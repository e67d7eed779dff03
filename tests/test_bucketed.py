"""Bucketed-table co-located joins (io/bucketed.py): the plan must
contain NO shuffle on either join side — the 100 TB payoff bucketing
buys at write time — and the result must equal the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dca_manager_spark.io.bucketed import bucketed_join, write_bucketed_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "l_linenumber",
            "l_extendedprice",
        )
    )
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            "o_orderstatus",
            "o_totalprice",
        )
    )
    write_bucketed_table(
        li, "dca_bucketed_li", ["orderkey"], num_buckets=8,
        sort_cols=["orderkey"],
    )
    write_bucketed_table(
        orders, "dca_bucketed_ord", ["orderkey"], num_buckets=8,
        sort_cols=["orderkey"],
    )
    try:
        joined = bucketed_join(
            spark, "dca_bucketed_li", "dca_bucketed_ord", ["orderkey"]
        )
        # Force the sort-merge path (tiny test tables would otherwise
        # broadcast, which trivially has no exchange on the build side
        # and proves nothing about bucketing).
        smj = (
            spark.table("dca_bucketed_li")
            .hint("merge")
            .join(
                spark.table("dca_bucketed_ord").hint("merge"),
                on=["orderkey"],
            )
        )
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, (
            "bucketed join still shuffles:\n" + plan[:2000]
        )
        # correctness: identical rows to the plain (shuffled) join
        plain = li.join(orders, on=["orderkey"])
        assert (
            smj.exceptAll(plain).count() == 0
            and plain.exceptAll(smj).count() == 0
        )
        # the convenience wrapper reads the same tables
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS dca_bucketed_li")
        spark.sql("DROP TABLE IF EXISTS dca_bucketed_ord")

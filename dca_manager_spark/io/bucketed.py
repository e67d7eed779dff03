"""Bucketed tables: co-located joins with the shuffle deleted.

At 100 TB the dominant cost of lineitem ⋈ orders is shuffling both sides
on orderkey. Bucketing both tables on the join key at WRITE time
(``bucketBy`` managed tables) pre-partitions the data so Catalyst plans the
join with NO Exchange on either side — the one-time write cost is repaid on
every subsequent join. This is the deployment-time knob SCALE.md refers to;
``tests/test_bucketed.py`` asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Sorting
    within buckets additionally removes the Sort from sort-merge joins."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst sees
    compatible output partitioning and plans no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on)

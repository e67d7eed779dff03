"""Phase-level timing of the manifest-family entries: wraps ManifestTable
write/read phases with wall-clock marks to show where a multi-commit
catalog entry spends its time (job launches vs fsync'd publishes).

Usage: python scripts/profile_manifest_phases.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.io.readers import load_table
    from dca_manager_spark.session import get_bench_session
    from dca_manager_spark.streaming.cdc import feed_deltas

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_bench_session()
    spark.sparkContext.setLogLevel("ERROR")

    marks: list[tuple[str, float]] = []

    def mark(label: str, t0: float) -> None:
        marks.append((label, time.perf_counter() - t0))

    # warm-up (codegen etc.)
    base_w = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_orderkey") < 2000))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_extendedprice").alias("l_extendedprice"))
    )
    tw = ManifestTable(
        spark, tempfile.mkdtemp(prefix="dca-phase-warm-"),
        keys=("l_orderkey", "l_linenumber"), precombine="l_extendedprice",
        partition_by=(),
    )
    tw.write(base_w, "bulk_insert")
    tw.write(base_w.filter(F.col("l_orderkey") < 100), "upsert")
    tw.write(base_w.filter(F.col("l_orderkey") < 25), "delete")

    # timed run — manifest_cdc_aggregate's exact write sequence at sf0.1
    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_orderkey") < 2000))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_extendedprice").alias("l_extendedprice"))
    )
    table = ManifestTable(
        spark, tempfile.mkdtemp(prefix="dca-phase-"),
        keys=("l_orderkey", "l_linenumber"), precombine="l_extendedprice",
        partition_by=(),
    )
    t0 = time.perf_counter()
    table.write(base, "bulk_insert")
    mark("bulk_insert", t0)
    t0 = time.perf_counter()
    v0 = table.commits()[-1]
    mark("commits()", t0)
    t0 = time.perf_counter()
    table.write(
        base.filter(F.col("l_orderkey") < 100).withColumn(
            "l_extendedprice", F.col("l_extendedprice") + 1), "upsert")
    mark("upsert1", t0)
    t0 = time.perf_counter()
    table.write(
        base.filter((F.col("l_orderkey") >= 50) & (F.col("l_orderkey") < 150))
        .withColumn("l_extendedprice", F.col("l_extendedprice") + 2), "upsert")
    mark("upsert2", t0)
    t0 = time.perf_counter()
    table.write(base.filter(F.col("l_orderkey") < 25), "delete")
    mark("delete", t0)
    t0 = time.perf_counter()
    bucket = (F.col("l_orderkey") % 10).alias("bucket")
    from dca_manager_spark.plans.queries import cents
    base_leg = (
        table.read(as_of=v0).groupBy(bucket)
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("__cents"),
             F.count(F.lit(1)).alias("__n")))
    move_leg = (
        feed_deltas(table.read_cdc(since=v0)).groupBy(bucket)
        .agg(F.sum(cents(F.col("l_extendedprice")) * F.col("_delta")).alias("__cents"),
             F.sum("_delta").cast("long").alias("__n")))
    out = (base_leg.unionByName(move_leg).groupBy("bucket")
           .agg((F.sum("__cents").cast("double") / 100).alias("total_price"),
                F.sum("__n").alias("n_rows"))
           .filter(F.col("n_rows") > 0).orderBy("bucket"))
    out.write.format("noop").mode("overwrite").save()
    mark("read+agg(noop)", t0)

    total = sum(d for _, d in marks)
    for label, d in marks:
        print(f"{label:>16}: {d:6.3f}s")
    print(f"{'TOTAL':>16}: {total:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

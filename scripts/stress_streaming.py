"""Structured-Streaming throughput probe (SCALE.md).

Drives the rate source through the engine's streaming shapes and
reports sustained rows/sec from StreamingQueryProgress (the number the
micro-batch scheduler actually admitted, not the source's nominal
rate):

- passthrough:   projection -> noop sink (framework floor)
- window_agg:    watermark + 10s tumbling count/sum (stateful agg)
- dedup:         watermark + dropDuplicates over a rolling key space
                 (stateful dedup, the EP2 idempotency shape)

Single-process local[32] numbers — the per-core admission rate is the
quantity that transfers to a cluster (state ops shuffle by key, so
they scale out with executors).

Usage: python scripts/stress_streaming.py [rows_per_sec=500000] [secs=15]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.session import get_bench_session  # noqa: E402


def measure(spark, name: str, build, secs: int) -> None:
    q = build()
    time.sleep(secs)
    rows = 0.0
    t = 0.0
    for p in q.recentProgress:
        rows += p["numInputRows"]
        t += p["durationMs"]["triggerExecution"] / 1000.0
    q.stop()
    rate = rows / t if t else 0.0
    print(f"{name}: {rows:,.0f} rows in {t:.1f}s busy -> {rate:,.0f} rows/s")


def main() -> None:
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    spark = get_bench_session("streaming-stress")
    spark.sparkContext.setLogLevel("ERROR")

    def source():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rps)
            .option("numPartitions", 8)
            .load()
            .select(
                F.col("timestamp"),
                (F.col("value") % 100_000).alias("key"),
                F.col("value"),
            )
        )

    def passthrough():
        return (
            source()
            .writeStream.format("noop")
            .option("checkpointLocation", f"/tmp/ss-pass-{time.time_ns()}")
            .start()
        )

    def window_agg():
        return (
            source()
            .withWatermark("timestamp", "5 seconds")
            .groupBy(F.window("timestamp", "10 seconds"), F.col("key") % 100)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", f"/tmp/ss-win-{time.time_ns()}")
            .start()
        )

    def dedup():
        return (
            source()
            .withWatermark("timestamp", "5 seconds")
            .dropDuplicates(["key", "timestamp"])
            .writeStream.format("noop")
            .option("checkpointLocation", f"/tmp/ss-dedup-{time.time_ns()}")
            .start()
        )

    measure(spark, "passthrough", passthrough, secs)
    measure(spark, "window_agg", window_agg, secs)
    measure(spark, "stateful_dedup", dedup, secs)


if __name__ == "__main__":
    main()

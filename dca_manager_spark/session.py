"""SparkSession builders tuned for the engine.

Two profiles mirroring the reference's deployment story
(terraform/glue.tf:88-96 — a small fixed Glue cluster — vs. local dev):

- ``get_session``       : general local session, AQE on, Arrow on.
- ``get_bench_session`` : sized from SPARK_GRAFT_CPUS for benchmarking.

Scale posture (designed for a 1000-executor cluster even though tests run
on local[*]):
- AQE enabled: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switching replace hand tuning.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; at
  cluster scale raise it to ~2-3x total cores and let AQE coalesce.
- Arrow enabled so any Pandas-UDF path is batch-vectorized, never per-row.
- UTC session timezone: the reference stores unix epochs and formats them
  without a zone (glue/scripts/load_transactions.py:90-91); pinning UTC
  makes timestamp semantics identical across engines and executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _apply_common(builder: SparkSession.Builder, shuffle_partitions: int) -> SparkSession.Builder:
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Dynamic partition overwrite: the pure-parquet analogue of the
        # reference's Hudi COPY_ON_WRITE partition rewrite (SURVEY §1.5).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # PySpark 4 captures the Python call site for every DataFrame/
        # Column API call (error-message context): a stack walk plus
        # FOUR py4j round-trips per call (conf.get + origin set/clear).
        # Measured (r17, cProfile on dedup_incremental_batch): 1234
        # wrapped calls cost 8.2s of an 12s query BUILD — the driver-
        # side floor of every catalog entry, dwarfing execution at
        # bench scale and pure overhead at any scale. Debug runs can
        # flip it back on ad hoc.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )


def get_session(app_name: str = "dca-manager-spark", master: str | None = None,
                shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS) -> SparkSession:
    """Create (or reuse) a tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # SPARK_GRAFT_MASTER lets a cluster deployment point at yarn/k8s/
    # standalone without code changes; default is local dev.
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    return _apply_common(builder, shuffle_partitions).getOrCreate()


def get_bench_session(app_name: str = "dca-manager-spark-bench") -> SparkSession:
    """Benchmark session: local[$SPARK_GRAFT_CPUS], shuffle partitions = cores."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    return _apply_common(builder, shuffle_partitions=cpus).getOrCreate()

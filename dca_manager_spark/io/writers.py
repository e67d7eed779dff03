"""Sinks (SURVEY §2B scans/sinks table + A10/A14).

- partitioned JSON sink: the distributed variant of the reference's
  row-wise S3 JSON writes (one object per row under
  ``status=<s>/exchange=<x>/``) — at scale you write partition-dir JSON,
  not per-row PutObject calls.
- partitioned parquet sink: the lake format (snappy, hive-style dirs).
- managed-table sink: saveAsTable into the session catalog (hive-sync
  parity, load_transactions.py:73-79) — queryable via ``spark.table`` /
  ``spark.sql`` like the reference's Athena surface.
- streaming parquet sink: writeStream wrapper with checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_partitioned_json(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ("exchange",), mode: str = "append"
) -> None:
    """A10 at scale: hive-partitioned JSON directory sink."""
    df.write.mode(mode).partitionBy(*partition_by).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ("pair",), mode: str = "append"
) -> None:
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def save_as_table(
    df: DataFrame,
    name: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Managed-table sink (A14): registers in the session catalog so
    ``spark.sql(f'SELECT ... FROM {name}')`` works — the engine's Athena
    surface. Use a database-qualified name for the dca_manager.<table>
    layout (terraform/glue.tf:119-122)."""
    if "." in name:
        db = name.split(".", 1)[0]
        df.sparkSession.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def write_stream_parquet(
    df: DataFrame, path: str, checkpoint: str, partition_by: tuple[str, ...] = ()
) -> StreamingQuery:
    """Streaming file sink with checkpointing (SURVEY §2B streaming row)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()

"""EP3: the analytics load — JSON scan -> normalize -> keyed table write.

Faithful re-expression of the reference's Glue job
(glue/scripts/load_transactions.py), composed from engine layers:

- operation validation          (:48-51)  -> WriteOperation.parse
- JSON scan with inference      (:84)     -> read_json_canonical
- time casts, centisecond fmt   (:90-91)  -> REFERENCE_TS_FORMAT
- double casts                  (:92-94)
- additional_columns + "none"   (:98-107)
- keyed Hudi write              (:56-80,:113-122) -> MergeTable
- hive-sync catalog             (:73-79)  -> register(table_name)

The reference triggers ONE Glue run per single-file order load
(cmd/process_orders/main.go:241,254) — an anti-pattern (SURVEY §4); this
function takes a file OR a prefix, so callers batch naturally.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dca_manager_spark.io.merge import MergeTable, WriteOperation
from dca_manager_spark.io.readers import read_json_canonical
from dca_manager_spark.schemas import REFERENCE_TS_FORMAT, TRANSACTION_RAW_SCHEMA

NONE_SENTINEL = "none"  # load_transactions.py:99 — literal skip marker


def normalize_transactions(df: DataFrame, decimal: bool = False) -> DataFrame:
    """The A4 transform (load_transactions.py:90-94): unix seconds ->
    timestamp through the exact 'yyyy-MM-dd HH:mm:ss.SS' format string
    (centisecond truncation parity — from_unixtime floors to seconds first,
    so the fraction is always .00), decimal strings -> numeric.

    Numeric policy (SURVEY §1.3 decimal note): the reference keeps exact
    shopspring decimals operationally and degrades to double in the lake.
    ``decimal=False`` (default) is lake parity; ``decimal=True`` keeps
    DecimalType(38,18) — exact quoted-string ingestion, no float round-trip.
    """
    num_type = "decimal(38,18)" if decimal else "double"
    out = df
    for c in ("close_time", "open_time"):
        out = out.withColumn(
            c, F.from_unixtime(F.col(c), REFERENCE_TS_FORMAT).cast("timestamp")
        )
    for c in ("fee", "price", "volume"):
        out = out.withColumn(c, F.col(c).cast(num_type))
    return out


def apply_additional_columns(df: DataFrame, additional_columns: str | dict | None) -> DataFrame:
    """A5 literal enrichment (load_transactions.py:98-107): a JSON object of
    {name: value} added as literal columns; the string "none" (or None)
    skips — the sentinel the producer sends when a file loads without hive
    partition context (cmd/process_orders/main.go:229-236)."""
    if additional_columns is None or additional_columns == NONE_SENTINEL:
        return df
    cols = (
        json.loads(additional_columns)
        if isinstance(additional_columns, str)
        else additional_columns
    )
    for name, value in cols.items():
        df = df.withColumn(name, F.lit(value))
    return df


def load_transactions(
    spark: SparkSession,
    input_path: str,
    table_path: str,
    write_operation: str = "upsert",
    additional_columns: str | dict | None = NONE_SENTINEL,
    table_name: str = "transactions",
    database: str = "dca_manager",
    infer_schema: bool = False,
    decimal: bool = False,
    max_corrupt_fraction: float = 0.0,
    table_format: str = "merge",
):
    """Run the load; returns the table handle.

    ``infer_schema=True`` reproduces the reference's bare inference
    (:84); default is the canonical-schema scan (single pass, robust to
    single-file inference drift — SURVEY §7 hard part #3).

    ``table_format``: "merge" (default) = directory-swap COW
    (io/merge.MergeTable — rename-capable filesystems); "manifest" =
    atomic-manifest commits (io/manifest.ManifestTable — object-store
    safe, time travel + incremental reads; no durable catalog
    registration, readers go through the handle).
    """
    op = WriteOperation.parse(write_operation)

    df = read_json_canonical(
        spark,
        input_path,
        schema=None if infer_schema else TRANSACTION_RAW_SCHEMA,
    )
    if "_corrupt_record" in df.columns:
        # Data-quality gate: count corrupt rows in the same pass via the
        # Observation API (no second scan), fail the load if the corrupt
        # fraction exceeds the budget instead of silently dropping a
        # mangled batch.
        from pyspark.sql import Observation

        obs = Observation("load_quality")
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        )
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        _quality_obs = obs
    else:
        _quality_obs = None

    df = normalize_transactions(df, decimal=decimal)
    df = apply_additional_columns(df, additional_columns)

    if table_format == "manifest":
        from dca_manager_spark.io.manifest import ManifestTable

        table_cls = ManifestTable
    elif table_format == "merge":
        table_cls = MergeTable
    else:
        raise ValueError(
            f"table_format must be 'merge' or 'manifest', got {table_format!r}"
        )
    table = table_cls(
        spark,
        table_path,
        keys=("transaction_id", "close_time"),  # ComplexKeyGenerator :57,:68
        precombine="transaction_id",  # :58
        partition_by=("pair",),  # :56
    )
    table.write(df, op)
    if _quality_obs is not None:
        metrics = _quality_obs.get  # available after the write action
        total, corrupt = metrics["n_total"], metrics["n_corrupt"]
        if total and corrupt / total > max_corrupt_fraction:
            raise ValueError(
                f"load quality gate: {corrupt}/{total} corrupt rows exceeds "
                f"max_corrupt_fraction={max_corrupt_fraction} "
                f"(the bad rows were NOT loaded, but the table now contains "
                f"this batch's clean rows — investigate the source)"
            )
    # Durable catalog sync — the analogue of hive-sync into the Glue
    # database `dca_manager` (load_transactions.py:73-79, glue.tf:119-122).
    # Manifest tables are read through the handle (their file set is named
    # by the manifest, not discoverable by a catalog's directory listing).
    if hasattr(table, "register"):
        table.register(f"{database}.{table_name}" if database else table_name)
    return table

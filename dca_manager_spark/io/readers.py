"""Sources: parquet/JSON/CSV scans with canonical-schema coercion.

Reference parity:
- A1 JSON source scan with inference      (glue/scripts/load_transactions.py:84)
- A2 config scan (JSON -> struct)         (pkg/configuration/dca.go:49-73)
- §2B parquet/CSV/catalog scans

Scale notes: all readers are plain ``spark.read`` DataFrame scans, so
Catalyst predicate pushdown / column pruning / partition pruning apply
untouched. Never infer schema in production paths when a canonical schema
exists — inference is an extra full pass over the data at 100 TB.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dca_manager_spark.schemas import DCA_ORDER_SCHEMA, coerce_to_schema

# Driver testdata star schema (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    ``events.ts`` has shipped in two physical formats across testdata
    generations: INT64 TIMESTAMP(NANOS) (which Spark 4 rejects unless read
    via the legacy nanos-as-long path, then truncated to microseconds) and
    plain ``timestamp[us]`` (which Spark reads natively as TIMESTAMP_NTZ).
    We set the legacy conf before the read so the nanos format loads at all,
    then convert only when ``ts`` actually arrives as a long — either way the
    values match DuckDB's native read exactly.
    """
    # Pin UTC regardless of who built the session (the driver harness builds
    # its own): timestamps must render identically to DuckDB's naive reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the testdata star schema as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_tables(spark: SparkSession, sf_dir: str,
                    names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load + register each table as a temp view so ``spark.sql`` works on it."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def read_json_canonical(spark: SparkSession, path: str, schema: T.StructType | None = None,
                        infer_then_coerce: bool = False) -> DataFrame:
    """JSON scan (A1). Three modes:

    - schema given, infer_then_coerce=False: fixed-schema scan (fast path;
      one pass, corrupt rows captured in ``_corrupt_record``).
    - schema given, infer_then_coerce=True: reference-parity inference
      (load_transactions.py:84) followed by coercion to the canonical schema.
    - no schema: raw inference, caller coerces later.
    """
    if schema is not None and not infer_then_coerce:
        robust = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        return (
            spark.read.schema(robust)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    df = spark.read.json(path)
    if schema is not None:
        df = coerce_to_schema(df, schema)
    return df


def read_dca_config(spark: SparkSession, path: str) -> DataFrame:
    """Config scan (A2): JSON config document -> one row per DCA order.

    The reference fetches a single small JSON document and unmarshals it
    driver-side (pkg/configuration/dca.go:49-73); we do the same — a config
    is KB-sized, a distributed scan would be pure overhead — then return it
    as a small DataFrame ready for broadcast joins (A9).
    """
    with open(path) as fh:
        doc = json.load(fh)
    orders = doc.get("orders", [])
    rows = [
        tuple(order.get(f.name) for f in DCA_ORDER_SCHEMA.fields)
        for order in orders
    ]
    return spark.createDataFrame(rows, DCA_ORDER_SCHEMA)


def validate_dca_config(path: str) -> list[str]:
    """Validate a config document against the reference's JSON-Schema rules
    (pkg/configuration/schema.json:5-68). Returns a list of violations
    (empty = valid). Implemented natively to avoid a jsonschema dependency.
    """
    errors: list[str] = []
    with open(path) as fh:
        doc = json.load(fh)
    orders = doc.get("orders")
    if not isinstance(orders, list):
        return ["config must contain an 'orders' array"]
    for i, order in enumerate(orders):
        where = f"orders[{i}]"
        for req in ("exchange", "pair", "order_type", "type", "volume"):
            if req not in order:
                errors.append(f"{where}: missing required field '{req}'")
        if order.get("order_type") not in (None, "market", "limit"):
            errors.append(f"{where}: order_type must be market|limit")
        if order.get("type") not in (None, "buy", "sell"):
            errors.append(f"{where}: type must be buy|sell")
        if order.get("order_type") == "limit" and "price" not in order:
            errors.append(f"{where}: limit orders require 'price'")
    return errors

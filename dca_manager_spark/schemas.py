"""Canonical schemas for the engine's data abstractions.

The reference carries four data shapes (SURVEY §1.1); the producer side is
fixed-schema Go structs, the lake side is inferred-then-coerced. Here every
shape gets an explicit StructType, and ingestion coerces inferred frames to
the canonical one (SURVEY §1.2: "dynamic ingestion + fixed logical schema").

Citations into /root/reference:
- DCA config / order      : pkg/configuration/dca.go:25-38, schema.json:5-68
- Pending order (raw)     : pkg/orders/common.go:15-19, pkg/orders/fake.go:16-28
- Queue message           : pkg/orders/common.go:30-34, submit_pending.go:31-48
- Completed transaction   : pkg/orders/common.go:39-50, load_transactions.py:56-80
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# DCA configuration: one row per recurring order (pkg/configuration/dca.go:25-38)
# ---------------------------------------------------------------------------
DCA_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("exchange", T.StringType(), False),
        T.StructField("pair", T.StringType(), False),
        T.StructField("order_type", T.StringType(), True),   # market | limit
        T.StructField("type", T.StringType(), True),         # buy | sell
        T.StructField("volume", T.StringType(), True),       # quoted decimal string
        T.StructField("price", T.StringType(), True),        # quoted decimal string
        T.StructField("enabled", T.BooleanType(), True),
    ]
)

DCA_CONFIG_SCHEMA = T.StructType(
    [T.StructField("orders", T.ArrayType(DCA_ORDER_SCHEMA), False)]
)

# ---------------------------------------------------------------------------
# Pending order: exchange's raw order-placement response (common.go:15-19).
# `result` is untyped (interface{}) upstream; canonical shape follows the
# Kraken AddOrderResponse fixture (pkg/orders/fake.go:16-28).
# ---------------------------------------------------------------------------
ORDER_DESCRIPTION_SCHEMA = T.StructType(
    [
        T.StructField("pair", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("order_type", T.StringType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("price2", T.StringType(), True),
        T.StructField("leverage", T.StringType(), True),
        T.StructField("order", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
    ]
)

PENDING_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), True),  # unix seconds
        T.StructField(
            "result",
            T.StructType(
                [
                    T.StructField("transaction_ids", T.ArrayType(T.StringType()), True),
                    T.StructField("description", ORDER_DESCRIPTION_SCHEMA, True),
                ]
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# Queue message (common.go:30-34 + attributes submit_pending.py:31-48).
# Attributes become ordinary columns in the streaming element.
# ---------------------------------------------------------------------------
QUEUE_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("s3_bucket", T.StringType(), True),
        T.StructField("s3_key", T.StringType(), True),
        T.StructField("exchange", T.StringType(), True),
        T.StructField("real", T.StringType(), True),  # "true"/"false" string attr
    ]
)

# ---------------------------------------------------------------------------
# Completed transaction — the analytics fact table (common.go:39-50).
# Two numeric policies (SURVEY §1.3 decimal note):
#   lake parity  -> DoubleType   (load_transactions.py:92-94 casts to double)
#   operational  -> DecimalType(38,18) (shopspring decimal upstream)
# ---------------------------------------------------------------------------


def transaction_schema(decimal: bool = False) -> T.StructType:
    num: T.DataType = T.DecimalType(38, 18) if decimal else T.DoubleType()
    return T.StructType(
        [
            T.StructField("transaction_id", T.StringType(), False),
            T.StructField("exchange_status", T.StringType(), True),
            T.StructField("pair", T.StringType(), True),
            T.StructField("order_type", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("price", num, True),
            T.StructField("fee", num, True),
            T.StructField("volume", num, True),
            T.StructField("open_time", T.TimestampType(), True),
            T.StructField("close_time", T.TimestampType(), True),
            T.StructField("exchange", T.StringType(), True),
        ]
    )


TRANSACTION_SCHEMA = transaction_schema(decimal=False)

# Raw (wire) form of a completed transaction before time/decimal coercion:
# prices are quoted decimal strings, times are unix-second floats
# (common.go:45-49 + shopspring JSON marshalling).
TRANSACTION_RAW_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("exchange_status", T.StringType(), True),
        T.StructField("pair", T.StringType(), True),
        T.StructField("order_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("fee", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("open_time", T.DoubleType(), True),
        T.StructField("close_time", T.DoubleType(), True),
    ]
)

# Timestamp format used by the reference's Glue job — note the centisecond
# (.SS) truncation, a deliberate parity detail (load_transactions.py:90-91).
REFERENCE_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SS"


def coerce_to_schema(df: DataFrame, schema: T.StructType, drop_extra: bool = True) -> DataFrame:
    """Coerce an inferred DataFrame to a canonical schema (the "analyze" step).

    Missing columns become typed nulls; present columns are cast. Extra
    columns are dropped unless ``drop_extra`` is False (they are kept as-is,
    after the canonical ones). This neutralizes schema-inference drift on
    single-file loads (SURVEY §7 hard part #3).
    """
    cols = []
    existing = {f.name: f for f in df.schema.fields}
    for field in schema.fields:
        if field.name in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    if not drop_extra:
        canonical = {f.name for f in schema.fields}
        cols.extend(F.col(c) for c in df.columns if c not in canonical)
    return df.select(*cols)

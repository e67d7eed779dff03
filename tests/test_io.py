"""IO layer tests: sinks (JSON/parquet/managed table/streaming), CSV and
JSON sources with canonical schemas, config validation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dca_manager_spark.io.readers import read_dca_config, read_json_canonical, validate_dca_config
from dca_manager_spark.io.writers import (
    save_as_table,
    write_partitioned_json,
    write_partitioned_parquet,
    write_stream_parquet,
)
from dca_manager_spark.schemas import TRANSACTION_RAW_SCHEMA, coerce_to_schema


def test_partitioned_json_sink_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("T1", "kraken"), ("T2", "fake")], "transaction_id string, exchange string"
    )
    write_partitioned_json(df, str(tmp_path / "out"))
    dirs = {p.name for p in (tmp_path / "out").iterdir() if p.is_dir()}
    assert dirs == {"exchange=kraken", "exchange=fake"}
    back = spark.read.json(str(tmp_path / "out"))
    assert back.count() == 2 and set(back.columns) == {"transaction_id", "exchange"}


def test_partitioned_parquet_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("T1", "BTCGBP", 1.5)], "txid string, pair string, price double")
    write_partitioned_parquet(df, str(tmp_path / "lake"))
    assert (tmp_path / "lake/pair=BTCGBP").is_dir()
    assert spark.read.parquet(str(tmp_path / "lake")).collect()[0].price == 1.5


def test_save_as_table_sql_surface(spark, tmp_path):
    # warehouse dir is a static conf — the managed table lands in the
    # default warehouse; clean up afterwards.
    df = spark.createDataFrame([("T1", "BTCGBP", 2.0)], "txid string, pair string, price double")
    try:
        save_as_table(df, "dca_manager.transactions_t", partition_by=("pair",))
        out = spark.sql(
            "SELECT pair, sum(price) AS total FROM dca_manager.transactions_t GROUP BY pair"
        ).collect()
        assert [(r.pair, r.total) for r in out] == [("BTCGBP", 2.0)]
    finally:
        # Drop only OUR table: the dca_manager database is shared with the
        # durable A14 registration (load_transactions registers
        # dca_manager.transactions), so the database may not be empty.
        spark.sql("DROP TABLE IF EXISTS dca_manager.transactions_t")


def test_streaming_parquet_sink(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text('{"transaction_id": "T1"}')
    stream = spark.readStream.schema("transaction_id string").json(str(src))
    q = write_stream_parquet(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    assert spark.read.parquet(str(tmp_path / "out")).collect()[0].transaction_id == "T1"


def test_csv_scan_with_schema(spark, tmp_path):
    (tmp_path / "c.csv").write_text("pair,price\nBTCGBP,1.25\nETHGBP,2.5\n")
    schema = T.StructType(
        [T.StructField("pair", T.StringType()), T.StructField("price", T.DoubleType())]
    )
    df = spark.read.csv(str(tmp_path / "c.csv"), header=True, schema=schema)
    assert {(r.pair, r.price) for r in df.collect()} == {("BTCGBP", 1.25), ("ETHGBP", 2.5)}


def test_json_canonical_corrupt_record_captured(spark, tmp_path):
    good = '{"transaction_id": "T1", "pair": "BTCGBP", "price": "1.5", "close_time": 100.0}'
    bad = '{"transaction_id": "T2", "price": NOT_JSON'
    (tmp_path / "data.json").write_text(good + "\n" + bad + "\n")
    df = read_json_canonical(spark, str(tmp_path / "data.json"), TRANSACTION_RAW_SCHEMA)
    rows = df.collect()
    corrupt = [r for r in rows if r._corrupt_record is not None]
    clean = [r for r in rows if r._corrupt_record is None]
    assert len(corrupt) == 1 and len(clean) == 1
    assert clean[0].transaction_id == "T1" and clean[0].price == "1.5"


def test_coerce_to_schema_drift(spark):
    """Single-file inference drift (SURVEY §7 hard part #3): a file where
    price inferred as double and a column is missing still coerces to the
    canonical quoted-string schema."""
    drifted = spark.createDataFrame(
        [("T1", 1.5)], "transaction_id string, price double"
    )
    out = coerce_to_schema(drifted, TRANSACTION_RAW_SCHEMA)
    assert [f.name for f in out.schema.fields] == [f.name for f in TRANSACTION_RAW_SCHEMA.fields]
    r = out.collect()[0]
    assert r.price == "1.5" and r.volume is None  # cast + typed-null fill


def test_config_reader_and_validation(spark, tmp_path):
    cfg = {
        "orders": [
            {"exchange": "kraken", "pair": "BTCGBP", "order_type": "limit",
             "type": "buy", "volume": "5", "price": "100", "enabled": True}
        ]
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    assert validate_dca_config(str(p)) == []
    df = read_dca_config(spark, str(p))
    assert df.collect()[0].pair == "BTCGBP"

    bad = {"orders": [{"exchange": "kraken", "pair": "X", "order_type": "limit",
                       "type": "buy", "volume": "5"}]}  # limit without price
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps(bad))
    assert any("price" in e for e in validate_dca_config(str(p2)))


def test_load_table_events_dtype(spark, sf_dir):
    """Pin the loaded dtype of every testdata table's time-ish columns.

    events.ts has drifted physical formats across testdata generations
    (INT64 TIMESTAMP(NANOS) -> timestamp[us]); load_table must always
    surface it as a timestamp regardless of the file's physical type.
    """
    from dca_manager_spark.io.readers import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.schema.fields, name
    ts_type = load_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)), ts_type

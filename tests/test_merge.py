"""MergeTable semantics: the four write operations with Hudi parity
(SURVEY §1.5) — precombine winner, duplicate-preserving bulk_insert,
keyed delete, partition layout, idempotent re-upsert."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.io.merge import MergeTable, WriteOperation, precombine_dedup

TS1 = datetime.datetime(2024, 1, 1, 12, 0, 0)
TS2 = datetime.datetime(2024, 2, 2, 12, 0, 0)


def make_df(spark, rows):
    return spark.createDataFrame(
        rows, "transaction_id string, close_time timestamp, pair string, price double"
    )


@pytest.fixture
def table(spark, tmp_path):
    return MergeTable(
        spark,
        str(tmp_path / "transactions"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id",
        partition_by=("pair",),
    )


def test_operation_validation():
    with pytest.raises(ValueError, match="write_operation"):
        WriteOperation.parse("replace")
    assert WriteOperation.parse("bulk_insert") is WriteOperation.BULK_INSERT


def test_bulk_insert_preserves_duplicates(spark, table):
    """Hudi bulk_insert/insert do NOT combine (SURVEY §7 hard part #2):
    duplicate keys are a legal table state."""
    df = make_df(spark, [("T1", TS1, "BTCGBP", 1.0), ("T1", TS1, "BTCGBP", 2.0)])
    table.write(df, "bulk_insert")
    table.write(df, "insert")
    assert table.read().count() == 4


def test_upsert_precombine_winner(spark, table):
    """Within a batch, the larger precombine value wins (load_transactions
    .py:58 — precombine field is transaction_id itself, so same-key rows
    collapse deterministically)."""
    df = make_df(
        spark,
        [
            ("T1", TS1, "BTCGBP", 1.0),
            ("T1", TS1, "BTCGBP", 9.0),  # same key: one survivor
            ("T2", TS1, "ETHGBP", 5.0),
        ],
    )
    table.write(df, "upsert")
    got = table.read().orderBy("transaction_id").collect()
    assert len(got) == 2
    assert {r.transaction_id for r in got} == {"T1", "T2"}


def test_upsert_updates_existing_and_inserts_new(spark, table):
    table.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    table.write(
        make_df(spark, [("T1", TS1, "BTCGBP", 42.0), ("T3", TS2, "BTCGBP", 7.0)]),
        "upsert",
    )
    got = {r.transaction_id: r.price for r in table.read().collect()}
    assert got == {"T1": 42.0, "T3": 7.0}


def test_upsert_is_idempotent(spark, table):
    df = make_df(spark, [("T1", TS1, "BTCGBP", 1.0), ("T2", TS2, "ETHGBP", 2.0)])
    table.write(df, "upsert")
    table.write(df, "upsert")
    table.write(df, "upsert")
    assert table.read().count() == 2


def test_composite_key_distinguishes_close_time(spark, table):
    """(transaction_id, close_time) is the record key — same txid at a
    different close_time is a DIFFERENT record (ComplexKeyGenerator)."""
    table.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    table.write(make_df(spark, [("T1", TS2, "BTCGBP", 2.0)]), "upsert")
    assert table.read().count() == 2


def test_delete_removes_matched_keys(spark, table):
    table.write(
        make_df(
            spark,
            [("T1", TS1, "BTCGBP", 1.0), ("T2", TS1, "ETHGBP", 2.0), ("T3", TS2, "BTCGBP", 3.0)],
        ),
        "bulk_insert",
    )
    table.write(make_df(spark, [("T1", TS1, "BTCGBP", 0.0)]), "delete")
    got = {r.transaction_id for r in table.read().collect()}
    assert got == {"T2", "T3"}


def test_hive_partition_layout(spark, table, tmp_path):
    """Partition dirs are hive-style pair=<PAIR> (hive_style_partitioning,
    load_transactions.py:69)."""
    table.write(
        make_df(spark, [("T1", TS1, "BTCGBP", 1.0), ("T2", TS1, "ETHGBP", 2.0)]),
        "bulk_insert",
    )
    root = tmp_path / "transactions"
    parts = {p.name for p in root.iterdir() if p.is_dir()}
    assert parts == {"pair=BTCGBP", "pair=ETHGBP"}


def test_upsert_rewrites_only_touched_partitions(spark, table, tmp_path):
    """COPY_ON_WRITE discipline: an upsert touching only ETHGBP must leave
    the BTCGBP partition's files untouched on disk."""
    table.write(
        make_df(spark, [("T1", TS1, "BTCGBP", 1.0), ("T2", TS1, "ETHGBP", 2.0)]),
        "bulk_insert",
    )
    root = tmp_path / "transactions"
    before = {f: f.stat().st_mtime_ns for f in (root / "pair=BTCGBP").glob("*.parquet")}
    table.write(make_df(spark, [("T2", TS1, "ETHGBP", 99.0)]), "upsert")
    after = {f: f.stat().st_mtime_ns for f in (root / "pair=BTCGBP").glob("*.parquet")}
    assert before == after, "untouched partition was rewritten"
    got = {r.transaction_id: r.price for r in table.read().collect()}
    assert got == {"T1": 1.0, "T2": 99.0}


def test_precombine_dedup_tiebreak(spark):
    df = spark.createDataFrame(
        [("K", 1, "a"), ("K", 2, "b"), ("K", 2, "c")], "k string, pc int, v string"
    )
    out = precombine_dedup(df, ["k"], "pc", tiebreaks=["v"]).collect()
    assert len(out) == 1 and out[0].v == "c"  # max pc, then max tiebreak

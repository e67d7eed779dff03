"""CdcFollower / replicate: manifest-aware streaming CDC — durable
cursor, incremental batches, backpressure, crash-replay idempotence."""

from __future__ import annotations

import datetime

import pytest

from dca_manager_spark.io.manifest import ManifestTable
from dca_manager_spark.streaming.cdc import CdcFollower, replicate

TS1 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def make_df(spark, rows):
    return spark.createDataFrame(
        rows, "transaction_id string, close_time timestamp, pair string, price double"
    )


@pytest.fixture
def source(spark, tmp_path):
    return ManifestTable(
        spark,
        str(tmp_path / "src"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id",
        partition_by=("pair",),
    )


@pytest.fixture
def replica(spark, tmp_path):
    return ManifestTable(
        spark,
        str(tmp_path / "dst"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id",
        partition_by=("pair",),
    )


def state(table):
    return {
        (r.transaction_id, r.pair): r.price for r in table.read().collect()
    }


def test_follower_tails_commits_incrementally(spark, source, replica, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    source.write(make_df(spark, [("T2", TS1, "ETHGBP", 5.0)]), "upsert")

    assert replicate(source, replica, ckpt) == 2
    assert state(replica) == state(source)
    assert CdcFollower(source, ckpt).position() == source.commits()[-1]

    # caught up: no-op
    assert replicate(source, replica, ckpt) == 0

    # later commits (update + delete) flow through on the next poll only
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 9.0)]), "upsert")
    source.write(make_df(spark, [("T2", TS1, "ETHGBP", 5.0)]), "delete")
    assert replicate(source, replica, ckpt) == 2
    assert state(replica) == state(source) == {("T1", "BTCGBP"): 9.0}


def test_follower_max_commits_backpressure(spark, source, replica, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    for i in range(4):
        source.write(make_df(spark, [(f"T{i}", TS1, "BTCGBP", float(i))]), "upsert")
    # a follower resuming far behind drains in bounded batches
    assert replicate(source, replica, ckpt, max_commits=3) == 3
    assert CdcFollower(source, ckpt).position() == source.commits()[2]
    assert replicate(source, replica, ckpt, max_commits=3) == 1
    assert state(replica) == state(source)


def test_crash_between_apply_and_cursor_advance_replays_idempotently(
    spark, source, replica, tmp_path
):
    ckpt = str(tmp_path / "ckpt.json")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 2.0)]), "upsert")
    assert replicate(source, replica, ckpt) == 2

    # simulate crash AFTER apply, BEFORE cursor advance: roll the cursor
    # back and re-run — the commit range is re-applied
    CdcFollower(source, ckpt).seek(source.commits()[0])
    assert replicate(source, replica, ckpt) == 1  # replay of commit 1
    assert state(replica) == state(source) == {("T1", "BTCGBP"): 2.0}


def test_append_commits_flow_through_the_feed(spark, source, replica, tmp_path):
    # append commits capture changes as data-file REFERENCES (no _changes
    # files) — exactly what a naive readStream glob over _changes/ would
    # miss; the manifest-aware follower must deliver them.
    ckpt = str(tmp_path / "ckpt.json")
    source.write(
        make_df(spark, [("T1", TS1, "BTCGBP", 1.0), ("T2", TS1, "ETHGBP", 2.0)]),
        "insert",
    )
    assert replicate(source, replica, ckpt) == 1
    assert state(replica) == state(source)


def test_seek_bootstraps_a_late_follower(spark, source, replica, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    source.write(make_df(spark, [("T2", TS1, "ETHGBP", 2.0)]), "upsert")
    # full-read bootstrap: copy the snapshot, then follow from the head
    replica.write(source.read(), "bulk_insert")
    f = CdcFollower(source, ckpt)
    f.seek(source.commits()[-1])
    assert f.run_once(lambda feed, lo, hi: replica.apply_cdc(feed)) == 0

    source.write(make_df(spark, [("T3", TS1, "BTCGBP", 3.0)]), "upsert")
    assert replicate(source, replica, ckpt) == 1
    assert state(replica) == state(source)


def test_apply_fn_sees_the_bounded_commit_range(spark, source, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    for i in range(3):
        source.write(make_df(spark, [(f"T{i}", TS1, "BTCGBP", float(i))]), "upsert")
    seen = []

    def capture(feed, lo, hi):
        seen.append((lo, hi, sorted({r._commit for r in feed.collect()})))

    f = CdcFollower(source, ckpt)
    assert f.run_once(capture, max_commits=2) == 2
    assert f.run_once(capture) == 1
    (lo0, hi0, commits0), (lo1, hi1, commits1) = seen
    assert (lo0, hi0) == (-1, source.commits()[1])
    assert commits0 == source.commits()[:2]
    assert (lo1, hi1) == (source.commits()[1], source.commits()[2])
    assert commits1 == [source.commits()[2]]


def test_max_commits_validation(spark, source, tmp_path):
    f = CdcFollower(source, str(tmp_path / "c.json"))
    with pytest.raises(ValueError, match="max_commits"):
        f.run_once(lambda *a: None, max_commits=0)


def test_replicate_from_a_mor_source(spark, tmp_path):
    """Cross-type replication: a MOR source's CDC feed (O(batch) delta
    captures, phantom-delete tolerant, no preimages) drives a COW
    replica to the same live state through the follower loop."""
    mor = ManifestTable(
        spark,
        str(tmp_path / "mor_src"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id",
        partition_by=("pair",),
        table_type="mor",
    )
    replica = ManifestTable(
        spark,
        str(tmp_path / "cow_dst"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id",
        partition_by=("pair",),
    )
    ckpt = str(tmp_path / "ckpt.json")
    mor.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0),
                              ("T2", TS1, "ETHGBP", 2.0)]), "upsert")
    mor.write(make_df(spark, [("T1", TS1, "BTCGBP", 9.0)]), "upsert")
    mor.write(make_df(spark, [("T2", TS1, "ETHGBP", 2.0),
                              ("TX", TS1, "ETHGBP", 0.0)]), "delete")  # TX phantom
    assert replicate(mor, replica, ckpt) == 3
    assert state(replica) == state(mor) == {("T1", "BTCGBP"): 9.0}


# -- replicate_stream: the datasource-native follower (r15) ---------------


def _drain(q):
    try:
        q.awaitTermination(180)
    finally:
        if q.isActive:
            q.stop()


def test_replicate_stream_converges_and_resumes(spark, source, replica, tmp_path):
    """Checkpointed Structured Streaming replication over the
    dca_table_changes source: drain, converge, then commits landing
    while the stream is down arrive on restart (and ONLY those)."""
    from dca_manager_spark.io.datasource import register_python_sources
    from dca_manager_spark.streaming.cdc import replicate_stream

    register_python_sources(spark)
    ckpt = str(tmp_path / "sckpt")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0),
                                 ("T2", TS1, "ETHGBP", 2.0)]), "upsert")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 9.0)]), "upsert")

    _drain(replicate_stream(spark, source.path, replica, ckpt))
    assert state(replica) == state(source) == {
        ("T1", "BTCGBP"): 9.0, ("T2", "ETHGBP"): 2.0,
    }

    # two commits while the stream is down -> exactly those on restart
    source.write(make_df(spark, [("T2", TS1, "ETHGBP", 2.0)]), "delete")
    source.write(make_df(spark, [("T3", TS1, "BTCGBP", 3.0)]), "upsert")
    before = replica.commits()[-1]
    _drain(replicate_stream(spark, source.path, replica, ckpt))
    assert state(replica) == state(source) == {
        ("T1", "BTCGBP"): 9.0, ("T3", "BTCGBP"): 3.0,
    }
    # caught-up restart: clean no-op, no spurious replica commits
    tail = replica.commits()[-1]
    _drain(replicate_stream(spark, source.path, replica, ckpt))
    assert replica.commits()[-1] == tail
    assert before < tail


@pytest.mark.slow
def test_replicate_stream_exactly_once_across_forced_crash(
    spark, source, replica, tmp_path
):
    """Kill/resume fault injection at the worst point — AFTER apply_cdc
    ran, BEFORE Spark marks the micro-batch done. The restart REPLAYS
    the batch (at-least-once delivery); apply_cdc's keyed idempotence
    makes the replica's resolved state exactly-once: converged, zero
    lost updates, zero resurrections."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dca_manager_spark.io.datasource import register_python_sources
    from dca_manager_spark.streaming.cdc import replicate_stream

    register_python_sources(spark)
    ckpt = str(tmp_path / "sckpt")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0),
                                 ("T2", TS1, "ETHGBP", 2.0)]), "upsert")
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 9.0)]), "upsert")
    source.write(make_df(spark, [("T2", TS1, "ETHGBP", 2.0)]), "delete")

    crashed = {"n": 0}

    def fault(batch, batch_id):
        crashed["n"] += 1
        raise RuntimeError("injected crash between apply and batch commit")

    q = replicate_stream(spark, source.path, replica, ckpt, _fault=fault)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
    assert crashed["n"] == 1
    # the apply DID run before the crash — data is already in the replica
    assert state(replica) == {("T1", "BTCGBP"): 9.0}

    # restart from the same checkpoint: the unacknowledged batch REPLAYS
    applied_commits = len(replica.commits())
    _drain(replicate_stream(spark, source.path, replica, ckpt))
    assert state(replica) == state(source) == {("T1", "BTCGBP"): 9.0}
    # replay happened (extra no-op commits on the replica's timeline —
    # the documented at-least-once trade), state unchanged
    assert len(replica.commits()) > applied_commits

    # post-crash commits still flow
    source.write(make_df(spark, [("T4", TS1, "ETHGBP", 4.0)]), "upsert")
    _drain(replicate_stream(spark, source.path, replica, ckpt))
    assert state(replica) == state(source)


def test_replicate_stream_continuous_mode_follows_live_commits(
    spark, source, replica, tmp_path
):
    """Continuous (non-availableNow) replication: commits landing WHILE
    the stream runs are applied without a restart."""
    import time as _t

    from dca_manager_spark.io.datasource import register_python_sources
    from dca_manager_spark.streaming.cdc import replicate_stream

    register_python_sources(spark)
    source.write(make_df(spark, [("T1", TS1, "BTCGBP", 1.0)]), "upsert")
    q = replicate_stream(
        spark, source.path, replica, str(tmp_path / "ck"),
        available_now=False, trigger_interval="1 seconds",
    )
    def safe_state():
        try:
            return state(replica)
        except FileNotFoundError:  # first replicated commit not landed yet
            return {}

    try:
        deadline = _t.time() + 120
        while _t.time() < deadline and safe_state() != {("T1", "BTCGBP"): 1.0}:
            _t.sleep(0.5)
        assert state(replica) == {("T1", "BTCGBP"): 1.0}
        # a LIVE commit while the query keeps running
        source.write(make_df(spark, [("T2", TS1, "ETHGBP", 2.0)]), "upsert")
        while _t.time() < deadline and len(safe_state()) != 2:
            _t.sleep(0.5)
        assert state(replica) == state(source)
    finally:
        q.stop()
        q.awaitTermination(60)

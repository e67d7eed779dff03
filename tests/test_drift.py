"""Semantic tests for the corpus-drift family: hand-computable
distributions, a Python replay of the quantized statistics, exact
integer ranking, and layout independence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.operators.drift import (
    TERM_SCALE,
    distribution_drift,
    token_counts_by_slice,
    top_divergent_tokens,
)


@pytest.fixture(scope="module")
def sliced(spark):
    rows = [
        ("a", "x x x y"),       # a: x=6, y=2  (n_a=8)
        ("a", "x x x y"),
        ("b", "x y y z"),       # b: x=2, y=4, z=2  (n_b=8)
        ("b", "x y y z"),
    ]
    return spark.createDataFrame(rows, "slice string, text string")


def _replay(counts_a, counts_b):
    """Python twin of distribution_drift's quantized statistics."""
    na, nb = sum(counts_a.values()), sum(counts_b.values())
    vocab = set(counts_a) | set(counts_b)
    tvd_q = chi_q = 0
    for tok in vocab:
        pa = counts_a.get(tok, 0) / na
        pb = counts_b.get(tok, 0) / nb
        d = pa - pb
        s = pa + pb
        tvd_q += math.floor(abs(d) * float(TERM_SCALE))
        chi_q += math.floor(d * d / s * float(TERM_SCALE))
    return tvd_q / TERM_SCALE / 2, chi_q / TERM_SCALE


def test_distribution_drift_matches_hand_values(sliced):
    row = distribution_drift(sliced, "slice", "a", "b").collect()[0]
    # a: p = {x: 6/8, y: 2/8}; b: p = {x: 2/8, y: 4/8, z: 2/8}
    want_tvd, want_chi = _replay({"x": 6, "y": 2}, {"x": 2, "y": 4, "z": 2})
    assert row["tvd"] == want_tvd
    assert row["chisq"] == want_chi
    # hand check: |6/8-2/8| + |2/8-4/8| + |0-2/8| = 1.0 -> tvd 0.5
    assert abs(row["tvd"] - 0.5) < 1e-9
    assert (row["n_tokens_a"], row["n_tokens_b"]) == (8, 8)
    assert (row["vocab_union"], row["vocab_shared"]) == (3, 2)


def test_identical_slices_have_zero_drift(spark):
    rows = [(s, "alpha beta beta gamma") for s in ("a", "b") for _ in range(3)]
    df = spark.createDataFrame(rows, "slice string, text string")
    row = distribution_drift(df, "slice", "a", "b").collect()[0]
    assert row["tvd"] == 0.0 and row["chisq"] == 0.0
    assert row["vocab_union"] == row["vocab_shared"] == 3


def test_disjoint_slices_have_tvd_one(spark):
    df = spark.createDataFrame(
        [("a", "p q r"), ("b", "s t u")], "slice string, text string"
    )
    row = distribution_drift(df, "slice", "a", "b").collect()[0]
    assert abs(row["tvd"] - 1.0) < 1e-9
    assert row["vocab_shared"] == 0


def test_top_divergent_exact_integer_ranking(sliced):
    got = top_divergent_tokens(sliced, "slice", "a", "b", k=10).collect()
    by_rank = [
        (r["token"], r["count_a"], r["count_b"], r["divergence_num"], r["direction"])
        for r in sorted(got, key=lambda r: r["rank"])
    ]
    # cross = c_a*n_b - c_b*n_a: x: 6*8-2*8=32 (down), y: 2*8-4*8=-16 (up),
    # z: 0-2*8=-16 (up); tie between y and z -> token asc
    assert by_rank == [
        ("x", 6, 2, 32, "down"),
        ("y", 2, 4, 16, "up"),
        ("z", 0, 2, 16, "up"),
    ]
    with pytest.raises(ValueError, match="k must be"):
        top_divergent_tokens(sliced, "slice", "a", "b", k=0)


def test_drift_is_layout_independent(sliced):
    a = distribution_drift(sliced, "slice", "a", "b").collect()[0]
    b = distribution_drift(sliced.repartition(7), "slice", "a", "b").collect()[0]
    assert tuple(a) == tuple(b)
    ta = [tuple(r) for r in top_divergent_tokens(sliced, "slice", "a", "b").collect()]
    tb = [
        tuple(r)
        for r in top_divergent_tokens(
            sliced.repartition(5), "slice", "a", "b"
        ).collect()
    ]
    assert sorted(ta) == sorted(tb)


def test_token_counts_lowercase_toggle(spark):
    df = spark.createDataFrame(
        [("a", "Foo foo BAR")], "slice string, text string"
    )
    lower = {
        (r["__tok"], r["__cnt"])
        for r in token_counts_by_slice(df, "slice").collect()
    }
    assert lower == {("foo", 2), ("bar", 1)}
    raw = {
        (r["__tok"], r["__cnt"])
        for r in token_counts_by_slice(df, "slice", lowercase=False).collect()
    }
    assert raw == {("Foo", 1), ("foo", 1), ("BAR", 1)}


def test_streaming_drift_store_matches_batch_and_is_idempotent(spark, tmp_path):
    """The streaming drift store's bucket-vs-bucket statistics must
    EQUAL the batch distribution_drift over the same documents (counts
    add losslessly across micro-batches), and a replay from a fresh
    checkpoint changes nothing (keyed upsert idempotence)."""
    import datetime
    import json

    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.streaming.drift_maintenance import (
        read_bucket_drift,
        read_bucket_top_divergent,
        stream_token_counts,
    )

    src = tmp_path / "docs"
    src.mkdir()
    rows1 = [
        ("2024-03-01T00:05:00", "alpha beta beta gamma"),
        ("2024-03-01T00:40:00", "alpha alpha delta"),
        ("2024-03-01T01:10:00", "beta beta beta zeta"),
    ]
    rows2 = [
        ("2024-03-01T00:55:00", "gamma gamma"),
        ("2024-03-01T01:30:00", "zeta eta eta eta"),
    ]

    def write(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps({"ts": ts, "text": tx}) for ts, tx in rows)
        )

    table = ManifestTable(
        spark,
        str(tmp_path / "store"),
        keys=("bucket_ts", "token", "batch_id"),
        precombine="batch_id",
        partition_by=(),
    )

    def run(ckpt):
        stream = spark.readStream.schema("ts timestamp, text string").json(str(src))
        q = stream_token_counts(
            stream, table, str(tmp_path / ckpt), "text", "ts",
            bucket_duration="1 hour",
        )
        q.awaitTermination(120)
        assert not q.isActive

    write("f1.json", rows1)
    run("ckpt")
    write("f2.json", rows2)
    run("ckpt")

    h0 = datetime.datetime(2024, 3, 1, 0)
    h1 = datetime.datetime(2024, 3, 1, 1)

    # batch twin: same docs labeled by their hour bucket
    all_rows = rows1 + rows2
    batch = spark.createDataFrame(
        [(ts[:13].replace("T", " ") + ":00:00", tx) for ts, tx in all_rows],
        "slice string, text string",
    )
    want = distribution_drift(batch, "slice", str(h0), str(h1)).collect()[0]
    got = read_bucket_drift(table, h0, h1).collect()[0]
    assert tuple(got) == tuple(want)

    want_top = [
        tuple(r)
        for r in top_divergent_tokens(batch, "slice", str(h0), str(h1), k=5).collect()
    ]
    got_top = [
        tuple(r) for r in read_bucket_top_divergent(table, h0, h1, k=5).collect()
    ]
    assert got_top == want_top

    # at-least-once replay: a crash between the sink write and the
    # checkpoint commit re-executes the SAME batch (same id, same
    # rows) — the keyed upsert rewrites identical rows and statistics
    # do not move. (A fresh checkpoint is a RE-INGEST, not a replay —
    # batch boundaries differ and counts would legitimately double.)
    batch2 = spark.createDataFrame(
        [(datetime.datetime.fromisoformat(ts), tx) for ts, tx in rows2],
        "ts timestamp, text string",
    )
    replay_counts = (
        batch2.select(
            F.window(F.col("ts"), "1 hour")["start"].alias("bucket_ts"),
            F.explode(
                F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                         lambda x: x != "")
            ).alias("token"),
        )
        .groupBy("bucket_ts", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("batch_id", F.lit(1).cast("long"))
    )
    table.write(replay_counts, "upsert")
    again = read_bucket_drift(table, h0, h1).collect()[0]
    assert tuple(again) == tuple(want)


def test_count_store_compaction_and_ttl_compose(spark, tmp_path):
    """Count-store compaction collapses each (bucket, token)'s batch
    rows to one summed row without moving any drift statistic, and the
    generic TTL sweep (sweep_sketch_ttl on bucket_ts) then expires old
    buckets exactly — compact/sweep/re-compact in any order keeps
    bounded reads correct."""
    import datetime
    import json

    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.streaming.drift_maintenance import (
        compact_count_store,
        read_bucket_drift,
        stream_token_counts,
    )
    from dca_manager_spark.streaming.sketch_maintenance import sweep_sketch_ttl

    src = tmp_path / "docs"
    src.mkdir()
    rows1 = [("2024-03-01T00:10:00", "aa bb bb"), ("2024-03-01T01:10:00", "cc dd")]
    rows2 = [("2024-03-01T00:20:00", "aa aa ee"), ("2024-03-01T01:40:00", "cc cc ff")]

    def write(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps({"ts": ts, "text": tx}) for ts, tx in rows)
        )

    table = ManifestTable(
        spark,
        str(tmp_path / "store"),
        keys=("bucket_ts", "token", "batch_id"),
        precombine="batch_id",
        partition_by=(),
    )

    def run():
        stream = spark.readStream.schema("ts timestamp, text string").json(str(src))
        q = stream_token_counts(
            stream, table, str(tmp_path / "ckpt"), "text", "ts",
            bucket_duration="1 hour",
        )
        q.awaitTermination(120)

    write("f1.json", rows1)
    run()
    write("f2.json", rows2)
    run()

    h0 = datetime.datetime(2024, 3, 1, 0)
    h1 = datetime.datetime(2024, 3, 1, 1)
    before = tuple(read_bucket_drift(table, h0, h1).collect()[0])

    # Stream is stopped at a committed availableNow checkpoint, so the
    # frontier batch may fold too (the default would keep it aside).
    compact_count_store(table, assume_quiesced=True)
    assert tuple(read_bucket_drift(table, h0, h1).collect()[0]) == before
    # each (bucket, token) now holds exactly one row
    from pyspark.sql import functions as F2
    per_key = (
        table.read().groupBy("bucket_ts", "token")
        .count().agg(F2.max("count")).first()[0]
    )
    assert per_key == 1
    # 'aa' rows from two batches summed: aa@h0 == 3
    aa = table.read().filter(
        (F2.col("token") == "aa") & (F2.col("bucket_ts") == h0)
    ).collect()
    assert len(aa) == 1 and aa[0]["cnt"] == 3

    # generic TTL sweep expires bucket h0; h1-only reads intact
    n = sweep_sketch_ttl(table, h1)
    assert n > 0 and sweep_sketch_ttl(table, h1) == 0
    assert table.read().filter(F2.col("bucket_ts") < h1).count() == 0
    compact_count_store(table)  # still a safe no-op afterwards
    assert table.read().filter(F2.col("token") == "cc").collect()[0]["cnt"] == 3


def test_compaction_excludes_replayable_frontier(spark, tmp_path):
    """ADVICE r11 (medium): compaction interleaved between a
    micro-batch's table write and that batch's checkpoint commit must
    not corrupt totals when the batch replays. Only the LATEST batch
    can ever replay (batch N+1 starts after N commits), so default
    compaction excludes the store's max batch_id; the replayed upsert
    then rewrites its own untouched rows and every read stays exact."""
    import datetime

    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.streaming.drift_maintenance import (
        compact_count_store,
        read_bucket_drift,
    )

    h0 = datetime.datetime(2024, 3, 1, 0)
    h1 = datetime.datetime(2024, 3, 1, 1)
    table = ManifestTable(
        spark,
        str(tmp_path / "store"),
        keys=("bucket_ts", "token", "batch_id"),
        precombine="batch_id",
        partition_by=(),
    )

    def write_batch(batch_id, rows):
        df = spark.createDataFrame(
            [(b, t, c, batch_id) for b, t, c in rows],
            "bucket_ts timestamp, token string, cnt long, batch_id long",
        )
        table.write(df, "upsert")

    # batch 0 committed; batch 1 written but its checkpoint commit is
    # (conceptually) still in flight — it may replay.
    write_batch(0, [(h0, "aa", 2), (h0, "bb", 1), (h1, "xx", 4)])
    batch1 = [(h0, "aa", 3), (h1, "cc", 4), (h1, "xx", 1)]
    write_batch(1, batch1)

    expected = tuple(read_bucket_drift(table, h0, h1).collect()[0])

    # compaction runs in the hazard window...
    compact_count_store(table)
    # ...then the crash replays batch 1 verbatim (same id, same rows).
    write_batch(1, batch1)

    # totals are still exact: aa@h0 == 5 (the old full fold would have
    # folded aa into batch 0 and the replay would re-add 3 -> 8).
    got = {
        (r["bucket_ts"], r["token"]): r["cnt"]
        for r in table.read()
        .groupBy("bucket_ts", "token")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == {
        (h0, "aa"): 5, (h0, "bb"): 1, (h1, "xx"): 5, (h1, "cc"): 4,
    }
    assert tuple(read_bucket_drift(table, h0, h1).collect()[0]) == expected
    # frontier rows themselves were left alone (still keyed batch_id 1)
    assert table.read().filter(
        (F.col("token") == "cc") & (F.col("batch_id") == 1)
    ).count() == 1


def test_sketch_compaction_excludes_replayable_frontier(spark, tmp_path):
    """Sketch-store twin of the count-store frontier rule: compaction
    between a batch's write and its checkpoint commit, followed by the
    batch's replay, keeps merged quantiles and counts exact."""
    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.operators.sketches import ddsketch_build
    from dca_manager_spark.streaming.sketch_maintenance import (
        compact_sketch_store,
        read_sketch_quantiles,
    )

    table = ManifestTable(
        spark,
        str(tmp_path / "skstore"),
        keys=("g", "batch_id"),
        precombine="batch_id",
        partition_by=(),
    )

    def write_batch(batch_id, rows):
        df = spark.createDataFrame(rows, "g string, v double")
        table.write(
            ddsketch_build(df, "v", ["g"]).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ),
            "upsert",
        )

    write_batch(0, [("a", float(v)) for v in range(1, 50)])
    batch1 = [("a", float(v)) for v in range(50, 80)] + [("b", 9.0)] * 5
    write_batch(1, batch1)
    expected = sorted(
        tuple(r)
        for r in read_sketch_quantiles(table, ["g"], [0.5, 0.99]).collect()
    )

    compact_sketch_store(table, ["g"])   # hazard window
    write_batch(1, batch1)               # replay

    after = sorted(
        tuple(r)
        for r in read_sketch_quantiles(table, ["g"], [0.5, 0.99]).collect()
    )
    assert after == expected
    ns = {r["g"]: r["n"] for r in read_sketch_quantiles(table, ["g"], [0.5]).collect()}
    assert ns == {"a": 49 + 30, "b": 5}  # old full fold: a would double batch 1


def test_sub_second_bucket_labels(spark, tmp_path):
    """ADVICE r11: bucket matching must not depend on str(datetime) and
    Spark's cast-to-string agreeing — sub-second buckets render
    differently ('…00.123000' vs '…00.123') and a '.' in a pivot label
    breaks column parsing. Buckets are now compared as timestamps and
    aliased to fixed labels, so sub-second stores read exactly."""
    import datetime

    from dca_manager_spark.io.manifest import ManifestTable
    from dca_manager_spark.operators.drift import drift_from_counts
    from dca_manager_spark.streaming.drift_maintenance import (
        read_bucket_drift,
        read_bucket_top_divergent,
    )

    b1 = datetime.datetime(2024, 3, 1, 0, 0, 0, 123000)
    b2 = datetime.datetime(2024, 3, 1, 0, 0, 0, 623000)
    table = ManifestTable(
        spark,
        str(tmp_path / "store"),
        keys=("bucket_ts", "token", "batch_id"),
        precombine="batch_id",
        partition_by=(),
    )
    rows = [
        (b1, "x", 6, 0), (b1, "y", 2, 0),
        (b2, "x", 2, 0), (b2, "y", 4, 0), (b2, "z", 2, 0),
    ]
    table.write(
        spark.createDataFrame(
            rows, "bucket_ts timestamp, token string, cnt long, batch_id long"
        ),
        "upsert",
    )
    counts = spark.createDataFrame(
        [("a" if b == b1 else "b", t, c) for b, t, c, _ in rows],
        "__slice string, __tok string, __cnt long",
    )
    want = tuple(drift_from_counts(counts, "a", "b").collect()[0])
    got = tuple(read_bucket_drift(table, b1, b2).collect()[0])
    assert got == want and got[2] == 8 and got[3] == 8  # n_tokens non-NULL
    assert len(read_bucket_top_divergent(table, b1, b2, k=3).collect()) == 3
    with pytest.raises(ValueError, match="same bucket"):
        read_bucket_drift(table, b1, b1)


def test_empty_slice_raises_loudly(spark, sliced):
    """ADVICE r11: a slice with zero tokens must fail loudly, not emit
    NULL statistics — the pivot total guard raises at evaluation."""
    with pytest.raises(Exception, match="zero tokens"):
        distribution_drift(sliced, "slice", "a", "nope").collect()
    with pytest.raises(Exception, match="zero tokens"):
        top_divergent_tokens(sliced, "slice", "nope", "b", k=3).collect()

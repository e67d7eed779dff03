"""ManifestTable Bloom-filter file skipping (r13): point lookups on
high-cardinality keys via per-file blooms — the Hudi-bloom-index /
Iceberg-Puffin analogue. Exactness contract: NO false negatives ever;
pruning is best-effort, results come from bloom prune + residual row
filter."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.io.manifest import ManifestTable

TS1 = datetime.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "transaction_id string, close_time timestamp, pair string, price double"


def make_table(spark, path, **kw):
    kw.setdefault("keys", ("transaction_id", "close_time"))
    kw.setdefault("precombine", "transaction_id")
    kw.setdefault("partition_by", ("pair",))
    kw.setdefault("bloom_by", ("transaction_id",))
    return ManifestTable(spark, str(path), **kw)


def seed_rows(spark, n=120):
    rows = [
        (f"T{i}", TS1, "BTCGBP" if i % 2 else "ETHGBP", float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def commit_in_chunks(table, df, n=120, step=40):
    for lo in range(0, n, step):
        table.write(
            df.filter((F.col("price") >= lo) & (F.col("price") < lo + step)),
            "upsert",
        )


def test_point_lookup_exact_and_pruned(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    commit_in_chunks(t, seed_rows(spark))
    doc = t._latest_manifest()[1]
    assert all("bloom" in f for f in doc["files"])
    # NO false negative over every key (the exactness contract)
    for i in range(0, 120, 7):
        got = t.read(point_filter={"transaction_id": f"T{i}"}).collect()
        assert [(r.transaction_id, r.price) for r in got] == [(f"T{i}", float(i))]
    # pruning is real: one key admits strictly fewer files than live set
    cand = [
        f for f in doc["files"]
        if t._bloom_admits(f, "transaction_id", "T7")
    ]
    assert 0 < len(cand) < len(doc["files"])
    # absent key: every file pruned, zero rows
    assert not any(
        t._bloom_admits(f, "transaction_id", "NOPE") for f in doc["files"]
    )
    assert t.read(point_filter={"transaction_id": "NOPE"}).count() == 0


def test_same_part_name_across_partition_dirs(spark, tmp_path):
    """Regression: partitionBy writes identical part-file NAMES into
    each partition dir of a task; bloom attribution must key on the
    full relative path or blooms land on the wrong file (observed as
    false negatives on first implementation)."""
    t = make_table(spark, tmp_path / "t")
    # one commit covering BOTH partitions -> same task writes two files
    # with the same part name under different __part_pair dirs
    t.write(seed_rows(spark, 40), "bulk_insert")
    doc = t._latest_manifest()[1]
    names = [f["path"].rsplit("/", 1)[-1] for f in doc["files"]]
    assert len(names) != len(set(names)), "fixture no longer collides"
    for i in range(40):
        assert t.read(point_filter={"transaction_id": f"T{i}"}).count() == 1


def test_mor_point_lookup_resolves(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", table_type="mor")
    t.write(seed_rows(spark, 60), "bulk_insert")
    t.write(
        spark.createDataFrame([("T7", TS1, "BTCGBP", 700.0)], SCHEMA),
        "upsert",
    )
    t.write(
        spark.createDataFrame([("T9", TS1, "BTCGBP", 0.0)], SCHEMA),
        "delete",
    )
    rows = t.read(point_filter={"transaction_id": "T7"}).collect()
    assert [(r.transaction_id, r.price) for r in rows] == [("T7", 700.0)]
    assert t.read(point_filter={"transaction_id": "T9"}).count() == 0


def test_compaction_recomputes_blooms(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    commit_in_chunks(t, seed_rows(spark, 80), n=80, step=20)
    t.compact()
    doc = t._latest_manifest()[1]
    assert all("bloom" in f for f in doc["files"])
    for i in (0, 33, 79):
        assert t.read(point_filter={"transaction_id": f"T{i}"}).count() == 1


def test_pre_bloom_commits_kept_conservatively(spark, tmp_path):
    plain = make_table(spark, tmp_path / "t", bloom_by=())
    plain.write(seed_rows(spark, 30), "bulk_insert")
    # reopen WITH blooms: old files lack them -> conservative keep
    t = make_table(spark, tmp_path / "t")
    t.write(
        spark.createDataFrame([("X1", TS1, "BTCGBP", 1.0)], SCHEMA),
        "insert",
    )
    for key, n in (("T3", 1), ("X1", 1), ("NOPE", 0)):
        assert t.read(point_filter={"transaction_id": key}).count() == n


def test_point_filter_guards(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.write(seed_rows(spark, 10), "bulk_insert")
    with pytest.raises(ValueError, match="non-null"):
        t.read(point_filter={"transaction_id": None})
    # ineligible bloom column type fails at WRITE, loudly
    bad = make_table(spark, tmp_path / "t2", bloom_by=("price",))
    with pytest.raises(ValueError, match="bloom_by"):
        bad.write(seed_rows(spark, 5), "bulk_insert")


def test_bloom_config_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="bloom_bits"):
        make_table(spark, tmp_path / "t", bloom_bits=100)
    with pytest.raises(ValueError, match="bloom_hashes"):
        make_table(spark, tmp_path / "t", bloom_hashes=5)


def test_time_travel_with_point_filter(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.write(seed_rows(spark, 20), "bulk_insert")
    v0 = t.commits()[-1]
    t.write(
        spark.createDataFrame([("T5", TS1, "BTCGBP", 500.0)], SCHEMA),
        "upsert",
    )
    old = t.read(as_of=v0, point_filter={"transaction_id": "T5"}).collect()
    assert old[0].price == 5.0
    new = t.read(point_filter={"transaction_id": "T5"}).collect()
    assert new[0].price == 500.0


def test_int_and_date_bloom_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (i, datetime.date(2024, 1, 1 + i % 28), f"v{i}")
            for i in range(50)
        ],
        "k long, d date, v string",
    )
    t = ManifestTable(
        spark,
        str(tmp_path / "t"),
        keys=("k",),
        precombine="k",
        partition_by=(),
        bloom_by=("k", "d"),
    )
    t.write(df.filter(F.col("k") < 25), "bulk_insert")
    t.write(df.filter(F.col("k") >= 25), "insert")
    assert t.read(point_filter={"k": 33}).collect()[0].v == "v33"
    got = t.read(
        point_filter={"d": datetime.date(2024, 1, 3)}
    ).count()
    want = df.filter(F.col("d") == F.lit(datetime.date(2024, 1, 3))).count()
    assert got == want
    # combined lookup
    assert t.read(
        point_filter={"k": 2, "d": datetime.date(2024, 1, 3)}
    ).count() == 1


def test_point_filter_list_batched_lookup(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    commit_in_chunks(t, seed_rows(spark))
    got = {
        r.transaction_id
        for r in t.read(
            point_filter={"transaction_id": ["T3", "T77", "NOPE"]}
        ).collect()
    }
    assert got == {"T3", "T77"}
    with pytest.raises(ValueError, match="non-empty"):
        t.read(point_filter={"transaction_id": []})
    with pytest.raises(ValueError, match="non-null"):
        t.read(point_filter={"transaction_id": ["T1", None]})


def test_mor_delta_bloom_prunes_key_columns_only(spark, tmp_path):
    """Regression (ADVICE r13, high): on a MOR table with a NON-key
    bloom column, pruning a delta whose bloom excludes the looked-up
    value would remove the key's NEWEST version from latest-per-key
    resolution and resurrect its superseded row — which then passes
    the residual filter. Delta/tombstone files must only ever be
    bloom-pruned on key columns."""
    t = ManifestTable(
        spark, str(tmp_path / "t"),
        keys=("transaction_id",), precombine="price",
        partition_by=(), table_type="mor",
        bloom_by=("transaction_id", "pair"),
    )
    t.write(
        spark.createDataFrame([("T1", TS1, "AAA", 1.0)], SCHEMA),
        "bulk_insert",
    )
    # newer version of T1 moves pair AAA -> BBB (lands as a delta whose
    # pair-bloom excludes 'AAA')
    t.write(
        spark.createDataFrame([("T1", TS1, "BBB", 2.0)], SCHEMA),
        "upsert",
    )
    # the stale (T1, AAA) row is superseded: looking up pair='AAA' must
    # find NOTHING, even though the base file's bloom admits it
    assert t.read(point_filter={"pair": "AAA"}).count() == 0
    rows = t.read(point_filter={"pair": "BBB"}).collect()
    assert [(r.transaction_id, r.pair, r.price) for r in rows] == [
        ("T1", "BBB", 2.0)
    ]
    # KEY-column pruning still applies to deltas (safe: a delta whose
    # bloom excludes the key holds no rows for it)
    doc = t._latest_manifest()[1]
    deltas = [f for f in doc["files"] if f.get("kind")]
    assert deltas and not any(
        t._bloom_admits(f, "transaction_id", "NOPE") for f in deltas
    )
    assert t.read(point_filter={"transaction_id": "NOPE"}).count() == 0


def test_bloom_config_inherited_by_plain_handle(spark, tmp_path):
    """Regression (ADVICE r13): the bloom config persists in the
    manifest, so a compactor/maintenance handle opened WITHOUT
    bloom_by inherits it instead of silently rewriting files with no
    blooms (and a plain reader gets the right bits/hashes for the
    _bloom_admits generation check)."""
    t = make_table(spark, tmp_path / "t", bloom_bits=2048, bloom_hashes=3)
    commit_in_chunks(t, seed_rows(spark, 40), n=40, step=20)
    # plain handle: no bloom args at all
    plain = ManifestTable(
        spark, str(tmp_path / "t"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id", partition_by=("pair",),
    )
    plain.write(
        spark.createDataFrame([("X1", TS1, "BTCGBP", 1.0)], SCHEMA),
        "upsert",
    )
    assert plain.bloom_by == ["transaction_id"]
    assert (plain.bloom_bits, plain.bloom_hashes) == (2048, 3)
    doc = plain._latest_manifest()[1]
    assert doc["bloom"] == {
        "by": ["transaction_id"], "bits": 2048, "hashes": 3
    }
    # the plain handle's commit carries blooms of the INHERITED
    # generation — every file prunable, absent key admits nothing
    assert all(
        f["bloom"]["bits"] == 2048 and f["bloom"]["hashes"] == 3
        for f in doc["files"]
    )
    assert not any(
        plain._bloom_admits(f, "transaction_id", "NOPE")
        for f in doc["files"]
    )
    # fresh reader, also plain: lookups prune under the inherited config
    reader = ManifestTable(
        spark, str(tmp_path / "t"),
        keys=("transaction_id", "close_time"),
        precombine="transaction_id", partition_by=("pair",),
    )
    assert reader.read(point_filter={"transaction_id": "X1"}).count() == 1
    assert reader.read(point_filter={"transaction_id": "NOPE"}).count() == 0


def test_bloom_config_mismatch_warns(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", bloom_bits=2048)
    t.write(seed_rows(spark, 10), "bulk_insert")
    other = make_table(spark, tmp_path / "t", bloom_bits=4096)
    with pytest.warns(UserWarning, match="bloom config"):
        other.read(point_filter={"transaction_id": "T1"})

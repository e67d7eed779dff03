"""Unit tests for relational operator edge cases not covered by the
oracle-checked catalog: as-of direction/misses, unbucketed range join
equivalence, approx-distinct accuracy."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.operators.relational import asof_join, range_join, top_k


def ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", ts(5), 100.0), ("A", ts(20), 200.0), ("B", ts(10), 300.0)],
        "sym string, trade_ts timestamp, qty double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts(0), 9.0),
            ("A", ts(5), 10.0),   # equal ts: inclusive backward match
            ("A", ts(15), 11.0),
            ("B", ts(30), 50.0),  # only AFTER B's trade
        ],
        "sym string, quote_ts timestamp, px double",
    )


def test_asof_backward_inclusive_and_miss(trades, quotes):
    out = {
        (r.sym, r.trade_ts.minute): (r.quote_ts.minute if r.quote_ts else None, r.px)
        for r in asof_join(trades, quotes, "trade_ts", "quote_ts", by=["sym"]).collect()
    }
    assert out[("A", 5)] == (5, 10.0)     # equal-ts quote matches (inclusive)
    assert out[("A", 20)] == (15, 11.0)   # latest at-or-before
    assert out[("B", 10)] == (None, None) # no earlier quote -> null payload


def test_asof_forward(trades, quotes):
    out = {
        (r.sym, r.trade_ts.minute): (r.quote_ts.minute if r.quote_ts else None)
        for r in asof_join(
            trades, quotes, "trade_ts", "quote_ts", by=["sym"], direction="forward"
        ).collect()
    }
    assert out[("A", 5)] == 5      # inclusive forward
    assert out[("A", 20)] is None  # nothing at-or-after for A
    assert out[("B", 10)] == 30


def test_asof_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, "trade_ts", "quote_ts", direction="sideways")


def test_range_join_bucketed_equals_plain(spark):
    """The bucketized range join must return exactly the plain non-equi
    join's rows (the residual predicate keeps it exact)."""
    left = spark.createDataFrame(
        [(1, ts(m)) for m in (0, 7, 14, 29, 45)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(5), ts(30), "w1"), (1, ts(40), ts(50), "w2")],
        "k int, lo timestamp, hi timestamp, tag string",
    )
    plain = range_join(left, right, ["k"], "ts", "lo", "hi")
    bucketed = range_join(left, right, ["k"], "ts", "lo", "hi", bucket_width_seconds=600)
    key = lambda r: (r.k, r.ts, r.tag)  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, bucketed.collect()))
    assert {(r.ts.minute, r.tag) for r in bucketed.collect()} == {
        (7, "w1"), (14, "w1"), (29, "w1"), (45, "w2"),
    }


def test_top_k_exact(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 17)
    got = [r.id for r in top_k(df, 5, F.col("v").desc(), F.col("id")).collect()]
    # v==16 at ids 16, 33, 50, 67, 84
    assert got == [16, 33, 50, 67, 84]


def test_approx_distinct_accuracy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_sort_within_partitions(spark):
    """Partition-local sort (SURVEY §2B sorts row): rows are ordered inside
    each partition without a global shuffle."""
    df = spark.range(100).withColumn("v", (F.col("id") * 37) % 100).repartition(4)
    local = df.sortWithinPartitions(F.col("v"))
    # no Exchange added by the sort itself (only the explicit repartition)
    from dca_manager_spark.plans.inspect import physical_plan

    assert physical_plan(local).count("Exchange") == 1
    parts = local.rdd.glom().collect()
    for part in parts:
        vs = [r.v for r in part]
        assert vs == sorted(vs)
    assert sum(len(p) for p in parts) == 100


def test_pack_sequences_bin_invariants(spark):
    """Every bin's token total stays within budget + one document's
    overshoot (sequential packing crosses the boundary by at most the
    crossing doc); order and assignment are rerun-deterministic."""
    from dca_manager_spark.operators.training import pack_sequences

    rows = [(i, 100 + (i * 97) % 900) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = pack_sequences(df, "doc_id", "n_tokens", budget=2048).collect()
    by_bin: dict[int, int] = {}
    for r in out:
        by_bin[r.bin_id] = by_bin.get(r.bin_id, 0) + r.n_tokens
    max_doc = max(n for _, n in rows)
    assert all(tot <= 2048 + max_doc for tot in by_bin.values())
    # Bins are contiguous from 0 and reruns agree exactly.
    assert set(by_bin) == set(range(len(by_bin)))
    again = pack_sequences(df, "doc_id", "n_tokens", budget=2048).collect()
    assert {(r.doc_id, r.bin_id) for r in again} == {(r.doc_id, r.bin_id) for r in out}


def test_chunk_documents_windows_and_edges(spark):
    """Overlapping token-window chunking: window membership is the exact
    integer function of the token count; short and empty docs yield one
    chunk; consecutive chunks overlap by exactly `overlap` tokens."""
    from dca_manager_spark.operators.training import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(8))),    # one exact window
        (2, " ".join(f"w{i}" for i in range(13))),   # chunks of 8 / stride 6: 2
        (3, ""),                                     # empty -> 1 empty chunk
        (4, " ".join(f"w{i}" for i in range(21))),   # 0..7, 6..13, 12..19, 18..20
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap=2)
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.chunk_n_tokens)
           for r in out.collect()}
    n_per_doc = {d: sum(1 for k in got if k[0] == d) for d in (1, 2, 3, 4)}
    assert n_per_doc == {1: 1, 2: 2, 3: 1, 4: 4}
    assert got[(3, 0)] == ("", 0)
    assert got[(1, 0)][1] == 8
    # doc 4: chunk 1 covers tokens 6..13 (stride 6), overlapping chunk 0 by 2
    assert got[(4, 1)][0].split() == [f"w{i}" for i in range(6, 14)]
    assert got[(4, 3)] == ("w18 w19 w20", 3)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_mixture_sample_rates_and_stability(spark, sf_dir):
    from dca_manager_spark.operators.training import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = mixture_sample(docs, "doc_id", "lang", {"en": 0.5}).select("doc_id", "lang")
    rows = kept.collect()
    assert all(r.lang == "en" for r in rows)  # default rate 0 drops others
    n_en = docs.filter("lang = 'en'").count()
    if n_en >= 50:
        frac = len(rows) / n_en
        assert 0.3 < frac < 0.7, f"en keep-rate {frac} far from 0.5"
    # Rerun-stable: identical selection.
    again = {r.doc_id for r in mixture_sample(
        docs, "doc_id", "lang", {"en": 0.5}).select("doc_id").collect()}
    assert again == {r.doc_id for r in rows}


def test_mixture_sample_many_groups_bounded_plan(spark):
    """200 groups must compile to a map-literal lookup, not a 200-deep
    CASE WHEN chain (O(groups) nesting depth breaks analysis/codegen at
    hundreds of sources — VERDICT r6 #6). The plan contains exactly one
    rate expression whose size is linear in the entries, with no CaseWhen
    nesting; the selection itself stays hash-exact."""
    from dca_manager_spark.operators.training import mixture_sample
    from dca_manager_spark.plans.inspect import physical_plan

    rates = {f"g{i:03d}": (i % 100) / 100.0 for i in range(200)}
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), F.lpad((F.col("id") % 200).cast("string"), 3, "0")).alias("g"),
    )
    out = mixture_sample(df, "doc_id", "g", rates)
    plan = physical_plan(out)
    assert "CASE WHEN" not in plan and "caseWhen" not in plan
    # Rate-0 groups are fully dropped; a sampled group keeps a plausible share.
    got = {r.g for r in out.select("g").distinct().collect()}
    assert not any(g in got for g in ("g000", "g100"))  # rate 0.0
    n_g150 = out.filter(F.col("g") == "g150").count()  # rate 0.5 of 10 rows
    assert 0 <= n_g150 <= 10


def test_exact_k_sample_sizes_and_plan(spark, sf_dir):
    """Exact-k sampling returns exactly min(k, stratum size) rows per
    stratum, is rerun-stable, and the unstratified form compiles to
    TakeOrderedAndProject (per-partition heaps, never a full sort)."""
    from dca_manager_spark.operators.sampling import exact_k_sample
    from dca_manager_spark.plans.inspect import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = exact_k_sample(docs, "doc_id", k=7, strata_col="lang")
    counts = {r.lang: r.n for r in
              per.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {lang: min(7, n) for lang, n in totals.items()}
    again = {r.doc_id for r in exact_k_sample(
        docs, "doc_id", k=7, strata_col="lang").select("doc_id").collect()}
    assert again == {r.doc_id for r in per.select("doc_id").collect()}

    flat = exact_k_sample(docs, "doc_id", k=11)
    assert flat.count() == 11
    assert "TakeOrderedAndProject" in physical_plan(flat)


def test_sampling_and_training_parameter_validation(spark):
    """Out-of-range fractions, budgets and k must fail at build time, not
    silently over- or under-select."""
    from dca_manager_spark.operators.sampling import (
        exact_k_sample,
        stratified_hash_sample,
        train_val_test_split,
    )
    from dca_manager_spark.operators.training import mixture_sample, pack_sequences

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
        F.lit(5).alias("n_tokens"),
    )
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        mixture_sample(df, "doc_id", "lang", {"en": 1.5})
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        stratified_hash_sample(df, "doc_id", {"en": -0.1}, "lang")
    with pytest.raises(ValueError, match="fractions"):
        train_val_test_split(df, "doc_id", train=0.8, val=0.3)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "n_tokens", budget=0)
    with pytest.raises(ValueError, match="bucket_chars"):
        pack_sequences(df, "doc_id", "n_tokens", budget=10, bucket_chars=9)
    with pytest.raises(ValueError, match="k must"):
        exact_k_sample(df, "doc_id", k=-1)


def test_chunk_documents_rejects_colliding_columns(spark):
    from dca_manager_spark.operators.training import chunk_documents

    df = spark.createDataFrame([(1, "a b", 0)], ["doc_id", "text", "chunk_id"])
    with pytest.raises(ValueError, match="chunk_id"):
        chunk_documents(df, "doc_id", "text")


def test_exact_dedup_and_range_join_validation(spark):
    """Typos must not silently flip semantics: keep='foo' behaved as
    'max', and a negative bucket width produced backwards bucket
    sequences."""
    from dca_manager_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(1, 2)], ["k", "o"])
    with pytest.raises(ValueError, match="keep"):
        exact_dedup(df, ["k"], "o", keep="foo")
    left = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2), "w")],
        "k int, lo timestamp, hi timestamp, tag string",
    )
    from dca_manager_spark.operators.relational import range_join

    with pytest.raises(ValueError, match="bucket_width_seconds"):
        range_join(left, right, ["k"], "ts", "lo", "hi", bucket_width_seconds=-60)


def test_exact_k_stratified_window_group_limit(spark, sf_dir):
    """The stratified exact-k must compile with WindowGroupLimit on BOTH
    sides of the shuffle (partial + final): the map side ships at most k
    rows per stratum, so a giant stratum never funnels through one task's
    full sort — the plan property the operator's scale claim rests on."""
    from dca_manager_spark.operators.sampling import exact_k_sample
    from dca_manager_spark.plans.inspect import physical_plan

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = physical_plan(exact_k_sample(df, "doc_id", k=25, strata_col="lang"))
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_blocked_levenshtein_pairs_vs_bruteforce(spark):
    from dca_manager_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
        first_token_block,
    )

    names = [
        (1, "red plate"), (2, "red plates"), (3, "red gear"),
        (4, "hot plate"), (5, "hot plates"), (6, "blue bolt"),
    ]
    df = spark.createDataFrame(names, "nid int, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_levenshtein_pairs(
            df, "nid", "name", first_token_block("name"), 2
        ).collect()
    }
    # brute-force reference WITHIN blocks (blocking bounds recall by design:
    # "red plate"/"hot plate" are 3 edits apart but never compared)
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    expect = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(names, 2)
        if a.split()[0] == b.split()[0] and lev(a, b) <= 2
    }
    assert got == expect and got, "blocked pairs must equal in-block brute force"
    with pytest.raises(ValueError, match="max_dist"):
        blocked_levenshtein_pairs(df, "nid", "name", first_token_block("name"), -1)


def test_write_training_shards_layout_and_determinism(spark, tmp_path):
    from dca_manager_spark.operators.training import (
        shard_assignment,
        write_training_shards,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, "doc_id", 8, order_in_shard="text")
    import pathlib

    dirs = sorted(p.name for p in pathlib.Path(out).iterdir() if p.name.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(8)]
    # exactly one data file per shard (repartition on the shard column)
    for d in dirs:
        files = [f for f in (pathlib.Path(out) / d).glob("*.parquet")]
        assert len(files) == 1, f"{d}: expected 1 file, got {len(files)}"
    back = spark.read.parquet(out)
    assert back.count() == 500
    # round-trip preserves every row and the assignment is the pure
    # row-function shard_assignment computes
    expect = {
        (r.doc_id, r.shard)
        for r in shard_assignment(df, "doc_id", 8).collect()
    }
    got = {(r.doc_id, int(r.shard)) for r in back.select("doc_id", "shard").collect()}
    assert got == expect
    # rerun-stable: a differently-partitioned input produces the same membership
    write_training_shards(df.repartition(13), out, "doc_id", 8, order_in_shard="text")
    again = {
        (r.doc_id, int(r.shard))
        for r in spark.read.parquet(out).select("doc_id", "shard").collect()
    }
    assert again == expect
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(df, "doc_id", 0)


def test_rolling_anomaly_warmup_and_spike(spark):
    """events_rolling_anomaly's recurrence on a constructed series: a
    spike inside the n>=30 warm-up is NOT flagged, an identical spike
    after warm-up is flagged exactly once. Uses the catalog query over a
    temp parquet dir shaped like the events table."""
    import datetime

    import dca_manager_spark.plans.queries as Q

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(80):
        # constant-ish signal with slight alternation so sigma > 0
        v = 10.0 + (0.02 if i % 2 else -0.02)
        if i in (10, 60):
            v = 500.0   # spikes: one inside warm-up, one after
        rows.append((i, base + datetime.timedelta(seconds=i), 1, "click", v, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/events.parquet")
        out = {r.event_type: (r.n_rows, r.n_anomalies)
               for r in Q.QUERIES["events_rolling_anomaly"].fn(spark, d).collect()}
    n_rows, n_anom = out["click"]
    assert n_rows == 80
    # row 10 is inside warm-up (n=11 < 30): not flagged. Row 60 is
    # flagged. The spike also inflates sigma for the NEXT 99 rows, which
    # shields later points — so exactly one anomaly total.
    assert n_anom == 1


def test_applyinarrow_flag_stats_matches_groupby(spark):
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.udtf_ops import arrow_flag_stats

    li = spark.createDataFrame(
        [
            (1, 1.01, 10.0, "A"),
            (2, 2.5, 30.0, "A"),
            (3, 4.0, 20.0, "R"),
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string",
    )
    got = {r.l_returnflag: (r.n_lines, r.sum_qty, r.max_price)
           for r in arrow_flag_stats(li).collect()}
    assert got == {"A": (2, 3.51, 30.0), "R": (1, 4.0, 20.0)}


def test_ddsketch_merge_equals_direct_build(spark):
    """Lossless mergeability: per-(g,sub) sketches merged to per-g are
    BIT-IDENTICAL (maps, zero counts, totals) to building per-g
    directly — the property that makes daily->rolling rollups exact."""
    from dca_manager_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantile,
    )
    import pyspark.sql.functions as F

    rows = [("a", "x", float(v)) for v in range(1, 300)]
    rows += [("a", "y", float(v) * 7.5) for v in range(1, 200)]
    rows += [("b", "x", 0.0)] * 25 + [("b", "x", 42.0)] * 75
    df = spark.createDataFrame(rows, "g string, sub string, v double")
    fine = ddsketch_build(df, "v", ["g", "sub"], gamma=1.02)
    merged = {
        r["g"]: (sorted(r["sketch"].items()), r["zero_count"], r["n"])
        for r in ddsketch_merge(fine, ["g"]).collect()
    }
    direct = {
        r["g"]: (sorted(r["sketch"].items()), r["zero_count"], r["n"])
        for r in ddsketch_build(df, "v", ["g"], gamma=1.02).collect()
    }
    assert merged == direct
    # quantile sanity on the merged sketch: b's p20 falls in the zeros,
    # p90 lands within the 1%-relative bucket of 42
    est = (
        ddsketch_merge(fine, ["g"])
        .select(
            "g",
            ddsketch_quantile(
                F.col("sketch"), F.col("zero_count"), F.col("n"), 0.2, 1.02
            ).alias("p20"),
            ddsketch_quantile(
                F.col("sketch"), F.col("zero_count"), F.col("n"), 0.9, 1.02
            ).alias("p90"),
        )
        .collect()
    )
    by_g = {r["g"]: r for r in est}
    assert by_g["b"]["p20"] == 0.0
    assert abs(by_g["b"]["p90"] - 42.0) <= 0.01 * 42.0


def test_ddsketch_rejects_negative_and_bad_params(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dca_manager_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_quantile,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a", -1.0)], "g string, v double")
    with pytest.raises(Exception, match="negative value"):
        ddsketch_build(df, "v", ["g"]).collect()
    with pytest.raises(ValueError, match="gamma"):
        ddsketch_build(df, "v", ["g"], gamma=1.0)
    with pytest.raises(ValueError, match="q must be"):
        ddsketch_quantile(F.lit(None), F.lit(0), F.lit(1), 1.5)


def test_ddsketch_relative_error_bound(spark):
    """The DDSketch guarantee: every quantile estimate within
    (gamma-1)/(gamma+1) relative error of the true order statistic,
    checked across a 4-decade value range."""
    from dca_manager_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_quantile,
    )
    import pyspark.sql.functions as F

    vals = sorted((1.07 ** i) % 9973 + 0.001 for i in range(3000))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    sk = ddsketch_build(df, "v", ["g"], gamma=1.02)
    gamma_bound = (1.02 - 1) / (1.02 + 1) + 1e-6
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = sk.select(
            ddsketch_quantile(
                F.col("sketch"), F.col("zero_count"), F.col("n"), q, 1.02
            ).alias("e")
        ).first()["e"]
        true = vals[min(len(vals) - 1, max(0, -(-int(q * len(vals))) - 1))]
        assert abs(est - true) / true <= gamma_bound, (q, est, true)


def test_ddsketch_quantile_edges(spark):
    """q=0 hits the smallest populated rank, q=1 the largest; an
    all-zeros group answers 0.0 for every q; empty n yields null."""
    from dca_manager_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_quantile,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("z", 0.0), ("z", 0.0)],
        "g string, v double",
    )
    sk = ddsketch_build(df, "v", ["g"], gamma=1.02)
    got = {
        r["g"]: (r["q0"], r["q1"])
        for r in sk.select(
            "g",
            ddsketch_quantile(F.col("sketch"), F.col("zero_count"), F.col("n"), 0.0, 1.02).alias("q0"),
            ddsketch_quantile(F.col("sketch"), F.col("zero_count"), F.col("n"), 1.0, 1.02).alias("q1"),
        ).collect()
    }
    bound = (1.02 - 1) / (1.02 + 1) + 1e-9
    assert abs(got["a"][0] - 1.0) / 1.0 <= bound
    assert abs(got["a"][1] - 100.0) / 100.0 <= bound
    assert got["z"] == (0.0, 0.0)


def test_registrable_domain_extraction(spark):
    """eTLD+1 extraction: scheme/userinfo/port/path stripping, the
    multi-part-suffix branch, bare hosts, and IPv4 literals."""
    from dca_manager_spark.operators.sampling import registrable_domain

    cases = [
        ("https://www.example.com/a/b?q=1", "example.com"),
        ("http://sub.deep.example.co.uk:8080/x", "example.co.uk"),
        ("ftp://user:pw@files.example.org/f", "example.org"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("https://192.168.10.1/admin", "192.168.10.1"),
        ("HTTPS://WWW.Example.COM/", "example.com"),
        ("https://a.b.c.d.com.au/", "d.com.au"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {
        r["i"]: r["d"]
        for r in df.select("i", registrable_domain(F.col("url")).alias("d")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_registrable_domain_injectable_suffix_table(spark, tmp_path):
    """VERDICT r13 #7: the suffix table is injectable — a production
    PSL snapshot replaces the built-in subset via ``suffixes=`` (and
    3-label registry rules promote to FOUR labels, longest match
    first); ``load_suffix_table`` parses the publicsuffix.org text
    format and is loud on wildcard/exception rules."""
    from dca_manager_spark.operators.sampling import (
        load_suffix_table,
        registrable_domain,
    )

    psl = tmp_path / "psl.dat"
    psl.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"            # 1-label: dropped (default behavior already)
        "co.uk\n"
        "pref.aichi.jp\n"  # 3-label registry rule
        "CO.UK\n"          # duplicate after lowercasing
        "\n"
    )
    table = load_suffix_table(str(psl))
    assert table == ("co.uk", "pref.aichi.jp")

    cases = [
        ("https://www.example.co.uk/", "example.co.uk"),
        ("https://deep.site.pref.aichi.jp/", "site.pref.aichi.jp"),
        # com.au is in the BUILT-IN table but not this snapshot:
        # replacement semantics -> grouped as a plain 2-label domain
        ("https://a.b.example.com.au/", "com.au"),
        ("https://plain.example.com/", "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", registrable_domain(F.col("url"), suffixes=table).alias("d")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])

    bad = tmp_path / "wild.dat"
    bad.write_text("*.ck\n")
    with pytest.raises(ValueError, match="wildcard"):
        load_suffix_table(str(bad))


def test_cap_per_domain_bounds_hot_domain(spark):
    """VERDICT r11 #4 skew pin: one domain holding 50% of the corpus
    must come out capped at max_docs; every other domain keeps min(n,
    cap); survivors are layout-independent, and the plan pushes a
    WindowGroupLimit below the shuffle (per-task top-k, so the hot
    domain never buffers whole in one task)."""
    from dca_manager_spark.operators.sampling import cap_per_domain

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot.com"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 97).cast("string"),
                            F.lit(".com")))
        .alias("domain"),
    )
    capped = cap_per_domain(df, "doc_id", "domain", 5)
    counts = {r["domain"]: r["cnt"] for r in
              capped.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    assert counts["hot.com"] == 5
    assert max(counts.values()) <= 5
    assert len(counts) == 98  # hot + 97 cold domains
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in
               cap_per_domain(df.repartition(13), "doc_id", "domain", 5).collect())
    assert a == b
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    with pytest.raises(ValueError, match="max_docs"):
        cap_per_domain(df, "doc_id", "domain", 0)


# -- token-budget mixture (r13, operators/sampling.py) ---------------------


def test_token_budget_mixture_semantics(spark):
    from dca_manager_spark.operators.sampling import (
        BUCKETS,
        hash_bucket,
        token_budget_mixture,
    )
    from pyspark.sql import functions as F

    rows = [(i, "en" if i % 2 else "de", 100) for i in range(400)]
    rows += [(1000 + i, "tiny", 10) for i in range(5)]
    rows += [(2000 + i, "zh", 100) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")

    kept, stats = token_budget_mixture(
        df, "doc_id", "lang", "toks",
        {"en": 500, "de": 400, "tiny": 100}, token_budget=10_000,
    )
    # stats arithmetic is exact integer math
    assert stats["en"] == {
        "available": 20_000, "desired": 5_000, "rate_bucket": 2_500}
    assert stats["de"] == {
        "available": 20_000, "desired": 4_000, "rate_bucket": 2_000}
    # under-supplied domain: rate capped at BUCKETS, keeps everything
    assert stats["tiny"]["rate_bucket"] == BUCKETS
    got = kept.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang.get("tiny") == 5
    assert "zh" not in by_lang  # unlisted domain dropped
    # selection is exactly the hash threshold (layout-independent)
    expected = df.filter(
        ((F.col("lang") == "en")
         & (hash_bucket(F.col("doc_id"), "token-budget") < 2500))
        | ((F.col("lang") == "de")
           & (hash_bucket(F.col("doc_id"), "token-budget") < 2000))
        | (F.col("lang") == "tiny")
    )
    assert kept.exceptAll(expected).count() == 0
    assert expected.exceptAll(kept).count() == 0


def test_token_budget_mixture_guards(spark):
    import pytest as _pytest

    from dca_manager_spark.operators.sampling import token_budget_mixture

    df = spark.createDataFrame([(1, "en", 10)], "doc_id long, lang string, toks long")
    with _pytest.raises(ValueError, match="token_budget"):
        token_budget_mixture(df, "doc_id", "lang", "toks", {"en": 1}, -5)
    with _pytest.raises(ValueError, match="target_weights"):
        token_budget_mixture(df, "doc_id", "lang", "toks", {}, 100)
    # zero-budget -> empty but typed
    kept, stats = token_budget_mixture(
        df, "doc_id", "lang", "toks", {"en": 1}, 0)
    assert kept.count() == 0 and stats["en"]["rate_bucket"] == 0


def test_repeat_epochs(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.sampling import repeat_epochs

    df = spark.createDataFrame(
        [(1, "books"), (2, "books"), (3, "web"), (4, "junk")],
        "doc_id long, lang string",
    )
    out = repeat_epochs(df, "lang", {"books": 3, "junk": 0})
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    # books x3, web default x1, junk dropped (0 epochs)
    assert by == {"books": 6, "web": 1}
    # epoch tags are 0..n-1 per copy; epoch=0 recovers each doc once
    assert out.filter(F.col("epoch") == 0).count() == 3
    epochs = sorted(
        r["epoch"] for r in out.filter(F.col("doc_id") == 1).collect()
    )
    assert epochs == [0, 1, 2]
    assert out.columns == ["doc_id", "lang", "epoch"]
    with _pytest.raises(ValueError, match=">= 0"):
        repeat_epochs(df, "lang", {"books": -1})

"""Retrieval statistics (TF-IDF / BM25 / collocations), sessionization,
SCD2, MAD outliers, and the mapInArrow twin."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry durian"),
    (3, "apple apple apple fig"),
    (4, "grape"),
]


def _py_tfidf(idf_kind):
    """Independent Python replay over CORPUS."""
    toks = {d: t.split() for d, t in CORPUS}
    n = len(CORPUS)
    tf = {(d, w): ws.count(w) for d, ws in toks.items() for w in set(ws)}
    df = {}
    for d, ws in toks.items():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for (d, w), f_ in tf.items():
        ratio = (n + 1.0) / (df[w] + 1.0)
        idf = ratio if idf_kind == "ratio" else math.log(ratio) + 1.0
        out[(d, w)] = f_ * idf
    return out, tf, df


@pytest.mark.parametrize("idf_kind", ["ratio", "log"])
def test_tfidf_matches_python_replay(spark, idf_kind):
    from dca_manager_spark.operators.retrieval import tfidf_topk

    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.tfidf, r.rnk)
        for r in tfidf_topk(
            _docs(spark, CORPUS), "doc_id", "text", k=10, idf=idf_kind
        ).collect()
    }
    want, tf, dfc = _py_tfidf(idf_kind)
    assert set(got) == set(want)
    for key, (gtf, gdf, gscore, _) in got.items():
        assert gtf == tf[key] and gdf == dfc[key[1]]
        assert gscore == pytest.approx(want[key], rel=1e-12)
    # ranks: per doc, 1..n_terms ordered by score desc then token
    for d in {k[0] for k in got}:
        terms = sorted(
            [(k[1], v) for k, v in got.items() if k[0] == d],
            key=lambda t: (-t[1][2], t[0]),
        )
        assert [got[(d, w)][3] for w, _ in terms] == list(range(1, len(terms) + 1))


def test_tfidf_k_and_min_df(spark):
    from dca_manager_spark.operators.retrieval import tfidf_topk

    out = tfidf_topk(_docs(spark, CORPUS), "doc_id", "text", k=1, min_df=2)
    rows = out.collect()
    assert all(r.rnk == 1 for r in rows)
    assert all(r.df >= 2 for r in rows)
    # doc 4's only token 'grape' has df=1 -> filtered entirely
    assert 4 not in {r.doc_id for r in rows}


def test_tfidf_log_and_ratio_agree_on_single_term_ranks(spark):
    """Where tf is constant (tf=1 for every candidate), any monotone idf
    gives the same per-doc ordering — the cheap invariant connecting the
    hashed ratio variant to the production log variant."""
    from dca_manager_spark.operators.retrieval import tfidf_topk

    docs = _docs(
        spark,
        [(1, "x y z"), (2, "x y w"), (3, "x q v"), (4, "x y q w v z")],
    )
    a = tfidf_topk(docs, "doc_id", "text", k=2, idf="ratio")
    b = tfidf_topk(docs, "doc_id", "text", k=2, idf="log")
    ra = {(r.doc_id, r.rnk): r.token for r in a.filter(F.col("doc_id") <= 3).collect()}
    rb = {(r.doc_id, r.rnk): r.token for r in b.filter(F.col("doc_id") <= 3).collect()}
    assert ra == rb


def test_tfidf_rejects_bad_idf(spark):
    from dca_manager_spark.operators.retrieval import tfidf_topk

    with pytest.raises(ValueError, match="idf"):
        tfidf_topk(_docs(spark, CORPUS), "doc_id", "text", idf="nope")


def _py_bm25(query_terms, k1=1.2, b=0.75, idf_kind="ratio"):
    toks = {d: t.split() for d, t in CORPUS}
    n = len(CORPUS)
    dls = {d: len(ws) for d, ws in toks.items()}
    avgdl = sum(dls.values()) / len(dls)
    tf = {}
    for d, ws in toks.items():
        for w in query_terms:
            if ws.count(w):
                tf[(d, w)] = ws.count(w)
    dfc = {}
    for (d, w) in tf:
        dfc[w] = dfc.get(w, 0) + 1
    scores = {}
    for (d, w), f_ in tf.items():
        ratio = (n + 1.0) / (dfc[w] + 1.0)
        idf = ratio if idf_kind == "ratio" else math.log(ratio) + 1.0
        s = idf * f_ * (k1 + 1.0) / (f_ + k1 * (1 - b + b * dls[d] / avgdl))
        scores[d] = scores.get(d, 0.0) + s
    return scores


@pytest.mark.parametrize("idf_kind", ["ratio", "log"])
def test_bm25_matches_python_replay(spark, idf_kind):
    from dca_manager_spark.operators.retrieval import bm25_scores

    terms = ["apple", "cherry"]
    got = {
        r.doc_id: (r.n_hits, r.bm25)
        for r in bm25_scores(
            _docs(spark, CORPUS), "doc_id", "text", terms, idf=idf_kind
        ).collect()
    }
    want = _py_bm25(terms, idf_kind=idf_kind)
    assert set(got) == set(want)  # doc 4 matches nothing -> absent
    for d, (hits, score) in got.items():
        assert score == pytest.approx(want[d], rel=1e-12)
    assert got[1][0] == 2 and got[2][0] == 1


def test_bm25_rejects_bad_args(spark):
    from dca_manager_spark.operators.retrieval import bm25_scores

    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(_docs(spark, CORPUS), "doc_id", "text", [])
    with pytest.raises(ValueError, match="idf"):
        bm25_scores(_docs(spark, CORPUS), "doc_id", "text", ["x"], idf="bad")


def test_collocation_lift_counts_and_ranks(spark):
    from dca_manager_spark.operators.retrieval import collocation_lift

    # "a b" x3 (strong pair), "a c" x1, singles pad the totals
    docs = _docs(
        spark,
        [(1, "a b a b"), (2, "a b a c"), (3, "d d d d")],
    )
    out = collocation_lift(docs, "doc_id", "text", min_count=2, k=10).collect()
    got = {r.bigram: (r.c_xy, r.c_x, r.c_y, r.lift) for r in out}
    # bigrams: doc1: ab, ba, ab; doc2: ab, ba, ac; doc3: dd x3
    # counts: ab=3, ba=2, ac=1(filtered), dd=3; unigrams a=4,b=3,c=1,d=4; N=12
    assert set(got) == {"a b", "b a", "d d"}
    assert got["a b"][:3] == (3, 4, 3)
    assert got["a b"][3] == pytest.approx(3 * 12 / (4 * 3))
    assert got["d d"][:3] == (3, 4, 4)
    # lift ordering: ab=3.0, dd=2.25, ba=2*12/12=2.0
    assert sorted(got, key=lambda k: -got[k][3]) == ["a b", "d d", "b a"]


def test_sessionize_gaps_boundaries_and_ties(spark):
    from dca_manager_spark.operators.relational import sessionize_gaps

    rows = [
        # user 1: t=0, t=1800 (== gap, same session), t=3601 (>gap from 1800)
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:30:00"),
        (3, 1, "2024-01-01 01:00:01"),
        # user 2: equal timestamps -> tiebreak on event_id, one session
        (4, 2, "2024-01-01 00:00:00"),
        (5, 2, "2024-01-01 00:00:00"),
        # user 2: sub-second over the boundary: 1800.5s after event 5
        (6, 2, "2024-01-01 00:30:00.5"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sessionize_gaps(df, "user_id", "ts", 1800.0, "event_id")
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 2}


def test_scd2_apply_all_paths(spark):
    from dca_manager_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [
            # closed history row: passes through untouched
            ("k1", "A", 10.0, "2023-01-01", "2023-06-01"),
            ("k1", "B", 11.0, "2023-06-01", None),   # open, will change
            ("k2", "C", 20.0, "2023-01-01", None),   # open, no-op update
            ("k3", "D", 30.0, "2023-01-01", None),   # open, no update at all
        ],
        "k string, seg string, bal double, valid_from string, valid_to string",
    ).select(
        "k", "seg", "bal",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [
            ("k1", "B", 99.0, "2024-01-01"),   # changed bal
            ("k2", "C", 20.0, "2024-01-01"),   # identical -> no-op
            ("k9", "Z", 1.0, "2024-01-01"),    # brand-new key
        ],
        "k string, seg string, bal double, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(dim, upd, "k", ["seg", "bal"]).collect()
    rows = {(r.k, str(r.valid_from)[:10]): (r.seg, r.bal, r.valid_to) for r in out}
    assert len(out) == 6
    # history passthrough
    assert rows[("k1", "2023-01-01")][2] is not None
    # k1 old version closed at effective ts, new version open with new bal
    closed = rows[("k1", "2023-06-01")]
    assert closed[:2] == ("B", 11.0) and str(closed[2])[:10] == "2024-01-01"
    assert rows[("k1", "2024-01-01")] == ("B", 99.0, None)
    # k2 identical update: still open, ONE row, untouched
    assert rows[("k2", "2023-01-01")] == ("C", 20.0, None)
    assert ("k2", "2024-01-01") not in rows
    # k3 untouched
    assert rows[("k3", "2023-01-01")] == ("D", 30.0, None)
    # new key inserted open
    assert rows[("k9", "2024-01-01")] == ("Z", 1.0, None)


def test_scd2_apply_chains_across_batches(spark):
    from dca_manager_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [("k1", "A", "2023-01-01", None)],
        "k string, seg string, valid_from string, valid_to string",
    ).select(
        "k", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )

    def upd(seg, eff):
        return spark.createDataFrame(
            [("k1", seg, eff)], "k string, seg string, effective_ts string"
        ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))

    v2 = scd2_apply(dim, upd("B", "2023-06-01"), "k", ["seg"])
    v3 = scd2_apply(v2, upd("C", "2024-01-01"), "k", ["seg"])
    rows = sorted(
        ((str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None, r.seg)
         for r in v3.collect())
    )
    assert rows == [
        ("2023-01-01", "2023-06-01", "A"),
        ("2023-06-01", "2024-01-01", "B"),
        ("2024-01-01", None, "C"),
    ]


def test_mad_outlier_stats_known_values(spark):
    from dca_manager_spark.operators.relational import mad_outlier_stats

    # group g: values 1..9 plus one wild outlier 1000
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    # median of [1..9, 1000] cents = (500+600)/2 = 550 -> 5.5
    # |cv - 550|: [450,350,250,150,50,50,150,250,350,99450] -> MAD=250 -> 2.5
    # z(1000) = .6745*99450/250 = 268 -> 1 outlier; z(1)=.6745*450/250=1.2 ok
    df = spark.createDataFrame(rows, "g string, v double")
    r = mad_outlier_stats(df, "g", "v", 3.5).collect()[0]
    assert r.n == 10
    assert r.median_value == pytest.approx(5.5)
    assert r.mad_value == pytest.approx(2.5)
    assert r.n_outliers == 1


def test_mad_outlier_zero_mad_group(spark):
    from dca_manager_spark.operators.relational import mad_outlier_stats

    # constant group: MAD=0 -> no division blowup, zero outliers
    df = spark.createDataFrame(
        [("c", 7.0)] * 5 + [("c", 7000.0)] * 0, "g string, v double"
    )
    r = mad_outlier_stats(df, "g", "v").collect()[0]
    assert r.mad_value == 0.0 and r.n_outliers == 0


def test_arrow_quantize_twin_matches_jvm_exactly(spark):
    """The mapInArrow kernel and the JVM-expression plan produce
    BIT-IDENTICAL profiles on the real embeddings table."""
    from dca_manager_spark.operators.arrow_ops import quantize_profile_arrow
    from dca_manager_spark.plans.queries import QUERIES

    jvm = {
        r.vec_id: (r.q_scale, r.q_sum, r.max_err)
        for r in QUERIES["embedding_quantize_int8"].fn(spark, SF_SMOKE).collect()
    }
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    arrow = {
        r.vec_id: (r.q_scale, r.q_sum, r.max_err)
        for r in quantize_profile_arrow(emb).collect()
    }
    assert arrow == jvm


def test_arrow_quantize_degenerate_vectors(spark):
    from dca_manager_spark.operators.arrow_ops import quantize_profile_arrow

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, []), (3, [1.5, -3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: (r.q_scale, r.q_sum, r.max_err) for r in
           quantize_profile_arrow(df).collect()}
    assert got[1] == (0.0, 0, 0.0)
    assert got[2] == (0.0, 0, 0.0)
    assert got[3][0] == 3.0
    assert got[3][1] == 64 - 127  # floor(1.5/3*127+.5)=64, floor(-127+.5)=-127

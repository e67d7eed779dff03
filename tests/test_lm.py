"""Stupid-backoff LM quality filter (operators/lm.py): hand-computable
scores, a Python replay, the gibberish-scores-worse pin, and layout
independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.operators.lm import (
    INV_SCALE,
    lm_doc_scores,
    perplexity_filter,
)

Q = INV_SCALE


def test_hand_computed_scores(spark):
    """Reference 'a b a b c': total=5; c1 = {a:2, b:2, c:1};
    c2 = {(a,b):2, (b,a):1, (b,c):1}. Every branch of the backoff is
    exercised and checked against hand arithmetic."""
    ref = spark.createDataFrame([("a b a b c",)], ["text"])
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "z a q"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_inv_q"], r["mean_inv_q"])
        for r in lm_doc_scores(docs, ref).collect()
    }
    # doc 1: pos0 'a' unigram (Q*5)//2 = 2.5Q; 'b'|'a' bigram (Q*2)//2 = Q;
    #        'c'|'b' bigram (Q*2)//1 = 2Q  -> sum 5.5Q, mean 5.5Q//3
    assert got[1] == (3, 5_500_000, 5_500_000 // 3)
    # doc 2: pos0 'z' OOV (Q*5*5)//2 = 12.5Q; 'a'|'z' backoff
    #        (Q*5*5)//(2*2) = 6.25Q; 'q'|'a' OOV (Q*25*5)//4 = 31.25Q
    assert got[2] == (3, 50_000_000, 50_000_000 // 3)
    # empty doc: no tokens, NULL mean
    assert got[3] == (0, 0, None)


def _py_replay(ref_texts, doc_tokens, an=2, ad=5):
    """Pure-Python twin of lm_doc_scores for one doc's token list."""
    toks = [t for s in ref_texts for t in s.lower().split()]
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for s in ref_texts:
        ws = s.lower().split()
        for i, w in enumerate(ws):
            c1[w] = c1.get(w, 0) + 1
            if i:
                c2[(ws[i - 1], w)] = c2.get((ws[i - 1], w), 0) + 1
    total = len(toks)
    out = []
    for i, w in enumerate(doc_tokens):
        prev = doc_tokens[i - 1] if i else None
        if prev is not None and (prev, w) in c2:
            out.append(Q * c1[prev] // c2[(prev, w)])
        elif i == 0:
            out.append(
                Q * total // c1[w] if w in c1 else Q * ad * total // an
            )
        elif w in c1:
            out.append(Q * ad * total // (an * c1[w]))
        else:
            out.append(Q * ad * ad * total // (an * an))
    return sum(out), (sum(out) // len(out) if out else None)


def test_matches_python_replay_randomized(spark):
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    ref_texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20)))
        for _ in range(15)
    ]
    doc_texts = [
        " ".join(
            rng.choice(vocab + ["zz1", "zz2"]) for _ in range(rng.randint(1, 15))
        )
        for _ in range(25)
    ]
    ref = spark.createDataFrame([(t,) for t in ref_texts], ["text"])
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["sum_inv_q"], r["mean_inv_q"])
        for r in lm_doc_scores(docs, ref).collect()
    }
    for i, t in enumerate(doc_texts):
        assert got[i] == _py_replay(ref_texts, t.lower().split()), (i, t)


def test_gibberish_scores_worse_than_natural(spark, sf_dir):
    """The VERDICT r11 #3 pin: planted gibberish documents must score
    strictly worse (higher mean inverse probability) than every natural
    in-reference document, and the gate must separate them."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("lang") == "en"
    )
    gibberish = spark.createDataFrame(
        [
            (9_000_001, "qzx vmw plk jjr wqa zzv xxo ppn mlk rrt"),
            (9_000_002, "zxq wvm klp rjj aqw vzz oxx npp klm trr"),
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(gibberish)
    scores = {
        r["doc_id"]: r["mean_inv_q"]
        for r in lm_doc_scores(both, docs).collect()
    }
    worst_natural = max(
        v for k, v in scores.items() if k < 9_000_000 and v is not None
    )
    for k in (9_000_001, 9_000_002):
        assert scores[k] > worst_natural, (scores[k], worst_natural)
    kept = {
        r["doc_id"]
        for r in perplexity_filter(
            both, docs, max_mean_inv_q=worst_natural
        ).collect()
    }
    assert 9_000_001 not in kept and 9_000_002 not in kept
    assert len(kept) > 0


def test_filter_flags_and_empty_docs(spark):
    ref = spark.createDataFrame([("a b a b c",)], ["text"])
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "z z z"), (3, "")], "doc_id long, text string"
    )
    flagged = {
        r["doc_id"]: r["lm_keep"]
        for r in perplexity_filter(
            docs, ref, max_mean_inv_q=10 * Q, flags=True
        ).collect()
    }
    assert flagged[1] is True   # mean 1.83Q
    assert flagged[2] is False  # OOV-heavy
    assert flagged[3] is False  # empty: never passes
    with pytest.raises(ValueError, match="alpha"):
        perplexity_filter(docs, ref, alpha_num=3, alpha_den=2).collect()


def test_layout_independent(spark):
    ref = spark.createDataFrame(
        [("a b a b c d e",), ("c d e a b",)], ["text"]
    )
    docs = spark.createDataFrame(
        [(i, "a b c d e z"[: 2 * (i % 6) + 1]) for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in lm_doc_scores(docs, ref).collect())
    b = sorted(
        tuple(r)
        for r in lm_doc_scores(docs.repartition(7), ref.repartition(3)).collect()
    )
    assert a == b


def test_empty_reference_raises_loudly(spark):
    """Review finding (r12): a reference slice with zero tokens has no
    language model — the gate must fail loudly, not score every doc as
    perfect (NULL totals coalesced to mean_inv_q=0 kept everything)."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    empty_ref = spark.createDataFrame([], "text string")
    with pytest.raises(Exception, match="zero tokens"):
        lm_doc_scores(docs, empty_ref).collect()
    blank_ref = spark.createDataFrame([("",), ("   ",)], ["text"])
    with pytest.raises(Exception, match="zero tokens"):
        perplexity_filter(docs, blank_ref).collect()

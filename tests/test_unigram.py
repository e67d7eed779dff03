"""Unigram-LM tokenizer (operators/unigram.py): three-path bit-identity,
Viterbi properties, apply contract, model lifecycle."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dca_manager_spark.operators.bpe import word_frequencies
from dca_manager_spark.operators.unigram import (
    UNIGRAM_FAMILY,
    load_unigram_model,
    save_unigram_model,
    train_unigram_model,
    train_unigram_model_py,
    unigram_tokenize,
    viterbi_segment,
)

CORPUS = [
    "the lower windows in the lowest tower",
    "hello world hello word help the world",
    "merge the batch then merge the window",
    "a big table joins a bigger table fast",
] * 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_three_path_bit_identity(spark, docs):
    kw = dict(vocab_size=64, seed_size=128, rounds=3)
    dist = train_unigram_model(docs, method="distributed", **kw)
    local = train_unigram_model(docs, method="local", **kw)
    wf = [(r["word"], r["freq"]) for r in word_frequencies(docs).collect()]
    py = train_unigram_model_py(wf, **kw)
    assert dist == local == py
    assert all(isinstance(s, int) for s in dist.values())


def test_viterbi_reconstructs_and_prefers_frequent_pieces(docs, spark):
    model = train_unigram_model(
        docs, method="local", vocab_size=64, seed_size=128, rounds=3
    )
    # every corpus word reconstructs
    for r in word_frequencies(docs).collect():
        pieces, _ = viterbi_segment(r["word"], model, 6)
        assert "".join(pieces) == r["word"]
    # the most frequent word is a single piece
    assert viterbi_segment("the", model, 6)[0] == ["the"]


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=12),
    vocab=st.sets(
        st.text(alphabet="abcd", min_size=2, max_size=4), max_size=12
    ),
)
def test_viterbi_total_score_is_optimal_and_reconstructs(word, vocab):
    """Property: the DP's score equals the brute-force best over all
    segmentations, and pieces always concatenate back to the word."""
    scores = {c: -10 for c in "abcd"}
    scores.update({p: -5 * len(p) + 1 for p in vocab})
    pieces, got = viterbi_segment(word, scores, 6)
    assert "".join(pieces) == word
    assert sum(scores[p] for p in pieces) == got

    def brute(w):
        if not w:
            return 0
        best = None
        for k in range(1, min(len(w), 6) + 1):
            if w[:k] in scores:
                s = scores[w[:k]] + brute(w[k:])
                best = s if best is None else max(best, s)
        return best

    assert got == brute(word)


def test_unknown_char_fallback_reconstructs(docs, spark):
    model = train_unigram_model(
        docs, method="local", vocab_size=64, seed_size=128, rounds=2
    )
    pieces, _ = viterbi_segment("heXllo", model, 6)
    assert "".join(pieces) == "heXllo"


def test_tokenize_contract_and_compression(spark, docs):
    model = train_unigram_model(
        docs, method="local", vocab_size=64, seed_size=128, rounds=3
    )
    out = unigram_tokenize(docs, model).select("doc_id", "uni.*")
    rows = out.collect()
    assert all(r["reconstruct"] for r in rows)
    # multi-char pieces learned -> strictly fewer tokens than characters
    wordchars = docs.select(
        F.sum(
            F.aggregate(
                F.expr(
                    "regexp_extract_all(lower(text),"
                    " '[a-z]+|[0-9]+|[^a-z0-9 \\\\t\\\\n\\\\r\\\\x0b\\\\x0c]', 0)"
                ),
                F.lit(0),
                lambda acc, x: acc + F.length(x),
            )
        ).alias("wc")
    ).collect()[0]["wc"]
    assert sum(r["n_tokens"] for r in rows) < wordchars
    assert rows[0]["tokens"] is not None


def test_model_save_load_roundtrip_and_family_guard(spark, docs, tmp_path):
    model = train_unigram_model(
        docs, method="local", vocab_size=64, seed_size=128, rounds=2
    )
    path = str(tmp_path / "uni_model")
    save_unigram_model(spark, model, path)
    assert load_unigram_model(spark, path) == model
    # corrupt the family tag -> loud
    bad = spark.read.parquet(path).withColumn("family", F.lit("other-v0"))
    bad.write.mode("overwrite").parquet(str(tmp_path / "bad_model"))
    with pytest.raises(ValueError, match=UNIGRAM_FAMILY):
        load_unigram_model(spark, str(tmp_path / "bad_model"))

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

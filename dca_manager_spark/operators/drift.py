"""Corpus drift detection: token-distribution shift between corpus
slices (snapshots, sources, languages, time windows) — the data-quality
monitoring a continuously-ingested training corpus needs. When a crawl
source changes template, a connector starts double-ingesting, or a new
snapshot's language mix shifts, the unigram distribution moves before
any downstream metric does; these operators quantify the move and name
the tokens driving it.

Reference scope: the reference repo has no corpus analytics — this
belongs to the LLM-training-pipeline surface the brief adds on top of
the reference's operators (SURVEY.md §2C), next to the quality gates
(operators/text.py) and dedup families.

Spark shape (100 TB): one explode + map-side-combined count per slice
pair (the ONLY corpus-sized job), then everything runs on the
distinct-token frame (Heaps' law: orders of magnitude smaller). The
two slices align with a single full-outer equi join on the token; no
per-row Python anywhere.

Cross-engine exactness policy (the catalog determinism rules):
- Divergence statistics (total-variation distance, chi-square) are sums
  of per-token DOUBLE terms. Each term is a fixed sequence of
  correctly-rounded IEEE ops (identical in Spark and DuckDB — no
  multiply-feeding-add, so no FMA contraction), and each term is
  quantized with floor(term * 1e12) BEFORE summing, so the sum is an
  exact, order-independent integer in both engines.
- Token RANKING by divergence uses cross-multiplied integer counts:
  |c_a * n_b - c_b * n_a| is exact BIGINT arithmetic — the ranking has
  no float anywhere, so top-k is bit-stable at any magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dca_manager_spark.operators.text import tokens

TERM_SCALE = 1_000_000_000_000  # 1e12: same quantum as similarity.SCALE


def token_counts_by_slice(
    df: DataFrame,
    slice_col: str,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-(slice, token) counts — the one corpus-sized job (explode +
    partial+final hash aggregate). Returns (__slice, __tok, __cnt)."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(
            F.col(slice_col).alias("__slice"),
            F.explode(tokens(src)).alias("__tok"),
        )
        .groupBy("__slice", "__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def _aligned(counts: DataFrame, slice_a, slice_b) -> DataFrame:
    """Full-outer align the two slices' token counts plus each slice's
    total: (token, c_a, c_b, n_a, n_b). Totals broadcast (2 rows).

    A slice with NO tokens has no distribution — its pivot total comes
    back NULL and every downstream per-token term (and the summed
    tvd/chisq) would silently go NULL (ADVICE r11). The totals are
    therefore guarded: a missing/zero slice total raises loudly at
    evaluation time instead of emitting NULL statistics."""

    def _required_total(raw_name: str, label) -> "F.Column":
        c = F.col(raw_name)
        return (
            F.when(
                c.isNull() | (c == 0),
                F.raise_error(
                    F.lit(
                        f"drift: slice {label!r} has zero tokens — no "
                        "distribution to compare (empty slice, wrong "
                        "label, or filtered-out bucket)"
                    )
                ).cast("bigint"),
            )
            .otherwise(c)
        )

    a = counts.filter(F.col("__slice") == slice_a).select(
        "__tok", F.col("__cnt").alias("__ca")
    )
    b = counts.filter(F.col("__slice") == slice_b).select(
        "__tok", F.col("__cnt").alias("__cb")
    )
    totals = (
        counts.filter(F.col("__slice").isin([slice_a, slice_b]))
        .groupBy()
        .pivot("__slice", [slice_a, slice_b])
        .sum("__cnt")
        .select(
            _required_total(str(slice_a), slice_a).alias("__na"),
            _required_total(str(slice_b), slice_b).alias("__nb"),
        )
    )
    return (
        a.join(b, "__tok", "full_outer")
        .select(
            "__tok",
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
        )
        .crossJoin(F.broadcast(totals))
    )


def drift_from_counts(counts: DataFrame, slice_a, slice_b) -> DataFrame:
    """:func:`distribution_drift` starting from a prebuilt
    (__slice, __tok, __cnt) frame — the entry point shared with the
    streaming drift store (streaming/drift_maintenance.py), where the
    counts come from a keyed table instead of a fresh corpus scan."""
    al = _aligned(counts, slice_a, slice_b)
    pa = F.col("__ca").cast("double") / F.col("__na").cast("double")
    pb = F.col("__cb").cast("double") / F.col("__nb").cast("double")
    diff = pa - pb
    tvd_term = F.floor(F.abs(diff) * F.lit(float(TERM_SCALE))).cast(
        "decimal(38,0)"
    )
    chi_term = F.floor(
        diff * diff / (pa + pb) * F.lit(float(TERM_SCALE))
    ).cast("decimal(38,0)")
    return al.agg(
        (F.sum(tvd_term).cast("double") / TERM_SCALE / 2).alias("tvd"),
        (F.sum(chi_term).cast("double") / TERM_SCALE).alias("chisq"),
        F.min("__na").cast("bigint").alias("n_tokens_a"),
        F.min("__nb").cast("bigint").alias("n_tokens_b"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_union"),
        F.sum(
            ((F.col("__ca") > 0) & (F.col("__cb") > 0)).cast("bigint")
        ).alias("vocab_shared"),
    )


def top_divergent_from_counts(
    counts: DataFrame, slice_a, slice_b, k: int = 20
) -> DataFrame:
    """:func:`top_divergent_tokens` from a prebuilt (__slice, __tok,
    __cnt) frame — shared with the streaming drift store."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    al = _aligned(counts, slice_a, slice_b)
    ca, cb = F.col("__ca").cast("decimal(38,0)"), F.col("__cb").cast("decimal(38,0)")
    na, nb = F.col("__na").cast("decimal(38,0)"), F.col("__nb").cast("decimal(38,0)")
    cross = ca * nb - cb * na
    scored = al.select(
        F.col("__tok").alias("token"),
        F.col("__ca").cast("bigint").alias("count_a"),
        F.col("__cb").cast("bigint").alias("count_b"),
        F.abs(cross).cast("decimal(38,0)").alias("__div"),
        F.when(cross < 0, F.lit("up")).otherwise(F.lit("down")).alias(
            "direction"
        ),
    )
    # Top-k FIRST via orderBy().limit() — TakeOrderedAndProject (per-task
    # k-heaps, no global sort, no single-partition window over the full
    # vocabulary); the rank window then runs over <= k rows.
    order = [F.col("__div").desc(), F.col("token").asc()]
    topk = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            "token",
            "count_a",
            "count_b",
            F.col("__div").cast("bigint").alias("divergence_num"),
            "direction",
        )
    )


def distribution_drift(
    df: DataFrame,
    slice_col: str,
    slice_a,
    slice_b,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """One-row drift summary between two slices' unigram distributions:

    - ``tvd``: total-variation distance, 0.5 * sum |p_a - p_b| over the
      union vocabulary — 0 for identical distributions, 1 for disjoint;
      the standard "how much probability mass moved" number.
    - ``chisq``: symmetric chi-square, sum (p_a - p_b)^2 / (p_a + p_b) —
      heavier weight on tokens that flipped between rare and common.
    - ``n_tokens_a/b``: slice token totals (exact).
    - ``vocab_union/vocab_shared``: vocabulary overlap accounting.

    Both statistics follow the exactness policy in the module docstring:
    per-token double terms quantized to integers before the sum, so the
    output is bit-identical across engines and layouts."""
    return drift_from_counts(
        token_counts_by_slice(df, slice_col, text_col, lowercase),
        slice_a,
        slice_b,
    )


def top_divergent_tokens(
    df: DataFrame,
    slice_col: str,
    slice_a,
    slice_b,
    text_col: str = "text",
    k: int = 20,
    lowercase: bool = True,
) -> DataFrame:
    """The ``k`` tokens driving the drift, ranked by the EXACT integer
    |c_a * n_b - c_b * n_a| (the cross-multiplied numerator of
    |p_a - p_b| — same order, zero floats), ties to the token. Output:
    (token, count_a, count_b, divergence_num, direction) where
    direction is 'up' when the token is relatively more frequent in
    slice_b (drift toward), 'down' otherwise. ``divergence_num`` is
    emitted as BIGINT (exact while c * n < 2^63 — a ~3e9-token slice;
    the internal ranking is decimal(38,0) and never overflows first).

    Scale: the ranking runs on the aligned distinct-token frame; top-k
    is one TakeOrderedAndProject — no global sort materialized."""
    return top_divergent_from_counts(
        token_counts_by_slice(df, slice_col, text_col, lowercase),
        slice_a,
        slice_b,
        k=k,
    )

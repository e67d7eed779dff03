"""End-to-end training-corpus preparation: the composed LLM-data pipeline.

One declarative DataFrame plan chaining the individually-oracled stages:

    clean -> language-ID -> quality/token gates -> exact dedup -> split

This is the "a user of the reference could run their whole prep in one
call" surface: every stage is a built-in-expression column op
(operators/text.py) or a window/hash op — zero Python in the row path,
one shuffle for the dedup window, one narrow projection for everything
else, so Catalyst fuses the full chain into a scan -> project ->
window -> project pipeline.

Scale notes: the only wide operation is the exact-dedup window (hash
partition by content digest). Filters run BEFORE it, so the shuffle
carries only surviving rows; the split assignment is a hash of the id
(join-free, seed-free, layout-independent). At 100 TB the plan is
scan-bound until the dedup exchange, which is proportional to the kept
corpus, not the raw corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dca_manager_spark.operators.sampling import train_val_test_split
from dca_manager_spark.operators.text import (
    clean_text,
    lang_id_from_tokens,
    quality_score_from_tokens,
    tokens,
)


def _gated_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang: str,
    min_quality: float,
    min_tokens: int,
) -> DataFrame:
    """clean -> language-ID -> quality/token gates -> exact dedup; the
    shared front half of prepare_corpus / prepare_corpus_spans. Returns
    (id, __clean, pred_lang, quality, n_tokens) for surviving docs."""
    # Materialize the cleaned text, then its two tokenizations, each ONCE
    # per row behind Generate barriers: a plain projection would be
    # collapsed by Catalyst into every downstream reference, re-running
    # the 3-regex cleaning chain inside each language score / quality
    # term (measured 40x slowdown); explode of a 1-element array
    # evaluates once and exposes attributes.
    cleaned = docs.select(
        F.col(id_col),
        F.explode(F.array(clean_text(F.col(text_col)))).alias("__clean"),
    )
    tokenized = cleaned.select(
        id_col,
        "__clean",
        F.explode(
            F.array(
                F.struct(
                    tokens(F.col("__clean")).alias("t"),
                    tokens(F.lower(F.col("__clean"))).alias("tl"),
                )
            )
        ).alias("__tk"),
    )
    # The features also go behind a barrier: the language/quality gates
    # below would otherwise be pushed beneath this projection and
    # re-evaluate the argmax/quality trees once in the filter and again
    # in the output (measured 6x on this stage).
    feat = tokenized.select(
        id_col,
        "__clean",
        F.explode(
            F.array(
                F.struct(
                    lang_id_from_tokens(F.col("__tk.tl")).alias("pl"),
                    quality_score_from_tokens(
                        F.col("__clean"), F.col("__tk.t"), F.col("__tk.tl")
                    ).alias("q"),
                    F.size(F.col("__tk.t")).alias("nt"),
                )
            )
        ).alias("__f"),
    ).select(
        id_col,
        "__clean",
        F.col("__f.pl").alias("pred_lang"),
        F.col("__f.q").alias("quality"),
        F.col("__f.nt").alias("n_tokens"),
    )
    kept = feat.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    # Exact dedup on the CLEANED content (post-cleaning collisions are the
    # ones that matter for training): deterministic first-id survivor.
    w = Window.partitionBy(F.md5(F.col("__clean"))).orderBy(F.col(id_col))
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Clean, gate, dedup, and split a document corpus in one plan.

    Returns (id, pred_lang, n_tokens, quality, split) for every SURVIVING
    document: cleaned text in the requested language, above the quality
    and length gates, first-id winner of its exact-content group.
    Deterministic end to end — rerunning on any partitioning yields the
    same rows with the same split assignment.
    """
    deduped = _gated_dedup(
        docs, id_col, text_col, lang, min_quality, min_tokens
    ).drop("__clean")
    return train_val_test_split(deduped, id_col, train=train, val=val).select(
        id_col, "pred_lang", "n_tokens", "quality", "split"
    )


def prepare_corpus_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    k: int = 8,
    train: float = 0.8,
    val: float = 0.1,
    max_gram_docs: int | None = 256,
    hash_grams: bool = True,
) -> DataFrame:
    """prepare_corpus with SPAN-level remediation between dedup and
    split: whole-doc exact dedup removes identical documents, then
    scrub_duplicate_spans (Lee et al. 2022) deletes every remaining
    >= ``k``-token passage shared verbatim across two survivors (the
    higher id loses it) — one composed plan: clean -> lang-ID -> gates
    -> doc dedup -> span scrub -> split.

    Returns (id, pred_lang, quality, n_tokens_before, n_tokens_after,
    split); before/after are token counts of the CLEANED text around the
    scrub. Defaults run the production span plan (hashed grams + posting
    cap — see duplicate_spans).

    Scale: span detection runs AFTER the gates and doc dedup, so the
    gram shuffle carries only the kept corpus; the stats join back to
    the survivor features is keyed on the doc id (same key as the split
    hash)."""
    from dca_manager_spark.operators.dedup import scrub_duplicate_spans

    deduped = _gated_dedup(
        docs, id_col, text_col, lang, min_quality, min_tokens
    ).localCheckpoint(eager=False)
    scrubbed = scrub_duplicate_spans(
        deduped.select(id_col, "__clean"),
        id_col,
        "__clean",
        k=k,
        max_gram_docs=max_gram_docs,
        hash_grams=hash_grams,
    )
    stats = deduped.select(id_col, "pred_lang", "quality").join(
        scrubbed.select(id_col, "n_tokens_before", "n_tokens_after"), id_col
    )
    return train_val_test_split(stats, id_col, train=train, val=val).select(
        id_col, "pred_lang", "quality", "n_tokens_before", "n_tokens_after",
        "split",
    )

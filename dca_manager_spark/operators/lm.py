"""N-gram language-model quality filtering — the CCNet recipe (Wenzek
et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data"): train n-gram statistics on a high-quality reference
slice, score every document's tokens against the model, and gate on the
score band. Documents whose token transitions the reference never (or
rarely) produced — gibberish, wrong-language text, template soup —
score far worse than natural prose.

Reference scope: the reference repo has no corpus analytics — this
belongs to the LLM-training-pipeline surface the brief adds on top of
the reference's operators (SURVEY.md §2C), next to the Gopher gates and
the quality logit in operators/text.py.

Model: a bigram STUPID-BACKOFF LM (Brants et al. 2007, "Large Language
Models in Machine Translation") — score(w | prev) is the bigram maximum
likelihood when observed, alpha * unigram when not, alpha^2 / total for
out-of-vocabulary tokens. Stupid backoff deliberately skips Kneser-Ney
normalization: at corpus scale the discounting constants stop mattering
(Brants' result) and the unnormalized score stays a pure RATIONAL in
the model counts, which is what makes the filter cross-engine exact.

Statistic: the MEAN INVERSE PROBABILITY of the document's tokens,
quantized per token as floor(Q * 1/p) with pure BIGINT cross-products
and integer division — zero floats anywhere. Perplexity proper is
exp(mean(-ln p)), the geometric mean of 1/p; ln() is not bit-stable
across engines (the same reason text_effective_vocab uses inverse
Simpson over Shannon entropy), so the filter uses the arithmetic mean
of 1/p — by AM-GM an upper bound on perplexity, monotone in the same
direction (low = natural, high = gibberish), and exactly replicable in
ANSI SQL. The quantized per-token terms are order-independent integers,
so the document score is bit-identical across engines and layouts.

Spark shape (100 TB): model build = one reference-sized explode + two
map-side-combined hash aggregates (unigram and bigram counts — Heaps'
law keeps both far below the corpus); scoring = one corpus-sized
explode + two EQUI JOINS keyed on the gram (broadcast when the model is
small, shuffled hash otherwise) + one per-doc aggregate. No UDFs, no
windows over the corpus, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dca_manager_spark.operators.text import tokens

INV_SCALE = 1_000_000  # Q: per-token 1/p quantum (floor(Q / p) fits
# BIGINT while Q * alpha_den^2 * total_tokens < 2^63 — ~3.6e11 reference
# tokens at the defaults; raise to decimal(38,0) cross-products past
# that, same upgrade as drift's ranking).


def _token_stream(df: DataFrame, id_col: str, text_col: str, lowercase: bool):
    """(id, pos, tok, prev) rows: one map-side explode; prev is the
    previous token in the SAME document (NULL at position 0), read from
    the token array by index — no window, no shuffle."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.col(id_col).alias("__id"), tokens(src).alias("__tk"))
        .select(
            "__id",
            F.col("__tk").alias("__tk"),
            F.posexplode("__tk").alias("__pos", "__tok"),
        )
        .select(
            "__id",
            "__pos",
            "__tok",
            F.when(
                F.col("__pos") > 0, F.element_at("__tk", F.col("__pos"))
            ).alias("__prev"),
        )
    )


def ngram_lm_counts(
    reference: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the stupid-backoff bigram model on a reference slice.
    Returns (unigrams, bigrams, totals):

    - unigrams: (__tok, __c1) — token occurrence counts;
    - bigrams: (__prev, __tok, __c2) — adjacent-pair counts WITHIN each
      document (no cross-document adjacency);
    - totals: 1 row (__total) — reference token count.

    One reference-sized explode feeds two map-side-combined aggregates;
    both model frames are distinct-gram-sized (Heaps' law)."""
    stream = _token_stream(
        reference.select(F.lit(1).alias("__one"), text_col),
        "__one",
        text_col,
        lowercase,
    )
    unigrams = stream.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c1"))
    bigrams = (
        stream.filter(F.col("__prev").isNotNull())
        .groupBy("__prev", "__tok")
        .agg(F.count(F.lit(1)).alias("__c2"))
    )
    # A reference with ZERO tokens has no language model — without this
    # guard the NULL total would propagate NULL per-token terms that
    # lm_doc_scores' coalesce turns into mean_inv_q = 0 ("perfect
    # quality") for EVERY document, silently disabling the gate (the
    # exact wrong-label/empty-slice mode drift._aligned also raises on).
    raw_total = F.sum("__c1").cast("bigint")
    totals = unigrams.agg(
        F.when(
            raw_total.isNull() | (raw_total == 0),
            F.raise_error(
                F.lit(
                    "lm: reference slice has zero tokens — no language "
                    "model to score against (empty slice or wrong filter)"
                )
            ).cast("bigint"),
        )
        .otherwise(raw_total)
        .alias("__total")
    )
    return unigrams, bigrams, totals


def lm_doc_scores(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha_num: int = 2,
    alpha_den: int = 5,
    lowercase: bool = True,
) -> DataFrame:
    """Score every document against the reference LM. Returns
    (id_col, n_tokens, sum_inv_q, mean_inv_q):

    - per token, the stupid-backoff probability (alpha = alpha_num /
      alpha_den, default 0.4 — Brants' constant):

      * bigram hit       p = c2(prev, tok) / c1(prev)
      * unigram backoff  p = alpha * c1(tok) / total
      * OOV              p = alpha^2 / total
      * position 0 skips the backoff penalty: p = c1(tok) / total, OOV
        p = alpha / total

    - each token contributes floor(Q / p) — an exact BIGINT
      cross-product integer division (Q = INV_SCALE), e.g. the bigram
      term is (Q * c1(prev)) div c2(prev, tok);
    - sum_inv_q = the exact integer sum, mean_inv_q = sum div n_tokens
      (NULL for empty documents).

    Low mean = reference-like text; high mean = transitions the
    reference never produced. See the module docstring for why the
    statistic is the arithmetic (not geometric) mean of 1/p."""
    if alpha_num < 1 or alpha_den < alpha_num:
        raise ValueError(
            f"alpha must be a rational in (0, 1]: {alpha_num}/{alpha_den}"
        )
    unigrams, bigrams, totals = ngram_lm_counts(reference, text_col, lowercase)
    stream = _token_stream(docs, id_col, text_col, lowercase)
    q = F.lit(INV_SCALE).cast("bigint")
    an, ad = F.lit(alpha_num).cast("bigint"), F.lit(alpha_den).cast("bigint")
    scored = (
        stream.join(
            bigrams.select(
                F.col("__prev"), F.col("__tok"), F.col("__c2")
            ),
            ["__prev", "__tok"],
            "left",
        )
        .join(unigrams, "__tok", "left")
        .join(
            unigrams.select(
                F.col("__tok").alias("__prev"), F.col("__c1").alias("__cp")
            ),
            "__prev",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    # Build each token's 1/p as an exact BIGINT rational (numerator,
    # denominator), then one integer division (div = floor division on
    # positive BIGINTs — identical to DuckDB's //).
    term = (
        F.when(F.col("__c2").isNotNull(), (q * F.col("__cp")))
        .when(
            F.col("__pos") == 0,
            F.when(F.col("__c1").isNotNull(), q * F.col("__total")).otherwise(
                q * ad * F.col("__total")
            ),
        )
        .otherwise(
            F.when(
                F.col("__c1").isNotNull(), q * ad * F.col("__total")
            ).otherwise(q * ad * ad * F.col("__total"))
        )
    )
    denom = (
        F.when(F.col("__c2").isNotNull(), F.col("__c2"))
        .when(
            F.col("__pos") == 0,
            F.when(F.col("__c1").isNotNull(), F.col("__c1")).otherwise(an),
        )
        .otherwise(
            F.when(
                F.col("__c1").isNotNull(), an * F.col("__c1")
            ).otherwise(an * an)
        )
    )
    per_tok = scored.select(
        "__id",
        term.cast("bigint").alias("__num"),
        denom.cast("bigint").alias("__den"),
    ).select("__id", F.expr("__num div __den").alias("__inv_q"))
    agg = per_tok.groupBy("__id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__inv_q").cast("bigint").alias("sum_inv_q"),
    )
    return (
        docs.select(F.col(id_col))
        .join(agg.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("sum_inv_q", F.lit(0)).cast("bigint").alias("sum_inv_q"),
        )
        .withColumn(
            "mean_inv_q",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("sum_inv_q div n_tokens"),
            ).cast("bigint"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_mean_inv_q: int = 50 * INV_SCALE,
    alpha_num: int = 2,
    alpha_den: int = 5,
    flags: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """The CCNet-style quality gate: keep documents whose mean inverse
    probability under the reference LM is at most ``max_mean_inv_q``
    (quantized units — the default keeps docs whose average token is at
    least 1/50th as probable as certainty). ``flags=True`` returns ALL
    docs annotated with (n_tokens, mean_inv_q, lm_keep) instead of
    filtering; empty documents never pass (no evidence of quality).

    Composes with prepare_corpus/corpus gates: run AFTER language ID
    (the reference is monolingual) and boilerplate removal, per the
    CCNet pipeline order."""
    scores = lm_doc_scores(
        docs, reference, id_col, text_col, alpha_num, alpha_den, lowercase
    )
    keep = (F.col("n_tokens") > 0) & (
        F.col("mean_inv_q") <= F.lit(int(max_mean_inv_q))
    )
    if flags:
        return docs.join(
            scores.select(
                id_col, "n_tokens", "mean_inv_q", keep.alias("lm_keep")
            ),
            id_col,
        )
    kept = scores.filter(keep).select(id_col)
    return docs.join(kept, id_col, "inner")

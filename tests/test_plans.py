"""Physical-plan shape tests: the catalog queries must compile to the plans
that survive 100 TB — filters pushed into scans, pruned read schemas,
broadcast joins for dims, TakeOrderedAndProject for top-k, whole-stage
codegen in the hot path. A correct result from a bad plan is a bug here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.plans.inspect import (
    explain_formatted,
    has_pushed_filter,
    read_schema_columns,
    uses,
)
from dca_manager_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE


def q(name, spark):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_q1_pushdown_and_pruning(spark):
    df = q("q1_pricing_summary", spark)
    assert has_pushed_filter(df, "l_shipdate"), "shipdate filter not pushed to scan"
    cols = set(read_schema_columns(df))
    assert "l_comment" not in cols  # nothing extraneous
    # only the 7 needed columns are read
    assert {"l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"} <= cols
    assert "l_orderkey" not in cols, "column pruning failed: reading unused key"


def test_q1_whole_stage_codegen(spark):
    """After execution (AQE finalizes the plan), the aggregate pipeline must
    be inside whole-stage-codegen stages ('*(n)' markers)."""
    df = q("q1_pricing_summary", spark)
    df.collect()  # executes THIS dataset's QueryExecution; AQE finalizes
    from dca_manager_spark.plans.inspect import physical_plan

    assert "*(1)" in physical_plan(df)


def test_q1_single_shuffle_partial_final_agg(spark):
    """Partial+final HashAggregate pair — map-side combine is on, the
    data shuffle carries only group partials (the second Exchange is the
    6-row range partition for the final ORDER BY, which is noise)."""
    from dca_manager_spark.plans.inspect import physical_plan

    df = q("q1_pricing_summary", spark)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") == 2
    assert "partial_sum" in plan


def test_q3_broadcasts_filtered_dim(spark):
    df = q("q3_shipping_priority", spark)
    assert uses(df, "BroadcastHashJoin")
    assert has_pushed_filter(df, "c_mktsegment")


def test_topk_is_take_ordered(spark):
    df = q("topk_global_lineitems", spark)
    assert uses(df, "TakeOrderedAndProject"), "top-k compiled to a full sort"


def test_q3_topk_no_global_sort_before_limit(spark):
    assert uses(q("q3_shipping_priority", spark), "TakeOrderedAndProject")


def test_merge_hint_respected(spark):
    assert uses(q("join_sort_merge_hint", spark), "SortMergeJoin")


def test_shuffle_hash_hint_respected(spark):
    assert uses(q("join_shuffle_hash_hint", spark), "ShuffledHashJoin")


def test_broadcast_dim_join(spark):
    df = q("join_broadcast_dim", spark)
    assert uses(df, "BroadcastHashJoin")
    assert has_pushed_filter(df, "p_size")


def test_semi_anti_compile_to_joins(spark):
    assert uses(q("join_left_semi", spark), "LeftSemi")
    assert uses(q("join_left_anti", spark), "LeftAnti")


def test_theta_join_is_bnlj_with_broadcast(spark):
    assert uses(q("theta_join_regions", spark), "BroadcastNestedLoopJoin")


def test_range_join_is_equi_not_bnlj(spark):
    """The bucketized range join must compile to an equi join (hash/sort-
    merge), NOT BroadcastNestedLoopJoin — that's its entire point."""
    df = q("range_join_purchase_clicks", spark)
    plan = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_asof_join_single_shuffle_no_explosion(spark):
    """The union+window as-of join must contain exactly one Window and no
    join node at all (no pair explosion)."""
    df = q("asof_join_purchase_view", spark)
    plan = explain_formatted(df)
    assert "Window" in plan
    assert "Join" not in plan, "as-of join degenerated into a pair join"
    assert "Union" in plan


def test_scalar_subquery_no_collect(spark):
    """The above-average filter must stay a broadcast join of a 1-row agg,
    not a driver-side collect baked into a literal."""
    df = q("scalar_subquery_above_avg", spark)
    assert uses(df, "BroadcastNestedLoopJoin") or uses(df, "BroadcastHashJoin")


def test_predicates_pushed(spark):
    df = q("filter_predicate_family", spark)
    for frag in ("o_orderstatus", "o_totalprice", "o_orderpriority"):
        assert has_pushed_filter(df, frag), f"{frag} not pushed"


def test_partition_overwrite_mode_dynamic(spark):
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic"


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_driver_window_rotation():
    """The driver scores the first 50 entries of queries(): the curated
    window must be exactly 50 valid, distinct names, lead the emitted
    order, and never lose a catalog query."""
    from dca_manager_spark.plans.queries import (
        _DRIVER_WINDOW,
        QUERIES,
        get_oracles,
        get_queries,
    )

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert all(n in QUERIES for n in _DRIVER_WINDOW)
    names = list(get_queries())
    assert names[:50] == _DRIVER_WINDOW
    assert set(names) == set(QUERIES)
    assert set(get_oracles()) <= set(names)


def test_embedding_dedup_is_equi_join_not_allpairs(spark):
    """The catalog near-dup entry must candidate via an equi join on
    (table, signature) — never a BroadcastNestedLoopJoin / cartesian
    all-pairs self-join (the r3-r5 scale blocker)."""
    df = q("dedup_embedding_cosine", spark)
    plan = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_q6_all_predicates_pushed(spark):
    """Q6 is the pushdown showcase: shipdate/discount/quantity filters must
    reach the parquet scan, and only the 4 needed columns are read."""
    df = q("q6_forecast_revenue", spark)
    assert has_pushed_filter(df, "l_shipdate")
    assert has_pushed_filter(df, "l_discount")
    assert has_pushed_filter(df, "l_quantity")
    cols = set(read_schema_columns(df))
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q4_exists_compiles_to_semi_join(spark):
    assert uses(q("q4_late_order_priority", spark), "LeftSemi")


def test_q18_having_subquery_is_semi_join_no_bnlj(spark):
    plan = explain_formatted(q("q18_large_volume_customers", spark))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_disjunction_stays_equi_join(spark):
    """OR-of-ANDs across join sides must not degrade the equi join to a
    nested loop — the l_partkey = p_partkey key survives."""
    plan = explain_formatted(q("q19_disjunctive_revenue", spark))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_tokenizes_once_below_generate(spark):
    """Chunking must tokenize each document ONCE in the projection below
    the Generate (the explode replicates the computed array per chunk
    row) and read only the two needed columns — a per-chunk re-tokenize
    would multiply the corpus-scan CPU by chunks/doc."""
    df = q("training_chunk_documents", spark)
    plan = explain_formatted(df)
    assert plan.count("split(trim(") == 1, "tokenization not hoisted below Generate"
    assert plan.count("explode(") == 1
    cols = set(read_schema_columns(df))
    assert cols == {"doc_id", "text"}


@pytest.mark.slow
def test_catalog_wide_no_accidental_cartesian(spark):
    """EVERY catalog query's physical plan is checked for cartesian /
    nested-loop joins. The whitelist names the queries where that shape
    is the documented intent (theta/cross joins, broadcast brute-force
    baselines); anything else growing one is a scale regression."""
    INTENTIONAL = {
        "theta_join_regions",          # non-equi theta join IS the demo
        "cross_join_region_types",     # cross join IS the demo
        "similarity_cosine_topk",      # broadcast-queries brute force baseline
        "dedup_embedding_cosine_exact",  # bounded all-pairs ground truth
        "scalar_subquery_above_avg",   # scalar subquery joins on no key by design
        "events_resample_ffill",       # spine = tiny dims cross join
                                       # (types x hour sequence off a
                                       # 1-row bounds agg) — documented
        "q22_idle_customer_balance",   # same scalar-subquery shape: 1-row
                                       # broadcast avg under a > predicate
                                       # (q15's = predicate becomes an equi
                                       # join; > cannot)
        "q11_important_stock",         # same again: 1-row broadcast
                                       # total/nparts under a > threshold
        "similarity_ivf_ann",          # corpus x broadcast-seeds (n_cells rows)
                                       # coarse quantizer: linear in corpus
        "similarity_ivf_learned",      # same quantizer shape + the exact
                                       # brute-force baseline its recall
                                       # floor is measured against
        "similarity_pq_adc",           # ADC scan (broadcast queries x
                                       # corpus codes) + the same exact
                                       # baseline for its recall floor
        "similarity_ivf_pq_rerank",    # composed IVF->PQ->rerank: the
                                       # only BNLJ is corpus x broadcast
                                       # seeds (n_cells rows, linear in
                                       # corpus) + the exact baseline its
                                       # recall floor is measured against;
                                       # ADC candidates and the re-rank
                                       # fetch are broadcast EQUI joins
        "text_tfidf_topk",             # 1-row broadcast corpus-size N
                                       # under the idf — same shape as
                                       # q11/q22's scalar subquery
        "text_bm25_rank",              # 1-row broadcast (N, sum_dl, n_dl)
        "text_pmi_collocations",       # 1-row broadcast token total
        "graph_pagerank",              # 1-row broadcast node count N
        "events_value_histogram",      # 1-row broadcast global min/max bounds
        "stat_regression_by_group",    # 1-row broadcast global min ts
        "similarity_hybrid_rrf",       # ranker B is the brute-force cosine
                                       # baseline (1 broadcast query vector
                                       # x bounded corpus) + 1-row BM25
                                       # broadcast constants
        "drift_token_distribution",    # 1-row broadcast slice totals
                                       # (same shape as stat_regression's
                                       # global-min broadcast)
        "drift_top_divergent_tokens",  # same 1-row totals broadcast
        "streaming_drift_buckets",     # same 1-row slice-totals broadcast
                                       # (drift_from_counts over the
                                       # count store)
        "text_perplexity_filter",      # 1-row broadcast reference token
                                       # total (the LM's denominator) —
                                       # same shape as text_tfidf_topk's N
        "dedup_semantic",              # corpus x broadcast seeds (16 rows)
                                       # coarse quantizer — same linear
                                       # routing shape as similarity_ivf_ann
    }
    flagged = {}
    for name in QUERIES:
        df = QUERIES[name].fn(spark, SF_SMOKE)
        plan = explain_formatted(df)
        bad = [
            node for node in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if node in plan
        ]
        if bad and name not in INTENTIONAL:
            flagged[name] = bad
    assert not flagged, f"unexpected cartesian/BNLJ shapes: {flagged}"


@pytest.mark.slow
def test_catalog_wide_no_unpartitioned_windows(spark):
    """EVERY catalog query is checked for Window nodes with an empty
    partitionSpec — the shape that forces Exchange SinglePartition and
    funnels the whole input through one task (the r6 pack_sequences
    defect, fixed by the hierarchical two-pass prefix sum). The whitelist
    names the queries where the window's input is provably bounded."""
    from dca_manager_spark.plans.inspect import unpartitioned_window_count

    BOUNDED = {
        # Fallback seed-picker: row_number over the n_cells-row frame
        # produced by orderBy().limit(n_cells) — a constant-size input
        # (operators/similarity.py default-seeds path), not the corpus.
        "similarity_ivf_ann",
        # rank_a window runs over the LIMIT-100 BM25 frame — bounded by
        # construction (the fused lists are fixed-size by definition)
        "similarity_hybrid_rrf",
        # rank window runs AFTER orderBy().limit(k) (TakeOrdered top-k),
        # so its input is <= k rows, never the vocabulary
        "drift_top_divergent_tokens",
    }
    flagged = {}
    for name in QUERIES:
        df = QUERIES[name].fn(spark, SF_SMOKE)
        n = unpartitioned_window_count(df)
        if n and name not in BOUNDED:
            flagged[name] = n
    assert not flagged, f"unpartitioned (single-partition) windows: {flagged}"


def test_audio_meta_sort_below_single_udf_pass(spark):
    """ADVICE r12: multimodal_audio_meta sorts BEFORE the pandas-UDF
    parse (a final orderBy would re-execute the UDF in the range
    partitioner's sampling pass — the r11 double-parse defect) and
    relies on the projection above the Sort preserving row order. Spark
    gives no cross-version contract for that, so this test pins the
    load-bearing plan shape: exactly one Sort, the ArrowEvalPython
    ABOVE it, and only order-preserving nodes (Project/WSCG/AQE wrapper)
    between the UDF and the root. If a future Spark inserts an Exchange
    or re-sort above the UDF, or reorders the two, this fails loudly."""
    df = q("multimodal_audio_meta", spark)
    plan = explain_formatted(df)
    tree = [
        ln.strip(" +-:*()0123456789")
        for ln in plan.split("== Physical Plan ==", 1)[1].splitlines()
        if ("+-" in ln or "AdaptiveSparkPlan" in ln) and ln.strip()
    ]
    # tree[] is root -> leaf; cut at the first blank-section boundary
    assert plan.count("ArrowEvalPython") >= 1, "audio parse UDF missing"
    udf_idx = next(i for i, n in enumerate(tree) if "ArrowEvalPython" in n)
    sort_idxs = [i for i, n in enumerate(tree) if n.startswith("Sort")]
    assert len(sort_idxs) == 1, f"expected exactly one Sort, got {tree}"
    assert sort_idxs[0] > udf_idx, f"Sort must sit BELOW the UDF: {tree}"
    for node in tree[:udf_idx]:
        assert node.startswith(("AdaptiveSparkPlan", "Project", "WholeStageCodegen")), (
            f"order-breaking node above the audio UDF: {node!r} in {tree}"
        )


def test_lang_id_ngram_plan_is_codegen_single_agg_shuffle(spark):
    """The r13 langid scale path must stay OUT of Python and inside
    codegen: no BatchEvalPython/ArrowEvalPython anywhere (scoring is
    literal-array element_at), a partial+final hash aggregate for the
    per-doc sums (map-side combine — the O(grams)->O(docs) reduction),
    and the gram explode as a Generate node."""
    from dca_manager_spark.plans.inspect import physical_plan

    df = q("text_lang_id_ngram", spark)
    plan = physical_plan(df)
    assert "EvalPython" not in plan, "langid scoring fell back to Python"
    assert "Generate" in plan, "gram explode missing"
    assert plan.count("HashAggregate") >= 2, "no partial+final aggregate"


def test_unigram_tokenize_is_arrow_batched(spark):
    """Unigram apply must be ONE Arrow-batched projection (never a
    row-at-a-time PythonUDF) with no shuffle above it."""
    from dca_manager_spark.operators.unigram import (
        train_unigram_model,
        unigram_tokenize,
    )
    from dca_manager_spark.plans.inspect import physical_plan

    docs = spark.createDataFrame(
        [(1, "the lower window"), (2, "merge the batch")],
        "doc_id long, text string",
    )
    model = train_unigram_model(
        docs, method="local", vocab_size=32, seed_size=64, rounds=2
    )
    out = unigram_tokenize(docs, model)
    plan = physical_plan(out)
    assert "ArrowEvalPython" in plan, "tokenizer not Arrow-vectorized"
    assert "Exchange" not in plan, "unexpected shuffle in tokenize"


def test_pixel_codec_queries_map_only_until_final_sort(spark):
    """The r14 JPEG/GIF pixel queries must touch Python exactly twice
    (one ArrowEvalPython encode, one MapInPandas decode) with NO
    exchange between them — the encode->decode pipeline is map-only.
    Allowed exchanges: the final orderBy's range partition ABOVE the
    decode, and (r16) the conditional partitioning.spread round-robin
    BELOW the encode that widens a narrow one-file scan so the codec
    work parallelizes."""
    for name in ("multimodal_jpeg_pixels", "multimodal_gif_pixels"):
        df = q(name, spark)
        plan = explain_formatted(df)
        phys = plan.split("== Physical Plan ==", 1)[1]
        tree = [
            ln for ln in phys.splitlines()
            if ("+-" in ln or "AdaptiveSparkPlan" in ln) and ln.strip()
        ]
        nodes = [ln.strip(" +-:*()0123456789") for ln in tree]
        assert sum(n.startswith("MapInPandas") for n in nodes) == 1, (name, nodes)
        assert sum(n.startswith("ArrowEvalPython") for n in nodes) == 1, (name, nodes)
        map_idx = next(i for i, n in enumerate(nodes) if n.startswith("MapInPandas"))
        arrow_idx = next(i for i, n in enumerate(nodes) if n.startswith("ArrowEvalPython"))
        ex_idxs = [i for i, n in enumerate(nodes) if n.startswith("Exchange")]
        assert 1 <= len(ex_idxs) <= 2, (name, nodes)
        # root -> leaf ordering: decode above encode, and every Exchange
        # either above the decode (final sort) or below the encode
        # (spread) — never between them.
        assert map_idx < arrow_idx, (name, nodes)
        for i in ex_idxs:
            assert i < map_idx or i > arrow_idx, (name, nodes)


def test_html_and_url_queries_are_udf_free(spark):
    """The r14 WARC->text and URL-canonicalization queries are pure
    JVM expression chains — any Python evaluator node in their plans
    means the regexp chain regressed off the codegen path."""
    for name in ("text_html_extract", "corpus_url_canonicalize"):
        plan = explain_formatted(q(name, spark))
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan, (name, node)

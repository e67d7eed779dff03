"""Operator layer: relational extensions + training-data-pipeline operators."""

from dca_manager_spark.operators.relational import asof_join, range_join, top_k
from dca_manager_spark.operators.dedup import (
    CorpusIndex,
    build_corpus_index,
    connected_components,
    dedup_keep_canonical,
    exact_dedup,
    exact_dedup_by_content,
    minhash_incremental_filter,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from dca_manager_spark.operators.sampling import (
    exact_k_sample,
    stratified_hash_sample,
    train_val_test_split,
)
from dca_manager_spark.operators.similarity import (
    cosine_cross_lsh,
    cosine_pairs,
    cosine_pairs_lsh,
    cosine_topk,
    cosine_topk_int8,
    decontaminate_embeddings,
    dequantize_embeddings,
    ivf_ann_topk,
    lsh_ann_topk,
    quantize_embeddings,
)
from dca_manager_spark.operators.retrieval import (
    bm25_scores,
    collocation_lift,
    tfidf_topk,
)
from dca_manager_spark.operators.relational import (
    mad_outlier_stats,
    scd2_apply,
    sessionize_gaps,
)
from dca_manager_spark.operators.arrow_ops import quantize_profile_arrow
from dca_manager_spark.operators.graph import pagerank
from dca_manager_spark.operators.embedding_index import (
    EmbeddingIndex,
    build_embedding_index,
    embedding_incremental_filter,
)
from dca_manager_spark.operators.skew import salted_join, salted_sum
from dca_manager_spark.operators.corpus import prepare_corpus
from dca_manager_spark.operators.training import (
    chunk_documents,
    deterministic_shuffle,
    mixture_sample,
    pack_sequences,
)
from dca_manager_spark.operators.bpe import (
    bpe_encode_word,
    bpe_tokenize,
    load_bpe_model,
    save_bpe_model,
    train_bpe_merges,
    word_frequencies,
)
from dca_manager_spark.operators.sketches import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantile,
)

__all__ = [
    "bpe_encode_word", "bpe_tokenize", "train_bpe_merges",
    "word_frequencies", "save_bpe_model", "load_bpe_model",
    "ddsketch_build", "ddsketch_merge", "ddsketch_quantile",
    "asof_join", "range_join", "top_k",
    "exact_dedup", "exact_dedup_by_content", "ngram_jaccard_pairs",
    "minhash_lsh_pairs", "minhash_incremental_filter", "simhash_pairs",
    "CorpusIndex", "build_corpus_index",
    "connected_components", "dedup_keep_canonical",
    "cosine_topk", "cosine_pairs", "cosine_pairs_lsh", "cosine_cross_lsh",
    "decontaminate_embeddings", "lsh_ann_topk",
    "ivf_ann_topk", "quantize_embeddings", "dequantize_embeddings",
    "cosine_topk_int8",
    "train_val_test_split", "stratified_hash_sample", "exact_k_sample",
    "salted_sum", "salted_join",
    "prepare_corpus",
    "deterministic_shuffle", "pack_sequences", "mixture_sample",
    "chunk_documents",
    "tfidf_topk", "bm25_scores", "collocation_lift",
    "sessionize_gaps", "scd2_apply", "mad_outlier_stats",
    "quantize_profile_arrow",
    "pagerank",
    "EmbeddingIndex", "build_embedding_index", "embedding_incremental_filter",
]

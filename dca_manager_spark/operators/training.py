"""Training-set assembly operators: shuffle, packing, mixture sampling.

The last mile of a training-data pipeline after cleaning/dedup (see
operators/corpus.py): put surviving documents in a reproducible random
order, pack them into fixed token budgets, and blend sources at target
ratios. All three are pure column/window expressions — deterministic on
any cluster/partitioning, no seeds stored, every one exactly replicable
by an engine-independent oracle.

Scale notes: shuffle-order and mixture are narrow projections + one
hash; packing is a hierarchical two-pass prefix sum (per-bucket window
cumsum on a hash-partitioned exchange + broadcast bucket offsets) — no
single-partition stage anywhere. The only collect is the bucket-total
frame, bounded by 16**bucket_chars rows of (string, long) metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_rank(id_col: Column, seed: str = "shuffle") -> Column:
    """Deterministic pseudo-random sort key: md5 of the salted id. Order
    by this to get a reproducible global shuffle — same order on any
    cluster, changeable by salt, no RNG state."""
    return F.md5(F.concat(F.lit(seed), id_col.cast("string")))


def deterministic_shuffle(df: DataFrame, id_col: str, seed: str = "shuffle") -> DataFrame:
    """Global reproducible shuffle: ORDER BY md5(seed || id). The sort is
    a range-partitioned exchange — the one shuffle this op costs — and
    the output order is a pure function of (ids, seed)."""
    return df.orderBy(shuffle_rank(F.col(id_col), seed), F.col(id_col))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    seed: str = "shuffle",
    bucket_chars: int = 3,
) -> DataFrame:
    """Sequential token-budget packing: documents are taken in the
    deterministic-shuffle order and a new bin starts whenever the running
    token total would cross the budget. Adds (bin_id, bin_tokens_before).

    This is the streaming-friendly packing LLM loaders use (greedy
    first-fit-decreasing needs global coordination; sequential packing of
    a shuffled stream wastes only the expected tail of each bin, which is
    small when documents are much shorter than the budget).

    The global cumsum is a hierarchical two-pass prefix sum, NOT a
    single-partition window: rows are bucketed by the first
    ``bucket_chars`` hex chars of the md5 sort key — a bucket is a
    contiguous RANGE of the global order and a pure function of the ids,
    so the two passes can never disagree about membership. Pass 1
    aggregates per-bucket token totals (map-side partial, then a bounded
    <= 16**bucket_chars-row collect of pure metadata); pass 2 runs the
    cumsum per bucket on an ordinary hash-partitioned window and adds the
    broadcast prefix offset of every earlier bucket. Max rows per task is
    n / 16**bucket_chars — raise ``bucket_chars`` to scale out further.

    Documents LONGER than the budget get a bin of their own (they cross
    the boundary immediately); chunk them upstream if that is an error.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1 token, got {budget}")
    if not 1 <= bucket_chars <= 8:
        raise ValueError(f"bucket_chars must be in [1, 8], got {bucket_chars}")
    rank = shuffle_rank(F.col(id_col), seed)
    keyed = df.withColumn("_pack_rank", rank).withColumn(
        "_pack_bucket", F.substring(F.col("_pack_rank"), 1, bucket_chars)
    )
    # Pass 1: per-bucket token totals. Bounded-metadata collect (one row
    # per *occupied* bucket, <= 16**bucket_chars) — deterministic across
    # actions because the bucket is a hash of the id, not a partition id.
    totals = (
        keyed.groupBy("_pack_bucket")
        .agg(F.sum(F.col(token_col).cast("long")).alias("_t"))
        .collect()
    )
    rows, run = [], 0
    for r in sorted(totals, key=lambda r: r["_pack_bucket"]):
        rows.append((r["_pack_bucket"], run))
        run += r["_t"]
    offsets = keyed.sparkSession.createDataFrame(
        rows, "_pack_bucket string, _pack_offset long"
    )
    # Pass 2: local cumsum inside each bucket (hash-partitioned window —
    # hex prefixes sort identically to the full key, and md5 collisions
    # aside, equal ranks share a bucket so cross-bucket ties are moot).
    w = Window.partitionBy("_pack_bucket").orderBy(F.col("_pack_rank"), F.col(id_col))
    cum = F.col("_pack_offset") + F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    # Bin = how many full budgets lie at or below the tokens BEFORE this
    # document — a doc starts a new bin exactly when its predecessor total
    # crossed a budget multiple.
    return (
        keyed.join(F.broadcast(offsets), "_pack_bucket")
        .withColumn("bin_id", F.floor(before / F.lit(budget)).cast("long"))
        .withColumn("bin_tokens_before", before.cast("long"))
        .drop("_pack_rank", "_pack_bucket", "_pack_offset")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks — the
    standard prep for context-bounded training/embedding: chunk i covers
    tokens [i*stride, i*stride + chunk_tokens) with stride =
    chunk_tokens - overlap; a document shorter than one window yields
    exactly one chunk (possibly empty for an empty text).

    Adds (chunk_id, chunk_text, chunk_n_tokens) with one output row per
    chunk. Pure JVM expressions: tokenization happens ONCE per document
    in the projection below the Generate (the explode replicates the
    computed array per chunk row — no per-chunk re-tokenization), and
    the chunk windows are array slices. Deterministic: a pure function
    of the text, replicated exactly by the SQL oracle.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    clash = {"chunk_id", "chunk_text", "chunk_n_tokens", "_toks"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} that chunking "
            "would overwrite; rename them first"
        )
    from dca_manager_spark.operators.text import tokens

    stride = chunk_tokens - overlap
    n = F.size(F.col("_toks"))
    # ceil((n - chunk) / stride) + 1 extra windows past the first, in
    # exact integer arithmetic (doubles are exact to 2^53 — fine for any
    # real token count).
    n_chunks = (
        F.floor(
            (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
        + F.lit(1)
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    window = F.slice(F.col("_toks"), start, chunk_tokens)
    return (
        df.withColumn("_toks", tokens(F.col(text_col)))
        .select(
            # Everything but the raw text rides along; the token array is
            # computed once per document here, below the Generate.
            *[c for c in df.columns if c != text_col],
            "_toks",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            *[c for c in df.columns if c != text_col],
            "chunk_id",
            F.concat_ws(" ", window).alias("chunk_text"),
            F.size(window).alias("chunk_n_tokens"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    seed: str = "mixture",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic mixture sampling: keep a hash-selected fraction of
    each group (e.g. per-language rates when blending corpora). A row is
    kept iff its md5 bucket (of 10000) falls below rate*10000 — the same
    layout-independent hash-range idiom as sampling.py, so reruns keep
    exactly the same rows and the oracle reproduces the selection.

    The per-group rate is a map-literal lookup (one expression node per
    group, O(1) tree depth), not a chained CASE WHEN — a when-chain nests
    one level per group and blows up analysis/codegen at hundreds of
    sources. The map rides in the plan like a broadcast dim; at tens of
    thousands of groups, switch to an actual broadcast join against a
    rates table (same filter, same hash)."""
    bad = {g: r for g, r in {**rates, "<default>": default_rate}.items()
           if not 0.0 <= r <= 1.0}
    if bad:
        raise ValueError(f"sampling rates must be in [0, 1], got {bad}")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    rate_map = F.create_map(
        *[lit for value, r in rates.items() for lit in (F.lit(value), F.lit(float(r)))]
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col(group_col)), F.lit(float(default_rate))
    )
    return df.filter(bucket < (rate * 10000).cast("bigint"))


# ---------------------------------------------------------------------------
# Sharded export: the final write of an assembled training set
# ---------------------------------------------------------------------------

def shard_assignment(
    df: DataFrame, id_col: str, n_shards: int, seed: str = "shard"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards): md5 hash-range of the
    salted id — a pure function of the row, so the assignment is
    identical on any cluster size / partitioning / rerun (and exactly
    replicable by a SQL oracle). Uniform over shards by md5.

    The hash is 60 bits (15 md5 hex chars), NOT sampling.hash_bucket's
    10,000-bucket range: training exports routinely use thousands of
    shards, and a 10k intermediate range would leave shards >= 10000
    permanently empty and skew non-divisor counts."""
    if not 1 <= n_shards <= 1 << 30:
        raise ValueError(
            f"n_shards must be in [1, 2^30], got {n_shards}"
        )
    key = F.concat(F.lit(seed), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: str = "shard",
    order_in_shard: str | None = None,
) -> None:
    """Write the training set as ``n_shards`` hash-assigned parquet
    shards (``shard=K/`` directories): the loader-facing layout training
    jobs expect — each data-loader rank reads its own shard subset, no
    global file list coordination.

    One exchange total: rows are repartitioned BY THE SHARD COLUMN so
    each shard's rows land in one task, then written with
    ``partitionBy`` — one file per shard, not one per (task x shard).
    ``order_in_shard`` optionally sorts within each task (e.g. by
    shuffle_rank for pre-shuffled shards) via sortWithinPartitions — no
    extra exchange. Deterministic: same input => byte-stable shard
    membership (file bytes also stable when order_in_shard is given).
    """
    assigned = shard_assignment(df, id_col, n_shards, seed)
    parted = assigned.repartition(n_shards, F.col("shard"))
    if order_in_shard is not None:
        parted = parted.sortWithinPartitions(order_in_shard, id_col)
    parted.write.mode("overwrite").partitionBy("shard").parquet(path)

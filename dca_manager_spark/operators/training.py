"""Training-set assembly operators: shuffle, packing, mixture sampling.

The last mile of a training-data pipeline after cleaning/dedup (see
operators/corpus.py): put surviving documents in a reproducible random
order, pack them into fixed token budgets, and blend sources at target
ratios. All three are pure column/window expressions — deterministic on
any cluster/partitioning, no seeds stored, every one exactly replicable
by an engine-independent oracle.

Scale notes: shuffle-order and mixture are narrow projections + one
hash; packing is one window cumsum over the chosen order (a single
range-partitioned shuffle). Nothing here is data-size-quadratic and
nothing collects.
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
) -> DataFrame:
    """Sequential token-budget packing: documents are taken in the
    deterministic-shuffle order and a new bin starts whenever the running
    token total would cross the budget. Adds (bin_id, bin_tokens_before).

    This is the streaming-friendly packing LLM loaders use (greedy
    first-fit-decreasing needs global coordination; sequential packing of
    a shuffled stream wastes only the expected tail of each bin, which is
    small when documents are much shorter than the budget). One window
    cumsum over the shuffle order = one range exchange.

    Documents LONGER than the budget get a bin of their own (they cross
    the boundary immediately); chunk them upstream if that is an error.
    """
    w = Window.orderBy(shuffle_rank(F.col(id_col), seed), F.col(id_col))
    cum = F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    # Bin = how many full budgets lie at or below the tokens BEFORE this
    # document — a doc starts a new bin exactly when its predecessor total
    # crossed a budget multiple.
    return df.withColumn("bin_id", F.floor(before / F.lit(budget)).cast("long")).withColumn(
        "bin_tokens_before", before.cast("long")
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
    exactly the same rows and the oracle reproduces the selection."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    rate = F.lit(default_rate)
    for value, r in rates.items():
        rate = F.when(F.col(group_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(bucket < (rate * 10000).cast("bigint"))

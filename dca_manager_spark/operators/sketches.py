"""Mergeable quantile sketches — the percentile twin of the HLL row
(plans/queries.agg_hll_sketch): per-group sketches built in one pass,
MERGED upward without re-reading history. approx_percentile can't do
that: its partial state is not a storable/unionable column.

Algorithm: DDSketch (Masson, Rim, Lee — VLDB 2019, public paper):
values bucket into logarithmic bins ``bin = ceil(log_gamma(x))``, the
sketch is the (bin -> count) map plus a zero count, and the quantile
estimate ``2 * gamma^bin / (gamma + 1)`` (bucket midpoint) carries a
RELATIVE-error guarantee of (gamma - 1) / (gamma + 1), independent of
data scale or distribution. Merging two sketches = summing their maps
bin-wise — associative, commutative, lossless: the sketch of a union
EQUALS the merge of the parts' sketches bit-for-bit (pinned by test),
which is what makes daily-sketch -> rolling-window rollups exact at
100 TB.

Everything is JVM expressions: binning is log/ceil arithmetic, the map
is map_from_entries over a grouped count, merge is explode + sum +
rebuild, and the quantile walk is an ``aggregate`` fold over the
sorted map entries. No UDFs, no driver collects; one shuffle per
grouping level.

Determinism: bin boundaries are pure double arithmetic; counts are
integers; ties in the cumulative walk resolve to the FIRST bin whose
cumulative count reaches ceil(q * n) — reproducible on any layout.
Negative inputs are rejected loudly at build time (the classic DDSketch
domain; store sign-split sketches for signed data), zeros get a
dedicated exact count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_col(value: Column, gamma: float) -> Column:
    # ceil(ln x / ln gamma) as int bin; exact powers land deterministically
    # because both engines evaluate the same IEEE double log/division.
    return F.ceil(F.log(value.cast("double")) / F.lit(math.log(gamma))).cast(
        "int"
    )


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    gamma: float = 1.02,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group DDSketch: returns group_cols + ``sketch_col``
    (map<int,bigint> of log-bin counts) + ``zero_count`` + ``n`` (total
    rows). One grouped count on (group, bin) then a map rollup —
    map-side partial aggregation does the heavy lifting; the sketch is
    O(log_gamma(max/min)) entries regardless of row count."""
    if not 1.0 < gamma:
        raise ValueError(f"gamma must be > 1, got {gamma}")
    v = F.col(value_col).cast("double")
    # NULLs are DROPPED, matching every standard aggregate
    # (percentile/approx_percentile ignore nulls) — without the filter a
    # null would fall through both the negative guard and the > 0 bin
    # test into the zero bucket, silently pulling quantiles toward 0.
    guarded = df.filter(v.isNotNull()).select(
        *group_cols,
        F.when(v < 0, F.raise_error(
            F.concat(
                F.lit(f"ddsketch_build: negative value in {value_col!r}: "),
                v.cast("string"),
                F.lit(" — split by sign upstream"),
            )
        ).cast("double")).otherwise(v).alias("__v"),
    )
    binned = guarded.select(
        *group_cols,
        F.when(F.col("__v") > 0, _bin_col(F.col("__v"), gamma)).alias("__bin"),
    )
    per_bin = binned.groupBy(*group_cols, "__bin").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return per_bin.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__bin").isNotNull(),
                        F.struct(F.col("__bin"), F.col("__cnt")),
                    )
                )
            )
        ).alias(sketch_col),
        F.coalesce(
            F.sum(F.when(F.col("__bin").isNull(), F.col("__cnt"))), F.lit(0)
        ).alias("zero_count"),
        F.sum("__cnt").alias("n"),
    )


def ddsketch_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches UPWARD to a coarser grouping: explode each map,
    sum counts bin-wise, rebuild. Lossless — merging per-(a,b) sketches
    to per-a equals building per-a directly (pinned by test)."""
    exploded = df.select(
        *group_cols,
        F.explode_outer(F.col(sketch_col)).alias("__bin", "__cnt"),
    )
    per_bin = exploded.groupBy(*group_cols, "__bin").agg(
        F.sum("__cnt").alias("__cnt")
    )
    totals = df.groupBy(*group_cols).agg(
        F.sum("zero_count").alias("zero_count"), F.sum("n").alias("n")
    )
    merged = per_bin.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__bin").isNotNull(),
                        F.struct(F.col("__bin"), F.col("__cnt")),
                    )
                )
            )
        ).alias(sketch_col)
    )
    return merged.join(totals, group_cols)


def ddsketch_quantile(
    sketch: Column,
    zero_count: Column,
    n: Column,
    q: float,
    gamma: float = 1.02,
) -> Column:
    """Quantile estimate from a sketch map — a JVM ``aggregate`` fold
    over the sorted (bin, count) entries: find the first bin whose
    cumulative count (after zeros) reaches ceil(q * n); the estimate is
    the bucket midpoint 2 * gamma^bin / (gamma + 1). Returns 0.0 when
    the target rank falls inside the zero count; null on an empty
    sketch."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    target = F.greatest(F.ceil(F.lit(q) * n.cast("double")), F.lit(1))
    entries = F.sort_array(F.map_entries(sketch))
    init = F.struct(
        zero_count.cast("bigint").alias("cum"),
        F.lit(None).cast("int").alias("chosen"),
    )
    fold = F.aggregate(
        entries,
        init,
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.when(acc["chosen"].isNotNull(), acc["chosen"])
            .when(acc["cum"] + e["value"] >= target, e["key"])
            .alias("chosen"),
        ),
    )
    chosen = fold["chosen"]
    in_zeros = zero_count.cast("bigint") >= target
    return (
        F.when(n.isNull() | (n <= 0), F.lit(None).cast("double"))
        .when(in_zeros, F.lit(0.0))
        .otherwise(
            F.lit(2.0)
            * F.pow(F.lit(gamma), chosen.cast("double"))
            / F.lit(gamma + 1.0)
        )
    )

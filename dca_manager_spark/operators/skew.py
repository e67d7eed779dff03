"""Skew mitigation: salting for aggregations and joins.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
these are the explicit, plan-level tools for the cases AQE can't fix —
a single hot GROUP BY key, or a hot join key on the non-splittable side.

Salts are DETERMINISTIC (hash of a secondary column, or a row-stable
expression), never rand(): retries and speculative tasks must agree on the
salt or results diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, str],
    salt_buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation under key skew: partial-aggregate on
    (group, salt) — spreading a hot key over ``salt_buckets`` reducers —
    then final-aggregate on the group alone. Sums/counts recompose exactly
    (decomposable aggregates only).

    ``salt_source``: a column whose hash spreads rows of the same group
    (defaults to a stable per-partition/row expression).
    """
    salt = (
        F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
        if salt_source is not None
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[F.sum(c).alias(f"__p_{alias}") for c, alias in agg_cols.items()],
            F.count(F.lit(1)).alias("__p_cnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"__p_{alias}").alias(alias) for alias in agg_cols.values()],
        F.sum("__p_cnt").alias("n_rows"),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Skewed-large ⋈ small equi join without one giant reducer: the
    skewed side gets a deterministic salt in [0, buckets); the small side
    is REPLICATED once per salt value (explode over sequence). The join key
    becomes (on..., salt) — a hot key's rows now land on ``salt_buckets``
    reducers instead of one. Exact same output rows as the unsalted join.

    Use when the small side is too big to broadcast but small enough to
    replicate xN; otherwise prefer broadcast (no shuffle at all) or AQE
    skew splitting.
    """
    salt = (
        F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
        if salt_source is not None
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return left.join(right, on=on + ["__salt"], how="inner").drop("__salt")

"""Relational operators Spark lacks as single primitives (SURVEY §2B).

Everything here is a *plan construction* over DataFrame ops — no UDFs, no
collects — so Catalyst/AQE keep full optimization freedom at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order_cols) -> DataFrame:
    """Global top-k. ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject: per-partition heaps + a single driver merge of k
    rows per partition — no global sort shuffle, safe at any scale.
    """
    return df.orderBy(*order_cols).limit(k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the single right row with the largest
    ``right_on <= left_on`` (backward, inclusive) — e.g. "latest price at or
    before trade time" (SURVEY §2B joins table).

    Implementation is the union+window trick, the scalable formulation:
    tag both sides, union, and take the running ``last`` right payload over
    a window ordered by time. ONE shuffle on (by, time), no row explosion —
    unlike the naive theta-join + dedup, which multiplies rows before
    filtering. The right payload travels as a single struct so a right row
    whose fields are null still matches as a row (ignorenulls skips only
    truly absent right rows, never mixes fields across rows).

    ``direction='forward'`` gives the smallest ``right_on >= left_on``.

    Scale note: with ``by=[]`` the window has no partition key and the
    whole union sorts on ONE reducer — fine for small frames, never for
    big ones. Always pass ``by`` keys at scale (and sub-bucket a hot key
    by time range if one key dominates).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = by or []

    payload_cols = [c for c in right.columns if c not in by]
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__ts", F.col(left_on)).withColumn("__side", F.lit(1))
    l = l.withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))

    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # Right rows sort before left rows at equal ts => inclusive match.
        w = Window.partitionBy(*by).orderBy(F.col("__ts").asc(), F.col("__side").asc())
    else:
        w = Window.partitionBy(*by).orderBy(F.col("__ts").desc(), F.col("__side").asc())
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(frame)
    ).filter(F.col("__side") == 1)

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in payload_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_lo,
    right_hi,
    bucket_width_seconds: int | None = None,
) -> DataFrame:
    """Interval join: left rows whose ``left_ts`` falls in
    [``right_lo``, ``right_hi``) of a right row, equi-matched on ``on``.

    With ``bucket_width_seconds`` set, both sides are bucketized so the
    match becomes an equi join on (keys, bucket) — the right interval is
    exploded over the buckets it covers via ``sequence`` — turning a
    potential BroadcastNestedLoopJoin into a shuffled hash/sort-merge join.
    That is the 100 TB-safe path when neither side is broadcastable; the
    residual range predicate still filters exactly.
    """
    if bucket_width_seconds is not None and bucket_width_seconds < 1:
        raise ValueError(
            f"bucket_width_seconds must be >= 1 (or None for the plain "
            f"non-equi join), got {bucket_width_seconds}"
        )
    cond = (F.col(left_ts) >= F.col(right_lo)) & (F.col(left_ts) < F.col(right_hi))
    if not bucket_width_seconds:
        eq = [left[c] == right[c] for c in on]
        pred = cond
        for e in eq:
            pred = pred & e
        joined = left.join(right, pred, "inner")
        return joined.drop(*[right[c] for c in on])

    width = bucket_width_seconds
    lb = left.withColumn("__bucket", (F.unix_timestamp(F.col(left_ts)) / width).cast("long"))
    rb = right.withColumn(
        "__buckets",
        F.sequence(
            (F.unix_timestamp(F.col(right_lo)) / width).cast("long"),
            (F.unix_timestamp(F.col(right_hi)) / width).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    joined = lb.join(rb, on=on + ["__bucket"], how="inner").filter(cond)
    return joined.drop("__bucket")

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


def sessionize_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_col: str,
) -> DataFrame:
    """Gaps-and-islands sessionization: rows of one ``key_col`` whose
    consecutive ``ts_col`` gaps are <= ``gap_seconds`` share a session.

    Returns the input plus ``session_id`` (1-based per key, in time order).
    The classic two-window shape: lag(ts) over (key, ts-order) marks
    session starts, a running sum of the start flags numbers them. Both
    windows partition by the key — at 100 TB that is one shuffle on a
    high-cardinality key (users/devices), each partition a single user's
    events; no global ordering anywhere. ``tiebreak_col`` totalizes the
    order under equal timestamps so session numbering is deterministic.
    Gap arithmetic is integer microseconds (unix_micros) — exact, and
    immune to the second-truncation of unix_timestamp; the NTZ->timestamp
    cast is an identity on the stored micros under the UTC session the
    loader pins.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    is_start = F.when(
        F.lag(micros).over(w).isNull()
        | ((micros - F.lag(micros).over(w)) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_start).over(run))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply an update batch to a
    versioned dimension, closing changed rows and appending new versions.

    ``dim`` carries ``(key, tracked..., valid_from, valid_to)`` where the
    current row of each key has ``valid_to IS NULL``; ``updates`` carries
    ``(key, tracked..., effective_ts)`` with at most one row per key (the
    caller pre-collapses intra-batch churn, e.g. keep-latest by
    precombine). Result, exactly:

    - closed history rows pass through untouched;
    - a current row whose tracked columns DIFFER from its update is closed
      (``valid_to = effective_ts``) and a new open version is appended;
    - a current row with no update, or whose update carries identical
      tracked values, stays open and untouched;
    - an update for an unseen key inserts a new open row.

    Plan: one left join current-rows x updates on the key (history rows
    never join), null-safe ``<=>`` comparisons decide "changed", and the
    new-version rows are a projection of the same joined frame — a single
    shuffle on the dimension key plus a union, no window, no collect.
    Dimensions are small next to facts, but this stays safe even for
    billion-row dims.
    """
    upd = updates.select(
        F.col(key_col).alias("__k"),
        F.col(effective_col).alias("__eff"),
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
    )
    history = dim.filter(F.col(valid_to).isNotNull())
    current = dim.filter(F.col(valid_to).isNull())
    joined = current.join(upd, current[key_col] == upd["__k"], "full_outer")
    changed = F.col("__k").isNotNull() & (
        F.col(key_col).isNull()  # brand-new key
        | ~sum(
            [F.col(c).eqNullSafe(F.col(f"__u_{c}")).cast("int") for c in tracked_cols],
            F.lit(0),
        ).eqNullSafe(F.lit(len(tracked_cols)))
    )
    out_cols = [key_col, *tracked_cols, valid_from, valid_to]
    # surviving current rows: unmatched, or matched-but-identical (stay
    # open), or matched-and-changed (close at the update's effective ts)
    kept = joined.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(valid_from),
        F.when(changed, F.col("__eff")).otherwise(F.col(valid_to)).alias(valid_to),
    )
    inserted = joined.filter(changed).select(
        F.col("__k").alias(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in tracked_cols],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return history.select(*out_cols).unionByName(kept).unionByName(inserted)


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier profile: median, MAD (median absolute
    deviation), and the count of rows whose modified z-score
    ``0.6745 * |x - median| / MAD`` exceeds ``z_threshold``.

    The robust alternative to mean/stddev z-scores (one corrupt feed
    value moves a mean arbitrarily; the median doesn't) — the standard
    data-quality gate on ingest. Values are quantized to integer cents
    first so the exact medians are engine-independent, and the z
    comparison uses one fixed operation order. Two grouped exact
    percentiles (group-keyed shuffles — no global ordering) + one
    equi-join of the per-group medians back onto the rows.
    """
    cents_v = F.floor(F.col(value_col) * 100)
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile(FLOOR({value_col} * 100), 0.5)").alias("__med")
    )
    # pinned: both the MAD aggregate and the z-scoring read this frame,
    # and Spark shares no common subplans — without the barrier the
    # input scan + median join would run twice (the repo's documented
    # Generate-barrier trap)
    with_med = df.join(med, group_col).localCheckpoint(eager=False)
    mad = with_med.groupBy(group_col).agg(
        F.expr(
            f"percentile(ABS(FLOOR({value_col} * 100) - __med), 0.5)"
        ).alias("__mad")
    )
    # the division is guarded at the expression site, not just in the
    # aggregate below: ANSI mode makes a bare /0 a runtime error for
    # constant groups (MAD = 0), and SQL AND does not short-circuit
    scored = with_med.join(mad, group_col).withColumn(
        "__z",
        F.when(
            F.col("__mad") > 0,
            F.lit(0.6745) * F.abs(cents_v - F.col("__med")) / F.col("__mad"),
        ),
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.first("__med") / 100).alias("median_value"),
        (F.first("__mad") / 100).alias("mad_value"),
        F.sum(
            F.when(F.col("__mad") > 0, (F.col("__z") > F.lit(float(z_threshold))).cast("int"))
            .otherwise(F.lit(0))
        ).alias("n_outliers"),
    )

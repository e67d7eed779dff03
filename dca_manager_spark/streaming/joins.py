"""Streaming joins: stream-stream and stream-static enrichment.

Stream-stream inner joins require BOTH sides watermarked plus a time-range
predicate so Spark can bound the join state: a side's buffered rows are
evicted once the watermark passes the range. Without the range condition
state grows forever — the 100 TB/day failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ``right_ts`` is within [left_ts - lookback,
    left_ts], equi-matched on ``on`` — e.g. 'purchases joined to the
    clicks of the preceding hour' with bounded state on both sides.

    The full join matrix is supported: ``inner``, ``left_outer``,
    ``right_outer``, ``full_outer``. Every outer variant emits an
    unmatched row (nulls on the other side) only once the watermark
    proves no match can still arrive — i.e. when that row's state is
    evicted. Until then the row is neither emitted nor dropped; a
    consumer must not treat the absence of a row in early micro-batches
    as a non-match. The same time-range predicate is what makes the
    outer joins legal at all: Spark rejects outer stream-stream joins
    whose state it cannot bound — here BOTH sides are bounded (the range
    relates the two event times, so each side's buffered rows age out
    once the opposite watermark passes lookback + delay).
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            "how must be one of 'inner', 'left_outer', 'right_outer', "
            f"'full_outer', got {how!r}"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = F.lit(True)
    for c in on:
        cond = cond & (l[c] == r[c])
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return l.join(r, cond, how)


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Stream enriched with a static dimension — planned as a broadcast
    join per micro-batch, no streaming state at all (the right tool when
    the dim fits in memory; use stream-stream only when both sides move)."""
    return stream.join(F.broadcast(dim), on=on, how="left")

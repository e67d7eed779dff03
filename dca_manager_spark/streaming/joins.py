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
) -> DataFrame:
    """Inner-join right rows whose ``right_ts`` is within [left_ts -
    lookback, left_ts], equi-matched on ``on`` — e.g. 'purchases joined to
    the clicks of the preceding hour' with bounded state on both sides."""
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
    return l.join(r, cond, "inner")


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Stream enriched with a static dimension — planned as a broadcast
    join per micro-batch, no streaming state at all (the right tool when
    the dim fits in memory; use stream-stream only when both sides move)."""
    return stream.join(F.broadcast(dim), on=on, how="left")

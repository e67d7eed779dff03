"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side design for a 100 TB multimodal corpus:
- media travels as a ``binary`` column next to a typed metadata struct
  (MEDIA_META_SCHEMA) — never as paths that executors re-fetch row-by-row;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole Arrow
  record batches in, no per-row serialization;
- partitioning: media rows are large, so stages repartition by byte budget
  (``target_partition_bytes``), not row count — a partition must fit in
  executor memory with decode headroom.

The actual codec calls are STUBBED (no PIL/ffmpeg in this container):
``decoder=None`` raises NotImplementedError at call time, and
``fake_image_decoder`` provides a deterministic stand-in so the plumbing —
schemas, batch shapes, partitioning, UDF signatures — is fully real and
tested end-to-end.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_image_decoder(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decode+embed: a fixed-length
    byte-histogram feature. Replace with PIL/torch in a real deployment."""
    if content is None:
        return []
    hist = [0.0] * 16
    for b in content:
        hist[b % 16] += 1.0
    total = max(len(content), 1)
    return [h / total for h in hist]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    batch_hint: int = 64,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of whole
    media rows). ``decoder=None`` raises — the codec is deliberately
    stubbed in this environment."""
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment — inject a decoder "
            "(e.g. PIL-based) or use fake_image_decoder for plumbing tests"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "feature": pdf["content"].map(decoder),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame,
    size_col: str = "content",
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Size-aware repartition: media partitions are budgeted in BYTES.
    Computes total payload size (cheap agg over length()) and repartitions
    to ceil(total/target). At 100 TB this is the difference between 'fits
    in executor memory' and OOM-on-decode."""
    total = media.agg(F.sum(F.length(F.col(size_col))).alias("b")).collect()[0].b or 0
    n = max(1, -(-total // target_partition_bytes))
    return media.repartition(n)


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media_id, frame_ts).
    The timestamps come from metadata (no decode needed — pure Spark
    sequence/explode); the actual frame extraction joins this plan into
    ``extract_features`` with a video decoder."""
    return (
        media.filter(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )

"""Multimodal plumbing tests: schema, Arrow-batched extraction with the
deterministic fake decoder, stub behavior, frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_image_decoder,
    frame_sample_plan,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes(range(64)), ("image", "png", 8, 8, None, None)),
        (2, b"\x00" * 100, ("image", "png", 10, 10, None, None)),
        (3, None, ("image", "png", None, None, None, None)),
        (4, b"vid", ("video", "mp4", 640, 480, 3500, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decoder_stub_raises(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, decoder=None)


def test_extract_features_fake_decoder(media):
    out = {r.media_id: r for r in extract_features(media, fake_image_decoder).collect()}
    assert out[1].n_bytes == 64
    # 64 bytes 0..63 -> uniform histogram: 4/64 per bucket
    assert all(abs(v - 0.0625) < 1e-6 for v in out[1].feature)
    assert out[2].feature[0] == 1.0 and sum(out[2].feature) == 1.0
    assert out[3].n_bytes == 0 and out[3].feature == []


def test_repartition_by_bytes(media):
    df = repartition_by_bytes(media, target_partition_bytes=100)
    # 167 payload bytes / 100 -> 2 partitions
    assert df.rdd.getNumPartitions() == 2


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert {r.media_id for r in frames} == {4}
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]

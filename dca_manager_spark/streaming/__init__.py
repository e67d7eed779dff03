"""Streaming layer: queue emulation + Structured Streaming operators."""

from dca_manager_spark.streaming.cdc import CdcFollower, feed_deltas, replicate
from dca_manager_spark.streaming.queue_source import FileQueue

__all__ = ["CdcFollower", "FileQueue", "feed_deltas", "replicate"]

"""Streaming layer: queue emulation + Structured Streaming operators."""

from dca_manager_spark.streaming.cdc import CdcFollower, replicate
from dca_manager_spark.streaming.queue_source import FileQueue

__all__ = ["CdcFollower", "FileQueue", "replicate"]

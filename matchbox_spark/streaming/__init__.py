"""Structured Streaming extensions (incremental source indexing)."""

from matchbox_spark.streaming.incremental import incremental_index_stream
from matchbox_spark.streaming.sketches import (
    KmvAccumulator,
    streaming_kmv_distinct,
)

__all__ = [
    "KmvAccumulator",
    "incremental_index_stream",
    "streaming_kmv_distinct",
]

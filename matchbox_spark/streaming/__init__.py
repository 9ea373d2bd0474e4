"""Structured Streaming extensions (incremental source indexing)."""

from matchbox_spark.streaming.incremental import incremental_index_stream

__all__ = ["incremental_index_stream"]

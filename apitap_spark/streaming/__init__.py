"""Structured Streaming ingestion (beyond the reference: SURVEY §2.2 Q15 —
the reference is bounded-only; streaming is its roadmap item README.md:535)."""

from apitap_spark.streaming.ingest import (
    EVENT_SCHEMA,
    read_event_stream,
    stream_merge_to_sink,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_event_stream",
    "windowed_event_counts",
    "streaming_dedup",
    "stream_merge_to_sink",
]

"""Structured Streaming surface: the streaming twins of the batch-first
operators in operators/streaming_ops.py (SURVEY §1.2, §2.9)."""

from base_etl_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    streaming_cumsum,
    streaming_dedup,
    streaming_enrich,
    streaming_interval_join,
    streaming_interval_join_outer,
    streaming_sessionize,
    streaming_tumbling,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "streaming_cumsum",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_sessionize",
    "streaming_tumbling",
]

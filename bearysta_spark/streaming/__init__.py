"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY §1.1) — this is the
beyond-reference extension: the same windowed rollups/sessionization the
batch queries compute, expressed as incremental streaming plans with
watermarks for late data.
"""

from bearysta_spark.streaming.events import (
    daily_type_counts_stream,
    enriched_stream,
    events_stream,
    hourly_rollup_stream,
    session_stream,
    run_stream_to_memory,
    view_click_join_stream,
)
from bearysta_spark.streaming.stateful import running_user_totals, stream_dedup

__all__ = [
    "enriched_stream",
    "events_stream",
    "hourly_rollup_stream",
    "session_stream",
    "run_stream_to_memory",
    "view_click_join_stream",
    "running_user_totals",
    "stream_dedup",
]

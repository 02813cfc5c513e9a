"""Structured Streaming surface.

The reference is a batch engine (SURVEY.md §2.9: its STREAMING_* operators
are pipeline-streaming, not event-time streaming), so streaming is the
forward-looking extension here: the events table doubles as a stream
source, and the batch tumbling-window queries share their semantics with
these streaming versions (F.window aggregation results are identical in
batch and streaming append mode once the watermark passes).
"""

from data_chunk_compaction_in_duckdb_spark.streaming.events import (  # noqa: F401
    run_stream_to_memory,
    streaming_dedup_events,
    streaming_session_windows,
    streaming_sessionize,
    streaming_sliding_counts,
    streaming_static_join_rollup,
    streaming_interval_join,
    streaming_left_outer_interval_join,
    streaming_tws_running_totals,
    tws_available,
    streaming_tumbling_counts,
)

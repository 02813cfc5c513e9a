"""Driver-checkable streaming queries.

Structured Streaming results are normally only pytest-covered (the
driver's oracle gate wants a DataFrame).  These entries drive the stream
synchronously to a memory sink (processAllAvailable) and return the sink
table as a batch DataFrame — so the watermarked streaming pipeline itself
gets a hard DuckDB-oracle correctness row: once the stream drains, the
windowed results must equal the same SQL over the static table.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "stream_tumbling_window_parity",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked tumbling-window stream (streaming/events.py) run
    to completion and returned as a batch DataFrame — Structured
    Streaming's core guarantee (stream == batch over the same input)
    made driver-checkable.  The oracle is plain hourly GROUP BY over the
    static events table; float totals match because micro-batch partial
    sums merge through the same double addition the batch plan uses at
    this fixture scale."""
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_tumbling_counts,
    )

    sink = f"stream_parity_{uuid.uuid4().hex[:8]}"
    sdf = streaming_tumbling_counts(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="complete")
    return spark.table(sink)

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


@query(
    "stream_interval_join_parity",
    oracle="""
    SELECT p.user_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(ROUND(p.value * 100) AS BIGINT) / 100.0 AS purchase_value
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    """,
)
def stream_interval_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked stream-stream interval join (purchase <- same-user
    clicks within 30 minutes, streaming/events.py) drained to a memory
    sink and returned as a batch DataFrame.  The oracle is the identical
    interval self-join over the static table; purchase_value uses the
    integer-cents form so the only float is one exact division."""
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_interval_join,
    )
    from pyspark.sql import functions as F

    sink = f"stream_ij_{uuid.uuid4().hex[:8]}"
    sdf = streaming_interval_join(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="append")
    out = spark.table(sink)
    return out.select(
        "user_id",
        "click_ts",
        "purchase_ts",
        ((F.round(F.col("purchase_value") * 100)).cast("long") / 100.0).alias(
            "purchase_value"
        ),
    )


@query(
    "stream_left_outer_join_parity",
    oracle="""
    WITH bound AS (SELECT max(ts) - INTERVAL 2 HOUR AS cutoff FROM events)
    SELECT p.user_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(ROUND(p.value * 100) AS BIGINT) / 100.0 AS purchase_value
    FROM (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    WHERE p.ts <= (SELECT cutoff FROM bound)
    """,
)
def stream_left_outer_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked LEFT OUTER stream-stream join drained to a memory
    sink.  Outer (never-clicked) purchases are held in state until the
    click-side watermark passes their join window, so parity with the
    batch LEFT JOIN holds only for purchases older than the final
    watermark — both sides bound the comparison at max(ts) - 2 hours
    (1 h watermark delay + 30 min window + margin); the unresolved tail
    is correct streaming semantics, not loss."""
    import os

    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_left_outer_interval_join,
    )

    sink = f"stream_loj_{uuid.uuid4().hex[:8]}"
    sdf = streaming_left_outer_interval_join(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="append")
    bound = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("_cutoff"))
    )
    out = (
        spark.table(sink)
        .crossJoin(F.broadcast(bound))
        .filter(F.col("purchase_ts") <= F.col("_cutoff"))
        .drop("_cutoff")
    )
    return out.select(
        "user_id",
        "click_ts",
        "purchase_ts",
        ((F.round(F.col("purchase_value") * 100)).cast("long") / 100.0).alias(
            "purchase_value"
        ),
    )


@query(
    "stream_dedup_parity",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked streaming dedup (streaming/events.py,
    dropDuplicates state) drained to a memory sink — the streaming twin
    of the corpus exact-dedup stage made driver-checkable.  The dedup
    keys carry no event-time column, so state holds every fingerprint
    and the drained stream equals batch DISTINCT exactly; the documented
    scale path bounds state with dropDuplicatesWithinWatermark when the
    key space is unbounded."""
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_dedup_events,
    )

    sink = f"stream_dd_{uuid.uuid4().hex[:8]}"
    sdf = streaming_dedup_events(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="append")
    return spark.table(sink)


@query(
    "stream_sliding_window_parity",
    oracle="""
    WITH starts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
             event_type
      FROM events
      UNION ALL
      SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP),
             event_type
      FROM events
    )
    SELECT win_start, event_type, COUNT(*) AS n
    FROM starts GROUP BY 1, 2
    """,
)
def stream_sliding_window_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked sliding-window stream (2 h window, 1 h slide)
    drained to a memory sink in complete mode — every event lands in two
    windows, and the oracle replays the expansion with a shifted UNION
    over the static table (same scheme as the batch twin
    events_sliding_window)."""
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_sliding_counts,
    )

    sink = f"stream_sw_{uuid.uuid4().hex[:8]}"
    sdf = streaming_sliding_counts(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="complete")
    return spark.table(sink)


@query(
    "stream_session_window_parity",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sid
      FROM g)
    SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS sess_start,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_window_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in session_window stream (30-min inactivity gap) drained
    to a memory sink in complete mode; the oracle replays gap-islands
    sessionization (new session when the gap >= 30 min, matching
    session_window's half-open [start, last + gap) semantics)."""
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_session_windows,
    )

    sink = f"stream_sess_{uuid.uuid4().hex[:8]}"
    sdf = streaming_session_windows(spark, sf_dir)
    run_stream_to_memory(sdf, name=sink, mode="complete")
    return spark.table(sink)

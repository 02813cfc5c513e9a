"""Streaming queries over the events table.

Local smoke path: parquet file stream → watermarked tumbling-window
aggregation → memory sink, driven synchronously with
processAllAvailable() (the guide's pattern for deterministic tests).
On a cluster the same query graph reads Kafka and writes a sink with
checkpointing; nothing in the transformation changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming file sources need an explicit schema; infer it from a batch
    # read of the same file so the stream tracks whatever physical type the
    # fixture uses for ts (int64 nanoseconds in older fixtures, native
    # timestamp[us] in current ones).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    # The streaming file source requires a directory: scan sf_dir with a
    # glob pinned to the events file.
    raw = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        # ns→µs NTZ, same arithmetic construction as catalog.load_table
        # (session-TZ independent).
        raw = raw.withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                "0, 0, 0, CAST(ts div 1000 AS DECIMAL(26,6)) / 1000000)"
            ),
        )
    return raw


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    twin of the batch events_tumbling_window query (same results once the
    watermark closes every window)."""
    ev = _event_stream(spark, sf_dir)
    # Watermarks accept TIMESTAMP but not TIMESTAMP_NTZ: map the NTZ
    # wall-clock onto the identical UTC instant arithmetically (no session
    # TZ involved), window on that, and convert the window start back to
    # NTZ so the output matches the batch twin under any driver timezone.
    ev = ev.withColumn(
        "ts_evt",
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ),
    )
    return (
        ev.withWatermark("ts_evt", "1 hour")
        .groupBy(F.window("ts_evt", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                "0, 0, 0, CAST(unix_micros(w.start) AS DECIMAL(26,6))"
                " / 1000000)"
            ).alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def _make_sessionizer(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize(key, pdfs, state):
        # Closure-serialized (no module imports on executors).
        import pandas as pd

        (user_id,) = key
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value) // 1000 for t in pdf["ts"])
        ts_us.sort()
        for t in ts_us:
            if last_ts is None or (t - last_ts) > gap_us:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return sessionize


def streaming_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user session counting with an inactivity gap, state = (last event
    time, session count, event count) carried across micro-batches.
    The batch twin is queries/events_q.events_sessionization — with the
    whole fixture in one micro-batch the outputs agree, which the test
    asserts."""
    ev = _event_stream(spark, sf_dir)
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_minutes),
        outputStructType="user_id LONG, n_sessions INT, n_events INT",
        stateStructType="last_ts LONG, n_sessions INT, n_events INT",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_stream_to_memory(
    df: DataFrame, name: str = "stream_out", mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion into a memory sink —
    synchronous, for tests/smoke.  Caller reads spark.table(name)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

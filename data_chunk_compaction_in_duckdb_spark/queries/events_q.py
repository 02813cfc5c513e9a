"""Event-stream analytics in batch form (SURVEY.md §2.9: the reference is
batch-only; F.window tumbling/sliding aggregations share semantics with
the Structured Streaming surface in streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "events_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (time_bucket analog — F.window start equals
    date_trunc for epoch-aligned windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, value
      FROM events
      UNION ALL
      SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP), value
      FROM events
    )
    SELECT win_start, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS total_milli
    FROM starts GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h width, 1h slide) — every event lands in two
    windows; the oracle replays the expansion with a shifted union.
    The measure is an exact integer milli-sum: a rounded AVG is fragile
    here because window counts are powers of two, so averages land
    exactly on decimal rounding boundaries where engines' summation
    order flips the last digit."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias(
                "total_milli"
            ),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_milli")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    ), per_sess AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events
      FROM s GROUP BY user_id, sess_id
    )
    SELECT user_id, COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 6) AS avg_events_per_session,
           MAX(n_events) AS max_session_len
    FROM per_sess GROUP BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag → gap flag → running
    sum as session id → two-level aggregation.  The streaming twin is
    session_window(ts, '30 minutes')."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            prev.isNull()
            | ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events")
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.max("n_events").alias("max_session_len"),
    )


@query(
    "microbench_chained_joins",
    oracle="""
    SELECT n_name, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND l_partkey <= (SELECT MAX(l_partkey) / 10 FROM lineitem)
    GROUP BY n_name
    """,
)
def microbench_chained_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's chained-join microbenchmark shape
    (vector_compaction.cpp:83-91: student ⋈ department ⋈ room ⋈ type with
    a 10% selective filter — the filter fragments chunks and the paper's
    compaction recovers the loss).  Spark: dimensions broadcast, one
    pipeline over the fact table, AQE coalescing after the filter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    max_part = li.agg((F.max("l_partkey") / 10).alias("_maxp10"))
    filtered = (
        li.crossJoin(F.broadcast(max_part))
        .filter(F.col("l_partkey") <= F.col("_maxp10"))
        .drop("_maxp10")
    )
    return (
        filtered.join(orders, filtered.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS c_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS a_day
      FROM events
    )
    SELECT c_day, CAST(datediff('day', c_day, a_day) AS BIGINT) AS offset_days,
           COUNT(*) AS n_users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY c_day, datediff('day', c_day, a_day)
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day.  Both aggregates and the join hash on
    user_id — one partitioning serves the cohort min, the activity
    distinct, and the join; only the final small matrix regroups."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("c_day"))
    activity = ev.distinct().withColumnRenamed("day", "a_day")
    return (
        activity.join(cohort, "user_id")
        .groupBy("c_day", F.datediff("a_day", "c_day").cast("long").alias("offset_days"))
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_gap_islands",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('microsecond',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM events
    ),
    islands AS (
      SELECT user_id,
             SUM(new_island) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM gaps
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, island_id
    ORDER BY user_id, island_id
    """,
)
def events_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: number each user's activity bursts (> 30 min of
    silence starts a new island) via lag + running conditional sum, then
    size each island.  Both windows and the final groupBy share the
    user_id partitioning — one shuffle total.  The same shape backs the
    reference-style sessionization without stateful UDFs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap: DuckDB's date_diff('second', ...) counts
    # second-boundary crossings while Spark's timestampdiff(SECOND, ...)
    # floors elapsed time — they disagree on sub-second offsets.  At
    # microsecond resolution (the storage precision) both are exact.
    gap_us = F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                    "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us > 1800 * 1000000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "user_id",
        F.sum("new_island").over(wrun).cast("long").alias("island_id"),
    )
    return (
        islands.groupBy("user_id", "island_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "island_id")
    )


@query(
    "events_hour_dow_matrix",
    oracle="""
    SELECT hour(ts) AS h,
           CAST(SUM(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sun,
           CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mon,
           CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS tue,
           CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS wed,
           CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS thu,
           CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS fri,
           CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS sat
    FROM (SELECT ts,
                 date_diff('day', DATE '1970-01-04', CAST(ts AS DATE)) % 7
                   AS dow
          FROM events) t
    GROUP BY h ORDER BY h
    """,
)
def events_hour_dow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity matrix — the punch-card report,
    one conditional-sum pivot over a single scan.  DOW is integer
    days-since-a-known-Sunday mod 7 (1970-01-04), sidestepping the
    engines' different weekday numbering."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-04").cast("date")) % 7
    base = ev.select(F.hour("ts").alias("h"), dow.alias("dow"))
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        F.sum(F.when(F.col("dow") == i, 1).otherwise(0)).alias(n)
        for i, n in enumerate(names)
    ]
    return base.groupBy("h").agg(*aggs).orderBy("h")

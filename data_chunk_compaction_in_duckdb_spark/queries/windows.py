"""Window functions — SURVEY.md §2.5.

Reference: physical_window.cpp (702 LoC, function dispatch :87-108) and the
sort-free streaming variant physical_streaming_window.cpp:55-80.  All 11
window functions + ROWS/RANGE frames + IGNORE NULLS, expressed with
pyspark Window specs.  Every ORDER BY carries a unique tiebreak column so
rank ties and frame contents are deterministic for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "win_ranking_family",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) AS BIGINT) AS prnk_e6,
           CAST(FLOOR(CUME_DIST()    OVER w * 1000000 + 0.5) AS BIGINT) AS cdist_e6,
           NTILE(4)       OVER w AS tile
    FROM orders
    WHERE o_totalprice > 400000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/percent_rank/cume_dist/ntile
    (expression_type.hpp:89-102).  percent_rank/cume_dist compare via
    FLOOR(x*1e6 + 0.5) — the integer scheme, NOT ROUND: (rank-1)/(n-1)
    generates exactly-representable decimal halves (k/640-class values)
    where Spark's HALF_UP and DuckDB's half-down double ROUND disagree;
    floor(x+0.5) is the same IEEE op on both engines (sf1 sweep find —
    3 of 300,604 rows at sf1, invisible at sf0.1 and below)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("prnk_e6"),
        F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("cdist_e6"),
        F.ntile(4).over(w).alias("tile"),
    )


@query(
    "win_lead_lag",
    oracle="""
    SELECT event_id,
           LAG(value, 1, -1.0)  OVER w AS prev_val,
           LEAD(value, 2)       OVER w AS next2_val,
           LAG(event_type)      OVER w AS prev_type
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with offsets and defaults."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.lag("value", 1, -1.0).over(w).alias("prev_val"),
        F.lead("value", 2).over(w).alias("next2_val"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey)  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_part,
           NTH_VALUE(l_partkey, 2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS second_part
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with explicit full-partition
    frames (last_value's default frame ends at CURRENT ROW in both
    engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(wfull).alias("last_part"),
        F.nth_value("l_partkey", 2).over(wfull).alias("second_part"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           LAST_VALUE(big_part IGNORE NULLS) OVER w AS last_big_part
    FROM (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_partkey % 3 = 0 THEN l_partkey END AS big_part
      FROM lineitem WHERE l_orderkey % 100 = 0
    ) t
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS gap-fill — the classic last-observation-carried-forward."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_partkey") % 3 == 0, F.col("l_partkey")).alias("big_part"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.last("big_part", ignorenulls=True).over(w).alias("last_big_part"),
    )


@query(
    "win_frame_rows_moving",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
    FROM events
    WHERE user_id <= 30
    """,
)
def win_frame_rows_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame moving aggregate (window_expression.hpp:16-26 frame
    types)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("mov_sum"),
        F.round(F.avg("value").over(w), 6).alias("mov_avg"),
        F.count("*").over(w).alias("mov_n"),
    )


@query(
    "win_frame_range_value",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER w AS n_near,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                AS BIGINT) / 100.0 AS sum_near
    FROM orders
    WHERE o_totalprice > 450000
    WINDOW w AS (ORDER BY o_totalprice
                 RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
    """,
)
def win_frame_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame over a numeric ORDER BY key — the
    SCALE-SAFE form.  Two problems with ``Window.orderBy(v).rangeBetween``:
    it funnels all rows through one task, and Spark re-evaluates sliding
    aggregate frames from scratch per row (O(rows × frame_rows); measured
    5.7 s at sf0.1 vs DuckDB's segment tree).  Rewrite as a distributed
    PREFIX SUM: emit each row once as a weighted contributor and twice as
    zero-weight boundary probes at v±5000 (lo probe sorts before equal-
    valued contributors → inclusive lower bound; hi probe after →
    inclusive upper), range-repartition by (value, kind), cumulative-sum
    within each partition with a ROWS frame (O(n)), add broadcast
    per-partition offsets, and finish with frame = hi_cum − lo_cum.
    Every stage is shuffle-parallel and linear; sums are exact integer
    cents."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000
    )
    v = F.col("o_totalprice")
    base = orders.select(
        "o_orderkey",
        v.alias("v"),
        F.round(v * 100).cast("long").alias("v_c"),
    )
    key_t = dict(base.dtypes)["o_orderkey"]
    contrib = base.select(
        F.col("v").alias("sv"),
        F.lit(0).alias("kind"),
        "v_c",
        F.lit(None).cast(key_t).alias("o_orderkey"),
    )
    lo = base.select(
        (F.col("v") - 5000).alias("sv"),
        F.lit(-1).alias("kind"),
        F.lit(0).cast("long").alias("v_c"),
        "o_orderkey",
    )
    hi = base.select(
        (F.col("v") + 5000).alias("sv"),
        F.lit(1).alias("kind"),
        F.lit(0).cast("long").alias("v_c"),
        "o_orderkey",
    )
    # Scale-adaptive partition count (NOT a constant tuned to one box):
    # one range partition per scheduler slot.  The result is partition-
    # count independent — pids only index the offset table — so any
    # cluster size computes the same rows.
    n_parts = spark.sparkContext.defaultParallelism
    u = (
        contrib.unionByName(lo)
        .unionByName(hi)
        .repartitionByRange(n_parts, "sv", "kind")
        .withColumn("pid", F.spark_partition_id())
        # REQUIRED for correctness, not a perf cache: lcum (window) and
        # the per-partition totals both consume this subtree, and without
        # materialization each job re-executes repartitionByRange, whose
        # runtime pid assignment need not match across jobs — offsets
        # then belong to a different partitioning than the local cumsums
        # (observed at sf0.1: every row wrong by ~1-3%).  Persisting pins
        # one partitioning; the stream is 3n narrow rows, spill-safe.
        .persist()
    )
    is_row = F.when(F.col("kind") == 0, F.lit(1)).otherwise(F.lit(0))
    wloc = (
        Window.partitionBy("pid")
        .orderBy("sv", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("lcum_s", F.sum("v_c").over(wloc)).withColumn(
        "lcum_n", F.sum(is_row).over(wloc)
    )
    # exclusive running offsets over the (tiny) per-partition totals
    tot = u.groupBy("pid").agg(
        F.sum("v_c").alias("ts"), F.sum(is_row).alias("tn")
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "pid",
        F.coalesce(F.sum("ts").over(woff), F.lit(0)).alias("os"),
        F.coalesce(F.sum("tn").over(woff), F.lit(0)).alias("on"),
    )
    probes = (
        u.filter(F.col("kind") != 0)
        .join(F.broadcast(off), "pid")
        .select(
            "o_orderkey",
            "kind",
            (F.col("lcum_s") + F.col("os")).alias("cum_s"),
            (F.col("lcum_n") + F.col("on")).alias("cum_n"),
        )
    )
    k_hi = F.when(F.col("kind") == 1, F.col("cum_n"))
    k_lo = F.when(F.col("kind") == -1, F.col("cum_n"))
    s_hi = F.when(F.col("kind") == 1, F.col("cum_s"))
    s_lo = F.when(F.col("kind") == -1, F.col("cum_s"))
    return probes.groupBy("o_orderkey").agg(
        (F.max(k_hi) - F.max(k_lo)).alias("n_near"),
        ((F.max(s_hi) - F.max(s_lo)) / F.lit(100.0)).alias("sum_near"),
    )


@query(
    "win_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey), 2) AS running_spend,
           MIN(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS running_min,
           MAX(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS running_max
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def win_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates — the streaming-window fast path
    (physical_streaming_window.cpp:55-80: computable without a full sort
    buffer)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.min("o_totalprice").over(w).alias("running_min"),
        F.max("o_totalprice").over(w).alias("running_max"),
    )


@query(
    "win_agg_whole_partition",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey), 6)
             AS qty_share,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 25 = 0
    """,
)
def win_agg_whole_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered whole-partition window aggregate (share-of-total)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 25 == 0)
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / F.sum("l_quantity").over(w), 6).alias(
            "qty_share"
        ),
        F.count("*").over(w).alias("n_lines"),
    )


@query(
    "win_qualify_rewrite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
    QUALIFY rnk <= 2
    """,
)
def win_qualify_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY clause (DuckDB window-filter sugar; binder rewrites it to
    a filter over the windowed subquery) — Spark has no QUALIFY, so the
    engine-side form IS the rewrite: window then filter.  Same single
    shuffle on the partition key either way."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", F.rank().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 2)
    )


_QUALIFY_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 2 = 0
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    ORDER BY o_custkey, o_orderkey
    LIMIT 500
    """


@query("win_qualify_sql", oracle=_QUALIFY_SQL)
def win_qualify_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY through the SQL entry point (dialect.rewrite_qualify;
    reference test/sql/qualify/): the engine accepts DuckDB's QUALIFY
    text VERBATIM — the oracle string IS the engine input — covering an
    inline window function in the predicate, a WHERE ahead of it and an
    ORDER BY/LIMIT tail behind it.  Spark has no QUALIFY clause, so the
    rewrite (filter column over the windowed pre-filter result, then
    drop) is the binder step DuckDB performs natively."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(_QUALIFY_SQL)

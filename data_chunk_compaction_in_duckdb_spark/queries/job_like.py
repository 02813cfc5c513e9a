"""JOB-style join-order stress query (reference benchmark/imdb/, 113 JOB
queries run by imdb_main.cpp:63-76): one deep multi-join with selective
predicates on several dimensions and two roles for the same table —
the plan-quality case the reference's chunk-factor instrumentation was
built around (fragmented probe outputs between consecutive joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query
from data_chunk_compaction_in_duckdb_spark.queries.relational import _REV_SQL, _rev


@query(
    "job_like_deep_join",
    oracle=f"""
    SELECT p_brand, sn.n_name AS n_name,
           COUNT(*) AS n,
           {_REV_SQL} AS revenue,
           COUNT(DISTINCT o_custkey) AS n_custs
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN part      ON l_partkey = p_partkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    WHERE p_size BETWEEN 5 AND 30
      AND p_type IN ('PROMO', 'STANDARD', 'ECONOMY')
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND l_quantity > 10
      AND r_regionkey < 4
      AND sn.n_regionkey <> cn.n_regionkey
    GROUP BY p_brand, sn.n_name
    """,
)
def job_like_deep_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way join with per-dimension selective filters and a self-joined
    dimension (nation in two roles) — the JOB query shape.  Every
    dimension broadcast; only the fact table streams; the chunk-factor
    fragmentation the reference measures between probe pipelines
    (HashJoinProfiler, profiler.hpp:335-432) maps to AQE's post-filter
    partition coalescing here."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 10)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(5, 30)
        & F.col("p_type").isin("PROMO", "STANDARD", "ECONOMY")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") < 4)
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("n_name"),
        F.col("n_regionkey").alias("sn_region"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .filter(F.col("sn_region") != F.col("cn_region"))
        .groupBy("p_brand", "n_name")
        .agg(
            F.count("*").alias("n"),
            _rev().alias("revenue"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


@query(
    "job_like_late_filter_chain",
    oracle=f"""
    SELECT r_name, o_orderpriority,
           COUNT(*) AS n, {_REV_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_extendedprice * (1 - l_discount) > 9.5 * l_quantity * 100
    GROUP BY r_name, o_orderpriority
    """,
)
def job_like_late_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain join with a cross-column predicate that cannot be pushed
    into any single scan — the intermediate stays full-width until the
    filter, the worst chunk-fragmentation case the reference's
    compaction targets (CompactingPhysicalOperator,
    physical_operator.hpp:221-245).  In Spark the analog is AQE
    coalescing the post-filter partitions before the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            > 9.5 * F.col("l_quantity") * 100
        )
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count("*").alias("n"), _rev().alias("revenue"))
    )


@query(
    "job_like_funnel_self_join",
    oracle="""
    SELECT s.user_id, COUNT(*) AS n_conversions,
           CAST(MIN(datediff('second', s.ts, p.ts)) AS BIGINT) AS fastest_sec
    FROM events s
    JOIN events p ON s.user_id = p.user_id
                 AND s.event_type = 'signup' AND p.event_type = 'purchase'
                 AND p.ts > s.ts
    GROUP BY s.user_id
    """,
)
def job_like_funnel_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-table two-role join (the JOB pattern of one table under
    several aliases) as a signup→purchase funnel: equi-join on user plus
    a range predicate on time.  One shuffle on user_id serves the join
    and the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts").alias("s_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        s.join(p, (s.user_id == p.p_user) & (p.p_ts > s.s_ts))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_conversions"),
            # DuckDB datediff('second') counts second-BOUNDARY crossings,
            # so truncate both sides before the TZ-independent timestampdiff
            # (never unix_timestamp on NTZ — session-TZ dependent).
            F.min(
                F.expr(
                    "timestampdiff(SECOND, date_trunc('second', s_ts),"
                    " date_trunc('second', p_ts))"
                ).cast("long")
            ).alias("fastest_sec"),
        )
    )


@query(
    "job_like_min_agg_star",
    oracle="""
    SELECT MIN(p_name) AS min_part, MIN(s_name) AS min_supp,
           CAST(MIN(o_orderdate) AS DATE) AS min_date,
           COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type LIKE '%BRASS' AND o_orderpriority LIKE '1-%'
      AND n_name LIKE 'U%' AND s_name NOT LIKE '%9%'
    """,
)
def job_like_min_agg_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB result shape: every IMDB/JOB query ends in MIN() over a
    LIKE-filtered dimension star (benchmark/imdb_plan_cost/queries/*.sql).
    The filtered dimensions shrink below the broadcast threshold, so the
    plan is fact-scan + three broadcast hash joins + a single-row partial
    aggregate — no fact-side shuffle at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("%BRASS"))
    s = load_table(spark, sf_dir, "supplier").filter(
        ~F.col("s_name").like("%9%")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1-%")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").like("U%"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
            F.count("*").alias("n"),
        )
    )

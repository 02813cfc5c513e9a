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
    dimension (nation in two roles) — the JOB query shape.  Bounded
    dimensions (supplier/part/nation/region) broadcast; orders and
    customer are fact-scale, so their join strategy is left to AQE
    (broadcast at small SF, shuffle at 100 TB); the chunk-factor
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
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
    WHERE p_type LIKE '%DARD' AND o_orderpriority LIKE '1-%'
      AND n_name LIKE 'NATION_1%' AND s_name NOT LIKE '%9%'
    """,
)
def job_like_min_agg_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB result shape: every IMDB/JOB query ends in MIN() over a
    LIKE-filtered dimension star (benchmark/imdb_plan_cost/queries/*.sql).
    The filtered dimensions shrink below the broadcast threshold, so the
    plan is fact-scan + three broadcast hash joins + a single-row partial
    aggregate — no fact-side shuffle at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("%DARD"))
    s = load_table(spark, sf_dir, "supplier").filter(
        ~F.col("s_name").like("%9%")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1-%")
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
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


# ---------------------------------------------------------------------------
# Round-2 widening: 11 more JOB shapes mirroring the reference's
# benchmark/imdb_plan_cost/queries corpus (113 .sql files, run by
# imdb_main.cpp:63-76) — deep left-deep chains, same-table multiple
# roles, cyclic equi-predicate triangles, IN/LIKE-heavy dimension
# filters, and the universal MIN(...) result shape.  All aggregate
# outputs are MIN over strings/dates/ints or COUNT, so the driver's
# value-hash is exact with no float scheme needed.
# ---------------------------------------------------------------------------


@query(
    "job_like_9way_snowflake",
    oracle="""
    SELECT MIN(c_name) AS min_cust, MIN(s_name) AS min_supp,
           MIN(p_name) AS min_part, COUNT(*) AS n
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    JOIN part      ON l_partkey = p_partkey
    WHERE cr.r_name = 'ASIA' AND sr.r_name IN ('EUROPE', 'AMERICA')
      AND p_size < 25 AND o_orderstatus = 'F'
    """,
)
def job_like_9way_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """9-way snowflake (the 19d/10-relation JOB depth): fact + two full
    dimension chains (customer→nation→region, supplier→nation→region) +
    part.  All six dimension sides are bounded (nation/region fixed-size;
    part filtered) → broadcast; orders joins by shuffle/AQE choice — the
    left-deep plan JOB stresses."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 25)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cn = nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("sn_region"))
    cr = reg.filter(F.col("r_name") == "ASIA").select(F.col("r_regionkey").alias("cr_key"))
    sr = reg.filter(F.col("r_name").isin("EUROPE", "AMERICA")).select(
        F.col("r_regionkey").alias("sr_key")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(cr), F.col("cn_region") == F.col("cr_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(sr), F.col("sn_region") == F.col("sr_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.min("c_name").alias("min_cust"),
            F.min("s_name").alias("min_supp"),
            F.min("p_name").alias("min_part"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_cyclic_triangle",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(MIN(l1.l_shipdate) AS DATE) AS first_ship,
           CAST(MIN(l2.l_shipdate) AS DATE) AS first_ret_ship
    FROM lineitem l1
    JOIN orders   ON l1.l_orderkey = o_orderkey
    JOIN lineitem l2 ON l2.l_orderkey = o_orderkey
                    AND l1.l_orderkey = l2.l_orderkey
                    AND l1.l_linenumber < l2.l_linenumber
    WHERE l2.l_returnflag = 'R' AND o_orderpriority = '1-URGENT'
    """,
)
def job_like_cyclic_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic equi-predicate triangle (JOB's mc.movie_id = ci.movie_id =
    mi.movie_id redundancy): lineitem twice + orders, all three pairwise
    join predicates present.  Catalyst dedups the redundant edge; one
    shuffle on orderkey co-locates all three sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l1 = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("ln1"),
        F.col("l_shipdate").alias("ship1"),
    )
    l2 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_linenumber").alias("ln2"),
        F.col("l_shipdate").alias("ship2"),
    )
    return (
        l1.join(o, F.col("k1") == o.o_orderkey)
        .join(
            l2,
            (F.col("k2") == o.o_orderkey)
            & (F.col("k1") == F.col("k2"))
            & (F.col("ln1") < F.col("ln2")),
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("ship1").cast("date")).alias("first_ship"),
            F.min(F.col("ship2").cast("date")).alias("first_ret_ship"),
        )
    )


@query(
    "job_like_in_list_dims",
    oracle="""
    SELECT MIN(p_name) AS min_part, MIN(n_name) AS min_nation, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#3', 'Brand#24')
      AND n_name IN ('NATION_5', 'NATION_6', 'NATION_14', 'NATION_21')
      AND l_quantity BETWEEN 5 AND 45
    """,
)
def job_like_in_list_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list dimension filters (JOB's ci.note IN (...) pattern): two
    multi-value IN lists shrink part and nation; both broadcast, the fact
    table never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(5, 45)
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#3", "Brand#24")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_14", "NATION_21")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("n_name").alias("min_nation"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_two_fact_roles",
    oracle="""
    SELECT COUNT(*) AS n, MIN(o_orderpriority) AS min_prio
    FROM lineitem lr
    JOIN lineitem lf ON lr.l_orderkey = lf.l_orderkey
                    AND lr.l_linenumber <> lf.l_linenumber
    JOIN orders ON o_orderkey = lr.l_orderkey
    WHERE lr.l_returnflag = 'R' AND lf.l_linestatus = 'F'
    """,
)
def job_like_two_fact_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fact table in two differently-filtered roles (JOB joins
    cast_info twice under different notes): both roles shuffle on the
    shared orderkey, so the whole 3-way join is one co-partitioned
    stage."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lr = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("kr"), F.col("l_linenumber").alias("lnr")
    )
    lf = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("kf"), F.col("l_linenumber").alias("lnf")
    )
    return (
        o.join(lr, F.col("kr") == o.o_orderkey)
        .join(lf, F.col("kf") == o.o_orderkey)
        .filter(F.col("lnr") != F.col("lnf"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderpriority").alias("min_prio"),
        )
    )


@query(
    "job_like_semi_reduce",
    oracle="""
    SELECT MIN(c_name) AS min_cust, COUNT(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """,
)
def job_like_semi_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction before the dimension join (JOB's subquery-free
    equivalent: the planner reduces the fact side first).  LEFT SEMI join
    on orderkey, then the customer join — the semi output is the smaller
    side."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    hi = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(hi, o.o_orderkey == hi.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .agg(F.min("c_name").alias("min_cust"), F.count("*").alias("n"))
    )


@query(
    "job_like_anti_exists",
    oracle="""
    SELECT n_name, COUNT(*) AS n_clean_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY n_name
    """,
)
def job_like_anti_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against a second fact role (orders with NO returned
    line): LEFT ANTI on orderkey, then dimension joins and a group-by —
    the negated-EXISTS JOB variant."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ret = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_anti")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_clean_orders"))
    )


@query(
    "job_like_like_or_chain",
    oracle="""
    SELECT MIN(p_name) AS min_part, MIN(p_brand) AS min_brand, COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE (p_name LIKE '%ol%' OR p_name LIKE '%gre%' OR p_name LIKE 'sm%')
      AND s_name LIKE 'Supplier#00000%'
      AND p_type NOT LIKE '%LARGE%'
    """,
)
def job_like_like_or_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-LIKEs dimension predicate (JOB's t.title LIKE ... OR ...):
    non-sargable for pushdown stats but still a dimension-side filter —
    broadcast both filtered dims, fact never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (
            F.col("p_name").like("%ol%")
            | F.col("p_name").like("%gre%")
            | F.col("p_name").like("sm%")
        )
        & ~F.col("p_type").like("%LARGE%")
    )
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("Supplier#00000%")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("p_brand").alias("min_brand"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_dim_cross_predicate",
    oracle="""
    SELECT n_name, COUNT(*) AS n
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation    ON c_nationkey = n_nationkey
    WHERE c_nationkey = s_nationkey
      AND o_orderstatus = 'F'
    GROUP BY n_name
    """,
)
def job_like_dim_cross_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dimension equality predicate (JOB's chn.id = ci.person_role_id
    shape): customer and supplier must share a nation — a predicate
    BETWEEN two joined dimensions, applied post-join; TPC-H q7's local
    variant."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )


@query(
    "job_like_dim_only_selectivity",
    oracle="""
    SELECT MIN(c_name) AS min_cust, CAST(MIN(o_orderdate) AS DATE) AS min_date,
           COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE p_brand = 'Brand#3' AND n_name = 'NATION_7'
    """,
)
def job_like_dim_only_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All selectivity from tiny dimension point-filters, zero fact
    predicates (most JOB queries): the plan quality question is purely
    join order — reduce by part and nation before the wide joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("c_name").alias("min_cust"),
            F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_fact_dim_fact_chain",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, MIN(s_name) AS min_supp
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE n_name LIKE 'NATION_2%' AND l_shipdate >= DATE '1995-01-01'
      AND o_totalprice > 50000
    GROUP BY o_orderpriority
    """,
)
def job_like_fact_dim_fact_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternating fact-dim-fact left-deep chain: the dimension join sits
    BETWEEN two fact joins, so the intermediate carries dimension columns
    through the second shuffle — the chunk-fragmentation case the
    reference's compaction instrumentation profiles between consecutive
    probes (HashJoinProfiler)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1995-01-01"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_2%")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.min("s_name").alias("min_supp"))
    )


@query(
    "job_like_events_fact_bridge",
    oracle="""
    SELECT e.event_type, COUNT(*) AS n, MIN(c_name) AS min_cust
    FROM events e
    JOIN customer ON e.user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_11', 'NATION_19') AND e.value > 50
    GROUP BY e.event_type
    """,
)
def job_like_events_fact_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second fact family (events) bridged to the TPC-H dimensions via
    user_id=custkey — the heterogeneous-schema join JOB exercises with
    aka_name/name.  Customer shuffles; nation broadcast."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 50)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_11", "NATION_19")
    )
    return (
        e.join(c, e.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("c_name").alias("min_cust"))
    )


@query(
    "job_like_long_chain",
    oracle="""
    SELECT MIN(e.event_id) AS min_event, MIN(p_name) AS min_part,
           COUNT(*) AS n
    FROM events e
    JOIN customer ON e.user_id = c_custkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE e.event_type = 'purchase' AND p_size > 45
      AND n_name LIKE 'NATION_1%'
    """,
)
def job_like_long_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal left-deep CHAIN topology (vs the star shapes): events →
    customer → orders → lineitem → part/supplier/nation, each hop a
    different key — the reference's chunk-factor degradation compounds
    along exactly this kind of chain (each probe fragments the next
    pipeline's input).  Selective part/nation broadcast; the two
    custkey-keyed joins share one shuffle."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    return (
        e.join(c, e.user_id == c.c_custkey)
        .join(o, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("event_id").alias("min_event"),
            F.min("p_name").alias("min_part"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_disjunctive_dims",
    oracle="""
    SELECT COUNT(*) AS n, MIN(p_name) AS min_part, MIN(n_name) AS min_nation
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size < 5 OR n_name = 'NATION_9'
    """,
)
def job_like_disjunctive_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction ACROSS two different dimensions (JOB's t.year > x OR
    cn.code = y): neither branch can be pushed into its own dimension
    scan, so the filter must run post-join — the late-filter
    fragmentation case; both dims broadcast unfiltered."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter((F.col("p_size") < 5) | (F.col("n_name") == "NATION_9"))
        .agg(
            F.count("*").alias("n"),
            F.min("p_name").alias("min_part"),
            F.min("n_name").alias("min_nation"),
        )
    )


@query(
    "job_like_negated_filters",
    oracle="""
    SELECT MIN(s_name) AS min_supp, MIN(p_type) AS min_type, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type NOT LIKE '%SMALL%' AND p_type NOT LIKE '%PROMO%'
      AND n_name <> 'NATION_5' AND n_name <> 'NATION_6'
      AND l_returnflag <> 'R'
    """,
)
def job_like_negated_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation-heavy predicates (JOB's note NOT LIKE ... chains):
    low-selectivity NOT filters keep the dimensions large — the case
    where forcing a broadcast is only safe because part/supplier/nation
    are bounded relations, not because the filter shrinks them."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") != "R")
    p = load_table(spark, sf_dir, "part").filter(
        ~F.col("p_type").like("%SMALL%") & ~F.col("p_type").like("%PROMO%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        (F.col("n_name") != "NATION_5") & (F.col("n_name") != "NATION_6")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("s_name").alias("min_supp"),
            F.min("p_type").alias("min_type"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_distinct_pair_count",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(DISTINCT o_custkey) AS d_custs,
           MIN(o_orderpriority) AS min_prio
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 200000 AND l_quantity > 30
    """,
)
def job_like_distinct_pair_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) over a filtered join (JOB's result-shape
    cousin of MIN): Catalyst expands to a single Expand + two-phase
    distinct aggregate — one plan, three dedup streams."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.countDistinct("l_partkey").alias("d_parts"),
            F.countDistinct("l_suppkey").alias("d_supps"),
            F.countDistinct("o_custkey").alias("d_custs"),
            F.min("o_orderpriority").alias("min_prio"),
        )
    )


@query(
    "job_like_date_band_dims",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS y, n_name,
           COUNT(*) AS n, MIN(c_name) AS min_cust
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate BETWEEN DATE '1994-06-01' AND DATE '1996-05-31'
      AND c_acctbal > 0
    GROUP BY EXTRACT(YEAR FROM o_orderdate), n_name
    """,
)
def job_like_date_band_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-band fact filter + dimension attributes in the group key
    (JOB's production_year BETWEEN shape): the date band prunes the
    orders scan (PushedFilters), nation broadcasts, one shuffle for the
    two-key aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1994-06-01", "1996-05-31")
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("y"), F.col("n_name"))
        .agg(F.count("*").alias("n"), F.min("c_name").alias("min_cust"))
    )


@query(
    "job_like_four_dim_roles",
    oracle=f"""
    SELECT cr.r_name AS cust_region, sr.r_name AS supp_region,
           COUNT(*) AS n, {_REV_SQL} AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_regionkey <> sr.r_regionkey
      AND o_orderstatus = 'F'
      AND l_discount >= 0.05
    GROUP BY cr.r_name, sr.r_name
    """,
)
def job_like_four_dim_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB multi-role topology: TWO dimension tables each joined in TWO
    roles (customer/supplier nation, customer/supplier region) — the
    shape of JOB queries that alias company/info tables repeatedly
    (e.g. 11-family).  All four role joins broadcast the same two tiny
    tables; the inequality predicate between the two region roles runs
    post-join (it references both sides), like JOB's cross-alias
    filters."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.05)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("sn_reg")
    )
    cr = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("cr_key"), F.col("r_name").alias("cust_region")
    )
    sr = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("sr_key"), F.col("r_name").alias("supp_region")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cr), F.col("cn_reg") == F.col("cr_key"))
        .join(F.broadcast(sr), F.col("sn_reg") == F.col("sr_key"))
        .filter(F.col("cr_key") != F.col("sr_key"))
        .groupBy("cust_region", "supp_region")
        .agg(F.count("*").alias("n"), _rev().alias("revenue"))
    )


@query(
    "job_like_exists_two_hop",
    oracle="""
    SELECT p_type, COUNT(*) AS n_parts, MIN(p_retailprice) AS min_price
    FROM part
    WHERE p_size > 20
      AND EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_partkey = p_partkey
          AND o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY p_type
    """,
)
def job_like_exists_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB 2-hop EXISTS: the correlated subquery is itself a join
    (lineitem x orders), so the semi join's probe side is a reduced
    fact-fact join — JOB's movie_keyword/movie_info chains behind an
    EXISTS take this shape.  The output is the canonical JOB MIN()
    row per group.  The inner join reduces before the semi (urgent +
    date filters push to both scans); the dimension is the build side."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 20)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1999-01-01")
    )
    probe = li.join(o, li.l_orderkey == o.o_orderkey).select("l_partkey")
    return (
        part.join(probe, part.p_partkey == probe.l_partkey, "left_semi")
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
        )
    )


@query(
    "job_like_dense_transitive_star",
    oracle="""
    SELECT MIN(p_name) AS a_part, MIN(s_name) AS a_supplier,
           MIN(c_name) AS a_customer, COUNT(*) AS n
    FROM lineitem, orders, customer, supplier, part,
         nation cn, nation sn, region cr, region sr, events
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND c_nationkey = cn.n_nationkey
      AND s_nationkey = sn.n_nationkey
      AND cn.n_regionkey = cr.r_regionkey
      AND sn.n_regionkey = sr.r_regionkey
      AND user_id = c_custkey
      AND event_type = 'purchase'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND p_name LIKE '%a%'
      AND p_size BETWEEN 5 AND 40
      AND l_quantity > 25
      AND cr.r_regionkey < 4
    """,
)
def job_like_dense_transitive_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JOB 29a topology (queries/29a.sql: 17 relations, transitive
    equi-closure over movie_id, point + IN + LIKE + BETWEEN filters, MIN
    outputs) mapped to the fixture: 10 relations — fact, two bridges
    (orders, events), four dimension roles across two tables — with the
    canonical MIN() result row.  Catalyst prunes the redundant
    transitive predicates; dimensions broadcast, the two fact bridges
    shuffle on their own keys."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%a%") & F.col("p_size").between(5, 40)
    )
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("sn_reg")
    )
    cr = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") < 4).select(
        F.col("r_regionkey").alias("cr_key")
    )
    sr = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("sr_key")
    )
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cr), F.col("cn_reg") == F.col("cr_key"))
        .join(F.broadcast(sr), F.col("sn_reg") == F.col("sr_key"))
        .join(ev, cust.c_custkey == ev.user_id)
        .agg(
            F.min("p_name").alias("a_part"),
            F.min("s_name").alias("a_supplier"),
            F.min("c_name").alias("a_customer"),
            F.count("*").alias("n"),
        )
    )


@query(
    "job_like_linked_pair_subtrees",
    oracle="""
    SELECT c_custkey,
           MIN(o1.o_totalprice) AS first_price,
           MIN(o2.o_totalprice) AS second_price,
           COUNT(*) AS n_pairs
    FROM customer, orders o1, orders o2
    WHERE o1.o_custkey = c_custkey
      AND o2.o_custkey = c_custkey
      AND o1.o_orderstatus = 'F'
      AND o2.o_orderstatus = 'O'
      AND o1.o_totalprice > o2.o_totalprice
    GROUP BY c_custkey
    """,
)
def job_like_linked_pair_subtrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JOB 33a topology (queries/33a.sql: movie_link joins TWO full
    copies of the schema, with a cross-side comparison between the two
    sides' ratings): two role slices of the same fact joined through the
    shared hub (customer), plus the cross-side inequality
    (o1.price > o2.price, 33a's mi_idx1 < mi_idx2 analog).  Both role
    slices shuffle on custkey — one co-partitioned exchange each — and
    the inequality filters inside the join stage."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    o1 = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k1"), F.col("o_totalprice").alias("p1")
    )
    o2 = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k2"), F.col("o_totalprice").alias("p2")
    )
    return (
        cust.join(o1, cust.c_custkey == F.col("k1"))
        .join(o2, (cust.c_custkey == F.col("k2")) & (F.col("p1") > F.col("p2")))
        .groupBy("c_custkey")
        .agg(
            F.min("p1").alias("first_price"),
            F.min("p2").alias("second_price"),
            F.count("*").alias("n_pairs"),
        )
    )

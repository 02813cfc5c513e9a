"""Relational core: scans, projection/filter, joins, aggregation, sort/limit,
set ops, distinct, sampling — SURVEY.md §2.1–2.4, §2.6, §2.7.

Every query is the Spark-native expression of a reference physical operator
(file:line cites below each builder).  Aggregate/computed columns are rounded
and aliased identically in the Spark plan and the DuckDB oracle because the
driver value-hashes after sorting columns by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Exact-integer revenue arithmetic.  l_extendedprice has 2 decimals and
# l_discount/l_tax 2, so price*(1-disc) has exactly 4 — its float sum lands
# on a .xx50 rounding boundary in ~1% of groups, where Spark's and DuckDB's
# different summation orders flip the cent.  Worse, even on identical
# doubles ROUND differs: DuckDB rounds the binary value, Spark rounds the
# shortest decimal string (285207.03499999997 → .03 vs "285207.035" → .04).
# Therefore: sum exact integer (cents × percent) units, round to cents with
# INTEGER arithmetic ((units + 50) div 100), and make one final exact-input
# division — no ROUND on floats anywhere.  _REV_SQL/_rev() and
# _CHARGE_SQL/_charge() are the same formula for the oracle and the Spark
# plan.
_REV_UNITS_SQL = (
    "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
)
_REV_SQL = f"CAST(({_REV_UNITS_SQL} + 50) // 100 AS BIGINT) / 100.0"
_CHARGE_UNITS_SQL = (
    "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
    " * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))"
)
_CHARGE_SQL = f"CAST(({_CHARGE_UNITS_SQL} + 5000) // 10000 AS BIGINT) / 100.0"


def _cents(col: str) -> "F.Column":
    return F.round(F.col(col) * 100).cast("long")


def _units_to_dollars(total_units: "F.Column", unit_per_cent: int) -> "F.Column":
    """Half-up integer rounding to cents, then one exact division to
    dollars.  (x - x % d) / d is an exact long division (x < 2^53)."""
    half = unit_per_cent // 2
    t = total_units + F.lit(half).cast("long")
    cents = ((t - t % unit_per_cent) / unit_per_cent).cast("long")
    return cents / F.lit(100.0)


def _rev() -> "F.Column":
    units = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return _units_to_dollars(F.sum(units), 100)


def _charge() -> "F.Column":
    units = (
        _cents("l_extendedprice")
        * (F.lit(100) - _cents("l_discount"))
        * (F.lit(100) + _cents("l_tax"))
    )
    return _units_to_dollars(F.sum(units), 10000)


# ---------------------------------------------------------------------------
# Scans / projection / filter  (§2.1, §2.2)
# ---------------------------------------------------------------------------


@query(
    "scan_projection_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) + 50) // 100
                AS BIGINT) / 100.0 AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate <  TIMESTAMP '2000-02-01'
    """,
)
def scan_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE_SCAN + PROJECTION + FILTER (physical_table_scan.cpp,
    physical_projection.cpp:80, physical_filter.cpp:62).  Projection and
    predicate push down to the parquet scan — verify with
    .explain(): PushedFilters + ReadSchema."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2000-02-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            # Per-row integer cent arithmetic — see _rev() note: rounding
            # floats with exactly-4-decimal values is engine-divergent.
            _units_to_dollars(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                100,
            ).alias("disc_price"),
        )
    )


@query(
    "filter_selective_compaction_point",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_quantity <= 2 AND l_discount >= 0.09
    """,
)
def filter_selective_compaction_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective FILTER — the reference's canonical chunk-fragmentation
    site (physical_filter.hpp:19 subclasses CompactingPhysicalOperator).  In
    Spark the analog is AQE coalescing the post-filter partitions."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") <= 2) & (F.col("l_discount") >= 0.09)).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped flagship queries (reference benchmark/tpch/sf1/*.benchmark)
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           {_REV_SQL} AS sum_disc_price,
           {_CHARGE_SQL} AS sum_charge,
           ROUND(AVG(l_quantity), 6)      AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6)      AS avg_disc,
           COUNT(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH_GROUP_BY with 8 aggregates (physical_hash_aggregate.cpp:876;
    TPC-H Q1 shape, benchmark/tpch/sf1/q01.benchmark)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _rev().alias("sum_disc_price"),
            _charge().alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV_SQL} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: chained HASH_JOINs + selective filters + HASH_GROUP_BY +
    TOP_N in one pipeline — the same operator chain as the reference's
    chained-join microbenchmark (vector_compaction.cpp:83-91) and TPC-H Q3.
    orders/customer are fact-scale: no forced broadcast — AQE picks
    broadcast when the filtered side fits, shuffle-hash at scale."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1999-01-01")
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_REV_SQL} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join star (TPC-H Q5): the bushy-plan stress case the
    reference's BushyOrderOptimizer targets (bushy_order_optimizer.cpp:7-44).
    Spark: broadcast the bounded dimensions (supplier/nation/region);
    orders/customer join by AQE's choice — they scale with SF."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_rev().alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND(l_discount * 100) AS BIGINT)) + 50) // 100
                AS BIGINT) / 100.0
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNGROUPED_AGGREGATE over a multi-predicate scan
    (physical_ungrouped_aggregate.cpp:633; TPC-H Q6).  All four predicates
    push to parquet row-group pruning."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(
        _units_to_dollars(
            F.sum(_cents("l_extendedprice") * _cents("l_discount")), 100
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Joins  (§2.3) — HASH_JOIN inner/left/right/full/semi/anti + CROSS_PRODUCT
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner HASH_JOIN (physical_hash_join.cpp:497-552 probe path); small
    dimension side broadcast."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = _t(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")


@query(
    "join_left_outer",
    oracle="""
    SELECT n_nationkey, n_name, c_custkey
    FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9900) c
      ON n_nationkey = c.c_nationkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join — unmatched probe rows null-padded
    (join_hashtable.cpp:403-432 join-type dispatch)."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left").select(
        "n_nationkey", "n_name", "c_custkey"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_nationkey, n_name, c_custkey
    FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c
         RIGHT JOIN nation ON c.c_nationkey = n_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join — unmatched build rows emitted in the reference's
    source phase (physical_hash_join.cpp:944, outer_join_marker.cpp)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    nation = _t(spark, sf_dir, "nation")
    return cust.join(nation, cust.c_nationkey == nation.n_nationkey, "right").select(
        "n_nationkey", "n_name", "c_custkey"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT lo.okey AS okey_low, hi.okey AS okey_high, COALESCE(lo.ct, 0) AS ct_low,
           COALESCE(hi.ct, 0) AS ct_high
    FROM (SELECT o_custkey AS okey, COUNT(*) AS ct FROM orders
          WHERE o_totalprice < 30000 GROUP BY o_custkey) lo
    FULL JOIN (SELECT o_custkey AS okey, COUNT(*) AS ct FROM orders
          WHERE o_totalprice > 400000 GROUP BY o_custkey) hi
      ON lo.okey = hi.okey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two disjoint aggregates — exercises null padding on
    both sides."""
    orders = _t(spark, sf_dir, "orders")
    lo = (
        orders.filter(F.col("o_totalprice") < 30000)
        .groupBy(F.col("o_custkey").alias("okey"))
        .agg(F.count("*").alias("ct"))
    )
    hi = (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy(F.col("o_custkey").alias("okey"))
        .agg(F.count("*").alias("ct"))
    )
    return lo.join(hi, lo.okey == hi.okey, "full").select(
        lo.okey.alias("okey_low"),
        hi.okey.alias("okey_high"),
        F.coalesce(lo.ct, F.lit(0)).alias("ct_low"),
        F.coalesce(hi.ct, F.lit(0)).alias("ct_high"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI join = EXISTS (join_hashtable.cpp semi path; ≤1 output per probe
    chunk, the no-compaction case noted at join_hashtable.cpp:406-429)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "join_anti",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate < TIMESTAMP '1996-01-01')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTI join = NOT EXISTS."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "1996-01-01")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


@query(
    "join_cross_product",
    oracle="""
    SELECT r_name, s.status
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    """,
)
def join_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS_PRODUCT (physical_cross_product.cpp:146, a
    CompactingPhysicalOperator subclass)."""
    region = _t(spark, sf_dir, "region")
    status = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return region.crossJoin(status).select("r_name", "status")


@query(
    "join_nonequi_nested_loop",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS richer_customers
    FROM supplier JOIN customer ON c_acctbal > s_acctbal
    GROUP BY s_suppkey
    """,
)
def join_nonequi_nested_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED_LOOP / BLOCKWISE_NL join: single inequality predicate
    (physical_nested_loop_join.cpp:466, plan_comparison_join.cpp:300-335).
    Catalyst plans BroadcastNestedLoopJoin with the 10-row side broadcast."""
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(supp, cust.c_acctbal > supp.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("richer_customers"))
    )


# ---------------------------------------------------------------------------
# Aggregation  (§2.4)
# ---------------------------------------------------------------------------


@query(
    "agg_ungrouped_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           ROUND(AVG(l_discount), 6) AS avg_disc
    FROM lineitem
    """,
)
def agg_ungrouped_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNGROUPED_AGGREGATE with a distinct aggregate
    (physical_ungrouped_aggregate.cpp:633, distinct_aggregate_data.cpp)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@query(
    "agg_groupby_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH_GROUP_BY + HAVING (post-aggregation filter)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev,
           COUNT(*) AS n_all
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg(x) FILTER (WHERE p) (bind_aggregate_expression.cpp) →
    conditional aggregation via when()."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
        ).alias("disc_rev"),
        F.count("*").alias("n_all"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via ROLLUP — the reference runs one radix HT per
    grouping set (physical_hash_aggregate.cpp:116-131)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() marker columns."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           ROUND(SUM(DISTINCT l_quantity), 2) AS d_qty_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates per group (distinct_aggregate_data.cpp:216
    — per-aggregate dedup hash tables; Spark plans Expand + two-phase agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("d_qty_sum"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-n / sample  (§2.6)
# ---------------------------------------------------------------------------


@query(
    "order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER_BY + LIMIT/OFFSET (physical_order.cpp:282, physical_limit.cpp:226).
    Catalyst rewrites to TakeOrderedAndProject — the TOP_N optimizer analog
    (topn_optimizer.cpp:31)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "limit_percent",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT CAST(CEIL((SELECT COUNT(*) FROM orders) * 0.01) AS BIGINT)
    """,
)
def limit_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT x% (physical_limit_percent.cpp:142) — two-pass: count then
    limit.  The count is a cheap metadata-only parquet scan."""
    orders = _t(spark, sf_dir, "orders")
    n = orders.count()
    k = int(-(-n * 0.01 // 1))  # ceil
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (l_orderkey * 2654435761) % 100 < 7
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEM/BERNOULLI sampling (physical_streaming_sample.cpp:75) expressed
    as a deterministic multiplicative-hash predicate so the oracle hash
    matches; df.sample() covers the nondeterministic reservoir variant
    (physical_reservoir_sample.cpp:73) in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") * 2654435761) % 100 < 7).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) t WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — TOP_N (physical_top_n.cpp:516) generalized with a
    window; Spark runs a partial top-K under AQE before the shuffle."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Set operations & distinct  (§2.7)
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (physical_union.cpp:67) — pipeline concatenation, no
    shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    supp = _t(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").alias("nkey")).unionAll(
        supp.select(F.col("s_nationkey").alias("nkey"))
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union + hash-aggregate dedup
    (plan_set_operation.cpp)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nkey"))
        .union(supp.select(F.col("s_nationkey").alias("nkey")))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — planned as SEMI join over all columns in the reference
    (plan_set_operation.cpp:25-39)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").alias("nkey")).intersect(
        supp.select(F.col("s_nationkey").alias("nkey"))
    )


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nkey FROM supplier WHERE s_nationkey < 20
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — planned as ANTI join over all columns
    (plan_set_operation.cpp:25-39).  The right side is key-bounded so
    the difference is non-empty (every nation has suppliers in this
    fixture; an unrestricted EXCEPT verified only the empty case)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 20)
    return cust.select(F.col("c_nationkey").alias("nkey")).subtract(
        supp.select(F.col("s_nationkey").alias("nkey"))
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_orderstatus AS st FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT o_orderstatus AS st FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderstatus").alias("st")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("st")
    )
    return a.intersectAll(b)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate over all columns (plan_distinct.cpp:52-76)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "distinct_on_first_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def distinct_on_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (key) — reference plans it via the FIRST aggregate
    (plan_distinct.cpp:52-76); here the deterministic row_number()=1 form."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_order"),
            F.col("o_totalprice").alias("top_price"),
        )
    )


@query(
    "cte_reused",
    oracle="""
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n FROM orders
      WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT a.o_custkey, a.n, b.n AS n2
    FROM big a JOIN big b ON a.o_custkey = b.o_custkey
    WHERE a.n >= 3
    """,
)
def cte_reused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE referenced twice (physical_cte.cpp:160 materialized-CTE analog:
    persist the DataFrame so the subtree runs once)."""
    orders = _t(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    a, b = big.alias("a"), big.alias("b")
    return (
        a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"))
        .filter(F.col("a.n") >= 3)
        .select(F.col("a.o_custkey").alias("o_custkey"), F.col("a.n").alias("n"), F.col("b.n").alias("n2"))
    )

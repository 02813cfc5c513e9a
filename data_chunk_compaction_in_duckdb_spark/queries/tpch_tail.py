"""TPC-H tail: q9/q11/q13/q15/q17/q20 shapes, completing the 22-query
corpus (reference benchmark/tpch/sf1/*.benchmark) on the fixture star
schema (no partsupp: lineitem carries the part–supplier link; supply cost
is modeled as 60% of p_retailprice).

New operator patterns over tpch_more.py: multi-fact profit arithmetic
with mixed-unit integer money (q9), grouped HAVING against an ungrouped
scalar total (q11), two-level aggregation over a conditional outer join
(q13), groupwise-max via scalar subquery (q15), correlated per-group
average threshold (q17), and a HAVING semi-join chain (q20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query
from data_chunk_compaction_in_duckdb_spark.queries.relational import (
    _REV_UNITS_SQL,
    _cents,
    _units_to_dollars,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(((s + 500) - ((s + 500) % 1000)) // 1000 AS BIGINT) / 100.0
             AS sum_profit
    FROM (
      SELECT n_name AS nation, year(l_shipdate) AS o_year,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) * 10
               - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                 * CAST(ROUND(l_quantity * 100) AS BIGINT) * 6) AS s
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY n_name, year(l_shipdate)
    ) per
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit = revenue − supply cost (0.6·retail), by supplier
    nation × ship year.  Money in 1e-5-dollar integer units so the mixed
    products (price×discount vs retail×quantity) stay exact; the oracle
    mirrors Spark's truncating ``%`` so negative groups round identically
    (reference benchmark/tpch/sf1/q09)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit_u = (
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")) * 10
        - _cents("p_retailprice") * _cents("l_quantity") * 6
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(_units_to_dollars(F.sum(profit_u), 1000).alias("sum_profit"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: two-level aggregation over a filtered LEFT OUTER join —
    COUNT(col) must not count the null-extended rows (reference
    benchmark/tpch/sf1/q13)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {_REV_UNITS_SQL} AS r_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST((r_u + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE r_u = (SELECT MAX(r_u) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: groupwise max via scalar subquery over a derived revenue
    view; ties all surface, max compared on raw integer units before any
    rounding (reference benchmark/tpch/sf1/q15)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    units = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.sum(units).alias("r_u"))
    best = rev.agg(F.max("r_u").alias("best_u"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("r_u") == F.col("best_u"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _units_to_dollars(F.col("r_u") + F.lit(0), 100).alias("total_revenue"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq_c,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) stats ON pk = l_partkey
    WHERE p_brand = 'Brand#12'
      AND 5 * CAST(ROUND(l_quantity * 100) AS BIGINT) * cnt < sq_c
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: rows below 20% of their part's average quantity — the
    correlated AVG threshold decorrelated into a per-part stats join and
    compared as exact integers (qty < 0.2·avg ⇔ 5·qty·cnt < sum)
    (reference benchmark/tpch/sf1/q17)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    stats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_cents("l_quantity")).alias("sq_c"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(stats, F.col("pk") == li.l_partkey)
        .filter(5 * _cents("l_quantity") * F.col("cnt") < F.col("sq_c"))
        .agg(
            (F.sum(_cents("l_extendedprice")) / 100.0 / 7.0).alias("avg_yearly")
        )
    )



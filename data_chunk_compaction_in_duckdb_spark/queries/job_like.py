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
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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

"""Compaction-layer showcase queries (SURVEY.md §0.1 / §7 Phase 4).

Compaction is a physical-layout transformation: results must be
bit-identical with and without it.  The oracle is therefore the plain
SQL, and a hash match proves the compaction operator is semantically
transparent — the same invariant the reference's sqllogic tests assert
across compaction strategies (run_bench.py branch-per-strategy matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.compaction import compact
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "compaction_filter_join_agg",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_quantity <= 3 AND l_discount >= 0.08
    GROUP BY o_orderpriority
    """,
)
def compaction_filter_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical pipeline: selective filter fragments the
    stream (chunk factor << 1), compaction restores full data units before
    the join probe (CompactingPhysicalOperator wraps FILTER and HASH_JOIN,
    physical_operator.cpp:130-144).  compact() here coalesces the
    post-filter partitions before the shuffle join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") <= 3) & (F.col("l_discount") >= 0.08)
    )
    li = compact(li, target_rows=100_000)
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )

"""Subquery machinery — SURVEY.md §2.3 MARK/SINGLE joins and §3's
decorrelation (plan_subquery.cpp:254-424, flatten_dependent_join.cpp).

The reference flattens correlated subqueries into DELIM joins and plans
IN/EXISTS as MARK joins with three-valued NULL logic
(join_hashtable.cpp:629-672).  Catalyst decorrelates the same SQL itself
(ExistenceJoin ≈ mark join), so these queries are written in SQL and the
engine's job is NULL-correctness parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "subq_mark_join_in_nulls",
    oracle="""
    SELECT o_orderkey,
           (CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey END)
             IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS in_rich,
           (CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey END)
             IN (SELECT CASE WHEN c_acctbal > 9990 THEN NULL ELSE c_custkey END
                 FROM customer WHERE c_acctbal > 5000) AS in_rich_nullable
    FROM orders WHERE o_orderkey <= 500
    """,
)
def subq_mark_join_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARK join three-valued logic (ConstructMarkJoinResult,
    join_hashtable.cpp:629): NULL probe key → NULL; no match but NULLs in
    the build side → NULL; otherwise TRUE/FALSE.

    Uses the engine's mark_join operator — Catalyst's ExistenceJoin is
    NOT null-aware in the projection position (returns FALSE where ANSI
    requires NULL), so plain Spark SQL `IN` would fail the oracle."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.operators import mark_join

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    probe = orders.withColumn(
        "_probe",
        F.when(F.col("o_custkey") % 7 == 0, None).otherwise(F.col("o_custkey")),
    )
    rich = cust.select(F.col("c_custkey").alias("k"))
    rich_nullable = cust.select(
        F.when(F.col("c_acctbal") > 9990, None)
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )
    out = mark_join(probe, rich, "_probe", "k", out_col="in_rich")
    out = mark_join(out, rich_nullable, "_probe", "k", out_col="in_rich_nullable")
    return out.select("o_orderkey", "in_rich", "in_rich_nullable")


@query(
    "subq_single_join_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT n_name FROM nation WHERE n_nationkey = c_nationkey) AS nname,
           ROUND(c_acctbal / (SELECT MAX(c_acctbal) FROM customer), 6) AS bal_share
    FROM customer WHERE c_custkey <= 300
    """,
)
def subq_single_join_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SINGLE join (join_hashtable.cpp:777): correlated + uncorrelated
    scalar subqueries — at most one row each, NULL when empty."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT n_name FROM nation WHERE n_nationkey = c_nationkey) AS nname,
               ROUND(c_acctbal / (SELECT MAX(c_acctbal) FROM customer), 6) AS bal_share
        FROM customer WHERE c_custkey <= 300
        """
    )


@query(
    "subq_correlated_exists_extra_pred",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 40 * c.c_acctbal)
    """,
)
def subq_correlated_exists_extra_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELIM join stress (flatten_dependent_join.cpp): correlated EXISTS
    with a non-equi correlated predicate — Catalyst decorrelates it."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 40 * c.c_acctbal)
        """
    )


@query(
    "subq_correlated_agg",
    oracle="""
    SELECT o_orderkey, n_lines
    FROM (
      SELECT o_orderkey,
             (SELECT COUNT(*) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 40) AS n_lines
      FROM orders o WHERE o_orderkey <= 400
    ) t
    WHERE n_lines >= 1
    """,
)
def subq_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery in the projection (COUNT over the
    correlated partition — decorrelated to an aggregate + outer join)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, n_lines
        FROM (
          SELECT o_orderkey,
                 (SELECT COUNT(*) FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 40) AS n_lines
          FROM orders o WHERE o_orderkey <= 400
        ) t
        WHERE n_lines >= 1
        """
    )


@query(
    "subq_in_where_any_all",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_size > ALL (SELECT p_size FROM part WHERE p_brand = 'Brand#13')
       OR p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 50)
    """,
)
def subq_in_where_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL comparison + IN filter (reference rewrites ALL to NOT EXISTS;
    Spark 4 supports >ALL natively... expressed via max() for portability)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_size > (SELECT MAX(p_size) FROM part WHERE p_brand = 'Brand#13')
           OR p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 50)
        """
    )

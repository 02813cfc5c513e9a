"""Edge-case semantics — the reference's sqllogictest corpus leans hard on
these (test/sql/aggregate, test/sql/types/null): empty inputs, all-NULL
aggregates, NULL grouping keys, NULL ordering, division/overflow behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "edge_empty_input_aggregates",
    oracle="""
    SELECT COUNT(*) AS n, SUM(l_quantity) AS s, MIN(l_quantity) AS mn,
           MAX(l_quantity) AS mx, AVG(l_quantity) AS av
    FROM lineitem WHERE l_quantity < 0
    """,
)
def edge_empty_input_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregates over zero rows: COUNT=0, everything else NULL
    (reference test/sql/aggregate empty-table cases)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 0)
    return li.agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("s"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
        F.avg("l_quantity").alias("av"),
    )


@query(
    "edge_grouped_empty_is_empty",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem WHERE l_quantity < 0
    GROUP BY l_returnflag
    """,
)
def edge_grouped_empty_is_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate over zero rows yields zero groups (not one NULL
    group) — a classic engine bug class."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 0)
    return li.groupBy("l_returnflag").agg(F.count("*").alias("n"))


@query(
    "edge_null_aggregates",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           CAST(SUM(v) AS BIGINT) AS s,
           ROUND(AVG(v), 6) AS av,
           COUNT(DISTINCT v) AS nd
    FROM (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 5 AS BIGINT) END AS v
      FROM orders
    ) t
    GROUP BY o_orderstatus
    """,
)
def edge_null_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-skipping aggregate semantics: COUNT(col) vs COUNT(*), SUM/AVG
    ignore NULLs, COUNT(DISTINCT) excludes NULL."""
    orders = load_table(spark, sf_dir, "orders")
    v = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(
        (F.col("o_orderkey") % 5).cast("bigint")
    )
    return (
        orders.select("o_orderstatus", v.alias("v"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_nonnull"),
            F.sum("v").alias("s"),
            F.round(F.avg("v"), 6).alias("av"),
            F.countDistinct("v").alias("nd"),
        )
    )


@query(
    "edge_null_group_keys",
    oracle="""
    SELECT CASE WHEN c_nationkey % 4 = 0 THEN NULL ELSE c_nationkey END AS k,
           COUNT(*) AS n
    FROM customer
    GROUP BY 1
    """,
)
def edge_null_group_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL is a single grouping key (SQL GROUP BY NULL-equality
    semantics)."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.when(F.col("c_nationkey") % 4 == 0, None).otherwise(
        F.col("c_nationkey")
    )
    return cust.select(k.alias("k")).groupBy("k").agg(F.count("*").alias("n"))


@query(
    "edge_nulls_ordering",
    oracle="""
    SELECT k, rn FROM (
      SELECT k, ROW_NUMBER() OVER (ORDER BY k ASC NULLS LAST, tiebreak) AS rn
      FROM (
        SELECT CASE WHEN s_suppkey % 3 = 0 THEN NULL
                    ELSE CAST(s_suppkey AS BIGINT) END AS k,
               s_suppkey AS tiebreak
        FROM supplier WHERE s_suppkey <= 500
      ) t
    ) w
    """,
)
def edge_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (Spark default is NULLS FIRST for ASC,
    DuckDB's is NULLS LAST — engines disagree unless pinned).  The global
    row_number is the semantics under test; the s_suppkey bound keeps its
    single partition dimension-sized at any SF."""
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 500)
    from pyspark.sql import Window

    k = F.when(F.col("s_suppkey") % 3 == 0, None).otherwise(
        F.col("s_suppkey").cast("bigint")
    )
    w = Window.orderBy(F.col("k").asc_nulls_last(), F.col("s_suppkey"))
    return supp.select(k.alias("k"), F.col("s_suppkey")).select(
        "k", F.row_number().over(w).alias("rn")
    )


@query(
    "edge_division_and_nan",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(CAST(o_orderkey % 3 AS INT), 0) AS div_nullable,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST((2 * CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           + (o_orderkey % 3))
                          // (2 * (o_orderkey % 3)) AS BIGINT) / 100.0
           END AS div_guarded
    FROM orders WHERE o_orderkey <= 100
    """,
)
def edge_division_and_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division-by-zero guards: x / NULLIF(d, 0) yields NULL (portable
    across engines — raw x/0 differs: DuckDB errors, Spark returns NULL).
    The rounded division uses half-up integer cent arithmetic — price/2
    has 3 exact decimals, the same round-boundary trap as revenue sums."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    d = (F.col("o_orderkey") % 3).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    num = 2 * cents + d
    den = 2 * d
    guarded = ((num - num % den) / den).cast("long") / F.lit(100.0)
    return orders.select(
        "o_orderkey",
        (F.col("o_totalprice") / F.nullif(d.cast("int"), F.lit(0))).alias(
            "div_nullable"
        ),
        F.when(d == 0, None).otherwise(guarded).alias("div_guarded"),
    )

"""Advanced joins — SURVEY.md §2.3: ASOF, IEJoin (2 range predicates),
piecewise-merge (1 range predicate / band), positional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.operators import (
    asof_join,
    positional_join,
)
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "join_asof_backward",
    oracle="""
    SELECT e.event_id, e.user_id,
           ROUND(p.value, 4) AS last_purchase_value,
           p.ts AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF_JOIN (physical_asof_join.cpp:951): for each click, the latest
    purchase at-or-before it per user — engine operator asof_join()
    (union + key-partitioned window, single shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("last_purchase_value"),
        F.col("ts_right").alias("last_purchase_ts"),
    )


@query(
    "join_ie_two_ranges",
    oracle="""
    SELECT a.o_orderkey AS k_a, b.o_orderkey AS k_b
    FROM (SELECT * FROM orders WHERE o_orderkey % 97 = 0) a
    JOIN (SELECT * FROM orders WHERE o_orderkey % 89 = 0) b
      ON a.o_totalprice < b.o_totalprice AND a.o_orderdate > b.o_orderdate
    """,
)
def join_ie_two_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IE_JOIN (physical_iejoin.cpp:1111): two inequality predicates.
    Spark plans a broadcast nested-loop over the pre-filtered sides; the
    deterministic modulo filters keep the pair count bounded at any SF."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 97 == 0).alias("a")
    b = orders.filter(F.col("o_orderkey") % 89 == 0).alias("b")
    return a.join(
        b,
        (F.col("a.o_totalprice") < F.col("b.o_totalprice"))
        & (F.col("a.o_orderdate") > F.col("b.o_orderdate")),
    ).select(
        F.col("a.o_orderkey").alias("k_a"), F.col("b.o_orderkey").alias("k_b")
    )


@query(
    "join_range_band",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 150 AND s_acctbal + 150
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIECEWISE_MERGE_JOIN (physical_piecewise_merge_join.cpp:903): single
    band/range predicate; broadcast NL with the 10-row side broadcast."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return cust.join(
        supp,
        (F.col("c_acctbal") >= F.col("s_acctbal") - 150)
        & (F.col("c_acctbal") <= F.col("s_acctbal") + 150),
    ).select("s_suppkey", "c_custkey")


@query(
    "join_positional",
    oracle="""
    WITH a AS (
      SELECT r_name, ROW_NUMBER() OVER (ORDER BY r_regionkey) AS _pos FROM region
    ), b AS (
      SELECT n_name, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS _pos
      FROM nation WHERE n_nationkey < 8
    )
    SELECT a.r_name, b.n_name
    FROM a FULL JOIN b ON a._pos = b._pos
    """,
)
def join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL_JOIN (physical_positional_join.cpp:196) via the engine's
    positional_join operator (explicit total orders per side)."""
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 8)
        .select("n_nationkey", "n_name")
    )
    out = positional_join(
        region, nation, ["r_regionkey"], ["n_nationkey"], how="full"
    )
    return out.select("r_name", "n_name")


@query(
    "join_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id,
           ROUND(p.value, 4) AS next_purchase_value,
           p.ts AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF (physical_asof_join.cpp comparison variants): for
    each click, the EARLIEST purchase at-or-after it per user — the
    direction='forward' path of the engine's asof_join (same union +
    key-partitioned window plan, reversed ordering)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("next_purchase_value"),
        F.col("ts_right").alias("next_purchase_ts"),
    )

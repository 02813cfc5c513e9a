"""Nested types & reshaping: UNNEST, PIVOT/UNPIVOT, LIST/STRUCT/MAP ops —
SURVEY.md §2.2 (physical_unnest.cpp:364, physical_pivot.cpp:82) and §2.8
list/struct/map function families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "unnest_explode_words",
    oracle="""
    SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
    FROM part
    WHERE p_partkey <= 50
    """,
)
def unnest_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST of a LIST column (physical_unnest.cpp) = explode(split())."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return part.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "unnest_with_ordinality",
    oracle="""
    SELECT p_partkey,
           UNNEST(generate_series(1, len(string_split(p_name, ' ')))) - 1 AS pos,
           UNNEST(string_split(p_name, ' ')) AS word
    FROM part
    WHERE p_partkey <= 30
    """,
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY = posexplode (DuckDB zips parallel unnests)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 30)
    return part.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS st_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS st_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS st_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (physical_pivot.cpp:82) — groupBy().pivot().count() with pinned
    pivot values (pinning avoids the extra distinct-values job at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("st_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("st_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_p"),
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS val
    FROM supplier
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT = stack() (reference plans UNPIVOT as projection+unnest)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'nationkey', CAST(s_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


@query(
    "list_ops_lambdas",
    oracle="""
    SELECT o_custkey,
           len(prices) AS n_orders,
           CAST(list_aggregate(list_transform(prices,
                          x -> (x * 9 + 5) // 10), 'sum') AS BIGINT)
             AS discounted_cents,
           prices[1] / 100.0 AS top_price,
           len(list_filter(prices, x -> x > 10000000)) AS n_big
    FROM (
      SELECT o_custkey,
             list_sort(list(CAST(ROUND(o_totalprice * 100) AS BIGINT)),
                       'DESC') AS prices
      FROM orders
      WHERE o_custkey <= 200
      GROUP BY o_custkey
    ) t
    """,
)
def list_ops_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST lambdas — list_transform/list_filter/list_aggregate
    (core_functions/scalar/list; SURVEY §2.8) = transform/filter/aggregate
    over collect_list.

    Float exactness: prices become exact integer cents BEFORE collect_list,
    the 0.9 discount is integer half-up ((c*9 + 5) div 10), and the only
    float op is one exact long/100.0 division — bit-identical in both
    engines (ROUND-on-double diverges: DuckDB rounds the binary value,
    Spark the shortest decimal string)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    prices = F.reverse(F.array_sort(F.collect_list(cents)))

    def _disc(x: "F.Column") -> "F.Column":
        t = x * 9 + 5
        return ((t - t % 10) / 10).cast("long")

    return (
        orders.groupBy("o_custkey")
        .agg(prices.alias("prices"))
        .select(
            "o_custkey",
            F.size("prices").alias("n_orders"),
            F.aggregate(
                F.transform("prices", _disc),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("discounted_cents"),
            (F.element_at("prices", 1) / F.lit(100.0)).alias("top_price"),
            F.size(F.filter("prices", lambda x: x > 10000000)).alias("n_big"),
        )
    )


@query(
    "struct_pack_extract",
    oracle="""
    SELECT c_custkey,
           struct_extract({'name': c_name, 'bal': c_acctbal}, 'name') AS s_name,
           ROUND(struct_extract({'name': c_name, 'bal': c_acctbal}, 'bal'), 2) AS s_bal
    FROM customer
    WHERE c_custkey <= 100
    """,
)
def struct_pack_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT pack + extract (struct_pack/struct_extract → struct()/field
    access)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    packed = F.struct(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")
    )
    return cust.select(
        "c_custkey",
        packed.getField("name").alias("s_name"),
        F.round(packed.getField("bal"), 2).alias("s_bal"),
    )


@query(
    "map_ops",
    oracle="""
    SELECT n_nationkey,
           element_at(map {'region': r_name, 'nation': n_name}, 'nation')[1]
             AS m_nation,
           cardinality(map {'region': r_name, 'nation': n_name}) AS m_size,
           array_to_string(map_keys(map {'region': r_name, 'nation': n_name}), ',')
             AS m_keys
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP construction + element_at/cardinality/map_keys
    (core_functions/scalar/map)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    m = F.create_map(
        F.lit("region"), F.col("r_name"), F.lit("nation"), F.col("n_name")
    )
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "n_nationkey",
            F.element_at(m, "nation").alias("m_nation"),
            F.size(m).alias("m_size"),
            F.array_join(F.map_keys(m), ",").alias("m_keys"),
        )
    )


@query(
    "fn_map_extended",
    oracle="""
    SELECT n_nationkey,
           array_to_string(map_values(
             map_concat(map {'nation': n_name}, map {'region': r_name})), '|')
             AS vals,
           cardinality(
             map_concat(map {'nation': n_name}, map {'region': r_name}))
             AS sz,
           array_to_string(list_transform(
             map_entries(map_concat(map {'nation': n_name},
                                    map {'region': r_name})),
             e -> e.key || '=' || e.value), ',') AS ent,
           element_at(map_from_entries(
             map_entries(map {'nation': n_name, 'region': r_name})),
             'region')[1] AS rt
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def fn_map_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function tail: map_concat, map_values, map_entries,
    map_from_entries round-trip (core_functions/scalar/map) — entry
    structs rendered as k=v strings so both engines compare as text."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    merged = F.map_concat(
        F.create_map(F.lit("nation"), F.col("n_name")),
        F.create_map(F.lit("region"), F.col("r_name")),
    )
    both = F.create_map(
        F.lit("nation"), F.col("n_name"), F.lit("region"), F.col("r_name")
    )
    return (
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        ).select(
            "n_nationkey",
            F.array_join(F.map_values(merged), "|").alias("vals"),
            F.size(merged).alias("sz"),
            F.array_join(
                F.transform(
                    F.map_entries(merged),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                ),
                ",",
            ).alias("ent"),
            F.element_at(
                F.map_from_entries(F.map_entries(both)), "region"
            ).alias("rt"),
        )
    )

"""JOB-style selectivity variants (reference benchmark/imdb_plan_cost/
queries: 113 files = ~33 join-shape families × a/b/c/d predicate
variants, imdb_main.cpp:63-76).  The reference varies ONLY the dimension
predicates between variants of a family — the join order stress comes
from how selectivity shifts between dimensions.  Same here: each family
below is one parameterized builder + oracle template instantiated with
several predicate sets, so the optimizer sees the same join graph under
different selectivity placements.

All outputs are MIN(string/date)/COUNT — exact under the driver's
value hash with no float scheme needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


def _register_snowflake_variant(
    suffix: str, cr_name: str, sr_names: list[str], p_size_max: int, status: str
) -> None:
    """Family: the 9-way double-dimension-chain snowflake
    (job_like_9way_snowflake), predicates shifted between variants."""
    sr_sql = ", ".join(f"'{r}'" for r in sr_names)
    oracle = f"""
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
    WHERE cr.r_name = '{cr_name}' AND sr.r_name IN ({sr_sql})
      AND p_size < {p_size_max} AND o_orderstatus = '{status}'
    """

    @query(f"job_like_9way_snowflake_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == status
        )
        c = load_table(spark, sf_dir, "customer")
        s = load_table(spark, sf_dir, "supplier")
        p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < p_size_max)
        nat = load_table(spark, sf_dir, "nation")
        reg = load_table(spark, sf_dir, "region")
        cn = nat.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_region"),
        )
        sn = nat.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_regionkey").alias("sn_region"),
        )
        cr = reg.filter(F.col("r_name") == cr_name).select(
            F.col("r_regionkey").alias("cr_key")
        )
        sr = reg.filter(F.col("r_name").isin(*sr_names)).select(
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

    _q.__doc__ = (
        f"Snowflake family, variant {suffix}: cust-region={cr_name}, "
        f"supp-regions={sr_names}, p_size<{p_size_max}, status={status}."
    )


def _register_star_variant(
    suffix: str, p_pred: str, n_pred: str, prio_pred: str
) -> None:
    """Family: the MIN-over-LIKE-filtered-star (job_like_min_agg_star),
    LIKE predicates shifted between variants."""
    oracle = f"""
    SELECT MIN(p_name) AS min_part, MIN(s_name) AS min_supp,
           CAST(MIN(o_orderdate) AS DATE) AS min_date, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type LIKE '{p_pred}' AND o_orderpriority LIKE '{prio_pred}'
      AND n_name LIKE '{n_pred}'
    """

    @query(f"job_like_min_agg_star_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like(p_pred))
        s = load_table(spark, sf_dir, "supplier")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority").like(prio_pred)
        )
        n = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").like(n_pred)
        )
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .agg(
                F.min("p_name").alias("min_part"),
                F.min("s_name").alias("min_supp"),
                F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Star family, variant {suffix}: p_type LIKE {p_pred}, "
        f"n_name LIKE {n_pred}, priority LIKE {prio_pred}."
    )


def _register_inlist_variant(
    suffix: str, brands: list[str], nations: list[str], qty_lo: int, qty_hi: int
) -> None:
    """Family: IN-list dimension filters (job_like_in_list_dims)."""
    b_sql = ", ".join(f"'{b}'" for b in brands)
    n_sql = ", ".join(f"'{n}'" for n in nations)
    oracle = f"""
    SELECT MIN(p_name) AS min_part, MIN(n_name) AS min_nation, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_brand IN ({b_sql}) AND n_name IN ({n_sql})
      AND l_quantity BETWEEN {qty_lo} AND {qty_hi}
    """

    @query(f"job_like_in_list_dims_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity").between(qty_lo, qty_hi)
        )
        p = load_table(spark, sf_dir, "part").filter(F.col("p_brand").isin(*brands))
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin(*nations)
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

    _q.__doc__ = (
        f"IN-list family, variant {suffix}: brands={brands}, "
        f"nations={nations}, qty [{qty_lo},{qty_hi}]."
    )


# Variant instantiations — predicates drift between variants the way the
# JOB a/b/c/d files drift (tighter region, looser size, different LIKE).
_register_snowflake_variant("b", "EUROPE", ["ASIA"], 40, "O")
_register_snowflake_variant("c", "AMERICA", ["AFRICA", "ASIA"], 15, "F")
_register_star_variant("b", "STAND%", "NATION_1%", "2-%")
_register_star_variant("c", "PROMO%", "%A%", "%")
_register_snowflake_variant("d", "ASIA", ["EUROPE", "AMERICA", "AFRICA"], 50, "P")
_register_star_variant("d", "ECONO%", "%2%", "5-%")
_register_inlist_variant(
    "b", ["Brand#12", "Brand#23"], ["NATION_3", "NATION_7"], 1, 25
)
_register_inlist_variant(
    "c", ["Brand#5", "Brand#14", "Brand#21"],
    ["NATION_10", "NATION_15", "NATION_20"], 30, 50,
)
_register_inlist_variant(
    "d", ["Brand#13", "Brand#22", "Brand#24", "Brand#25"],
    ["NATION_2", "NATION_4", "NATION_11", "NATION_19"], 10, 40,
)

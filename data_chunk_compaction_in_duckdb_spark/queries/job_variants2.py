"""JOB-style selectivity variants, second tranche (reference
benchmark/imdb_plan_cost/queries: 113 files = ~33 join-shape families
× a/b/c/d predicate variants, imdb_main.cpp:63-76).  job_variants.py
covers the snowflake/star/IN-list families; this module parameterizes
seven more family topologies from job_like.py — deep 8-way star,
late cross-column filter chain, cyclic triangle, four-dimension
multi-role, maximal left-deep chain, two-hop EXISTS, and date-band —
so each join graph is exercised under several selectivity placements,
exactly how the reference's variants differ from their 'a' query.

All outputs are MIN(string/date)/COUNT (the JOB result shape) or the
exact integer-cents revenue — value-hash exact, no float scheme needed
beyond _REV_SQL/_rev.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query
from data_chunk_compaction_in_duckdb_spark.queries.relational import _REV_SQL, _rev


def _register_deep_join_variant(
    suffix: str,
    size_lo: int,
    size_hi: int,
    types: list[str],
    prios: list[str],
    qty_min: int,
    region_max: int,
) -> None:
    """Family: the 8-way star with a nation self-role and cross-role
    inequality (job_like_deep_join) — variants shift selectivity between
    part, orders, the fact filter, and the region prune."""
    types_sql = ", ".join(f"'{t}'" for t in types)
    prios_sql = ", ".join(f"'{p}'" for p in prios)
    oracle = f"""
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
    WHERE p_size BETWEEN {size_lo} AND {size_hi}
      AND p_type IN ({types_sql})
      AND o_orderpriority IN ({prios_sql})
      AND l_quantity > {qty_min}
      AND r_regionkey < {region_max}
      AND sn.n_regionkey <> cn.n_regionkey
    GROUP BY p_brand, sn.n_name
    """

    @query(f"job_like_deep_join_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity") > qty_min
        )
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority").isin(*prios)
        )
        cust = load_table(spark, sf_dir, "customer")
        supp = load_table(spark, sf_dir, "supplier")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_size").between(size_lo, size_hi)
            & F.col("p_type").isin(*types)
        )
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region").filter(
            F.col("r_regionkey") < region_max
        )
        cn = nation.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_region"),
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

    _q.__doc__ = (
        f"Deep-join family, variant {suffix}: p_size [{size_lo},{size_hi}], "
        f"types {types}, priorities {prios}, l_quantity > {qty_min}, "
        f"region < {region_max}."
    )


def _register_late_filter_variant(suffix: str, factor: str) -> None:
    """Family: chain join whose cross-column predicate defeats pushdown
    (job_like_late_filter_chain) — variants move the predicate's
    selectivity point, shifting how much of the intermediate survives."""
    oracle = f"""
    SELECT r_name, o_orderpriority,
           COUNT(*) AS n, {_REV_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_extendedprice * (1 - l_discount) > {factor} * l_quantity * 100
    GROUP BY r_name, o_orderpriority
    """

    @query(f"job_like_late_filter_chain_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                > float(factor) * F.col("l_quantity") * 100
            )
            .groupBy("r_name", "o_orderpriority")
            .agg(F.count("*").alias("n"), _rev().alias("revenue"))
        )

    _q.__doc__ = (
        f"Late-filter family, variant {suffix}: survival threshold "
        f"{factor}x quantity — the cross-column predicate still runs "
        "post-join; only its pass rate changes."
    )


def _register_cyclic_triangle_variant(suffix: str, flag: str, prio: str) -> None:
    """Family: cyclic equi-predicate triangle (job_like_cyclic_triangle)
    with the second lineitem role's filter and the orders filter moved."""
    oracle = f"""
    SELECT COUNT(*) AS n,
           CAST(MIN(l1.l_shipdate) AS DATE) AS first_ship,
           CAST(MIN(l2.l_shipdate) AS DATE) AS first_ret_ship
    FROM lineitem l1
    JOIN orders   ON l1.l_orderkey = o_orderkey
    JOIN lineitem l2 ON l2.l_orderkey = o_orderkey
                    AND l1.l_orderkey = l2.l_orderkey
                    AND l1.l_linenumber < l2.l_linenumber
    WHERE l2.l_returnflag = '{flag}' AND o_orderpriority = '{prio}'
    """

    @query(f"job_like_cyclic_triangle_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == prio
        )
        l1 = li.select(
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").alias("ln1"),
            F.col("l_shipdate").alias("ship1"),
        )
        l2 = li.filter(F.col("l_returnflag") == flag).select(
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

    _q.__doc__ = (
        f"Cyclic-triangle family, variant {suffix}: second role filtered to "
        f"l_returnflag={flag}, orders to {prio}."
    )


def _register_four_dim_roles_variant(
    suffix: str, status: str, disc_min: str, same_region: bool
) -> None:
    """Family: two dimension tables each in two roles
    (job_like_four_dim_roles); variants flip the cross-role predicate
    between <> and = — the = direction collapses the pair cardinality."""
    op = "=" if same_region else "<>"
    oracle = f"""
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
    WHERE cr.r_regionkey {op} sr.r_regionkey
      AND o_orderstatus = '{status}'
      AND l_discount >= {disc_min}
    GROUP BY cr.r_name, sr.r_name
    """

    @query(f"job_like_four_dim_roles_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_discount") >= float(disc_min)
        )
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == status
        )
        cust = load_table(spark, sf_dir, "customer")
        sup = load_table(spark, sf_dir, "supplier")
        cn = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_reg"),
        )
        sn = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_regionkey").alias("sn_reg"),
        )
        cr = load_table(spark, sf_dir, "region").select(
            F.col("r_regionkey").alias("cr_key"),
            F.col("r_name").alias("cust_region"),
        )
        sr = load_table(spark, sf_dir, "region").select(
            F.col("r_regionkey").alias("sr_key"),
            F.col("r_name").alias("supp_region"),
        )
        pred = (
            (F.col("cr_key") == F.col("sr_key"))
            if same_region
            else (F.col("cr_key") != F.col("sr_key"))
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
            .join(F.broadcast(cr), F.col("cn_reg") == F.col("cr_key"))
            .join(F.broadcast(sr), F.col("sn_reg") == F.col("sr_key"))
            .filter(pred)
            .groupBy("cust_region", "supp_region")
            .agg(F.count("*").alias("n"), _rev().alias("revenue"))
        )

    _q.__doc__ = (
        f"Four-dim-roles family, variant {suffix}: region roles {op}, "
        f"status {status}, discount >= {disc_min}."
    )


def _register_long_chain_variant(
    suffix: str, etype: str, size_min: int, nation_like: str
) -> None:
    """Family: maximal left-deep chain events→customer→orders→lineitem→
    dims (job_like_long_chain) with the chain-end selectivities moved."""
    oracle = f"""
    SELECT MIN(e.event_id) AS min_event, MIN(p_name) AS min_part,
           COUNT(*) AS n
    FROM events e
    JOIN customer ON e.user_id = c_custkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE e.event_type = '{etype}' AND p_size > {size_min}
      AND n_name LIKE '{nation_like}'
    """

    @query(f"job_like_long_chain_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = load_table(spark, sf_dir, "events").filter(
            F.col("event_type") == etype
        )
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > size_min)
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").like(nation_like)
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

    _q.__doc__ = (
        f"Long-chain family, variant {suffix}: event_type={etype}, "
        f"p_size>{size_min}, nation LIKE {nation_like}."
    )


def _register_exists_two_hop_variant(
    suffix: str, prio: str, date_min: str, size_min: int
) -> None:
    """Family: EXISTS whose subquery is a fact-fact join
    (job_like_exists_two_hop) with inner-join selectivity moved between
    the priority and date filters."""
    oracle = f"""
    SELECT p_type, COUNT(*) AS n_parts, MIN(p_retailprice) AS min_price
    FROM part
    WHERE p_size > {size_min}
      AND EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_partkey = p_partkey
          AND o_orderpriority = '{prio}'
          AND o_orderdate >= TIMESTAMP '{date_min}')
    GROUP BY p_type
    """

    @query(f"job_like_exists_two_hop_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_size") > size_min
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        o = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == prio)
            & (F.col("o_orderdate") >= date_min)
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

    _q.__doc__ = (
        f"Two-hop-EXISTS family, variant {suffix}: priority {prio}, "
        f"orderdate >= {date_min}, p_size > {size_min}."
    )


def _register_date_band_variant(
    suffix: str, d_lo: str, d_hi: str, bal_pred_sql: str, bal_lo: float
) -> None:
    """Family: date-band fact filter + dimension group key
    (job_like_date_band_dims) with the band and the customer filter
    shifted."""
    oracle = f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS y, n_name,
           COUNT(*) AS n, MIN(c_name) AS min_cust
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate BETWEEN DATE '{d_lo}' AND DATE '{d_hi}'
      AND {bal_pred_sql}
    GROUP BY EXTRACT(YEAR FROM o_orderdate), n_name
    """

    @query(f"job_like_date_band_dims_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate").between(d_lo, d_hi)
        )
        c = load_table(spark, sf_dir, "customer").filter(
            F.col("c_acctbal") < bal_lo
            if "<" in bal_pred_sql
            else F.col("c_acctbal") > bal_lo
        )
        n = load_table(spark, sf_dir, "nation")
        return (
            o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.year("o_orderdate").alias("y"), F.col("n_name"))
            .agg(F.count("*").alias("n"), F.min("c_name").alias("min_cust"))
        )

    _q.__doc__ = (
        f"Date-band family, variant {suffix}: band [{d_lo},{d_hi}], "
        f"customer filter {bal_pred_sql}."
    )


# Variant instantiations — same topology per family, different
# selectivity placements (the reference's a/b/c/d discipline).
_register_deep_join_variant(
    "b", 1, 15, ["SMALL", "MEDIUM"], ["5-LOW"], 30, 3
)
_register_deep_join_variant(
    "c", 20, 50, ["LARGE", "STANDARD", "PROMO", "ECONOMY"],
    ["3-MEDIUM", "4-NOT SPECIFIED"], 1, 5,
)
_register_deep_join_variant(
    "d", 10, 40, ["PROMO"], ["1-URGENT", "2-HIGH", "3-MEDIUM"], 20, 2
)
_register_late_filter_variant("b", "7.0")
_register_late_filter_variant("c", "9.9")
_register_cyclic_triangle_variant("b", "A", "5-LOW")
_register_cyclic_triangle_variant("c", "N", "3-MEDIUM")
_register_four_dim_roles_variant("b", "O", "0.08", False)
_register_four_dim_roles_variant("c", "F", "0.01", True)
_register_long_chain_variant("b", "click", 35, "NATION_%")
_register_long_chain_variant("c", "signup", 5, "NATION_2%")
_register_exists_two_hop_variant("b", "5-LOW", "2000-06-01", 5)
_register_exists_two_hop_variant("c", "3-MEDIUM", "1996-01-01", 40)
_register_date_band_variant("b", "1998-01-01", "1999-12-31", "c_acctbal < 500", 500)
_register_date_band_variant("c", "1995-01-01", "1995-12-31", "c_acctbal > 5000", 5000)

# d-variants (same topologies, a fourth selectivity placement — the
# reference's families run up to four letters)
_register_late_filter_variant("d", "8.8")
_register_cyclic_triangle_variant("d", "R", "2-HIGH")
_register_four_dim_roles_variant("d", "P", "0.00", False)
_register_long_chain_variant("d", "error", 20, "NATION_3%")
_register_exists_two_hop_variant("d", "2-HIGH", "1997-06-01", 25)
_register_date_band_variant("d", "1999-06-01", "2001-06-30", "c_acctbal > -1000", -1000)

"""JOB-style selectivity variants, third tranche (reference
benchmark/imdb_plan_cost/queries, 113 files): variants for the
remaining job_like.py families that had only an 'a' instance —
funnel self-join, two fact roles, semi/anti existence, OR-of-LIKEs,
cross-dimension predicate, dimension-only selectivity, fact-dim-fact
chain, events bridge, disjunctive dims, negated filters, multi-
COUNT(DISTINCT), the 29a dense-transitive-star and 33a linked-pair
topologies.  With job_variants.py and job_variants2.py this puts every
JOB family topology under at least two selectivity placements.

Result shapes stay MIN()/COUNT (exact under the driver's value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


def _register_funnel_variant(suffix: str, first: str, second: str) -> None:
    """Family: same-table two-role funnel (job_like_funnel_self_join),
    variants choose a different event pair — selectivity moves between
    the two roles."""
    oracle = f"""
    SELECT s.user_id, COUNT(*) AS n_conversions,
           CAST(MIN(datediff('second', s.ts, p.ts)) AS BIGINT) AS fastest_sec
    FROM events s
    JOIN events p ON s.user_id = p.user_id
                 AND s.event_type = '{first}' AND p.event_type = '{second}'
                 AND p.ts > s.ts
    GROUP BY s.user_id
    """

    @query(f"job_like_funnel_self_join_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        s = ev.filter(F.col("event_type") == first).select(
            F.col("user_id"), F.col("ts").alias("s_ts")
        )
        p = ev.filter(F.col("event_type") == second).select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
        )
        return (
            s.join(p, (s.user_id == F.col("p_user")) & (F.col("p_ts") > F.col("s_ts")))
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_conversions"),
                F.min(
                    F.expr(
                        "timestampdiff(SECOND, date_trunc('second', s_ts),"
                        " date_trunc('second', p_ts))"
                    ).cast("long")
                ).alias("fastest_sec"),
            )
        )

    _q.__doc__ = f"Funnel family, variant {suffix}: {first} → {second}."


def _register_two_fact_roles_variant(suffix: str, flag: str, status: str) -> None:
    """Family: one fact in two filtered roles (job_like_two_fact_roles)."""
    oracle = f"""
    SELECT COUNT(*) AS n, MIN(o_orderpriority) AS min_prio
    FROM lineitem lr
    JOIN lineitem lf ON lr.l_orderkey = lf.l_orderkey
                    AND lr.l_linenumber <> lf.l_linenumber
    JOIN orders ON o_orderkey = lr.l_orderkey
    WHERE lr.l_returnflag = '{flag}' AND lf.l_linestatus = '{status}'
    """

    @query(f"job_like_two_fact_roles_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        lr = li.filter(F.col("l_returnflag") == flag).select(
            F.col("l_orderkey").alias("kr"), F.col("l_linenumber").alias("lnr")
        )
        lf = li.filter(F.col("l_linestatus") == status).select(
            F.col("l_orderkey").alias("kf"), F.col("l_linenumber").alias("lnf")
        )
        return (
            o.join(lr, F.col("kr") == o.o_orderkey)
            .join(lf, F.col("kf") == o.o_orderkey)
            .filter(F.col("lnr") != F.col("lnf"))
            .agg(
                F.count("*").alias("n"),
                F.min("o_orderpriority").alias("min_prio"),
            )
        )

    _q.__doc__ = (
        f"Two-fact-roles family, variant {suffix}: roles {flag}/{status}."
    )


def _register_semi_reduce_variant(suffix: str, segment: str, qty_min: int) -> None:
    """Family: EXISTS semi-reduction before a dimension join
    (job_like_semi_reduce)."""
    oracle = f"""
    SELECT MIN(c_name) AS min_cust, COUNT(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = '{segment}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > {qty_min})
    """

    @query(f"job_like_semi_reduce_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == segment
        )
        hi = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity") > qty_min
        )
        return (
            o.join(hi, o.o_orderkey == hi.l_orderkey, "left_semi")
            .join(c, F.col("o_custkey") == c.c_custkey)
            .agg(F.min("c_name").alias("min_cust"), F.count("*").alias("n"))
        )

    _q.__doc__ = (
        f"Semi-reduce family, variant {suffix}: segment {segment}, "
        f"quantity > {qty_min}."
    )


def _register_anti_exists_variant(suffix: str, flag_sql: str) -> None:
    """Family: NOT EXISTS anti-join per order (job_like_anti_exists) —
    the variant negates a different inner predicate."""
    oracle = f"""
    SELECT n_name, COUNT(*) AS n_clean_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND {flag_sql})
    GROUP BY n_name
    """

    @query(f"job_like_anti_exists_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        inner = load_table(spark, sf_dir, "lineitem").filter(F.expr(flag_sql))
        return (
            o.join(inner, o.o_orderkey == inner.l_orderkey, "left_anti")
            .join(c, F.col("o_custkey") == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_clean_orders"))
        )

    _q.__doc__ = f"Anti-exists family, variant {suffix}: NOT EXISTS {flag_sql}."


def _register_like_or_variant(
    suffix: str, pats: list[str], s_pat: str, not_pat: str
) -> None:
    """Family: OR-of-LIKEs dimension predicate (job_like_like_or_chain)."""
    ors = " OR ".join(f"p_name LIKE '{p}'" for p in pats)
    oracle = f"""
    SELECT MIN(p_name) AS min_part, MIN(p_brand) AS min_brand, COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE ({ors})
      AND s_name LIKE '{s_pat}'
      AND p_type NOT LIKE '{not_pat}'
    """

    @query(f"job_like_like_or_chain_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        cond = F.col("p_name").like(pats[0])
        for pat in pats[1:]:
            cond = cond | F.col("p_name").like(pat)
        p = load_table(spark, sf_dir, "part").filter(
            cond & ~F.col("p_type").like(not_pat)
        )
        s = load_table(spark, sf_dir, "supplier").filter(
            F.col("s_name").like(s_pat)
        )
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .agg(
                F.min("p_name").alias("min_part"),
                F.min("p_brand").alias("min_brand"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = f"LIKE-OR family, variant {suffix}: patterns {pats}."


def _register_dim_cross_variant(suffix: str, status: str, same: bool) -> None:
    """Family: equality predicate between two joined dimensions
    (job_like_dim_cross_predicate); the variant flips it to <>."""
    op = "=" if same else "<>"
    oracle = f"""
    SELECT n_name, COUNT(*) AS n
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation    ON c_nationkey = n_nationkey
    WHERE c_nationkey {op} s_nationkey
      AND o_orderstatus = '{status}'
    GROUP BY n_name
    """

    @query(f"job_like_dim_cross_predicate_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == status
        )
        c = load_table(spark, sf_dir, "customer")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        pred = (
            (c.c_nationkey == s.s_nationkey)
            if same
            else (c.c_nationkey != s.s_nationkey)
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .filter(pred)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n"))
        )

    _q.__doc__ = (
        f"Dim-cross family, variant {suffix}: nations {op}, status {status}."
    )


def _register_dim_only_variant(suffix: str, brand: str, nat: str) -> None:
    """Family: all selectivity from dimension point filters
    (job_like_dim_only_selectivity)."""
    oracle = f"""
    SELECT MIN(c_name) AS min_cust, CAST(MIN(o_orderdate) AS DATE) AS min_date,
           COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE p_brand = '{brand}' AND n_name = '{nat}'
    """

    @query(f"job_like_dim_only_selectivity_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
        n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nat)
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .agg(
                F.min("c_name").alias("min_cust"),
                F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = f"Dim-only family, variant {suffix}: {brand} x {nat}."


def _register_fact_dim_fact_variant(
    suffix: str, nat_like: str, ship_min: str, price_min: int
) -> None:
    """Family: fact-dim-fact alternating chain (job_like_fact_dim_fact_chain)."""
    oracle = f"""
    SELECT o_orderpriority, COUNT(*) AS n, MIN(s_name) AS min_supp
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE n_name LIKE '{nat_like}' AND l_shipdate >= DATE '{ship_min}'
      AND o_totalprice > {price_min}
    GROUP BY o_orderpriority
    """

    @query(f"job_like_fact_dim_fact_chain_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") >= ship_min
        )
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").like(nat_like)
        )
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > price_min
        )
        return (
            li.join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.min("s_name").alias("min_supp"))
        )

    _q.__doc__ = (
        f"Fact-dim-fact family, variant {suffix}: nation {nat_like}, "
        f"ship >= {ship_min}, price > {price_min}."
    )


def _register_events_bridge_variant(
    suffix: str, nations: list[str], val_min: int
) -> None:
    """Family: heterogeneous events→customer bridge
    (job_like_events_fact_bridge)."""
    nat_sql = ", ".join(f"'{x}'" for x in nations)
    oracle = f"""
    SELECT e.event_type, COUNT(*) AS n, MIN(c_name) AS min_cust
    FROM events e
    JOIN customer ON e.user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ({nat_sql}) AND e.value > {val_min}
    GROUP BY e.event_type
    """

    @query(f"job_like_events_fact_bridge_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = load_table(spark, sf_dir, "events").filter(F.col("value") > val_min)
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin(*nations)
        )
        return (
            e.join(c, e.user_id == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.min("c_name").alias("min_cust"))
        )

    _q.__doc__ = (
        f"Events-bridge family, variant {suffix}: nations {nations}, "
        f"value > {val_min}."
    )


def _register_distinct_pair_variant(
    suffix: str, price_min: int, qty_min: int
) -> None:
    """Family: multi-COUNT(DISTINCT) result shape
    (job_like_distinct_pair_count)."""
    oracle = f"""
    SELECT COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(DISTINCT o_custkey) AS d_custs,
           MIN(o_orderpriority) AS min_prio
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > {price_min} AND l_quantity > {qty_min}
    """

    @query(f"job_like_distinct_pair_count_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity") > qty_min
        )
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > price_min
        )
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(
                F.countDistinct("l_partkey").alias("d_parts"),
                F.countDistinct("l_suppkey").alias("d_supps"),
                F.countDistinct("o_custkey").alias("d_custs"),
                F.min("o_orderpriority").alias("min_prio"),
            )
        )

    _q.__doc__ = (
        f"Distinct-count family, variant {suffix}: price > {price_min}, "
        f"quantity > {qty_min}."
    )


def _register_linked_pair_variant(
    suffix: str, st1: str, st2: str, flip: bool
) -> None:
    """Family: 33a linked-pair subtrees (job_like_linked_pair_subtrees);
    the variant swaps the two role filters and the comparison side."""
    cmp_sql = "o1.o_totalprice < o2.o_totalprice" if flip else \
        "o1.o_totalprice > o2.o_totalprice"
    oracle = f"""
    SELECT c_custkey,
           MIN(o1.o_totalprice) AS first_price,
           MIN(o2.o_totalprice) AS second_price,
           COUNT(*) AS n_pairs
    FROM customer, orders o1, orders o2
    WHERE o1.o_custkey = c_custkey
      AND o2.o_custkey = c_custkey
      AND o1.o_orderstatus = '{st1}'
      AND o2.o_orderstatus = '{st2}'
      AND {cmp_sql}
    GROUP BY c_custkey
    """

    @query(f"job_like_linked_pair_subtrees_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer").select("c_custkey")
        o = load_table(spark, sf_dir, "orders")
        o1 = o.filter(F.col("o_orderstatus") == st1).select(
            F.col("o_custkey").alias("k1"), F.col("o_totalprice").alias("p1")
        )
        o2 = o.filter(F.col("o_orderstatus") == st2).select(
            F.col("o_custkey").alias("k2"), F.col("o_totalprice").alias("p2")
        )
        cmp_col = (
            (F.col("p1") < F.col("p2")) if flip else (F.col("p1") > F.col("p2"))
        )
        return (
            cust.join(o1, cust.c_custkey == F.col("k1"))
            .join(o2, (cust.c_custkey == F.col("k2")) & cmp_col)
            .groupBy("c_custkey")
            .agg(
                F.min("p1").alias("first_price"),
                F.min("p2").alias("second_price"),
                F.count("*").alias("n_pairs"),
            )
        )

    _q.__doc__ = (
        f"Linked-pair family, variant {suffix}: roles {st1}/{st2}, "
        f"comparison {'<' if flip else '>'}."
    )


_register_funnel_variant("b", "view", "click")
_register_funnel_variant("c", "click", "error")
_register_two_fact_roles_variant("b", "A", "O")
_register_two_fact_roles_variant("c", "N", "F")
_register_semi_reduce_variant("b", "MACHINERY", 40)
_register_semi_reduce_variant("c", "HOUSEHOLD", 48)
_register_anti_exists_variant("b", "l_quantity > 49")
_register_anti_exists_variant("c", "l_discount >= 0.09")
_register_like_or_variant(
    "b", ["%ue%", "bl%", "%ow"], "Supplier#0000%", "%ECONOMY%"
)
_register_dim_cross_variant("b", "O", True)
_register_dim_cross_variant("c", "P", False)
_register_dim_only_variant("b", "Brand#17", "NATION_12")
_register_dim_only_variant("c", "Brand#25", "NATION_3")
_register_fact_dim_fact_variant("b", "NATION_%", "2000-01-01", 150000)
_register_fact_dim_fact_variant("c", "NATION_1_", "1996-06-01", 20000)
_register_events_bridge_variant("b", ["NATION_0", "NATION_7"], 90)
_register_events_bridge_variant("c", ["NATION_2"], 10)
_register_distinct_pair_variant("b", 300000, 45)
_register_distinct_pair_variant("c", 100000, 10)
_register_linked_pair_variant("b", "O", "P", True)

# d-variants (fourth placement per family) and the missing c's
_register_funnel_variant("d", "view", "purchase")
_register_two_fact_roles_variant("d", "R", "O")
_register_semi_reduce_variant("d", "AUTOMOBILE", 44)
_register_anti_exists_variant("d", "l_quantity > 45 AND l_returnflag = 'A'")
_register_like_or_variant(
    "c", ["%re%", "me%", "%um"], "Supplier#000%", "%STANDARD%"
)
_register_like_or_variant(
    "d", ["red %", "%gear", "%bolt%"], "Supplier#%", "%MEDIUM%"
)
_register_dim_cross_variant("d", "F", True)
_register_dim_only_variant("d", "Brand#9", "NATION_20")
_register_fact_dim_fact_variant("d", "NATION_2_", "1998-01-01", 250000)
_register_events_bridge_variant(
    "d", ["NATION_4", "NATION_9", "NATION_13", "NATION_17"], 50
)
_register_distinct_pair_variant("d", 250000, 40)
_register_linked_pair_variant("c", "F", "P", False)
_register_linked_pair_variant("d", "P", "O", True)

"""JOB-style corpus, fourth tranche: reaches the reference's exact
count of 113 shapes (benchmark/imdb_plan_cost/queries/, 113 .sql files,
imdb_main.cpp:63-76).

Two kinds of additions:

1. b/c/d selectivity placements for the three families that still had a
   single instance (disjunctive-dims, negated-filters, dense-transitive
   star) — same join graph, predicates moved between relations, the
   reference's a/b/c/d discipline.
2. Four NEW family topologies present in the reference corpus but not
   yet represented here:
   - two point-coded roles of one tiny dimension (JOB 20/28:
     comp_cast_type aliased twice with kind='cast' /
     kind='complete+verified') → nation in customer- and supplier-role
     with a point equality code on each;
   - entity linked to itself through the fact as a link table (JOB
     32/33: title–movie_link–title) → part–lineitem–supplier–lineitem–
     part co-supply pairs;
   - one entity with TWO distinct 1:N side tables joined through the
     entity key (JOB 29: name→aka_name AND name→person_info) →
     customer→orders AND customer→events;
   - a cyclic join graph whose cycle closes through a non-key attribute
     equality (JOB's redundant movie_id cliques, e.g. 29a's pairwise
     closure) → lineitem→orders→customer / lineitem→supplier closed by
     c_nationkey = s_nationkey.

Result shapes stay MIN()/COUNT (exact under the driver's value hash);
all dimension broadcasts are bounded relations per SCALE.md policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


# ---------------------------------------------------------------------------
# 1a. disjunctive-dims variants: OR across two different dimensions
# ---------------------------------------------------------------------------


def _register_disjunctive_variant(suffix: str, left_sql: str, right_sql: str,
                                  left_col, right_col) -> None:
    """Family: disjunction ACROSS two dimensions (job_like_disjunctive_dims)
    — neither branch pushes into its own dimension scan."""
    oracle = f"""
    SELECT COUNT(*) AS n, MIN(p_name) AS min_part, MIN(n_name) AS min_nation
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE ({left_sql}) OR ({right_sql})
    """

    @query(f"job_like_disjunctive_dims_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        return (
            li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .filter(left_col() | right_col())
            .agg(
                F.count("*").alias("n"),
                F.min("p_name").alias("min_part"),
                F.min("n_name").alias("min_nation"),
            )
        )

    _q.__doc__ = (
        f"Disjunctive-dims family, variant {suffix}: "
        f"({left_sql}) OR ({right_sql})."
    )


# ---------------------------------------------------------------------------
# 1b. negated-filters variants
# ---------------------------------------------------------------------------


def _register_negated_variant(suffix: str, part_sql: str, other_sql: str,
                              li_sql: str, part_col, other_on_nation: bool,
                              other_col, li_col) -> None:
    """Family: negation-heavy predicates (job_like_negated_filters) —
    NOT filters keep the dimensions large."""
    other_table = "n_name" if other_on_nation else "s_name"
    oracle = f"""
    SELECT MIN(s_name) AS min_supp, MIN(p_type) AS min_type, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE {part_sql} AND {other_sql} AND {li_sql}
    """

    @query(f"job_like_negated_filters_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(li_col())
        p = load_table(spark, sf_dir, "part").filter(part_col())
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        if other_on_nation:
            n = n.filter(other_col())
        else:
            s = s.filter(other_col())
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .agg(
                F.min("s_name").alias("min_supp"),
                F.min("p_type").alias("min_type"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Negated-filters family, variant {suffix}: {part_sql} / "
        f"{other_sql} (on {other_table}) / {li_sql}."
    )


# ---------------------------------------------------------------------------
# 1c. dense-transitive-star variants (the 29a topology)
# ---------------------------------------------------------------------------


def _register_dense_star_variant(
    suffix: str,
    event_type: str,
    order_sql: str,
    order_col,
    part_like: str,
    size_lo: int,
    size_hi: int,
    qty_min: int,
    region_max: int,
    region_on_supplier: bool,
) -> None:
    """Family: 10-relation transitive star (job_like_dense_transitive_star,
    the JOB 29a topology) — point + IN + LIKE + BETWEEN filters moved
    between the relations per variant."""
    region_alias = "sr" if region_on_supplier else "cr"
    oracle = f"""
    SELECT MIN(p_name) AS a_part, MIN(s_name) AS a_supplier,
           MIN(c_name) AS a_customer, COUNT(*) AS n
    FROM lineitem, orders, customer, supplier, part,
         nation cn, nation sn, region cr, region sr, events
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND c_nationkey = cn.n_nationkey
      AND s_nationkey = sn.n_nationkey
      AND cn.n_regionkey = cr.r_regionkey
      AND sn.n_regionkey = sr.r_regionkey
      AND user_id = c_custkey
      AND event_type = '{event_type}'
      AND {order_sql}
      AND p_name LIKE '{part_like}'
      AND p_size BETWEEN {size_lo} AND {size_hi}
      AND l_quantity > {qty_min}
      AND {region_alias}.r_regionkey < {region_max}
    """

    @query(f"job_like_dense_transitive_star_{suffix}", oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity") > qty_min
        )
        o = load_table(spark, sf_dir, "orders").filter(order_col())
        cust = load_table(spark, sf_dir, "customer")
        sup = load_table(spark, sf_dir, "supplier")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_name").like(part_like)
            & F.col("p_size").between(size_lo, size_hi)
        )
        cn = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_reg"),
        )
        sn = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_regionkey").alias("sn_reg"),
        )
        cr = load_table(spark, sf_dir, "region").select(
            F.col("r_regionkey").alias("cr_key")
        )
        sr = load_table(spark, sf_dir, "region").select(
            F.col("r_regionkey").alias("sr_key")
        )
        if region_on_supplier:
            sr = sr.filter(F.col("sr_key") < region_max)
        else:
            cr = cr.filter(F.col("cr_key") < region_max)
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("event_type") == event_type
        ).select("user_id")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
            .join(F.broadcast(cr), F.col("cn_reg") == F.col("cr_key"))
            .join(F.broadcast(sr), F.col("sn_reg") == F.col("sr_key"))
            .join(ev, cust.c_custkey == ev.user_id)
            .agg(
                F.min("p_name").alias("a_part"),
                F.min("s_name").alias("a_supplier"),
                F.min("c_name").alias("a_customer"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Dense-transitive-star family, variant {suffix}: event "
        f"'{event_type}', {order_sql}, part LIKE '{part_like}' size "
        f"[{size_lo},{size_hi}], qty>{qty_min}, "
        f"{region_alias}<{region_max}."
    )


# ---------------------------------------------------------------------------
# 2a. NEW family: two point-coded roles of one tiny dimension
#     (JOB 20/28: comp_cast_type aliased twice, kind='cast' AND
#      kind='complete+verified' — both roles pinned by an equality code)
# ---------------------------------------------------------------------------


def _register_nation_codes_variant(suffix: str, cust_nation: str,
                                   supp_nation: str, extra_sql: str,
                                   extra_col) -> None:
    """Family: the same tiny dimension joined in two roles, each pinned
    by a point equality code."""
    extra = f"AND {extra_sql}" if extra_sql else ""
    oracle = f"""
    SELECT MIN(c_name) AS min_cust, MIN(s_name) AS min_supp,
           MIN(o_orderpriority) AS min_prio, COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name = '{cust_nation}' AND sn.n_name = '{supp_nation}' {extra}
    """

    name = "job_like_two_point_nation_codes"
    qname = name if suffix == "a" else f"{name}_{suffix}"

    @query(qname, oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        if extra_col is not None:
            li, o = extra_col(li, o)
        cust = load_table(spark, sf_dir, "customer")
        sup = load_table(spark, sf_dir, "supplier")
        cn = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name") == cust_nation
        ).select(F.col("n_nationkey").alias("cn_key"))
        sn = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name") == supp_nation
        ).select(F.col("n_nationkey").alias("sn_key"))
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
            .agg(
                F.min("c_name").alias("min_cust"),
                F.min("s_name").alias("min_supp"),
                F.min("o_orderpriority").alias("min_prio"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Two-point-nation-codes family, variant {suffix}: customer role "
        f"= '{cust_nation}', supplier role = '{supp_nation}'"
        + (f", {extra_sql}" if extra_sql else "")
        + ". Point codes on both roles make each broadcast a single-"
        "nation slice; the joint selectivity is their product — the "
        "comp_cast_type two-alias shape."
    )


# ---------------------------------------------------------------------------
# 2b. NEW family: entity–link–entity through the fact (JOB 32/33:
#     title–movie_link–title) — parts co-supplied by one supplier
# ---------------------------------------------------------------------------


def _register_co_supplied_variant(suffix: str, brand: str, ptype: str,
                                  qty_min: int) -> None:
    """Family: same dimension in two roles linked through two fact
    instances sharing a middle entity (part–lineitem–supplier–lineitem–
    part)."""
    # Semantically identical to the row-grain five-way join (each side
    # pre-aggregated to (supplier, part) grain with its lineitem
    # multiplicity; n = SUM(c1*c2) == COUNT(*) of row pairs, and the
    # MIN names are multiplicity-invariant).  The row-grain form is
    # what the Spark side executes; DuckDB's optimizer materialized a
    # >51 GiB intermediate for it at sf1 (r6 sweep finding), so the
    # oracle states the same semantics in the plan-robust form.
    oracle = f"""
    WITH a AS (
      SELECT l_suppkey AS s, p_partkey AS pk, MIN(p_name) AS pn,
             COUNT(*) AS c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = '{brand}' AND l_quantity > {qty_min}
      GROUP BY l_suppkey, p_partkey),
    b AS (
      SELECT l_suppkey AS s, p_partkey AS pk, MIN(p_name) AS pn,
             COUNT(*) AS c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = '{ptype}' AND l_quantity > {qty_min}
      GROUP BY l_suppkey, p_partkey),
    pairs AS (
      SELECT a.s, a.pn AS pn1, b.pn AS pn2, a.c * b.c AS cnt
      FROM a JOIN b ON a.s = b.s AND a.pk < b.pk)
    SELECT MIN(pn1) AS first_part, MIN(pn2) AS second_part,
           MIN(s_name) AS via_supplier,
           CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n
    FROM pairs JOIN supplier ON pairs.s = s_suppkey
    """

    name = "job_like_co_supplied_parts"
    qname = name if suffix == "a" else f"{name}_{suffix}"

    @query(qname, oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity") > qty_min
        )
        p1 = load_table(spark, sf_dir, "part").filter(
            F.col("p_brand") == brand
        ).select(F.col("p_partkey").alias("pk1"), F.col("p_name").alias("pn1"))
        p2 = load_table(spark, sf_dir, "part").filter(
            F.col("p_type") == ptype
        ).select(F.col("p_partkey").alias("pk2"), F.col("p_name").alias("pn2"))
        sup = load_table(spark, sf_dir, "supplier")
        l1 = li.select(
            F.col("l_partkey").alias("lp1"), F.col("l_suppkey").alias("ls1")
        )
        l2 = li.select(
            F.col("l_partkey").alias("lp2"), F.col("l_suppkey").alias("ls2")
        )
        return (
            l1.join(F.broadcast(p1), F.col("lp1") == F.col("pk1"))
            .join(sup, F.col("ls1") == F.col("s_suppkey"))
            .join(l2, F.col("ls2") == F.col("s_suppkey"))
            .join(F.broadcast(p2), F.col("lp2") == F.col("pk2"))
            .filter(F.col("pk1") < F.col("pk2"))
            .agg(
                F.min("pn1").alias("first_part"),
                F.min("pn2").alias("second_part"),
                F.min("s_name").alias("via_supplier"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Co-supplied-parts family (title–movie_link–title analog), "
        f"variant {suffix}: p1 brand '{brand}', p2 type '{ptype}', "
        f"qty>{qty_min}.  The l1 side reduces first (brand is ~1/28 of "
        "parts), so the supplier-key fan-out join runs on the reduced "
        "side; both part roles broadcast as filtered slices."
    )


# ---------------------------------------------------------------------------
# 2c. NEW family: one entity, two distinct 1:N side tables (JOB 29:
#     name→aka_name AND name→person_info)
# ---------------------------------------------------------------------------


def _register_double_bridge_variant(suffix: str, segment: str,
                                    event_type: str, status: str,
                                    extra_sql: str, extra_cust) -> None:
    """Family: customer bridged by BOTH its 1:N tables (orders, events)
    — the implicit many-to-many through the shared entity key."""
    extra = f"AND {extra_sql}" if extra_sql else ""
    oracle = f"""
    SELECT MIN(c_name) AS min_person, MIN(o_orderpriority) AS min_prio,
           COUNT(*) AS n
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN events ON user_id = c_custkey
    WHERE event_type = '{event_type}' AND o_orderstatus = '{status}'
      AND c_mktsegment = '{segment}' {extra}
    """

    name = "job_like_person_double_bridge"
    qname = name if suffix == "a" else f"{name}_{suffix}"

    @query(qname, oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == segment
        )
        if extra_cust is not None:
            cust = cust.filter(extra_cust())
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == status
        )
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("event_type") == event_type
        ).select("user_id")
        return (
            cust.join(o, cust.c_custkey == o.o_custkey)
            .join(ev, cust.c_custkey == ev.user_id)
            .agg(
                F.min("c_name").alias("min_person"),
                F.min("o_orderpriority").alias("min_prio"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Person-double-bridge family (name→aka_name + name→person_info "
        f"analog), variant {suffix}: segment '{segment}', event "
        f"'{event_type}', status '{status}'"
        + (f", {extra_sql}" if extra_sql else "")
        + ". Both bridges shuffle on the entity key; joining through "
        "the entity multiplies the two per-entity fan-outs."
    )


# ---------------------------------------------------------------------------
# 2d. NEW family: cyclic join graph closed by a non-key attribute
#     (the redundant-closure cliques of JOB 29)
# ---------------------------------------------------------------------------


def _register_diamond_variant(suffix: str, where_sql: str, li_col,
                              o_col) -> None:
    """Family: diamond cycle lineitem→orders→customer / lineitem→supplier
    closed by c_nationkey = s_nationkey."""
    oracle = f"""
    SELECT MIN(c_name) AS min_cust, MIN(s_name) AS min_supp,
           MIN(n_name) AS shared_nation, COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE {where_sql}
    """

    name = "job_like_diamond_clique"
    qname = name if suffix == "a" else f"{name}_{suffix}"

    @query(qname, oracle=oracle)
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(li_col())
        o = load_table(spark, sf_dir, "orders")
        if o_col is not None:
            o = o.filter(o_col())
        cust = load_table(spark, sf_dir, "customer")
        sup = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(
                sup,
                (li.l_suppkey == sup.s_suppkey)
                & (cust.c_nationkey == sup.s_nationkey),
            )
            .join(F.broadcast(n), sup.s_nationkey == n.n_nationkey)
            .agg(
                F.min("c_name").alias("min_cust"),
                F.min("s_name").alias("min_supp"),
                F.min("n_name").alias("shared_nation"),
                F.count("*").alias("n"),
            )
        )

    _q.__doc__ = (
        f"Diamond-clique family (redundant-closure cycle), variant "
        f"{suffix}: {where_sql}.  The c_nationkey = s_nationkey edge "
        "closes the 4-cycle; it can only be applied once both paths "
        "meet, so join order decides how long the unclosed intermediate "
        "survives — the JOB clique-planning stress."
    )


# ---------------------------------------------------------------------------
# registrations — 26 shapes: 87 existing + these = 113, the reference count
# ---------------------------------------------------------------------------

_register_disjunctive_variant(
    "b", "p_type = 'PROMO'", "n_name LIKE 'NATION_2%'",
    lambda: F.col("p_type") == "PROMO",
    lambda: F.col("n_name").like("NATION_2%"),
)
_register_disjunctive_variant(
    "c", "p_size > 47", "s_acctbal < 0",
    lambda: F.col("p_size") > 47,
    lambda: F.col("s_acctbal") < 0,
)
_register_disjunctive_variant(
    "d", "p_brand = 'Brand#13'", "n_name IN ('NATION_4', 'NATION_8')",
    lambda: F.col("p_brand") == "Brand#13",
    lambda: F.col("n_name").isin("NATION_4", "NATION_8"),
)

_register_negated_variant(
    "b",
    "p_brand NOT IN ('Brand#1', 'Brand#2', 'Brand#3')",
    "n_name NOT LIKE 'NATION_1%'",
    "l_linestatus <> 'F'",
    lambda: ~F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"),
    True,
    lambda: ~F.col("n_name").like("NATION_1%"),
    lambda: F.col("l_linestatus") != "F",
)
_register_negated_variant(
    "c",
    "p_size NOT BETWEEN 10 AND 40",
    "s_name NOT LIKE '%7%'",
    "l_returnflag <> 'N'",
    lambda: ~F.col("p_size").between(10, 40),
    False,
    lambda: ~F.col("s_name").like("%7%"),
    lambda: F.col("l_returnflag") != "N",
)
_register_negated_variant(
    "d",
    "p_name NOT LIKE '%b%'",
    "n_name NOT IN ('NATION_0', 'NATION_1', 'NATION_2')",
    "l_returnflag <> 'A'",
    lambda: ~F.col("p_name").like("%b%"),
    True,
    lambda: ~F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2"),
    lambda: F.col("l_returnflag") != "A",
)

_register_dense_star_variant(
    "b", "click", "o_orderpriority = '5-LOW'",
    lambda: F.col("o_orderpriority") == "5-LOW",
    "%e%", 10, 30, 40, 3, False,
)
_register_dense_star_variant(
    "c", "signup",
    "o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED')",
    lambda: F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"),
    "%o%", 1, 50, 10, 4, True,
)
_register_dense_star_variant(
    "d", "error", "o_orderstatus = 'P'",
    lambda: F.col("o_orderstatus") == "P",
    "%r%", 20, 45, 30, 2, False,
)

_register_nation_codes_variant("a", "NATION_3", "NATION_7", "", None)
_register_nation_codes_variant(
    "b", "NATION_12", "NATION_0", "l_returnflag = 'R'",
    lambda li, o: (li.filter(F.col("l_returnflag") == "R"), o),
)
_register_nation_codes_variant(
    # the kind='cast' / kind='cast' near-same-code case: both roles pin
    # the SAME nation → local-supplier semantics through the clique
    "c", "NATION_9", "NATION_9", "", None,
)
_register_nation_codes_variant(
    "d", "NATION_21", "NATION_14", "o_orderstatus = 'F'",
    lambda li, o: (li, o.filter(F.col("o_orderstatus") == "F")),
)
_register_nation_codes_variant(
    "e", "NATION_5", "NATION_18", "l_quantity > 35",
    lambda li, o: (li.filter(F.col("l_quantity") > 35), o),
)

_register_co_supplied_variant("a", "Brand#1", "PROMO", 30)
_register_co_supplied_variant("b", "Brand#16", "ECONOMY", 40)
_register_co_supplied_variant("c", "Brand#25", "STANDARD", 45)
_register_co_supplied_variant("d", "Brand#7", "SMALL", 35)

_register_double_bridge_variant("a", "BUILDING", "purchase", "O", "", None)
_register_double_bridge_variant(
    "b", "MACHINERY", "signup", "F", "c_acctbal > 0",
    lambda: F.col("c_acctbal") > 0,
)
_register_double_bridge_variant("c", "HOUSEHOLD", "error", "P", "", None)
_register_double_bridge_variant(
    "d", "AUTOMOBILE", "click", "O", "c_acctbal < 5000",
    lambda: F.col("c_acctbal") < 5000,
)

_register_diamond_variant(
    "a", "o_orderpriority = '2-HIGH' AND l_discount >= 0.06",
    lambda: F.col("l_discount") >= 0.06,
    lambda: F.col("o_orderpriority") == "2-HIGH",
)
_register_diamond_variant(
    "b", "o_orderstatus = 'F' AND l_quantity > 40",
    lambda: F.col("l_quantity") > 40,
    lambda: F.col("o_orderstatus") == "F",
)
_register_diamond_variant(
    "c", "o_totalprice > 150000 AND l_returnflag = 'R'",
    lambda: F.col("l_returnflag") == "R",
    lambda: F.col("o_totalprice") > 150000,
)
_register_diamond_variant(
    "d",
    "o_orderdate >= TIMESTAMP '1999-01-01' AND l_quantity BETWEEN 10 AND 20",
    lambda: F.col("l_quantity").between(10, 20),
    lambda: F.col("o_orderdate") >= "1999-01-01",
)

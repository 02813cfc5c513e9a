"""TPC-DS-shaped query corpus, second tranche (reference
benchmark/tpcds/sf1/, 99 queries, run by run_bench.py:97-98) — fifteen
more DS-distinctive patterns adapted to the fixture star schema,
covering the q3/q42/q52/q55 report family, q4/q74 multi-period growth,
q8 substring-geography, q12/q20/q98 windowed class share, q14
cross-channel INTERSECT, q15 OR-of-dimensions, q18/q27 rollup
multi-avgs, q24 global-average threshold, q37 band+EXISTS, q43
weekday matrix, q46/q68 two-role dimension inequality, q57 outlier
periods, q69 include/exclude channels, and q70 rank-pruned rollup.

Money/quantity sums use the exact integer-cents scheme from
relational.py; averages are expressed as CAST(SUM AS DOUBLE)/COUNT on
both engines (identical IEEE division, no engine-internal AVG merge
order in play) so hashes match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query
from data_chunk_compaction_in_duckdb_spark.queries.relational import _cents


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "tpcds_q3_brand_year_report",
    oracle="""
    SELECT EXTRACT(YEAR FROM l_shipdate) AS y, p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size BETWEEN 1 AND 15
    GROUP BY y, p_brand
    """,
)
def tpcds_q3_brand_year_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 shape (also the q42/q52/q55 family): the canonical DS report —
    fact x item dimension, dimension-attribute filter, year x brand
    revenue.  The p_size filter prunes part before the join, so the
    build side is a bounded dimension slice: broadcast is safe at any
    scale factor; one shuffle for the two-key groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").between(1, 15))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("y"), "p_brand")
        .agg((F.sum(_cents("l_extendedprice")) / 100.0).alias("revenue"))
    )


@query(
    "tpcds_q4_channel_growth_pair",
    oracle="""
    SELECT user_id, c1 / 100.0 AS click_h1, c2 / 100.0 AS click_h2,
           p1 / 100.0 AS buy_h1, p2 / 100.0 AS buy_h2
    FROM (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' AND EXTRACT(DAY FROM ts) <= 15
                      THEN c ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'click' AND EXTRACT(DAY FROM ts) > 15
                      THEN c ELSE 0 END) AS c2,
             SUM(CASE WHEN event_type = 'purchase' AND EXTRACT(DAY FROM ts) <= 15
                      THEN c ELSE 0 END) AS p1,
             SUM(CASE WHEN event_type = 'purchase' AND EXTRACT(DAY FROM ts) > 15
                      THEN c ELSE 0 END) AS p2
      FROM (SELECT user_id, event_type, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
            WHERE event_type IN ('click', 'purchase')) t
      GROUP BY user_id
    ) g
    WHERE c1 > 0 AND p1 > 0 AND c2 * p1 > p2 * c1
    """,
)
def tpcds_q4_channel_growth_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4/q74 shape: per-entity growth compared across two channels and
    two periods — DS does year-over-year per sales channel with 4+ CTE
    roles over the same fact; here one conditional-sum groupBy replaces
    the self-joins (one scan, one shuffle), and the growth comparison
    `c2/c1 > p2/p1` is cross-multiplied so it stays in exact integer
    arithmetic (no ratio doubles in the predicate)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    c = _cents("value")
    day = F.dayofmonth("ts")
    is_click = F.col("event_type") == "click"
    is_buy = F.col("event_type") == "purchase"

    def _slice(pred) -> F.Column:
        return F.sum(F.when(pred, c).otherwise(F.lit(0).cast("long")))

    g = ev.groupBy("user_id").agg(
        _slice(is_click & (day <= 15)).alias("c1"),
        _slice(is_click & (day > 15)).alias("c2"),
        _slice(is_buy & (day <= 15)).alias("p1"),
        _slice(is_buy & (day > 15)).alias("p2"),
    )
    return g.filter(
        (F.col("c1") > 0)
        & (F.col("p1") > 0)
        & (F.col("c2") * F.col("p1") > F.col("p2") * F.col("c1"))
    ).select(
        "user_id",
        (F.col("c1") / 100.0).alias("click_h1"),
        (F.col("c2") / 100.0).alias("click_h2"),
        (F.col("p1") / 100.0).alias("buy_h1"),
        (F.col("p2") / 100.0).alias("buy_h2"),
    )


@query(
    "tpcds_q8_name_prefix_agg",
    oracle="""
    SELECT substr(n_name, 8, 2) AS pfx,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE substr(n_name, 8, 1) IN ('1', '2')
    GROUP BY pfx
    """,
)
def tpcds_q8_name_prefix_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: geography collapsed to a substring prefix with an
    IN-list filter on the prefix (DS filters store zips by 5-char
    prefixes; the fixture's NATION_%d names play the zip role, so the
    prefix is the digit suffix starting at char 8).  The prefix
    predicate evaluates on the 25-row nation dimension before
    broadcast; the fact side never materializes the substring —
    grouping happens on the joined short key."""
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation").filter(
        F.substring("n_name", 8, 1).isin("1", "2")
    )
    return (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.substring("n_name", 8, 2).alias("pfx"))
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
    )


@query(
    "tpcds_q12_windowed_class_share",
    oracle="""
    SELECT p_type, p_brand, c / 100.0 AS revenue,
           ROUND(c * 100.0 / SUM(c) OVER (PARTITION BY p_type), 6) AS share_pct
    FROM (
      SELECT p_type, p_brand,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-03-01'
        AND l_shipdate <  TIMESTAMP '1998-03-31'
      GROUP BY p_type, p_brand
    ) g
    """,
)
def tpcds_q12_windowed_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12/q20 shape (the catalog/web siblings of q98): revenue share of
    each brand within its class, restricted to a 30-day window.  The
    share window partitions on p_type — the same key the groupBy just
    hashed on a superset of, so the window input is already small
    (brand x type grid); the date filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-03-01") & (F.col("l_shipdate") < "1998-03-31")
    )
    part = _t(spark, sf_dir, "part")
    g = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_cents("l_extendedprice")).alias("c"))
    )
    w = Window.partitionBy("p_type")
    return g.select(
        "p_type",
        "p_brand",
        (F.col("c") / 100.0).alias("revenue"),
        F.round(F.col("c") * 100.0 / F.sum("c").over(w), 6).alias("share_pct"),
    )


@query(
    "tpcds_q14_cross_channel_intersect",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_lines,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY p_brand
    """,
)
def tpcds_q14_cross_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: items appearing in ALL channels (DS: store INTERSECT
    catalog INTERSECT web) selected first, then the fact re-scanned
    restricted to them.  Each INTERSECT leg is a distinct key set (
    map-side partial dedup); the final restriction is a semi join, so
    the brand rollup only shuffles surviving lines.  At 100 TB the key
    sets are partkey-sized (bounded by the dimension), not fact-sized."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    keys = None
    for flag in ("A", "N", "R"):
        s = li.filter(F.col("l_returnflag") == flag).select("l_partkey").distinct()
        keys = s if keys is None else keys.intersect(s)
    return (
        li.join(keys, "l_partkey", "left_semi")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum(_cents("l_quantity")) / 100.0).alias("sum_qty"),
        )
    )


@query(
    "tpcds_q15_or_dims_agg",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE substr(n_name, 8, 1) IN ('3', '7')
       OR n_regionkey IN (1, 3)
       OR o_totalprice > 400000
    GROUP BY n_name
    """,
)
def tpcds_q15_or_dims_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: a disjunction spanning two dimension attributes AND a
    fact measure (DS: zip-list OR state-list OR sale>500) — the OR
    defeats simple pushdown, so the predicate must run post-join.  The
    dimension legs stay broadcast; only the residual filter touches the
    joined rows."""
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .filter(
            F.substring("n_name", 8, 1).isin("3", "7")
            | F.col("n_regionkey").isin(1, 3)
            | (F.col("o_totalprice") > 400000)
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
    )


@query(
    "tpcds_q18_rollup_customer_avgs",
    oracle="""
    SELECT r_name, n_name, c_mktsegment,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_price,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_acctbal,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name, c_mktsegment)
    """,
)
def tpcds_q18_rollup_customer_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: multiple averages over a geography ROLLUP (DS: country
    / state / county).  Averages are CAST(SUM AS DOUBLE)/COUNT of exact
    integer cents on both engines — partial-aggregate merge order can
    never shift the result, unlike engine-native AVG over doubles.
    ROLLUP is one shuffle (Catalyst Expand feeds one hash aggregate)."""
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            "r_name",
            "n_name",
            "c_mktsegment",
            _cents("o_totalprice").alias("pc"),
            _cents("c_acctbal").alias("bc"),
        )
    )
    n = F.count("*")
    return joined.rollup("r_name", "n_name", "c_mktsegment").agg(
        (F.sum("pc").cast("double") / n / 100.0).alias("avg_price"),
        (F.sum("bc").cast("double") / n / 100.0).alias("avg_acctbal"),
        n.alias("n_orders"),
    )


@query(
    "tpcds_q24_above_avg_group_sums",
    oracle="""
    WITH g AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_partkey
    ), t AS (SELECT SUM(c) AS tot, COUNT(*) AS n FROM g)
    SELECT l_partkey, c / 100.0 AS returned
    FROM g, t
    WHERE c * n > 2 * tot
    """,
)
def tpcds_q24_above_avg_group_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q24 shape: grouped sums kept only when they exceed a multiple of
    the all-groups average (DS: customers whose return total beats
    5% of the channel total).  The threshold compare is cross-multiplied
    (`c * n > 2 * tot`) so it stays in exact integers, and the global
    (tot, n) row rides a lazy crossJoin(broadcast) — one DAG, no driver
    sync (driver-side-state policy, SCALE.md)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    g = li.groupBy("l_partkey").agg(F.sum(_cents("l_extendedprice")).alias("c"))
    t = g.agg(F.sum("c").alias("tot"), F.count("*").alias("n"))
    return (
        g.crossJoin(F.broadcast(t))
        .filter(F.col("c") * F.col("n") > 2 * F.col("tot"))
        .select("l_partkey", (F.col("c") / 100.0).alias("returned"))
    )


@query(
    "tpcds_q27_rollup_item_geo_avgs",
    oracle="""
    SELECT p_brand, n_name,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_disc
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY ROLLUP(p_brand, n_name)
    """,
)
def tpcds_q27_rollup_item_geo_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q27 shape: three measure averages by item attribute with a
    geography ROLLUP (DS: item x ROLLUP(state)).  Same exact-integer
    average scheme as q18; the p_size filter bounds the part build
    side before broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    joined = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            "n_name",
            _cents("l_quantity").alias("qc"),
            _cents("l_extendedprice").alias("pc"),
            _cents("l_discount").alias("dc"),
        )
    )
    n = F.count("*")
    return joined.rollup("p_brand", "n_name").agg(
        (F.sum("qc").cast("double") / n / 100.0).alias("avg_qty"),
        (F.sum("pc").cast("double") / n / 100.0).alias("avg_price"),
        (F.sum("dc").cast("double") / n / 100.0).alias("avg_disc"),
    )


@query(
    "tpcds_q37_band_exists_parts",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_retailprice BETWEEN 940 AND 970
      AND p_size BETWEEN 10 AND 40
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey
                    AND l_shipdate >= TIMESTAMP '1998-01-01'
                    AND l_shipdate <  TIMESTAMP '1998-07-01')
    GROUP BY p_brand
    """,
)
def tpcds_q37_band_exists_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q37/q82 shape: items in a price/size band that actually moved in
    a date window (DS: inventory on-hand plus catalog sales EXISTS).
    The dimension filters evaluate first; the EXISTS becomes a semi
    join whose probe side is the date-pruned fact scan — build on the
    small filtered dimension, never the fact."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(940, 970) & F.col("p_size").between(10, 40)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-07-01")
    )
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


@query(
    "tpcds_q43_priority_weekday_matrix",
    oracle="""
    SELECT o_orderpriority,
           SUM(CASE WHEN dow = 0 THEN c ELSE 0 END) / 100.0 AS sun,
           SUM(CASE WHEN dow = 1 THEN c ELSE 0 END) / 100.0 AS mon,
           SUM(CASE WHEN dow = 2 THEN c ELSE 0 END) / 100.0 AS tue,
           SUM(CASE WHEN dow = 3 THEN c ELSE 0 END) / 100.0 AS wed,
           SUM(CASE WHEN dow = 4 THEN c ELSE 0 END) / 100.0 AS thu,
           SUM(CASE WHEN dow = 5 THEN c ELSE 0 END) / 100.0 AS fri,
           SUM(CASE WHEN dow = 6 THEN c ELSE 0 END) / 100.0 AS sat
    FROM (SELECT o_orderpriority,
                 date_diff('day', DATE '1992-01-05', o_orderdate) % 7 AS dow,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
          FROM orders
          WHERE EXTRACT(YEAR FROM o_orderdate) = 1997) t
    GROUP BY o_orderpriority
    """,
)
def tpcds_q43_priority_weekday_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q43 shape: one row per reporting entity, one column per weekday
    (DS: store x sun..sat).  DOW uses the engine-neutral
    days-since-a-known-Sunday mod 7 (the q2 idiom — engines number
    weekdays differently); the pivot is conditional sums, one scan,
    one groupBy on a 5-value key."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    base = o.select(
        "o_orderpriority",
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-05").cast("date")) % 7)
        .alias("dow"),
        _cents("o_totalprice").alias("c"),
    )
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        (
            F.sum(F.when(F.col("dow") == i, F.col("c")).otherwise(F.lit(0).cast("long")))
            / 100.0
        ).alias(names[i])
        for i in range(7)
    ]
    return base.groupBy("o_orderpriority").agg(*aggs)


@query(
    "tpcds_q46_nation_mismatch_orders",
    oracle="""
    SELECT o_orderkey, c_name, hn.n_name AS home_nation,
           COUNT(*) AS n_cross_lines,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS cross_rev
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation hn ON c_nationkey = hn.n_nationkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE o_orderpriority = '1-URGENT'
      AND l_quantity > 45
      AND hn.n_name <> sn.n_name
    GROUP BY o_orderkey, c_name, hn.n_name
    """,
)
def tpcds_q46_nation_mismatch_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q46/q68 shape: per-order detail rows where the transaction
    geography differs from the customer's home geography (DS: bought in
    a city they don't live in).  The nation dimension plays two roles —
    both broadcast; the grouped output is per-order, bounded by the
    selective priority+quantity filters which push to the scans."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    sup = _t(spark, sf_dir, "supplier")
    hn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hn_key"), F.col("n_name").alias("home_nation")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("ship_nation")
    )
    return (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(hn), cust.c_nationkey == F.col("hn_key"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn_key"))
        .filter(F.col("home_nation") != F.col("ship_nation"))
        .groupBy("o_orderkey", "c_name", "home_nation")
        .agg(
            F.count("*").alias("n_cross_lines"),
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("cross_rev"),
        )
    )


@query(
    "tpcds_q57_outlier_periods",
    oracle="""
    SELECT p_brand, d, v / 100.0 AS revenue, rnk
    FROM (
      SELECT p_brand, d, v,
             CAST(SUM(v) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(v) OVER (PARTITION BY p_brand) AS a,
             RANK() OVER (PARTITION BY p_brand ORDER BY v DESC) AS rnk
      FROM (
        SELECT p_brand, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS d,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, date_trunc('month', l_shipdate)
      ) m
    ) s
    WHERE ABS(CAST(v AS DOUBLE) - a) > 0.1 * a
    """,
)
def tpcds_q57_outlier_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q57 shape: monthly series per item with months deviating >10%
    from the item's average, ranked (DS: call-center monthly outliers).
    The mean is expressed as window SUM/COUNT of exact integer cents —
    not engine-native AVG — so both engines do the same single IEEE
    division.  Both windows share the groupBy's p_brand partitioning:
    no extra exchange."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    m = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.date_trunc("month", "l_shipdate").alias("d"))
        .agg(F.sum(_cents("l_extendedprice")).alias("v"))
    )
    wp = Window.partitionBy("p_brand")
    wr = Window.partitionBy("p_brand").orderBy(F.col("v").desc())
    avg = F.sum("v").over(wp).cast("double") / F.count("v").over(wp)
    return (
        m.select(
            "p_brand",
            "d",
            "v",
            avg.alias("a"),
            F.rank().over(wr).alias("rnk"),
        )
        .filter(F.abs(F.col("v").cast("double") - F.col("a")) > 0.1 * F.col("a"))
        .select("p_brand", "d", (F.col("v") / 100.0).alias("revenue"), "rnk")
    )


@query(
    "tpcds_q69_channel_include_exclude",
    oracle="""
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND EXTRACT(YEAR FROM o_orderdate) = 1997)
      AND NOT EXISTS (SELECT 1 FROM events
                      WHERE user_id = c_custkey AND event_type = 'purchase')
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def tpcds_q69_channel_include_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q69 shape: entities active in one channel but absent from
    another (DS: store buyers with no web/catalog activity) — an EXISTS
    plus a NOT EXISTS, i.e. a semi join chained with an anti join on
    the same probe side, then a demographic rollup."""
    cust = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left_semi")
        .join(ev, cust.c_custkey == ev.user_id, "left_anti")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


@query(
    "tpcds_q70_rank_pruned_rollup",
    oracle="""
    WITH natrev AS (
      SELECT r_name, n_name, n_nationkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name, n_nationkey
    ), top AS (
      SELECT n_nationkey FROM (
        SELECT n_nationkey,
               RANK() OVER (PARTITION BY r_name ORDER BY c DESC) AS rk
        FROM natrev
      ) WHERE rk <= 3
    )
    SELECT r_name, n_name, SUM(c) / 100.0 AS revenue
    FROM natrev
    WHERE n_nationkey IN (SELECT n_nationkey FROM top)
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def tpcds_q70_rank_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q70 shape: the reporting ROLLUP runs only over dimension members
    that rank top-k within their parent (DS: top-5 revenue states).
    The rank prefilter operates on the already-aggregated nation-level
    rows (25 rows here; dimension-bounded at any scale), so the window
    is cheap and the rollup re-aggregates the same tiny intermediate —
    the fact is scanned exactly once."""
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    natrev = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name", "n_nationkey")
        .agg(F.sum(_cents("o_totalprice")).alias("c"))
        # natrev (dimension-bounded, <= #nations rows) feeds both the
        # rank prefilter and the rollup; without materialization the
        # orders ⋈ customer fact join executed TWICE (guide §2.4 — the
        # r9 plan audit showed orders/customer scanned 2×, contradicting
        # the "fact scanned once" intent).  localCheckpoint, not persist:
        # per-instance, recomputed every invocation, no cross-run cache.
        # eager=False: the checkpoint materializes inside the first
        # consuming job — no separate blocking driver job (r10 A/B:
        # lazy <= eager in all 3 interleaved runs).
        .localCheckpoint(eager=False)
    )
    wr = Window.partitionBy("r_name").orderBy(F.col("c").desc())
    top = (
        natrev.select("n_nationkey", F.rank().over(wr).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("n_nationkey")
    )
    return (
        natrev.join(top, "n_nationkey", "left_semi")
        .rollup("r_name", "n_name")
        .agg((F.sum("c") / 100.0).alias("revenue"))
    )


@query(
    "tpcds_q22_hierarchy_band_avg",
    oracle="""
    SELECT p_brand, p_type, sz_band,
           CAST(SUM(qc) AS DOUBLE) / COUNT(*) / 100.0 AS avg_qty,
           COUNT(*) AS n_lines
    FROM (SELECT p_brand, p_type,
                 CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 25 THEN 'M'
                      WHEN p_size < 40 THEN 'L' ELSE 'XL' END AS sz_band,
                 CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
          FROM lineitem JOIN part ON l_partkey = p_partkey) t
    GROUP BY ROLLUP(p_brand, p_type, sz_band)
    """,
)
def tpcds_q22_hierarchy_band_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: average quantity over a 3-level item-hierarchy ROLLUP
    whose innermost level is a computed size band (DS rolls up the
    product hierarchy over inventory).  The band CASE is evaluated on
    the broadcast dimension before the join; the rollup stays one
    Expand + one exchange regardless of level count."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        F.when(F.col("p_size") < 10, "S")
        .when(F.col("p_size") < 25, "M")
        .when(F.col("p_size") < 40, "L")
        .otherwise("XL")
        .alias("sz_band"),
    )
    n = F.count("*")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("p_brand", "p_type", "sz_band", _cents("l_quantity").alias("qc"))
        .rollup("p_brand", "p_type", "sz_band")
        .agg(
            (F.sum("qc").cast("double") / n / 100.0).alias("avg_qty"),
            n.alias("n_lines"),
        )
    )


@query(
    "tpcds_q71_time_of_day_matrix",
    oracle="""
    SELECT c_mktsegment,
           SUM(CASE WHEN h BETWEEN 6 AND 11 THEN c ELSE 0 END) / 100.0
             AS morning,
           SUM(CASE WHEN h BETWEEN 12 AND 17 THEN c ELSE 0 END) / 100.0
             AS afternoon,
           SUM(CASE WHEN h BETWEEN 18 AND 23 THEN c ELSE 0 END) / 100.0
             AS evening,
           SUM(CASE WHEN h BETWEEN 0 AND 5 THEN c ELSE 0 END) / 100.0
             AS night
    FROM (SELECT user_id, EXTRACT(HOUR FROM ts) AS h,
                 CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase') e
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def tpcds_q71_time_of_day_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q71 shape: revenue by reporting entity x time-of-day bucket (DS:
    brand x breakfast/dinner), the time dimension derived in-query from
    the event timestamp.  The purchase filter prunes the fact before the
    customer join; the 4-bucket pivot is conditional sums in one
    aggregate."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cust = _t(spark, sf_dir, "customer")
    base = ev.select(
        "user_id", F.hour("ts").alias("h"), _cents("value").alias("c")
    ).join(cust, F.col("user_id") == cust.c_custkey)
    z = F.lit(0).cast("long")

    def bucket(lo: int, hi: int, name: str) -> F.Column:
        return (
            F.sum(F.when(F.col("h").between(lo, hi), F.col("c")).otherwise(z))
            / 100.0
        ).alias(name)

    return base.groupBy("c_mktsegment").agg(
        bucket(6, 11, "morning"),
        bucket(12, 17, "afternoon"),
        bucket(18, 23, "evening"),
        bucket(0, 5, "night"),
    )


@query(
    "tpcds_q76_null_key_channels",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN k7 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
           SUM(CASE WHEN k7 IS NULL THEN c ELSE 0 END) / 100.0
             AS null_key_value
    FROM (SELECT event_type,
                 NULLIF(CAST(json_extract(props, '$.k') AS BIGINT) % 7, 0)
                   AS k7,
                 CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events) t
    GROUP BY event_type
    """,
)
def tpcds_q76_null_key_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q76 shape: per-channel counts/sums of fact rows whose dimension
    key is NULL (DS unions three channels each probing a nullable key).
    The nullable key derives from the JSON payload (NULLIF residue
    class), so the NULL test exercises the JSON path + three-valued
    conditional aggregation in one scan."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr(
            "nullif(cast(get_json_object(props, '$.k') as bigint) % 7, 0)"
        ).alias("k7"),
        _cents("value").alias("c"),
    )
    z = F.lit(0).cast("long")
    return base.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("k7").isNull(), F.lit(1).cast("long")).otherwise(z)).alias(
            "n_null_key"
        ),
        (F.sum(F.when(F.col("k7").isNull(), F.col("c")).otherwise(z)) / 100.0).alias(
            "null_key_value"
        ),
    )


@query(
    "tpcds_q83_three_slice_share",
    oracle="""
    SELECT l_partkey,
           q1c / 100.0 AS q_mar, q2c / 100.0 AS q_apr, q3c / 100.0 AS q_may,
           ROUND(q1c * 300.0 / (q1c + q2c + q3c), 6) AS mar_share_pct3,
           ROUND(q2c * 300.0 / (q1c + q2c + q3c), 6) AS apr_share_pct3,
           ROUND(q3c * 300.0 / (q1c + q2c + q3c), 6) AS may_share_pct3
    FROM (
      SELECT l_partkey,
             SUM(CASE WHEN mo = 3 THEN qc ELSE 0 END) AS q1c,
             SUM(CASE WHEN mo = 4 THEN qc ELSE 0 END) AS q2c,
             SUM(CASE WHEN mo = 5 THEN qc ELSE 0 END) AS q3c
      FROM (SELECT l_partkey, EXTRACT(MONTH FROM l_shipdate) AS mo,
                   CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
            FROM lineitem
            WHERE l_returnflag = 'R'
              AND EXTRACT(YEAR FROM l_shipdate) = 1997
              AND EXTRACT(MONTH FROM l_shipdate) IN (3, 4, 5)) t
      GROUP BY l_partkey
    ) m
    WHERE q1c + q2c + q3c > 0
    """,
)
def tpcds_q83_three_slice_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q83 shape: per-item returned quantity in three aligned period
    slices, each expressed as its share of the three-slice total (DS
    aligns store/catalog/web return months).  One scan with conditional
    sums replaces DS's three-CTE join; the share `q/(tot/3)*100` is
    cross-multiplied to `q*300/tot` so the only float op is the final
    division of exact integers."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R")
        & (F.year("l_shipdate") == 1997)
        & F.month("l_shipdate").isin(3, 4, 5)
    )
    base = li.select(
        "l_partkey", F.month("l_shipdate").alias("mo"), _cents("l_quantity").alias("qc")
    )
    z = F.lit(0).cast("long")

    def slice_(mo: int, name: str) -> F.Column:
        return F.sum(F.when(F.col("mo") == mo, F.col("qc")).otherwise(z)).alias(name)

    m = base.groupBy("l_partkey").agg(
        slice_(3, "q1c"), slice_(4, "q2c"), slice_(5, "q3c")
    )
    tot = F.col("q1c") + F.col("q2c") + F.col("q3c")
    return m.filter(tot > 0).select(
        "l_partkey",
        (F.col("q1c") / 100.0).alias("q_mar"),
        (F.col("q2c") / 100.0).alias("q_apr"),
        (F.col("q3c") / 100.0).alias("q_may"),
        F.round(F.col("q1c") * 300.0 / tot, 6).alias("mar_share_pct3"),
        F.round(F.col("q2c") * 300.0 / tot, 6).alias("apr_share_pct3"),
        F.round(F.col("q3c") * 300.0 / tot, 6).alias("may_share_pct3"),
    )


@query(
    "tpcds_q19_brand_geo_mismatch",
    oracle="""
    SELECT p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
             AS mismatch_rev,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_nationkey <> s_nationkey
      AND p_size BETWEEN 20 AND 35
    GROUP BY p_brand
    """,
)
def tpcds_q19_brand_geo_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: brand-grain revenue restricted to transactions whose
    customer and fulfillment geographies differ (DS: buyer zip != store
    zip) — the aggregate-grain sibling of q46's per-order detail.  The
    nationkey inequality needs no nation join at all (both keys are
    already on the joined row); part is filtered then broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").between(20, 35))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("p_brand")
        .agg(
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("mismatch_rev"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpcds_q72_late_fulfillment",
    oracle="""
    SELECT p_brand, wk,
           COUNT(*) AS n_late,
           CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_supp
    FROM (
      SELECT l_partkey, l_suppkey,
             CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ) late
    JOIN part ON l_partkey = p_partkey
    LEFT JOIN supplier ON l_suppkey = s_suppkey AND s_acctbal < 0
    WHERE p_size <= 15
    GROUP BY p_brand, wk
    """,
)
def tpcds_q72_late_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q72 shape: fulfillment later than a date offset from the order
    (DS: inventory on-hand date more than 5 days after sale), reported
    per item/week, with a null-preserving LEFT JOIN to a qualifying
    dimension slice counted via NULL presence (DS's promotion left
    join).  The date-offset predicate is a non-equi condition between
    two fact columns — it rides the fact-fact equi-join and filters
    in-stage, never a range-join explosion."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    neg_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.date_trunc("week", "o_orderdate").alias("wk"),
        )
    )
    return (
        late.join(F.broadcast(part), late.l_partkey == part.p_partkey)
        .join(F.broadcast(neg_supp), late.l_suppkey == neg_supp.s_suppkey, "left")
        .groupBy("p_brand", "wk")
        .agg(
            F.count("*").alias("n_late"),
            F.sum(
                F.when(F.col("s_acctbal").isNotNull(), F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("n_neg_supp"),
        )
    )


@query(
    "tpcds_q29_sale_return_resale",
    oracle="""
    SELECT s.l_partkey,
           SUM(CAST(ROUND(s.l_quantity * 100) AS BIGINT)) / 100.0 AS sold_qty,
           SUM(CAST(ROUND(r.l_quantity * 100) AS BIGINT)) / 100.0 AS ret_qty,
           COUNT(*) AS n_pairs
    FROM (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
          WHERE l_returnflag = 'N') s
    JOIN (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
          WHERE l_returnflag = 'R') r
      ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
    GROUP BY s.l_partkey
    """,
)
def tpcds_q29_sale_return_resale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29 shape: the same fact joined to itself in two role slices
    (sold vs returned lines of the same order+part), quantities compared
    per item — DS's sale->return->re-sale chain with the fixture's two
    return-flag roles.  The self-join keys on (orderkey, partkey), so
    both sides shuffle once on the same compound key; AQE handles the
    skewed popular parts."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.filter(F.col("l_returnflag") == "N").select(
        F.col("l_orderkey").alias("s_ok"),
        F.col("l_partkey").alias("s_pk"),
        _cents("l_quantity").alias("s_qc"),
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"),
        F.col("l_partkey").alias("r_pk"),
        _cents("l_quantity").alias("r_qc"),
    )
    return (
        s.join(r, (F.col("s_ok") == F.col("r_ok")) & (F.col("s_pk") == F.col("r_pk")))
        .groupBy(F.col("s_pk").alias("l_partkey"))
        .agg(
            (F.sum("s_qc") / 100.0).alias("sold_qty"),
            (F.sum("r_qc") / 100.0).alias("ret_qty"),
            F.count("*").alias("n_pairs"),
        )
    )


@query(
    "tpcds_q62_transit_band_matrix",
    oracle="""
    SELECT o_orderpriority, l_linestatus,
           CAST(SUM(CASE WHEN d <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN d > 30 AND d <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN d > 60 AND d <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN d > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d_over
    FROM (SELECT o_orderpriority, l_linestatus,
                 date_diff('day', o_orderdate, l_shipdate) AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    GROUP BY o_orderpriority, l_linestatus
    """,
)
def tpcds_q62_transit_band_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q62/q99 shape: shipping-latency day-bands as columns, reported per
    TWO dimension attributes (DS: warehouse x ship mode) — unlike q50's
    single-dimension pivot, the band matrix here keys on a compound
    (priority, linestatus) pair.  One fact-fact join, one groupBy; the
    day difference is integer arithmetic on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        "l_linestatus",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("d"),
    )
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")

    def band(pred, name: str) -> F.Column:
        return F.sum(F.when(pred, one).otherwise(z)).alias(name)

    d = F.col("d")
    return base.groupBy("o_orderpriority", "l_linestatus").agg(
        band(d <= 30, "d30"),
        band((d > 30) & (d <= 60), "d60"),
        band((d > 60) & (d <= 90), "d90"),
        band(d > 90, "d_over"),
    )


@query(
    "tpcds_q74_quarterly_growth",
    oracle="""
    WITH q AS (
      SELECT o_custkey,
             EXTRACT(YEAR FROM o_orderdate) AS y,
             EXTRACT(QUARTER FROM o_orderdate) AS qtr,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
        AND EXTRACT(QUARTER FROM o_orderdate) = 1
      GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate),
               EXTRACT(QUARTER FROM o_orderdate)
    )
    SELECT cur.o_custkey, prev.c / 100.0 AS q1_1996, cur.c / 100.0 AS q1_1997
    FROM q cur JOIN q prev
      ON cur.o_custkey = prev.o_custkey AND cur.y = 1997 AND prev.y = 1996
    WHERE cur.c * 10 > prev.c * 15
    """,
)
def tpcds_q74_quarterly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q74 shape: q11's year-over-year growth at QUARTER grain — the
    period key is (year, quarter) and the growth bar is a 1.5x cross-
    multiplied integer compare, so the self-join aligns same-quarter
    slices of adjacent years on the pre-aggregated per-customer rows."""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    q = (
        o.filter(y.isin(1996, 1997) & (F.quarter("o_orderdate") == 1))
        .groupBy(
            "o_custkey", y.alias("y"), F.quarter("o_orderdate").alias("qtr")
        )
        .agg(F.sum(_cents("o_totalprice")).alias("c"))
    )
    cur = q.filter(F.col("y") == 1997).select(
        "o_custkey", F.col("c").alias("c97")
    )
    prev = q.filter(F.col("y") == 1996).select(
        "o_custkey", F.col("c").alias("c96")
    )
    return (
        cur.join(prev, "o_custkey")
        .filter(F.col("c97") * 10 > F.col("c96") * 15)
        .select(
            "o_custkey",
            (F.col("c96") / 100.0).alias("q1_1996"),
            (F.col("c97") / 100.0).alias("q1_1997"),
        )
    )


@query(
    "tpcds_q77_channel_net_rollup",
    oracle="""
    SELECT o_orderpriority,
           SUM(CASE WHEN l_returnflag <> 'R' THEN cents ELSE 0 END) / 100.0
             AS gross,
           SUM(CASE WHEN l_returnflag = 'R' THEN cents ELSE 0 END) / 100.0
             AS returned,
           SUM(CASE WHEN l_returnflag <> 'R' THEN cents ELSE -cents END)
             / 100.0 AS net
    FROM (SELECT o_orderpriority, l_returnflag,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    GROUP BY ROLLUP(o_orderpriority)
    """,
)
def tpcds_q77_channel_net_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q77/q80 shape: per-channel gross, returns, and RETURNS-NETTED
    revenue with a channel rollup total row — q5 reports sales only;
    the netting (gross minus returned in one signed conditional sum)
    is what q77 adds.  One fact join, one Expand aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        "l_returnflag",
        _cents("l_extendedprice").alias("cents"),
    )
    z = F.lit(0).cast("long")
    is_ret = F.col("l_returnflag") == "R"
    return base.rollup("o_orderpriority").agg(
        (F.sum(F.when(~is_ret, F.col("cents")).otherwise(z)) / 100.0).alias("gross"),
        (F.sum(F.when(is_ret, F.col("cents")).otherwise(z)) / 100.0).alias("returned"),
        (
            F.sum(F.when(~is_ret, F.col("cents")).otherwise(-F.col("cents"))) / 100.0
        ).alias("net"),
    )


@query(
    "tpcds_q94_dated_semi_anti",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l1
                  WHERE l1.l_orderkey = o.o_orderkey
                    AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey
                        AND l2.l_returnflag = 'R')
    """,
)
def tpcds_q94_dated_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q94/q95 shape: orders in a date window with a correlated EXISTS
    whose predicate compares columns ACROSS the outer and inner fact
    (shipped >30 days after the order date) and a NOT EXISTS excluding
    returns — q16's semi+anti with the dated cross-fact correlation
    added.  The cross-column predicate forces the semi join to carry
    o_orderdate through the join rather than pre-filtering lineitem."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey)
            & (
                late.l_shipdate
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
            ),
            "left_semi",
        )
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
    )

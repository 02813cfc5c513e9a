"""TPC-DS-shaped query corpus (reference benchmark/tpcds/sf1/, 99
queries, run by run_bench.py:97-98) — the DS-distinctive operator
patterns absent from the TPC-H set, adapted to the fixture tables:

- q88 shape: many independent scalar aggregates cross-joined into one
  wide row (reporting dashboards).
- q47 shape: window functions OVER an aggregate (period-over-period
  ratios with lag).
- q34 shape: HAVING COUNT BETWEEN band, joined back to the dimension.
- q35 shape: EXISTS AND (EXISTS OR EXISTS) multi-channel customer
  qualification.
- q93 shape: conditional +/- adjustment aggregation (returns offsetting
  sales).
- q67 shape: window rank OVER a ROLLUP's output (grouped and total rows
  rank in separate frames).
- q51 shape: two per-key cumulative series aligned by FULL OUTER join.

Money/value sums use the exact integer-cents scheme from relational.py
so hashes match DuckDB bit-for-bit.
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
    "tpcds_q88_multi_count",
    oracle="""
    SELECT a.h1, b.h2, c.h3, d.h4
    FROM (SELECT COUNT(*) AS h1 FROM events
          WHERE hour(ts) BETWEEN 0 AND 5 AND event_type = 'click') a,
         (SELECT COUNT(*) AS h2 FROM events
          WHERE hour(ts) BETWEEN 6 AND 11 AND event_type = 'click') b,
         (SELECT COUNT(*) AS h3 FROM events
          WHERE hour(ts) BETWEEN 12 AND 17 AND event_type = 'click') c,
         (SELECT COUNT(*) AS h4 FROM events
          WHERE hour(ts) BETWEEN 18 AND 23 AND event_type = 'click') d
    """,
)
def tpcds_q88_multi_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q88 shape: independent scalar counts combined by cross join into
    one row.  Spark evaluates the four single-row aggregates in parallel
    stages; the cross joins are trivially broadcast (1×1 rows) — at any
    scale this is 4 scans (or 1 with conditional aggregation; kept as 4
    to mirror the reference plan's operator structure)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    hour = F.hour("ts")
    parts = [
        ev.filter(hour.between(lo, hi)).agg(F.count("*").alias(name))
        for name, lo, hi in [("h1", 0, 5), ("h2", 6, 11), ("h3", 12, 17), ("h4", 18, 23)]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out


@query(
    "tpcds_q47_period_ratio",
    oracle="""
    SELECT event_type, d, v_c / 100.0 AS v,
           CAST(v_c AS DOUBLE) / prev_c AS ratio
    FROM (
      SELECT event_type, d, v_c,
             LAG(v_c) OVER (PARTITION BY event_type ORDER BY d) AS prev_c
      FROM (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v_c
        FROM events GROUP BY event_type, date_trunc('day', ts)
      ) daily
    ) seq
    WHERE prev_c IS NOT NULL AND prev_c > 0
    """,
)
def tpcds_q47_period_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47 shape: window over aggregate — day-over-day value ratio per
    event type.  One shuffle for the group-by; the lag window reuses the
    same hash partitioning on event_type (no second exchange)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(_cents("value")).alias("v_c"))
    w = Window.partitionBy("event_type").orderBy("d")
    return (
        daily.withColumn("prev_c", F.lag("v_c").over(w))
        .filter(F.col("prev_c").isNotNull() & (F.col("prev_c") > 0))
        .select(
            "event_type",
            "d",
            (F.col("v_c") / 100.0).alias("v"),
            (F.col("v_c").cast("double") / F.col("prev_c")).alias("ratio"),
        )
    )


@query(
    "tpcds_q34_count_band",
    oracle="""
    SELECT c_name, cnt
    FROM (
      SELECT o_custkey, COUNT(*) AS cnt
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey
      HAVING COUNT(*) BETWEEN 2 AND 10
    ) q
    JOIN customer ON o_custkey = c_custkey
    """,
)
def tpcds_q34_count_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q34 shape: grouped count constrained to a band, then joined back
    to the dimension for display columns."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    cust = _t(spark, sf_dir, "customer")
    band = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt").between(2, 10))
    )
    return band.join(cust, band.o_custkey == cust.c_custkey).select(
        "c_name", "cnt"
    )


@query(
    "tpcds_q35_multi_channel_exists",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS sum_bal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      AND (EXISTS (SELECT 1 FROM events
                   WHERE user_id = c_custkey AND event_type = 'purchase')
           OR EXISTS (SELECT 1 FROM events
                      WHERE user_id = c_custkey AND event_type = 'signup'))
    GROUP BY c_nationkey
    """,
)
def tpcds_q35_multi_channel_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q35 shape: customers qualified through one mandatory channel AND a
    disjunction of two others.  The OR of EXISTS becomes one semi-join
    against the union of the two event filters — same cardinality, one
    probe instead of two."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    ev = _t(spark, sf_dir, "events")
    either = ev.filter(
        F.col("event_type").isin("purchase", "signup")
    ).select("user_id")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .join(either, cust.c_custkey == either.user_id, "left_semi")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("sum_bal"),
        )
    )


@query(
    "tpcds_q93_conditional_adjust",
    oracle="""
    SELECT l_suppkey,
           SUM(CASE WHEN l_returnflag = 'R'
                    THEN -CAST(ROUND(l_quantity * 100) AS BIGINT)
                    ELSE  CAST(ROUND(l_quantity * 100) AS BIGINT) END) / 100.0
             AS net_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) >= 5
    """,
)
def tpcds_q93_conditional_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q93 shape: returns offset sales via a signed conditional sum —
    integer units keep the +/- arithmetic exact."""
    li = _t(spark, sf_dir, "lineitem")
    signed = F.when(
        F.col("l_returnflag") == "R", -_cents("l_quantity")
    ).otherwise(_cents("l_quantity"))
    return (
        li.groupBy("l_suppkey")
        .agg(
            (F.sum(signed) / 100.0).alias("net_qty"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 5)
    )


@query(
    "tpcds_q67_rank_over_rollup",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, o_orderpriority,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_c,
             CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
             RANK() OVER (
               PARTITION BY p_brand, GROUPING(o_orderpriority)
               ORDER BY SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) DESC,
                        o_orderpriority NULLS FIRST
             ) AS rk
      FROM lineitem
      JOIN part   ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_size <= 8
      GROUP BY ROLLUP (p_brand, o_orderpriority)
    ) t
    WHERE rk <= 3 AND p_brand IS NOT NULL
    """,
)
def tpcds_q67_rank_over_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q67 shape: window rank computed OVER the output of a ROLLUP —
    the grouped and total rows rank in separate frames (partition
    includes GROUPING()).  Exercises the aggregate→window pipeline with
    null-extended grouping keys."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 8)
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    qty_c = F.sum(_cents("l_quantity"))
    rolled = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .rollup("p_brand", "o_orderpriority")
        .agg(
            qty_c.alias("qty_c"),
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
        )
    )
    w = W.partitionBy("p_brand", "g_pri").orderBy(
        F.col("qty_c").desc(), F.col("o_orderpriority").asc_nulls_first()
    )
    return (
        rolled.withColumn("rk", F.rank().over(w))
        .filter((F.col("rk") <= 3) & F.col("p_brand").isNotNull())
    )


@query(
    "tpcds_q51_cumulative_full_outer",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS k, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY o_custkey
                                 ORDER BY date_trunc('day', o_orderdate)) AS BIGINT) AS cum_orders
      FROM orders WHERE o_custkey < 60 GROUP BY o_custkey, date_trunc('day', o_orderdate)
    ),
    e AS (
      SELECT user_id AS k, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id
                                 ORDER BY date_trunc('day', ts)) AS BIGINT) AS cum_events
      FROM events WHERE user_id < 60 GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT COALESCE(c.k, e.k) AS k, COALESCE(c.d, e.d) AS d,
           c.cum_orders AS cum_orders, e.cum_events AS cum_events
    FROM c FULL OUTER JOIN e ON c.k = e.k AND c.d = e.d
    """,
)
def tpcds_q51_cumulative_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51 shape: two per-key cumulative (running-total) series aligned
    by FULL OUTER join — window-over-aggregate on both sides, then the
    outer join preserves days present in only one series."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 60)
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    c = (
        orders.groupBy(
            F.col("o_custkey").alias("ck"),
            F.date_trunc("day", "o_orderdate").alias("cd"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn(
            "cum_orders",
            F.sum("n").over(W.partitionBy("ck").orderBy("cd")),
        )
        .drop("n")
    )
    e = (
        ev.groupBy(
            F.col("user_id").alias("ek"), F.date_trunc("day", "ts").alias("ed")
        )
        .agg(F.count("*").alias("n"))
        .withColumn(
            "cum_events",
            F.sum("n").over(W.partitionBy("ek").orderBy("ed")),
        )
        .drop("n")
    )
    return c.join(
        e, (c.ck == e.ek) & (c.cd == e.ed), "full_outer"
    ).select(
        F.coalesce("ck", "ek").alias("k"),
        F.coalesce("cd", "ed").alias("d"),
        "cum_orders",
        "cum_events",
    )


@query(
    "tpcds_q1_returns_above_avg",
    oracle="""
    WITH ctr AS (
      SELECT o_custkey AS cust, c_nationkey AS nat,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS total_c
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, c1.total_c / 100.0 AS returned
    FROM ctr c1 JOIN customer ON c1.cust = c_custkey
    WHERE c1.total_c * 10
          * (SELECT COUNT(*) FROM ctr c2 WHERE c2.nat = c1.nat)
          > 12 * (SELECT SUM(total_c) FROM ctr c2 WHERE c2.nat = c1.nat)
    ORDER BY c_name LIMIT 100
    """,
)
def tpcds_q1_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 shape: CTE of per-customer return totals, kept if above 1.2x the
    per-nation average (correlated aggregate subquery), joined back to the
    dimension for names.  Spark evaluates the correlated average as a
    window sum/count over the nation partition — one shuffle of the small
    CTE result instead of DuckDB's delim-join re-aggregation.  The
    above-average test is cross-multiplied into pure integer arithmetic
    (total*10*cnt > 12*sum) so both engines agree on boundary rows."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    ctr = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("total_c"))
    )
    w = Window.partitionBy("c_nationkey")
    qualified = (
        ctr.withColumn("nat_sum", F.sum("total_c").over(w))
        .withColumn("nat_cnt", F.count("*").over(w))
        .filter(
            F.col("total_c") * 10 * F.col("nat_cnt") > 12 * F.col("nat_sum")
        )
    )
    return (
        qualified.join(
            c.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_name", (F.col("total_c") / 100.0).alias("returned"))
        .orderBy("c_name")
        .limit(100)
    )


@query(
    "tpcds_q11_yoy_growth",
    oracle="""
    WITH yt AS (
      SELECT o_custkey AS cust, year(o_orderdate) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'u' ELSE 's' END AS chan,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS tot_c
      FROM orders
      WHERE year(o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2, 3
    )
    SELECT u1.cust AS c_custkey,
           u1.tot_c / 100.0 AS urgent_y1, u2.tot_c / 100.0 AS urgent_y2,
           s1.tot_c / 100.0 AS std_y1,    s2.tot_c / 100.0 AS std_y2
    FROM yt u1
    JOIN yt u2 ON u1.cust = u2.cust
    JOIN yt s1 ON u1.cust = s1.cust
    JOIN yt s2 ON u1.cust = s2.cust
    WHERE u1.yr = 1995 AND u1.chan = 'u'
      AND u2.yr = 1996 AND u2.chan = 'u'
      AND s1.yr = 1995 AND s1.chan = 's'
      AND s2.yr = 1996 AND s2.chan = 's'
      AND u1.tot_c > 0 AND s1.tot_c > 0
      AND u2.tot_c * s1.tot_c > s2.tot_c * u1.tot_c
    """,
)
def tpcds_q11_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11/q4 shape: customers whose year-over-year growth in one channel
    beats the other channel.  The reference plans this as a 4-way
    self-join of the per-customer-year CTE (one hash join per channel-year
    role); here the four series are conditional sums in ONE groupBy — a
    single shuffle of orders replaces four joins, the rewrite that matters
    when the CTE is 100 TB-derived.  Growth ratios compare by integer
    cross-multiplication (u2*s1 > s2*u1), never division, so boundary
    rows agree with the oracle exactly."""
    o = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    y = F.year("o_orderdate")

    def chan_year(pred, yr):
        return F.sum(
            F.when(pred & (y == yr), _cents("o_totalprice")).otherwise(F.lit(0))
        )

    g = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        chan_year(urgent, 1995).alias("u1"),
        chan_year(urgent, 1996).alias("u2"),
        chan_year(~urgent, 1995).alias("s1"),
        chan_year(~urgent, 1996).alias("s2"),
        F.max(F.when(urgent & (y == 1995), 1).otherwise(0)).alias("has_u1"),
        F.max(F.when(urgent & (y == 1996), 1).otherwise(0)).alias("has_u2"),
        F.max(F.when(~urgent & (y == 1995), 1).otherwise(0)).alias("has_s1"),
        F.max(F.when(~urgent & (y == 1996), 1).otherwise(0)).alias("has_s2"),
    )
    return (
        g.filter(
            (F.col("has_u1") == 1) & (F.col("has_u2") == 1)
            & (F.col("has_s1") == 1) & (F.col("has_s2") == 1)
            & (F.col("u1") > 0) & (F.col("s1") > 0)
            & (F.col("u2") * F.col("s1") > F.col("s2") * F.col("u1"))
        )
        .select(
            "c_custkey",
            (F.col("u1") / 100.0).alias("urgent_y1"),
            (F.col("u2") / 100.0).alias("urgent_y2"),
            (F.col("s1") / 100.0).alias("std_y1"),
            (F.col("s2") / 100.0).alias("std_y2"),
        )
    )


@query(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH urgent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    slow AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT CAST(SUM(CASE WHEN u.o_custkey IS NOT NULL AND s.o_custkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
           CAST(SUM(CASE WHEN u.o_custkey IS NOT NULL AND s.o_custkey IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
           CAST(SUM(CASE WHEN u.o_custkey IS NULL AND s.o_custkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS slow_only
    FROM urgent u FULL OUTER JOIN slow s ON u.o_custkey = s.o_custkey
    """,
)
def tpcds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q97 shape: FULL OUTER join of two distinct-customer channel sets,
    counted into both/left-only/right-only buckets.  Both DISTINCT inputs
    and the join share one hash partitioning on o_custkey, so AQE plans a
    single exchange per side and the counts reduce map-side."""
    o = _t(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_custkey").alias("u_cust"))
        .distinct()
    )
    slow = (
        o.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"))
        .select(F.col("o_custkey").alias("s_cust"))
        .distinct()
    )
    j = urgent.join(slow, urgent.u_cust == slow.s_cust, "full_outer")
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return j.agg(
        F.sum(
            flag(F.col("u_cust").isNotNull() & F.col("s_cust").isNotNull())
        ).alias("both_channels"),
        F.sum(
            flag(F.col("u_cust").isNotNull() & F.col("s_cust").isNull())
        ).alias("urgent_only"),
        F.sum(
            flag(F.col("u_cust").isNull() & F.col("s_cust").isNotNull())
        ).alias("slow_only"),
    )


@query(
    "tpcds_q38_intersect_channels",
    oracle="""
    SELECT COUNT(*) AS n_loyal FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
    ) t
    """,
)
def tpcds_q38_intersect_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q38 shape: customers present in all three channels via chained
    INTERSECT (planned as semi joins over distinct sets, the reference's
    plan_set_operation.cpp:25-39 strategy), then counted."""
    o = _t(spark, sf_dir, "orders")

    def chan(p):
        return o.filter(F.col("o_orderpriority") == p).select("o_custkey")

    loyal = chan("1-URGENT").intersect(chan("2-HIGH")).intersect(
        chan("3-MEDIUM")
    )
    return loyal.agg(F.count("*").alias("n_loyal"))


# ---------------------------------------------------------------------------
# Round-2 widening: 13 more DS-distinctive shapes from the reference's
# benchmark/tpcds/sf1/ 99-query corpus, adapted to the fixture schema.
# Exactness: money goes through integer cents (CAST(ROUND(x*100) AS
# BIGINT)), quantities through CAST(... AS BIGINT); ratios divide two
# exact integers (identical IEEE doubles in both engines) and only then
# round.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q9_case_buckets",
    oracle="""
    SELECT CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
           CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS b5
    FROM lineitem
    """,
)
def tpcds_q9_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape: one scan, five CASE bucket counts in a single wide row —
    the conditional-aggregation alternative to q88's N scans.  One pass,
    map-side partials, no shuffle beyond the single-row agg."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")

    def b(lo, hi):
        return F.sum(F.when(q.between(lo, hi), 1).otherwise(0).cast("long"))

    return li.agg(
        b(1, 10).alias("b1"),
        b(11, 20).alias("b2"),
        b(21, 30).alias("b3"),
        b(31, 40).alias("b4"),
        F.sum(F.when(q > 40, 1).otherwise(0).cast("long")).alias("b5"),
    )


@query(
    "tpcds_q23_frequent_items",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_partkey IN (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 35
    )
    """,
)
def tpcds_q23_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23 shape: frequent-item set built by a grouped HAVING subquery,
    then a semi join restricts the fact scan to those items.  The item
    set is aggregated (small) → broadcast semi join, fact never
    shuffles for the probe."""
    li = _t(spark, sf_dir, "lineitem")
    frequent = (
        li.groupBy("l_partkey").agg(F.count("*").alias("cnt")).filter(
            F.col("cnt") > 35
        )
    ).select("l_partkey")
    return (
        li.join(F.broadcast(frequent), "l_partkey", "left_semi")
        .agg(
            F.sum(_cents("l_extendedprice")).alias("rev_cents"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpcds_q36_margin_rollup_rank",
    oracle="""
    SELECT lochierarchy, r_name, n_name, qty,
           RANK() OVER (PARTITION BY lochierarchy,
                        CASE WHEN lochierarchy = 0 THEN r_name END
                        ORDER BY qty DESC, r_name NULLS FIRST,
                                 n_name NULLS FIRST) AS rank_within
    FROM (
      SELECT grouping(r_name) + grouping(n_name) AS lochierarchy,
             CASE WHEN grouping(r_name) = 0 THEN r_name END AS r_name,
             CASE WHEN grouping(n_name) = 0 THEN n_name END AS n_name,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
    ) t
    """,
)
def tpcds_q36_margin_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q36/q70 shape: RANK partitioned by the rollup's grouping LEVEL
    (lochierarchy trick — totals rank against totals, leaves against
    leaves within their parent).  Rollup is one shuffle; the window
    re-shuffles only the aggregated rows."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    g = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") + F.grouping("n_name")).alias("lochierarchy"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.grouping("r_name").alias("_gr"),
            F.grouping("n_name").alias("_gn"),
        )
        .select(
            "lochierarchy",
            F.when(F.col("_gr") == 0, F.col("r_name")).alias("r_name"),
            F.when(F.col("_gn") == 0, F.col("n_name")).alias("n_name"),
            "qty",
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("r_name")),
    ).orderBy(
        F.col("qty").desc(),
        F.col("r_name").asc_nulls_first(),
        F.col("n_name").asc_nulls_first(),
    )
    return g.select(
        "lochierarchy", "r_name", "n_name", "qty",
        F.rank().over(w).alias("rank_within"),
    )


@query(
    "tpcds_q59_mom_compare",
    oracle="""
    WITH monthly AS (
      SELECT n_name, EXTRACT(MONTH FROM o_orderdate) AS m, COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
      GROUP BY n_name, EXTRACT(MONTH FROM o_orderdate)
    )
    SELECT a.n_name, a.m AS m,
           a.n_orders AS cur, b.n_orders AS nxt,
           ROUND(CAST(b.n_orders AS DOUBLE) / a.n_orders, 4) AS ratio
    FROM monthly a JOIN monthly b
      ON a.n_name = b.n_name AND b.m = a.m + 1
    """,
)
def tpcds_q59_mom_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59 shape: a periodic aggregate self-joined at period+1 to compare
    consecutive months.  The monthly CTE aggregates once and joins to
    itself on (nation, month) — both sides shrink to groups before the
    join."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.month("o_orderdate").alias("m"))
        .agg(F.count("*").alias("n_orders"))
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    return a.join(
        b,
        (F.col("a.n_name") == F.col("b.n_name"))
        & (F.col("b.m") == F.col("a.m") + 1),
    ).select(
        F.col("a.n_name").alias("n_name"),
        F.col("a.m").alias("m"),
        F.col("a.n_orders").alias("cur"),
        F.col("b.n_orders").alias("nxt"),
        F.round(
            F.col("b.n_orders").cast("double") / F.col("a.n_orders"), 4
        ).alias("ratio"),
    )


@query(
    "tpcds_q89_deviation_from_avg",
    oracle="""
    SELECT p_brand, m, qty, avg_qty
    FROM (
      SELECT p_brand, m, qty,
             AVG(qty) OVER (PARTITION BY p_brand) AS avg_qty
      FROM (
        SELECT p_brand, EXTRACT(MONTH FROM l_shipdate) AS m,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type LIKE 'PROMO%'
        GROUP BY p_brand, EXTRACT(MONTH FROM l_shipdate)
      ) g
    ) t
    WHERE qty > 1.1 * avg_qty
    """,
)
def tpcds_q89_deviation_from_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q89/q63 shape: monthly aggregate, window AVG per brand over the
    months, keep months deviating above the brand mean.  The window runs
    over already-aggregated rows (tiny); inputs to the float compare are
    exact integers so both engines compute identical doubles."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    g = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.month("l_shipdate").alias("m"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    w = Window.partitionBy("p_brand")
    return (
        g.withColumn("avg_qty", F.avg("qty").over(w))
        .filter(F.col("qty") > 1.1 * F.col("avg_qty"))
        .select("p_brand", "m", "qty", "avg_qty")
    )


@query(
    "tpcds_q65_below_avg_parts",
    oracle="""
    WITH part_rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand, COUNT(*) AS n_cheap
    FROM part_rev
    JOIN part ON l_partkey = p_partkey
    WHERE rev_c < 0.5 * (SELECT AVG(rev_c) FROM part_rev)
    GROUP BY p_brand
    """,
)
def tpcds_q65_below_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q65 shape: per-item revenue compared against a fraction of the
    global average item revenue (scalar subquery → lazy broadcast
    single-row join, the q22 pattern — no driver collect)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("rev_c")
    )
    avg_rev = part_rev.agg(F.avg("rev_c").alias("_avg_rev"))
    return (
        part_rev.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("rev_c") < 0.5 * F.col("_avg_rev"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_cheap"))
    )


@query(
    "tpcds_q25_three_fact",
    oracle="""
    SELECT o1.o_orderpriority, COUNT(*) AS n
    FROM orders o1
    JOIN lineitem r  ON r.l_orderkey = o1.o_orderkey AND r.l_returnflag = 'R'
    JOIN orders o2   ON o2.o_custkey = o1.o_custkey
                    AND o2.o_orderdate > o1.o_orderdate
    GROUP BY o1.o_orderpriority
    """,
)
def tpcds_q25_three_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q25/q29 shape: three fact roles — a sale, its return, and a later
    repurchase by the same customer (sales ⋈ returns ⋈ sales).  First
    join co-partitions on orderkey, second re-shuffles on custkey; the
    date predicate stays a join residual."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o1 = o.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("c1"),
        F.col("o_orderdate").alias("d1"),
        F.col("o_orderpriority"),
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("kr")
    )
    o2 = o.select(
        F.col("o_custkey").alias("c2"), F.col("o_orderdate").alias("d2")
    )
    return (
        o1.join(r, F.col("kr") == F.col("k1"))
        .join(o2, (F.col("c2") == F.col("c1")) & (F.col("d2") > F.col("d1")))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "tpcds_q31_qoq_growth",
    oracle="""
    WITH q AS (
      SELECT n_name, EXTRACT(QUARTER FROM o_orderdate) AS qtr, COUNT(*) AS cnt
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate)
    )
    SELECT q1.n_name, q1.cnt AS c1, q2.cnt AS c2,
           ROUND(CAST(q2.cnt AS DOUBLE) / q1.cnt, 4) AS growth
    FROM q q1 JOIN q q2 ON q1.n_name = q2.n_name AND q1.qtr = 1 AND q2.qtr = 2
    WHERE q2.cnt > q1.cnt
    """,
)
def tpcds_q31_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q31 shape: quarter-over-quarter growth per region, keeping only
    growing groups.  Same aggregate reused under two filters — Catalyst
    caches nothing between CTE references, but both sides reduce before
    the tiny equi-join."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    q = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.quarter("o_orderdate").alias("qtr"))
        .agg(F.count("*").alias("cnt"))
    )
    q1 = q.filter(F.col("qtr") == 1).select(
        F.col("n_name"), F.col("cnt").alias("c1")
    )
    q2 = q.filter(F.col("qtr") == 2).select(
        F.col("n_name").alias("n2"), F.col("cnt").alias("c2")
    )
    return (
        q1.join(q2, F.col("n_name") == F.col("n2"))
        .filter(F.col("c2") > F.col("c1"))
        .select(
            "n_name", "c1", "c2",
            F.round(F.col("c2").cast("double") / F.col("c1"), 4).alias("growth"),
        )
    )


@query(
    "tpcds_q54_revenue_bands",
    oracle="""
    SELECT band, COUNT(*) AS n_custs
    FROM (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               // 5000000 AS band
      FROM orders GROUP BY o_custkey
    ) t
    GROUP BY band
    """,
)
def tpcds_q54_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q54 shape: histogram of customers by lifetime-spend band (integer
    bucket width $50k in cents).  Two cascaded aggregations, the second
    over an already-small domain."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("spend_c")
    )
    t = F.col("spend_c")
    band = ((t - t % 5000000) / 5000000).cast("long")
    return (
        spend.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count("*").alias("n_custs"))
    )


@query(
    "tpcds_q49_topn_union_channels",
    oracle="""
    SELECT * FROM (
      SELECT 'orders' AS channel, CAST(o_custkey AS BIGINT) AS cust_id, cnt, rnk
      FROM (
        SELECT o_custkey, COUNT(*) AS cnt,
               RANK() OVER (ORDER BY COUNT(*) DESC, o_custkey) AS rnk
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
      ) a WHERE rnk <= 5
      UNION ALL
      SELECT 'events' AS channel, CAST(user_id AS BIGINT) AS cust_id, cnt, rnk
      FROM (
        SELECT user_id, COUNT(*) AS cnt,
               RANK() OVER (ORDER BY COUNT(*) DESC, user_id) AS rnk
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
      ) b WHERE rnk <= 5
    ) u
    """,
)
def tpcds_q49_topn_union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q49 shape: per-channel top-N by rank, UNION ALL'd with a channel
    tag.  Each branch aggregates then ranks its own (small) group table;
    the global-rank window runs over aggregated rows only."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")

    def top5(df, key, tag):
        g = df.groupBy(key).agg(F.count("*").alias("cnt"))
        # Scale safety: a global rank window funnels all groups through
        # one task, so pre-prune to each hash-bucket's local top 5 (any
        # global top-5 row is in its bucket's top 5) — the final window
        # then orders ≤ 5×n_buckets rows.
        order = [F.col("cnt").desc(), F.col(key)]
        wb = Window.partitionBy(F.abs(F.hash(key)) % 64).orderBy(*order)
        pruned = (
            g.withColumn("_brnk", F.row_number().over(wb))
            .filter(F.col("_brnk") <= 5)
            .drop("_brnk")
        )
        w = Window.orderBy(*order)
        return (
            pruned.withColumn("rnk", F.rank().over(w))
            .filter(F.col("rnk") <= 5)
            .select(
                F.lit(tag).alias("channel"),
                F.col(key).cast("long").alias("cust_id"),
                "cnt",
                "rnk",
            )
        )

    return top5(o, "o_custkey", "orders").unionByName(
        top5(e, "user_id", "events")
    )


@query(
    "tpcds_q21_before_after",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CASE WHEN l_shipdate <  DATE '1998-07-01'
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
             AS qty_before,
           CAST(SUM(CASE WHEN l_shipdate >= DATE '1998-07-01'
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
             AS qty_after
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    GROUP BY p_brand
    HAVING SUM(CASE WHEN l_shipdate <  DATE '1998-07-01'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 3
         > SUM(CASE WHEN l_shipdate >= DATE '1998-07-01'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 2
       AND SUM(CASE WHEN l_shipdate <  DATE '1998-07-01'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 2
         < SUM(CASE WHEN l_shipdate >= DATE '1998-07-01'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) * 3
    """,
)
def tpcds_q21_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: before/after pivot around a date, keeping brands whose
    ratio stays within (2/3, 3/2) — DS q21's band, in exact integer
    cross-multiplied form, no float boundary anywhere.  (Pivot
    1998-07-01 splits the fixture's 1995-2001 shipdate range near its
    middle; the round-1 pivot of 1995-06-01 left the before leg ~5
    months vs 6.5 years and the band empty.)"""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    qty = F.col("l_quantity").cast("long")
    before = F.sum(
        F.when(F.col("l_shipdate") < "1998-07-01", qty).otherwise(F.lit(0))
    )
    after = F.sum(
        F.when(F.col("l_shipdate") >= "1998-07-01", qty).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(before.alias("qty_before"), after.alias("qty_after"))
        .filter(
            (F.col("qty_before") * 3 > F.col("qty_after") * 2)
            & (F.col("qty_before") * 2 < F.col("qty_after") * 3)
        )
    )


@query(
    "tpcds_q78_channel_ratio",
    oracle="""
    WITH ord AS (
      SELECT o_custkey AS cust, COUNT(*) AS n_ord
      FROM orders GROUP BY o_custkey
    ),
    ev AS (
      SELECT user_id AS cust, COUNT(*) AS n_ev
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(ord.cust, ev.cust) AS cust,
           coalesce(n_ord, 0) AS n_ord, coalesce(n_ev, 0) AS n_ev
    FROM ord FULL OUTER JOIN ev ON ord.cust = ev.cust
    WHERE coalesce(n_ord, 0) >= 20 OR coalesce(n_ev, 0) >= 20
    """,
)
def tpcds_q78_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q78 shape: per-customer activity across two channels aligned by
    FULL OUTER join with COALESCE defaults — customers missing from a
    channel still appear.  Both inputs are pre-aggregated before the
    join."""
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ord_ = o.groupBy(F.col("o_custkey").alias("cust_o")).agg(
        F.count("*").alias("n_ord")
    )
    ev = e.groupBy(F.col("user_id").alias("cust_e")).agg(
        F.count("*").alias("n_ev")
    )
    j = ord_.join(ev, F.col("cust_o") == F.col("cust_e"), "full_outer")
    return (
        j.select(
            F.coalesce(F.col("cust_o"), F.col("cust_e")).alias("cust"),
            F.coalesce(F.col("n_ord"), F.lit(0)).alias("n_ord"),
            F.coalesce(F.col("n_ev"), F.lit(0)).alias("n_ev"),
        )
        .filter((F.col("n_ord") >= 20) | (F.col("n_ev") >= 20))
    )


@query(
    "tpcds_q6_above_avg_price",
    oracle="""
    WITH typed AS (
      SELECT p_partkey, p_retailprice,
             AVG(p_retailprice) OVER (PARTITION BY p_type) AS avg_price
      FROM part
    )
    SELECT n_name, COUNT(*) AS n
    FROM lineitem
    JOIN typed    ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_retailprice > 1.03 * avg_price
    GROUP BY n_name
    """,
)
def tpcds_q6_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 shape: items priced above 1.03x their type's average (window
    AVG inside the dimension), then fact joins count per nation.  The
    window runs over the part dimension only; the enriched dimension
    broadcasts.  (DS uses 1.2x over a wide price domain; the fixture's
    p_retailprice spans only 900..999.9, where 1.2x the mean exceeds the
    max and returned nothing — 1.03x keeps the same shape selective.)"""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("p_type")
    typed = (
        p.withColumn("avg_price", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > 1.03 * F.col("avg_price"))
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(typed), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )


@query(
    "tpcds_q64_repeat_purchase",
    oracle="""
    WITH yearly AS (
      SELECT l_partkey AS pk, o_custkey AS ck,
             EXTRACT(YEAR FROM o_orderdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey, o_custkey, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT COUNT(*) AS n_repeat_pairs,
           CAST(MIN(a.pk) AS BIGINT) AS min_part
    FROM yearly a JOIN yearly b
      ON a.pk = b.pk AND a.ck = b.ck AND b.y = a.y + 1
    """,
)
def tpcds_q64_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q64 shape: (customer, item) pairs purchased in two CONSECUTIVE
    years.  The DS formulation (and this oracle) is a year+1 self-join
    of the deduped (part, cust, year) grain; the Spark plan instead
    dedups to the (part, cust, year) grain and flags rows whose
    predecessor year exists via lag() over (pk, ck) — the self-join
    collapses into dedup + one window, the fact subtree is scanned ONCE
    instead of twice, and every operator stays in codegen (a collect_set
    formulation was tried and lost: object-hash aggregation over near-
    unique (pk, ck) groups costs more than the shuffle it saves)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    dedup = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("o_custkey").alias("ck"),
            F.year("o_orderdate").alias("y"),
        )
        .distinct()
    )
    w = Window.partitionBy("pk", "ck").orderBy("y")
    flagged = dedup.withColumn("prev", F.lag("y").over(w)).filter(
        F.col("prev") == F.col("y") - 1
    )
    return flagged.agg(
        F.count("*").alias("n_repeat_pairs"),
        F.min("pk").cast("long").alias("min_part"),
    )


@query(
    "tpcds_q17_quantity_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           ROUND(SQRT((COUNT(*) * SUM(CAST(l_quantity AS BIGINT)
                                      * CAST(l_quantity AS BIGINT))
                       - SUM(CAST(l_quantity AS BIGINT))
                         * SUM(CAST(l_quantity AS BIGINT)))
                      / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1))), 4)
             AS qty_std
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def tpcds_q17_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: per-group dispersion statistics.  stddev is computed
    FROM EXACT INTEGER sums (n·Σx² − (Σx)²) rather than the engines'
    streaming moment aggregates, whose merge order differs between Spark
    and DuckDB in the last float bits — identical doubles on both sides,
    one aggregation pass."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    n = F.count("*")
    s = F.sum(q)
    ss = F.sum(q * q)
    var = (n * ss - s * s) / (n.cast("double") * (n - 1))
    return li.groupBy("l_returnflag").agg(
        n.cast("long").alias("n"),
        s.alias("qty_sum"),
        F.round(F.sqrt(var), 4).alias("qty_std"),
    )


@query(
    "tpcds_q39_cov_filter",
    oracle="""
    SELECT pk, m, n, mean_x100
    FROM (
      SELECT l_partkey AS pk, EXTRACT(MONTH FROM l_shipdate) AS m,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) * 100 // COUNT(*) AS BIGINT)
               AS mean_x100,
             COUNT(*) * SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT))
               - SUM(CAST(l_quantity AS BIGINT))
                 * SUM(CAST(l_quantity AS BIGINT)) AS m2n
      FROM lineitem
      GROUP BY l_partkey, EXTRACT(MONTH FROM l_shipdate)
    ) t
    WHERE n >= 4 AND m2n > n * n * 25
    """,
)
def tpcds_q39_cov_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q39 shape: keep (item, month) groups whose quantity variance
    exceeds a coefficient-of-variation-style threshold — the comparison
    stays in cross-multiplied exact integers (m2n > n²·25 ⇔ sample
    var·n(n−1) > n²·25), so no float boundary exists anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    n = F.count("*")
    s = F.sum(q)
    ss = F.sum(q * q)
    g = li.groupBy(
        F.col("l_partkey").alias("pk"), F.month("l_shipdate").alias("m")
    ).agg(
        n.cast("long").alias("n"),
        ((s * 100 - (s * 100) % n) / n).cast("long").alias("mean_x100"),
        (n * ss - s * s).alias("m2n"),
    )
    return (
        g.filter((F.col("n") >= 4) & (F.col("m2n") > F.col("n") * F.col("n") * 25))
        .select("pk", "m", "n", "mean_x100")
    )


@query(
    "tpcds_q90_am_pm_ratio",
    oracle="""
    SELECT ROUND(CAST(am.n AS DOUBLE) / pm.n, 4) AS am_pm_ratio,
           am.n AS n_am, pm.n AS n_pm
    FROM (SELECT COUNT(*) AS n FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11) am,
         (SELECT COUNT(*) AS n FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 23) pm
    """,
)
def tpcds_q90_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q90 shape: ratio of two disjoint time-slice counts — two scalar
    aggregates combined by a 1×1 cross join; ratio of exact integers is
    the same double in both engines."""
    ev = _t(spark, sf_dir, "events")
    h = F.hour("ts")
    am = ev.filter(h.between(6, 11)).agg(F.count("*").alias("n_am"))
    pm = ev.filter(h.between(18, 23)).agg(F.count("*").alias("n_pm"))
    return am.crossJoin(F.broadcast(pm)).select(
        F.round(F.col("n_am").cast("double") / F.col("n_pm"), 4).alias(
            "am_pm_ratio"
        ),
        "n_am",
        "n_pm",
    )


@query(
    "tpcds_q98_revenue_share",
    oracle="""
    SELECT p_type, p_brand, rev_c,
           ROUND(CAST(rev_c AS DOUBLE) * 100
                 / SUM(rev_c) OVER (PARTITION BY p_type), 6) AS share_pct
    FROM (
      SELECT p_type, p_brand,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_brand
    ) g
    """,
)
def tpcds_q98_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q98/q12 shape: each brand's revenue share within its item type —
    window SUM over the aggregated rows only; shares divide exact cents
    so the doubles agree bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    g = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_cents("l_extendedprice")).alias("rev_c"))
    )
    w = Window.partitionBy("p_type")
    return g.select(
        "p_type",
        "p_brand",
        "rev_c",
        F.round(
            F.col("rev_c").cast("double") * 100 / F.sum("rev_c").over(w), 6
        ).alias("share_pct"),
    )


@query(
    "tpcds_q33_triple_union_by_brand",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CASE WHEN ch = 'ret' THEN q ELSE 0 END) AS BIGINT) AS q_ret,
           CAST(SUM(CASE WHEN ch = 'fin' THEN q ELSE 0 END) AS BIGINT) AS q_fin,
           CAST(SUM(CASE WHEN ch = 'big' THEN q ELSE 0 END) AS BIGINT) AS q_big
    FROM (
      SELECT 'ret' AS ch, p_brand, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'fin', p_brand, CAST(l_quantity AS BIGINT)
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linestatus = 'F'
      UNION ALL
      SELECT 'big', p_brand, CAST(l_quantity AS BIGINT)
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 40
    ) u
    GROUP BY p_brand
    """,
)
def tpcds_q33_triple_union_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q33/q56/q60 shape: three channel branches UNION ALL'd with a tag,
    re-aggregated into one wide row per item attribute.  Each branch
    reuses the same broadcast part dimension; one shuffle on brand."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    base = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity").cast("long")

    def branch(tag, cond):
        return base.filter(cond).select(
            F.lit(tag).alias("ch"), F.col("p_brand"), q.alias("q")
        )

    u = (
        branch("ret", F.col("l_returnflag") == "R")
        .unionByName(branch("fin", F.col("l_linestatus") == "F"))
        .unionByName(branch("big", F.col("l_quantity") > 40))
    )
    return u.groupBy("p_brand").agg(
        F.sum(F.when(F.col("ch") == "ret", F.col("q")).otherwise(0)).alias("q_ret"),
        F.sum(F.when(F.col("ch") == "fin", F.col("q")).otherwise(0)).alias("q_fin"),
        F.sum(F.when(F.col("ch") == "big", F.col("q")).otherwise(0)).alias("q_big"),
    )


@query(
    "tpcds_q5_channel_rollup",
    oracle="""
    SELECT coalesce(channel, 'ALL') AS channel,
           coalesce(grp, 'ALL') AS grp,
           COUNT(*) AS n_rows,
           CAST(SUM(v_c) AS BIGINT) AS v_c
    FROM (
      SELECT 'orders' AS channel, o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v_c
      FROM orders
      UNION ALL
      SELECT 'events', event_type,
             CAST(ROUND(value * 100) AS BIGINT)
      FROM events WHERE value IS NOT NULL
    ) u
    GROUP BY ROLLUP(channel, grp)
    """,
)
def tpcds_q5_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5/q77 shape: per-channel reports UNION ALL'd, then ROLLUP over
    (channel, group) yields leaf rows, channel subtotals, and a grand
    total in one aggregation."""
    o = _t(spark, sf_dir, "orders").select(
        F.lit("orders").alias("channel"),
        F.col("o_orderpriority").alias("grp"),
        _cents("o_totalprice").alias("v_c"),
    )
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.lit("events").alias("channel"),
            F.col("event_type").alias("grp"),
            _cents("value").alias("v_c"),
        )
    )
    return (
        o.unionByName(e)
        .rollup("channel", "grp")
        .agg(F.count("*").alias("n_rows"), F.sum("v_c").alias("v_c"))
        .select(
            F.coalesce(F.col("channel"), F.lit("ALL")).alias("channel"),
            F.coalesce(F.col("grp"), F.lit("ALL")).alias("grp"),
            "n_rows",
            "v_c",
        )
    )


@query(
    "tpcds_q61_promo_ratio",
    oracle="""
    SELECT n_name,
           CAST(promo_c AS BIGINT) AS promo_c,
           CAST(total_c AS BIGINT) AS total_c,
           ROUND(CAST(promo_c AS DOUBLE) * 100 / total_c, 4) AS promo_pct
    FROM (
      SELECT n_name,
             SUM(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS promo_c,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS total_c
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name
    ) g
    WHERE total_c > 0
    """,
)
def tpcds_q61_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q61 shape (TPC-H q14's DS cousin): promotional share of revenue
    per nation — conditional cents sum over the same single aggregation,
    ratio of exact integers."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = _cents("l_extendedprice")
    g = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.when(F.col("p_type").like("PROMO%"), cents).otherwise(0)
            ).alias("promo_c"),
            F.sum(cents).alias("total_c"),
        )
        .filter(F.col("total_c") > 0)
    )
    return g.select(
        "n_name",
        "promo_c",
        "total_c",
        F.round(
            F.col("promo_c").cast("double") * 100 / F.col("total_c"), 4
        ).alias("promo_pct"),
    )


@query(
    "tpcds_q58_balanced_brands",
    oracle="""
    WITH m AS (
      SELECT p_brand,
             SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 3
                      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS rev_a,
             SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 4
                      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS rev_b
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    )
    SELECT p_brand, CAST(rev_a AS BIGINT) AS rev_a, CAST(rev_b AS BIGINT) AS rev_b
    FROM m
    WHERE rev_a > 0 AND rev_b > 0
      AND 20 * rev_a >= 9 * (rev_a + rev_b)
      AND 20 * rev_a <= 11 * (rev_a + rev_b)
    """,
)
def tpcds_q58_balanced_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q58 shape: brands whose revenue is balanced (within ±10% of the
    two-period mean) across two periods — the band test stays in
    cross-multiplied exact integers (20·a within [9,11]·(a+b) ⇔
    a within [0.9,1.1]·mean), no float boundary."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cents = _cents("l_extendedprice")
    m = F.month("l_shipdate")
    g = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(m == 3, cents).otherwise(0)).alias("rev_a"),
            F.sum(F.when(m == 4, cents).otherwise(0)).alias("rev_b"),
        )
    )
    tot = F.col("rev_a") + F.col("rev_b")
    return g.filter(
        (F.col("rev_a") > 0)
        & (F.col("rev_b") > 0)
        & (20 * F.col("rev_a") >= 9 * tot)
        & (20 * F.col("rev_a") <= 11 * tot)
    ).select("p_brand", "rev_a", "rev_b")


@query(
    "tpcds_q7_multi_avg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 100, 4) AS avg_price,
           ROUND(CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 100, 6) AS avg_disc,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def tpcds_q7_multi_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7/q26 shape: several demographic averages in one aggregation —
    every AVG is an exact-integer SUM divided by COUNT, so both engines
    produce the identical double before the final ROUND."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = F.count("*")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("long")).cast("double") / n, 4
            ).alias("avg_qty"),
            F.round(
                F.sum(_cents("l_extendedprice")).cast("double") / n / 100, 4
            ).alias("avg_price"),
            F.round(
                F.sum(_cents("l_discount")).cast("double") / n / 100, 6
            ).alias("avg_disc"),
            n.alias("n"),
        )
    )


@query(
    "tpcds_q48_or_band_sum",
    oracle="""
    SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
       OR (p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 16 AND 35)
       OR (p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 36 AND 50)
    """,
)
def tpcds_q48_or_band_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48 shape: OR of conjunctive band pairs across the fact and a
    dimension — each disjunct pairs a dimension band with a fact band,
    so no single-side pushdown removes the OR; the dimension still
    broadcasts whole."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        (sz.between(1, 10) & q.between(1, 15))
        | (sz.between(11, 25) & q.between(16, 35))
        | (sz.between(26, 50) & q.between(36, 50))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(q.cast("long")).alias("qty"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpcds_q96_point_count",
    oracle="""
    SELECT COUNT(*) AS n
    FROM events
    JOIN customer ON user_id = c_custkey
    WHERE EXTRACT(HOUR FROM ts) = 20
      AND event_type = 'click'
      AND c_mktsegment = 'AUTOMOBILE'
    """,
)
def tpcds_q96_point_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q96 shape: one COUNT(*) under three point predicates spanning the
    fact and a dimension — the minimal star probe; AQE broadcasts the
    filtered customer slice."""
    e = _t(spark, sf_dir, "events").filter(
        (F.hour("ts") == 20) & (F.col("event_type") == "click")
    )
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    return e.join(c, e.user_id == c.c_custkey).agg(F.count("*").alias("n"))


@query(
    "tpcds_q32_excess_discount",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS disc_sum,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS BIGINT)
             AS excess_disc_c,
           COUNT(*) AS n
    FROM lineitem l JOIN pa ON l.l_partkey = pa.pk
    WHERE CAST(ROUND(l.l_discount * 100) AS BIGINT) * pa.cnt * 10
          > pa.disc_sum * 13
    """,
)
def tpcds_q32_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q32/q92 shape: lines discounted more than 1.3× their item's
    average discount — per-item aggregate joined back to the fact, the
    threshold kept in cross-multiplied exact integers (d·cnt·10 >
    sum·13 ⇔ d > 1.3·avg)."""
    li = _t(spark, sf_dir, "lineitem")
    d_c = _cents("l_discount")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(d_c).alias("disc_sum"), F.count("*").alias("cnt")
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(d_c * F.col("cnt") * 10 > F.col("disc_sum") * 13)
        .agg(
            F.sum(d_c).alias("excess_disc_c"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpcds_q2_wow_share",
    oracle="""
    SELECT dow,
           CAST(SUM(CASE WHEN y = 1996 THEN cents ELSE 0 END) AS BIGINT) AS c96,
           CAST(SUM(CASE WHEN y = 1997 THEN cents ELSE 0 END) AS BIGINT) AS c97,
           ROUND(CAST(SUM(CASE WHEN y = 1996 THEN cents ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN y = 1997 THEN cents ELSE 0 END), 6) AS ratio
    FROM (SELECT date_diff('day', DATE '1992-01-05', o_orderdate) % 7 AS dow,
                 EXTRACT(YEAR FROM o_orderdate) AS y,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
          WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)) t
    GROUP BY dow ORDER BY dow
    """,
)
def tpcds_q2_wow_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: day-of-week revenue aligned across two years with a
    year-over-year ratio per weekday.  DOW is computed as days-since-a-
    known-Sunday mod 7 (pure integer arithmetic) because the engines
    number weekdays differently (divergence documented in COVERAGE.md).
    One scan, one groupBy on a 7-value key; ratio of exact integer-cents
    sums is the same double in both engines.  (Years 1996/1997: the
    fixture's orderdate range is 1995-01-01..2001-08-01.)"""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    base = o.filter(y.isin(1996, 1997)).select(
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-05").cast("date")) % 7)
        .alias("dow"),
        y.alias("y"),
        _cents("o_totalprice").alias("cents"),
    )
    c96 = F.sum(F.when(F.col("y") == 1996, F.col("cents")).otherwise(0))
    c97 = F.sum(F.when(F.col("y") == 1997, F.col("cents")).otherwise(0))
    return (
        base.groupBy("dow")
        .agg(
            c96.alias("c96"),
            c97.alias("c97"),
            F.round(c96.cast("double") / c97, 6).alias("ratio"),
        )
        .orderBy("dow")
    )


@query(
    "tpcds_q16_multi_supplier_clean",
    oracle="""
    SELECT COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_c
    FROM (
      SELECT o.o_orderkey, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      WHERE o.o_orderpriority = '1-URGENT'
        AND o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = o.o_orderkey AND l3.l_returnflag = 'R')
    ) t
    """,
)
def tpcds_q16_multi_supplier_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: orders fulfilled by MULTIPLE suppliers with NO returned
    line — a grouped-HAVING semi join plus an anti join on the same fact.
    Both reduce lineitem to order keys before touching orders, so the
    joins are key-only; the HAVING side is a partial-aggregated
    count-distinct per key."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = _t(spark, sf_dir, "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    kept = (
        o.join(multi, "o_orderkey", "left_semi")
        .join(returned, "o_orderkey", "left_anti")
    )
    return kept.agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("total_c"),
    )


@query(
    "tpcds_q28_band_buckets",
    oracle="""
    SELECT a.avg1, a.cnt1, a.cd1, b.avg2, b.cnt2, b.cd2, c.avg3, c.cnt3, c.cd3
    FROM
      (SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / 100, 6) AS avg1,
              COUNT(*) AS cnt1,
              COUNT(DISTINCT CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cd1
       FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) a,
      (SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / 100, 6) AS avg2,
              COUNT(*) AS cnt2,
              COUNT(DISTINCT CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cd2
       FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) b,
      (SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / 100, 6) AS avg3,
              COUNT(*) AS cnt3,
              COUNT(DISTINCT CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cd3
       FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) c
    """,
)
def tpcds_q28_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q28 shape: independent (avg, count, count-distinct) triples over
    disjoint quantity bands, cross-joined into one wide row.  Each band
    is its own aggregate subtree (mirroring the reference plan); the
    cross joins combine 1-row results.  Averages are exact-integer-cents
    sums divided once at the end."""
    li = _t(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    parts = []
    for i, (lo, hi) in enumerate([(1, 10), (11, 25), (26, 50)], start=1):
        parts.append(
            li.filter(F.col("l_quantity").between(lo, hi))
            .select(cents.alias("c"))
            .agg(
                F.round(
                    F.sum("c").cast("double") / F.count("*") / 100.0, 6
                ).alias(f"avg{i}"),
                F.count("*").alias(f"cnt{i}"),
                F.countDistinct("c").alias(f"cd{i}"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        # every part is a 1-row aggregate — hint it like the sibling
        # chain at :64 so the broadcast-policy audit reads uniformly
        out = out.crossJoin(F.broadcast(p))
    return out


@query(
    "tpcds_q41_or_maze_distinct",
    oracle="""
    SELECT DISTINCT p_name FROM part
    WHERE p_size BETWEEN 1 AND 20 AND (
      (p_type LIKE '%LARGE%' AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
       AND p_size BETWEEN 1 AND 8) OR
      (p_type LIKE '%MEDIUM%' AND p_brand IN ('Brand#21', 'Brand#22', 'Brand#23')
       AND p_size BETWEEN 5 AND 15) OR
      (p_type LIKE '%STANDARD%' AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
       AND p_size BETWEEN 10 AND 20)
    )
    ORDER BY p_name LIMIT 100
    """,
)
def tpcds_q41_or_maze_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q41 shape: DISTINCT dimension attribute under a deep OR-of-ANDs
    predicate maze.  The whole disjunction is one Catalyst filter over a
    single dimension scan (no join) — the common BETWEEN bound still
    prunes via min/max statistics even though the OR arms cannot all
    push to parquet."""
    p = _t(spark, sf_dir, "part")
    arm1 = (
        F.col("p_type").like("%LARGE%")
        & F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")
        & F.col("p_size").between(1, 8)
    )
    arm2 = (
        F.col("p_type").like("%MEDIUM%")
        & F.col("p_brand").isin("Brand#21", "Brand#22", "Brand#23")
        & F.col("p_size").between(5, 15)
    )
    arm3 = (
        F.col("p_type").like("%STANDARD%")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 20)
    )
    return (
        p.filter(F.col("p_size").between(1, 20) & (arm1 | arm2 | arm3))
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(100)
    )


@query(
    "tpcds_q44_best_worst_rank",
    oracle="""
    WITH perf AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS avg_disc
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, avg_disc,
             ROW_NUMBER() OVER (ORDER BY avg_disc ASC,  l_partkey) AS rk_best,
             ROW_NUMBER() OVER (ORDER BY avg_disc DESC, l_partkey) AS rk_worst
      FROM perf
    )
    SELECT b.rk_best AS rk, pb.p_name AS best_name, pw.p_name AS worst_name
    FROM ranked b
    JOIN ranked w ON w.rk_worst = b.rk_best
    JOIN part pb ON pb.p_partkey = b.l_partkey
    JOIN part pw ON pw.p_partkey = w.l_partkey
    WHERE b.rk_best <= 10
    ORDER BY rk
    """,
)
def tpcds_q44_best_worst_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q44 shape: best- and worst-performing parts by average discount,
    aligned rank-for-rank (rank 1 best beside rank 1 worst) and decorated
    from the dimension twice.  Scale safety: a global rank window would
    funnel every partkey group through one task, so each direction first
    prunes to per-hash-bucket local top 10 (any global top-10 row is in
    its bucket's top 10) and the final unpartitioned window orders
    ≤ 10×64 rows.  Averages of exact cents ints order identically in
    both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    perf = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(_cents("l_discount")).cast("double") / F.count("*"))
            .alias("avg_disc")
        )
    )

    def global_top10(direction_desc: bool, out_key: str) -> DataFrame:
        order = [
            F.col("avg_disc").desc() if direction_desc else F.col("avg_disc").asc(),
            F.col("l_partkey"),
        ]
        wb = Window.partitionBy(F.abs(F.hash("l_partkey")) % 64).orderBy(*order)
        pruned = (
            perf.withColumn("_brnk", F.row_number().over(wb))
            .filter(F.col("_brnk") <= 10)
            .drop("_brnk")
        )
        return (
            pruned.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
            .filter(F.col("rk") <= 10)
            .select("rk", F.col("l_partkey").alias(out_key))
        )

    b = global_top10(False, "bk")
    w = global_top10(True, "wk")
    pb = p.select(F.col("p_partkey").alias("bk"), F.col("p_name").alias("best_name"))
    pw = p.select(F.col("p_partkey").alias("wk"), F.col("p_name").alias("worst_name"))
    return (
        b.join(w, "rk")
        .join(pb, "bk")
        .join(pw, "wk")
        .select("rk", "best_name", "worst_name")
        .orderBy("rk")
    )


@query(
    "tpcds_q50_latency_matrix",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN d <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN d > 30 AND d <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN d > 60 AND d <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN d > 90 AND d <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN d > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
    FROM (SELECT l_returnflag,
                 date_diff('day', o_orderdate, l_shipdate) AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def tpcds_q50_latency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q50/q99 shape: order-to-ship latency bucketed into a day-band
    matrix per return flag — conditional-sum pivot in a single aggregate
    after a key join (integer day arithmetic; the fixture has no
    shipmode/receiptdate columns, so the band source is the
    orderdate→shipdate gap)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_returnflag", d.alias("d")
    )
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("d") <= 30, 1).otherwise(0)).alias("d30"),
            F.sum(
                F.when((F.col("d") > 30) & (F.col("d") <= 60), 1).otherwise(0)
            ).alias("d60"),
            F.sum(
                F.when((F.col("d") > 60) & (F.col("d") <= 90), 1).otherwise(0)
            ).alias("d90"),
            F.sum(
                F.when((F.col("d") > 90) & (F.col("d") <= 120), 1).otherwise(0)
            ).alias("d120"),
            F.sum(F.when(F.col("d") > 120, 1).otherwise(0)).alias("dmore"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpcds_q87_except_customers",
    oracle="""
    SELECT COUNT(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    ) t
    """,
)
def tpcds_q87_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q87 shape: customer count via EXCEPT between period scans (bought
    in 1996 but not 1997).  EXCEPT over pre-DISTINCTed single columns is
    a key-only shuffle; both branches scan the same table once each with
    the year filter pushed down."""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = o.filter(y == 1996).select("o_custkey").distinct()
    b = o.filter(y == 1997).select("o_custkey").distinct()
    return a.exceptAll(b).agg(F.count("*").alias("n"))


@query(
    "tpcds_q66_month_matrix",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN m = 1 THEN cents ELSE 0 END) AS BIGINT) AS jan_c,
           CAST(SUM(CASE WHEN m = 2 THEN cents ELSE 0 END) AS BIGINT) AS feb_c,
           CAST(SUM(CASE WHEN m = 3 THEN cents ELSE 0 END) AS BIGINT) AS mar_c,
           CAST(SUM(CASE WHEN m = 4 THEN cents ELSE 0 END) AS BIGINT) AS apr_c,
           CAST(SUM(CASE WHEN m = 5 THEN cents ELSE 0 END) AS BIGINT) AS may_c,
           CAST(SUM(CASE WHEN m = 6 THEN cents ELSE 0 END) AS BIGINT) AS jun_c
    FROM (SELECT l_suppkey, EXTRACT(MONTH FROM l_shipdate) AS m,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem
          WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30') l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def tpcds_q66_month_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q66 shape: wide month-column revenue report per supplier nation —
    a conditional-sum pivot after broadcast dimension joins.  The date
    band prunes the fact scan; only (suppkey, month, cents) survives to
    the join, and the 12-way CASE pivot is one aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-06-30")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.select(
            "l_suppkey",
            F.month("l_shipdate").alias("m"),
            _cents("l_extendedprice").alias("cents"),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    aggs = [
        F.sum(F.when(F.col("m") == i, F.col("cents")).otherwise(0)).alias(a)
        for i, a in enumerate(
            ["jan_c", "feb_c", "mar_c", "apr_c", "may_c", "jun_c"], start=1
        )
    ]
    return base.groupBy("n_name").agg(*aggs).orderBy("n_name")


@query(
    "tpcds_q13_count_of_counts",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders ORDER BY n_orders
    """,
)
def tpcds_q13_count_of_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: count-of-counts histogram (how many customers placed
    exactly N orders, including zero via LEFT JOIN).  Two aggregations:
    the first shuffles on the customer key; the second groups the
    already-tiny (n_orders, count) pairs — the classic distribution
    report that stays two-exchange at any scale."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


@query(
    "tpcds_q45_disjunctive_semi",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_c
    FROM (
      SELECT o.o_orderkey, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
         OR c.c_custkey IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal > 5000)
    ) t
    """,
)
def tpcds_q45_disjunctive_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q45 shape: a literal attribute filter OR membership in a subquery
    list.  The disjunction cannot become a plain semi join, so the
    bounded subquery key set is broadcast-joined as a marker column and
    the OR evaluates per row — one pass over the fact, no correlated
    re-execution."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    marks = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_suppkey").alias("c_custkey"))
        .distinct()
        .withColumn("_in_list", F.lit(1))
    )
    joined = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(marks), "c_custkey", "left")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            | F.col("_in_list").isNotNull()
        )
    )
    return joined.agg(
        F.count("*").alias("n"),
        F.sum(_cents("o_totalprice")).alias("total_c"),
    )


@query(
    "tpcds_q75_yoy_decline",
    oracle="""
    WITH yearly AS (
      SELECT p.p_brand AS brand, EXTRACT(YEAR FROM l.l_shipdate) AS y,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1996, 1997)
      GROUP BY p.p_brand, EXTRACT(YEAR FROM l.l_shipdate)
    )
    SELECT cur.brand, cur.qty AS qty97, prev.qty AS qty96,
           cur.rev_c AS rev97_c, prev.rev_c AS rev96_c
    FROM yearly cur JOIN yearly prev
      ON cur.brand = prev.brand AND cur.y = 1997 AND prev.y = 1996
    WHERE cur.qty * 10 < prev.qty * 9
    ORDER BY cur.brand
    """,
)
def tpcds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q75 shape: brands whose shipped quantity declined more than 10%
    year over year.  One fact aggregation produces both years; the
    self-join aligns (brand, 1997) to (brand, 1996) on the tiny
    aggregate, and the decline test is integer cross-multiplication
    (qty97 < 0.9*qty96 without touching floats)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    y = F.year("l_shipdate")
    yearly = (
        li.filter(y.isin(1996, 1997))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), y.alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(_cents("l_extendedprice")).alias("rev_c"),
        )
    )
    cur = yearly.filter(F.col("y") == 1997).select(
        "brand",
        F.col("qty").alias("qty97"),
        F.col("rev_c").alias("rev97_c"),
    )
    prev = yearly.filter(F.col("y") == 1996).select(
        "brand",
        F.col("qty").alias("qty96"),
        F.col("rev_c").alias("rev96_c"),
    )
    return (
        cur.join(prev, "brand")
        .filter(F.col("qty97") * 10 < F.col("qty96") * 9)
        .select("brand", "qty97", "qty96", "rev97_c", "rev96_c")
        .orderBy("brand")
    )


@query(
    "tpcds_q10_customer_profile",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CASE WHEN f.has_urgent = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN f.has_return = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
    FROM customer c
    JOIN (
      SELECT o.o_custkey,
             MAX(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS has_urgent,
             MAX(CASE WHEN EXISTS (
                   SELECT 1 FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND l.l_returnflag = 'R') THEN 1 ELSE 0 END)
               AS has_return
      FROM orders o GROUP BY o.o_custkey
    ) f ON f.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def tpcds_q10_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: segment-level customer profile with per-customer
    behavior flags (any urgent order / any returned line), each flag a
    semi-join-derived marker folded by MAX before the final rollup.
    The lineitem probe reduces to distinct returned order keys before
    joining orders — key-only traffic on both fact joins."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("_ret", F.lit(1))
    )
    flags = (
        o.join(returned, "o_orderkey", "left")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("has_urgent"),
            F.max(
                F.when(F.col("_ret").isNotNull(), 1).otherwise(0)
            ).alias("has_return"),
        )
    )
    return (
        c.join(flags, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.when(F.col("has_urgent") == 1, 1).otherwise(0)).alias(
                "n_urgent"
            ),
            F.sum(F.when(F.col("has_return") == 1, 1).otherwise(0)).alias(
                "n_returned"
            ),
        )
        .orderBy("c_mktsegment")
    )

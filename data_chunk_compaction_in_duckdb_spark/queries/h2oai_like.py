"""H2O.ai db-benchmark corpus — all 10 groupby + 5 join queries
(reference benchmark/h2oai/{group,join}/queries/q*.sql) on the fixture.

Like the ClickBench corpus, every query is ONE dialect-common SQL text
executed verbatim by BOTH engines (spark.sql + DuckDB oracle).

Groupby suite: the reference's x_group (id1..id6 at two cardinality
tiers, v1/v2 small ints, v3 float) is derived from lineitem — id1/id2
low-card strings, id3 high-card string, id4/id5 low-card ints, id6
high-card int, v1/v2 from quantity/linenumber, v3 as exact integer
cents of l_extendedprice (v3c) so SUM/AVG/median/stddev/corr replay
bit-identically: dispersion and correlation use the n/Σx/Σx²/Σxy
exact-integer-sum formulas (same discipline as tpcds_q17/q39; at
cluster scale those sums upgrade to DECIMAL(38) to keep headroom —
at fixture scale BIGINT bounds are proven in the module test).

Join suite: the reference's x JOIN small/medium/big (1e1/1e4/1e7 rows)
maps directly onto real fixture relations — supplier (small: 10 rows at
sf0.001), part (medium), orders (big, fact-to-fact shuffle) — keeping
the three build-side size classes the benchmark is about; q4's
"different key into the same dim" uses a bounded synthetic key
(l_orderkey % 100 -> p_partkey, valid at every SF).  Scale note: the
small/medium joins broadcast under AQE; the big join is the shuffle
hash join on the shared key, exactly the plan wanted at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark.catalog import register_views
from data_chunk_compaction_in_duckdb_spark.queries.registry import query

_XG = """x_group AS (
  SELECT 'id' || CAST(l_suppkey % 10 AS STRING) AS id1,
         'id' || CAST(l_partkey % 10 AS STRING) AS id2,
         'id' || CAST(l_orderkey % 1000 AS STRING) AS id3,
         l_suppkey % 10 AS id4,
         l_partkey % 10 AS id5,
         l_orderkey % 1000 AS id6,
         CAST(l_quantity AS BIGINT) % 5 + 1 AS v1,
         CAST(l_linenumber AS BIGINT) % 15 + 1 AS v2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v3c
  FROM lineitem)"""

# groupby q-number -> (description, SELECT body over the x_group CTE)
_GROUP: dict[int, tuple[str, str]] = {
    1: ("sum by low-card string key",
        "SELECT id1, CAST(SUM(v1) AS BIGINT) AS v1 FROM x_group GROUP BY id1"),
    2: ("sum by two low-card keys",
        "SELECT id1, id2, CAST(SUM(v1) AS BIGINT) AS v1 FROM x_group "
        "GROUP BY id1, id2"),
    3: ("sum + mean by high-card key",
        "SELECT id3, CAST(SUM(v1) AS BIGINT) AS v1, "
        "CAST(SUM(v3c) AS DOUBLE) / (100.0 * COUNT(*)) AS v3 "
        "FROM x_group GROUP BY id3"),
    4: ("three means by int key",
        "SELECT id4, CAST(SUM(v1) AS DOUBLE) / COUNT(*) AS v1, "
        "CAST(SUM(v2) AS DOUBLE) / COUNT(*) AS v2, "
        "CAST(SUM(v3c) AS DOUBLE) / (100.0 * COUNT(*)) AS v3 "
        "FROM x_group GROUP BY id4"),
    5: ("three sums by high-card int key",
        # CAST AS DOUBLE before /100.0: Spark types BIGINT/DECIMAL(4,1)
        # as decimal(27,6) while DuckDB yields DOUBLE for the same text
        # -- the q03/q04 idiom keeps both engines on DOUBLE.
        "SELECT id6, CAST(SUM(v1) AS BIGINT) AS v1, "
        "CAST(SUM(v2) AS BIGINT) AS v2, "
        "CAST(SUM(v3c) AS DOUBLE) / 100.0 AS v3 FROM x_group GROUP BY id6"),
    6: ("median + stddev by two keys (exact-sum dispersion)",
        "SELECT id4, id5, median(v3c / 100.0) AS median_v3, "
        "CASE WHEN COUNT(*) > 1 THEN "
        "sqrt((COUNT(*) * CAST(SUM(v3c * v3c) AS DOUBLE) "
        "- CAST(SUM(v3c) AS DOUBLE) * CAST(SUM(v3c) AS DOUBLE)) "
        "/ (COUNT(*) * (COUNT(*) - 1.0))) / 100.0 END AS sd_v3 "
        "FROM x_group GROUP BY id4, id5"),
    7: ("range (max - min) by high-card key",
        "SELECT id3, CAST(MAX(v1) - MIN(v2) AS BIGINT) AS range_v1_v2 "
        "FROM x_group GROUP BY id3"),
    8: ("top-2 values per group via row_number",
        "SELECT id6, CAST(v3c AS DOUBLE) / 100.0 AS largest2_v3 FROM ("
        "SELECT id6, v3c, row_number() OVER (PARTITION BY id6 "
        "ORDER BY v3c DESC) AS order_v3 FROM x_group "
        "WHERE v3c IS NOT NULL) sub_query WHERE order_v3 <= 2"),
    9: ("squared correlation by two keys (exact-sum corr)",
        "SELECT id2, id4, "
        "CASE WHEN COUNT(*) > 1 THEN "
        "((COUNT(*) * CAST(SUM(v1 * v2) AS DOUBLE) "
        "- CAST(SUM(v1) AS DOUBLE) * CAST(SUM(v2) AS DOUBLE)) "
        "* (COUNT(*) * CAST(SUM(v1 * v2) AS DOUBLE) "
        "- CAST(SUM(v1) AS DOUBLE) * CAST(SUM(v2) AS DOUBLE))) "
        "/ ((COUNT(*) * CAST(SUM(v1 * v1) AS DOUBLE) "
        "- CAST(SUM(v1) AS DOUBLE) * CAST(SUM(v1) AS DOUBLE)) "
        "* (COUNT(*) * CAST(SUM(v2 * v2) AS DOUBLE) "
        "- CAST(SUM(v2) AS DOUBLE) * CAST(SUM(v2) AS DOUBLE))) END AS r2 "
        "FROM x_group GROUP BY id2, id4"),
    10: ("six-key sum + count",
         "SELECT id1, id2, id3, id4, id5, id6, "
         "CAST(SUM(v3c) AS DOUBLE) / 100.0 AS v3, COUNT(*) AS count "
         "FROM x_group GROUP BY id1, id2, id3, id4, id5, id6"),
}

# join q-number -> (description, full SQL)
_JOIN: dict[int, tuple[str, str]] = {
    1: ("fact x small (10-row build side)",
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        "CAST(l_quantity AS BIGINT) AS quantity, "
        "s_nationkey AS small_nation, s_acctbal AS v2 "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"),
    2: ("fact x medium inner",
        "SELECT l_orderkey, l_linenumber, l_suppkey, "
        "p_brand AS medium_brand, p_type AS medium_type, "
        "p_size AS medium_size, p_retailprice AS v2 "
        "FROM lineitem JOIN part ON l_partkey = p_partkey"),
    3: ("fact x medium LEFT (null-preserving)",
        "SELECT l_orderkey, l_linenumber, l_suppkey, "
        "p_brand AS medium_brand, p_type AS medium_type, "
        "p_size AS medium_size, p_retailprice AS v2 "
        "FROM lineitem LEFT JOIN part ON l_partkey = p_partkey"),
    4: ("fact x medium on a second key",
        "SELECT l_orderkey, l_linenumber, l_partkey, "
        "p_brand AS medium_brand, p_size AS medium_size, "
        "p_retailprice AS v2 "
        "FROM lineitem JOIN part ON l_orderkey % 100 = p_partkey"),
    5: ("fact x big (shuffle join on the shared key)",
        "SELECT l_orderkey, l_linenumber, l_suppkey, "
        "o_custkey AS big_cust, o_orderstatus AS big_status, "
        "o_orderpriority AS big_prio, o_totalprice AS v2 "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),
}


# Spark-side rewrites proven value- and schema-identical to the oracle
# text (guide §2.3 "narrower types"): id1/id2/id3 are injective
# functions of id4/id5/id6 ('id' || CAST(x AS STRING)), so grouping by
# the numeric keys partitions the rows identically and the string keys
# can be derived from the group keys AFTER aggregation — the hash
# aggregate hashes 3 ints instead of building + hashing 3 strings per
# input row, and the exchange carries ints.  All aggregates are exact
# integer sums/counts (v3c is integer cents), so values are
# order-independent and bit-identical.  Interleaved A/B at sf0.1
# (q10): 0.88 s -> 0.54 s median, 99,736/99,736 rows identical, same
# schema.  The DuckDB oracle keeps the original six-key text; the
# driver gate value-checks equivalence at every SF.
_XN = """x_num AS (
  SELECT l_suppkey % 10 AS id4,
         l_partkey % 10 AS id5,
         l_orderkey % 1000 AS id6,
         CAST(l_quantity AS BIGINT) % 5 + 1 AS v1,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v3c
  FROM lineitem)"""
_GROUP_SPARK: dict[int, str] = {
    3: f"""WITH {_XN}
SELECT 'id' || CAST(id6 AS STRING) AS id3,
       CAST(SUM(v1) AS BIGINT) AS v1,
       CAST(SUM(v3c) AS DOUBLE) / (100.0 * COUNT(*)) AS v3
FROM x_num GROUP BY id6""",
    10: f"""WITH {_XN}
SELECT 'id' || CAST(id4 AS STRING) AS id1,
       'id' || CAST(id5 AS STRING) AS id2,
       'id' || CAST(id6 AS STRING) AS id3,
       id4, id5, id6,
       CAST(SUM(v3c) AS DOUBLE) / 100.0 AS v3, COUNT(*) AS count
FROM x_num GROUP BY id4, id5, id6""",
}


def _register_group(num: int, desc: str, body: str) -> None:
    full = f"WITH {_XG}\n{body}"
    spark_sql = _GROUP_SPARK.get(num, full)

    @query(f"h2o_group_q{num:02d}", oracle=full)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _q.__doc__ = (
        f"H2O.ai db-benchmark groupby q{num:02d} (benchmark/h2oai/group/"
        f"queries/q{num:02d}.sql): {desc}."
    )


def _register_join(num: int, desc: str, full: str) -> None:
    @query(f"h2o_join_q{num:02d}", oracle=full)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = full) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _q.__doc__ = (
        f"H2O.ai db-benchmark join q{num:02d} (benchmark/h2oai/join/"
        f"queries/q{num:02d}.sql): {desc}."
    )


for _num, (_desc, _body) in _GROUP.items():
    _register_group(_num, _desc, _body)
for _num, (_desc, _body) in _JOIN.items():
    _register_join(_num, _desc, _body)

#!/usr/bin/env python
"""Generate sqllogictest files validated against BOTH engines.

The reference's primary corpus is sqllogictest files with inline golden
rows (SURVEY.md §5).  This tool keeps ours honest the same way — and,
since round 2, keeps itself honest too: each query spec below is written
in the DIALECT-COMMON subset (identical text parses in DuckDB and Spark
SQL), executed in BOTH engines over the sf0.001 fixture views, and a
file is emitted only when every spec's rendered rows agree.  A mismatch
prints both sides and fails the run — no unvalidated goldens can reach
tests/sqllogic/ anymore (round 1 committed 5 never-executed files, all
red).

Dialect-common notes learned by running both engines:
  - STRING, not VARCHAR (Spark needs a length for VARCHAR).
  - No ANY/ALL quantified comparisons (Spark lacks the syntax); encode
    the standard rewrites (IN / scalar min-max subqueries) instead.
  - date_trunc returns DATE in DuckDB but TIMESTAMP in Spark → CAST.
  - ceil/floor return DOUBLE in DuckDB, BIGINT in Spark → render I.
  - CAST(DECIMAL AS BIGINT) rounds in DuckDB, truncates in Spark (same
    divergence as double→BIGINT) → floor() first.
  - datediff has different signatures → avoid.

Usage:  python tools/gen_sqllogic.py [corpus...]  # validate + regenerate (all by default)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_chunk_compaction_in_duckdb_spark.testing.sqllogic import render_row

SF_DIR = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(REPO, "tests", "sqllogic")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# (types, sortmode, sql) — sortmode "" means nosort (query must ORDER BY).
SPECS: dict[str, tuple[str, list[tuple[str, str, str]]]] = {}


def corpus(name: str, header: str):
    def add(specs):
        if name in SPECS:
            raise ValueError(f"duplicate corpus name: {name}")
        SPECS[name] = (header, specs)
    return add


corpus("scalar_expr", "Scalar expression semantics (reference test/sql/function, test/sql/cast)")([
    ("T", "", "SELECT CASE WHEN r_regionkey < 2 THEN 'low' WHEN r_regionkey < 4 THEN 'mid' ELSE 'high' END FROM region ORDER BY r_regionkey"),
    # CAST(double AS BIGINT) rounds in DuckDB, truncates in Spark — another
    # validator-found divergence; floor() agrees in both engines.
    ("I", "", "SELECT CAST(floor(o_totalprice) AS BIGINT) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(l_shipdate AS STRING) FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3"),
    ("TI", "", "SELECT substr(r_name, 1, 3), length(r_name) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT upper(lower(n_name)) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("T", "", "SELECT concat(r_name, '-', CAST(r_regionkey AS STRING)) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT abs(-r_regionkey) + least(r_regionkey, 2) * greatest(r_regionkey, 3) FROM region ORDER BY r_regionkey"),
    ("R", "", "SELECT round(sqrt(CAST(n_nationkey AS DOUBLE)), 3) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT mod(n_nationkey, 7) FROM nation ORDER BY n_nationkey LIMIT 10"),
    ("T", "", "SELECT trim('  pad  ') || '|' || lpad(r_name, 12, '.') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT replace(r_name, 'A', '@') FROM region ORDER BY r_regionkey"),
    ("I", "rowsort", "SELECT position('AR' IN r_name) FROM region"),
    ("T", "", "SELECT coalesce(NULL, NULL, r_name) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT nullif(r_regionkey, 2) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CASE r_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' END FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT sign(n_nationkey - 12) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT repeat(substr(r_name, 1, 1), 3) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT reverse(r_name) FROM region ORDER BY r_regionkey"),
])

corpus("null_semantics", "Three-valued logic / NULL handling (reference test/sql/subquery, test/sql/filter)")([
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL"),
    ("TT", "", "SELECT CAST(CAST(NULL AS STRING) IS DISTINCT FROM 'x' AS STRING), CAST('x' IS NOT DISTINCT FROM 'x' AS STRING)"),
    ("T", "", "SELECT CAST(NULL = NULL AS STRING)"),
    ("T", "", "SELECT CAST(NULL AND FALSE AS STRING)"),
    ("T", "", "SELECT CAST(NULL OR TRUE AS STRING)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 3)"),
    ("I", "", "SELECT sum(CASE WHEN CAST(NULL AS BOOLEAN) THEN 1 ELSE 0 END) FROM region"),
    ("T", "", "SELECT CAST(max(CASE WHEN r_regionkey > 99 THEN r_name END) AS STRING) FROM region"),
    ("I", "", "SELECT count(CASE WHEN r_regionkey > 2 THEN 1 END) FROM region"),
    ("II", "", "SELECT count(*), count(NULL) FROM region"),
    ("I", "", "SELECT count(*) FROM region WHERE CAST(NULL AS BOOLEAN)"),
    ("I", "", "SELECT coalesce(nullif(1, 1), nullif(2, 3))"),
])

corpus("datetime_interval", "Date / timestamp / interval arithmetic (reference test/sql/types/date, /interval)")([
    ("T", "", "SELECT CAST(CAST(DATE '1995-03-15' + INTERVAL 30 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1996-01-31' - INTERVAL 1 MONTH AS DATE) AS STRING)"),
    ("III", "", "SELECT EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate), EXTRACT(DAY FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 3"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31'"),
    ("T", "", "SELECT CAST(min(o_orderdate) AS STRING) FROM orders"),
    ("T", "", "SELECT CAST(max(l_shipdate) AS STRING) FROM lineitem"),
    ("I", "rowsort", "SELECT EXTRACT(QUARTER FROM o_orderdate) FROM orders GROUP BY 1"),
    ("TI", "", "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS STRING), count(*) FROM orders GROUP BY 1 ORDER BY 1"),
    ("T", "", "SELECT CAST(last_day(DATE '1996-02-10') AS STRING)"),
    ("T", "", "SELECT CAST(CAST(date_trunc('month', DATE '1995-07-19') AS DATE) AS STRING)"),
    ("I", "", "SELECT EXTRACT(DOY FROM DATE '1996-03-01')"),
])

corpus("grouping_edges", "GROUP BY edge semantics (reference test/sql/aggregate/group)")([
    ("TI", "", "SELECT r_name, count(*) FROM region GROUP BY r_name HAVING count(*) >= 1 ORDER BY r_name"),
    ("II", "rowsort", "SELECT n_regionkey, count(DISTINCT n_nationkey) FROM nation GROUP BY n_regionkey"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey) t"),
    ("TII", "rowsort", "SELECT coalesce(CAST(n_regionkey AS STRING), 'ALL'), grouping(n_regionkey), count(*) FROM nation GROUP BY ROLLUP(n_regionkey)"),
    ("II", "rowsort", "SELECT n_regionkey % 2, sum(n_nationkey) FROM nation GROUP BY n_regionkey % 2"),
    ("TI", "", "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    ("II", "", "SELECT o_orderkey % 3 AS k, max(o_custkey) FROM orders GROUP BY k ORDER BY k"),
])

# Spark has no ANY/ALL quantified-comparison syntax; these are the
# standard rewrites (IN, EXISTS, scalar min/max subqueries) both engines
# parse — the same rewrites queries/subqueries.py uses.
corpus("quantifiers", "ANY/ALL quantified comparisons via dialect-common rewrites (reference test/sql/subquery/any_all)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey > (SELECT max(r_regionkey) FROM region)"),
    ("I", "", "SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)"),
    ("I", "", "SELECT count(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    ("T", "rowsort", "SELECT r_name FROM region WHERE r_regionkey <= (SELECT min(n_regionkey) FROM nation WHERE n_nationkey < 3)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_totalprice >= (SELECT min(o_totalprice) FROM orders WHERE o_orderpriority = '1-URGENT')"),
])

corpus("cast_matrix", "Cast / TRY_CAST matrix (reference test/sql/types/cast)")([
    ("I", "", "SELECT CAST('42' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('oops' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('123' AS BIGINT)"),
    ("R", "", "SELECT CAST('2.5' AS DOUBLE)"),
    ("T", "", "SELECT CAST(CAST('1995-06-17' AS DATE) AS STRING)"),
    ("I", "", "SELECT TRY_CAST('1995-13-40' AS DATE) IS NULL"),
    ("T", "", "SELECT CAST(CAST(1 AS BOOLEAN) AS STRING)"),
    ("T", "", "SELECT CAST(TRUE AS STRING)"),
    # NOTE engine divergence found by this validator: CAST(3.7 AS BIGINT)
    # rounds in DuckDB (4) but truncates in Spark (3).  Kept out of the
    # dialect-common corpus; our engine follows Spark/ANSI truncation.
    ("I", "", "SELECT CAST(CAST(3.0 AS BIGINT) AS BIGINT)"),
    ("I", "", "SELECT CAST(o_orderkey AS INT) FROM orders ORDER BY o_orderkey LIMIT 3"),
    ("T", "", "SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 3"),
])

corpus("in_expr", "IN-list and BETWEEN semantics with NULLs (reference test/sql/filter)")([
    ("I", "", "SELECT count(*) FROM region WHERE r_regionkey IN (0, 2, 4)"),
    ("I", "", "SELECT count(*) FROM region WHERE r_regionkey NOT IN (0, 2)"),
    ("T", "", "SELECT CAST(1 IN (2, 3) AS STRING)"),
    ("T", "", "SELECT CAST(NULL IN (1, 2) AS STRING)"),
    ("T", "", "SELECT CAST(1 NOT IN (2, NULL) AS STRING)"),
    ("T", "", "SELECT CAST(1 IN (1, NULL) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 20"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity NOT BETWEEN 10 AND 20"),
])

corpus("string_edges", "String function edges (reference test/sql/function/string)")([
    ("I", "", "SELECT length('')"),
    ("T", "", "SELECT substr('abcdef', -3, 2)"),
    ("T", "", "SELECT substr('abcdef', 2)"),
    ("T", "", "SELECT ltrim('  x  ') || '|' || rtrim('  x  ')"),
    ("I", "", "SELECT length(n_name) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT left(r_name, 2) || right(r_name, 2) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT translate('abcba', 'ab', 'xy')"),
    ("I", "", "SELECT instr(r_name, 'ROPE') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT split_part('a|b|c', '|', 2)"),
    ("T", "", "SELECT md5('spark-graft')"),
    ("I", "", "SELECT ascii('A')"),
    ("T", "", "SELECT chr(66)"),
    ("T", "", "SELECT lcase(ucase(r_name)) FROM region ORDER BY r_regionkey LIMIT 2"),
])

corpus("math_edges", "Math edges (reference test/sql/function/numeric)")([
    ("I", "", "SELECT CAST(ceil(2.1) AS BIGINT)"),
    ("I", "", "SELECT CAST(floor(-2.1) AS BIGINT)"),
    ("R", "", "SELECT round(pi(), 3)"),
    ("R", "", "SELECT round(exp(1.0), 3)"),
    ("R", "", "SELECT round(ln(exp(2.0)), 3)"),
    ("R", "", "SELECT round(log10(1000.0), 3)"),
    ("R", "", "SELECT round(power(2.0, 10.0), 3)"),
    ("I", "", "SELECT CAST(sign(-5.0) AS BIGINT)"),
    ("R", "", "SELECT round(degrees(pi()), 3)"),
    ("R", "", "SELECT round(radians(180.0), 6)"),
    ("R", "", "SELECT round(atan2(1.0, 1.0), 6)"),
    ("I", "", "SELECT factorial(5)"),
    ("I", "", "SELECT CAST(cbrt(27.0) AS BIGINT)"),
    ("R", "", "SELECT round(cos(0.0) + sin(0.0) + tan(0.0), 3)"),
])

corpus("order_nulls", "ORDER BY NULLS FIRST/LAST and mixed keys (reference test/sql/order)")([
    ("I", "", "SELECT nullif(r_regionkey, 2) FROM region ORDER BY nullif(r_regionkey, 2) ASC NULLS FIRST"),
    ("I", "", "SELECT nullif(r_regionkey, 2) FROM region ORDER BY nullif(r_regionkey, 2) ASC NULLS LAST"),
    ("I", "", "SELECT nullif(r_regionkey, 0) FROM region ORDER BY nullif(r_regionkey, 0) DESC NULLS FIRST"),
    ("TI", "", "SELECT o_orderpriority, o_orderkey FROM orders ORDER BY o_orderpriority DESC, o_orderkey ASC LIMIT 5"),
    ("I", "", "SELECT r_regionkey FROM region ORDER BY r_regionkey DESC LIMIT 2 OFFSET 1"),
])

corpus("agg_edges", "Aggregate edge semantics (reference test/sql/aggregate)")([
    ("I", "", "SELECT sum(r_regionkey) FROM region WHERE r_regionkey > 99"),
    ("I", "", "SELECT count(*) FROM region WHERE r_regionkey > 99"),
    ("I", "", "SELECT min(o_orderkey) FROM orders"),
    ("R", "", "SELECT round(avg(CAST(l_quantity AS DOUBLE)), 3) FROM lineitem"),
    ("II", "", "SELECT count(DISTINCT o_orderpriority), count(DISTINCT o_orderstatus) FROM orders"),
    ("I", "", "SELECT max(o_orderkey) - min(o_orderkey) FROM orders"),
    ("T", "", "SELECT CAST(bool_and(r_regionkey >= 0) AS STRING) FROM region"),
    ("T", "", "SELECT CAST(bool_or(r_regionkey > 3) AS STRING) FROM region"),
    ("I", "", "SELECT count(*) FILTER (WHERE o_orderstatus = 'F') FROM orders"),
    ("I", "", "SELECT sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) FROM lineitem"),
])

corpus("exists_corr", "Correlated EXISTS / scalar subqueries (reference test/sql/subquery/exists)")([
    ("I", "", "SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20)"),
    ("TI", "", "SELECT r_name, (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations FROM region r ORDER BY r_name"),
    ("I", "", "SELECT count(*) FROM nation n WHERE n.n_nationkey < (SELECT max(o_orderkey) FROM orders) / 100000"),
    ("TI", "", "SELECT n_name, (SELECT r_regionkey FROM region WHERE r_regionkey = n_regionkey) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("I", "", "SELECT count(*) FROM customer c WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)"),
])

corpus("union_edges", "Set-operation dedup/typing edges (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT r_regionkey FROM region UNION SELECT n_regionkey FROM nation"),
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey FROM region UNION ALL SELECT n_regionkey FROM nation) t"),
    ("I", "rowsort", "SELECT r_regionkey FROM region EXCEPT SELECT n_regionkey FROM nation WHERE n_regionkey < 2"),
    ("I", "rowsort", "SELECT n_regionkey FROM nation INTERSECT SELECT r_regionkey FROM region"),
    ("I", "", "SELECT count(*) FROM (SELECT 1 AS x UNION SELECT 1) t"),
    ("I", "", "SELECT count(*) FROM (SELECT 1 AS x UNION ALL SELECT 1) t"),
    ("R", "rowsort", "SELECT CAST(r_regionkey AS DOUBLE) FROM region WHERE r_regionkey < 2 UNION SELECT 2.5"),
])

corpus("window_edges", "Window function edges (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, row_number() OVER (ORDER BY n_nationkey DESC) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("III", "", "SELECT n_regionkey, n_nationkey, rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_regionkey, n_nationkey LIMIT 8"),
    ("II", "", "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT n_nationkey, lag(n_nationkey, 2) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT n_nationkey, lead(n_nationkey, 1, -1) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey DESC LIMIT 3"),
    ("II", "", "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("IR", "", "SELECT n_nationkey, round(cume_dist() OVER (ORDER BY n_nationkey), 4) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT n_nationkey, first_value(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM nation ORDER BY n_nationkey LIMIT 3"),
])

corpus("having_distinct", "HAVING / DISTINCT interaction (reference test/sql/aggregate/having)")([
    ("II", "rowsort", "SELECT o_custkey, count(*) FROM orders GROUP BY o_custkey HAVING count(*) > 25"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT o_orderpriority FROM orders) t"),
    ("T", "rowsort", "SELECT DISTINCT l_linestatus FROM lineitem"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders) t"),
    ("II", "rowsort", "SELECT n_regionkey, min(n_nationkey) FROM nation GROUP BY n_regionkey HAVING min(n_nationkey) < 5"),
])

corpus("join_edges", "Join type/condition edges (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM region CROSS JOIN nation"),
    ("TI", "rowsort", "SELECT r_name, count(n_nationkey) FROM region LEFT JOIN nation ON r_regionkey = n_regionkey AND n_nationkey > 90 GROUP BY r_name"),
    ("I", "", "SELECT count(*) FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey"),
    ("I", "", "SELECT count(*) FROM region FULL JOIN nation ON r_regionkey = n_regionkey + 100"),
    ("I", "", "SELECT count(*) FROM region JOIN nation ON r_regionkey = n_regionkey WHERE FALSE"),
    ("TT", "rowsort", "SELECT r_name, n_name FROM region RIGHT JOIN nation ON r_regionkey = n_regionkey WHERE n_nationkey < 3"),
])

corpus("case_bool", "CASE / boolean algebra (reference test/sql/function/generic)")([
    ("T", "", "SELECT CAST(TRUE AND NULL AS STRING)"),
    ("T", "", "SELECT CAST(FALSE OR NULL AS STRING)"),
    ("T", "", "SELECT CAST(NOT NULL AS STRING)"),
    ("I", "", "SELECT CASE WHEN 1 = 1 THEN 10 END"),
    ("I", "", "SELECT CASE WHEN 1 = 2 THEN 10 END"),
    ("I", "", "SELECT CASE 5 WHEN 1 THEN 100 ELSE -1 END"),
    ("T", "", "SELECT CAST((1 < 2) = (3 < 4) AS STRING)"),
    ("I", "", "SELECT if(r_regionkey > 2, 1, 0) FROM region ORDER BY r_regionkey"),
])

corpus("subquery_select", "Scalar subqueries in SELECT position (reference test/sql/subquery/scalar)")([
    ("TI", "", "SELECT r_name, (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) FROM region ORDER BY r_name"),
    ("II", "", "SELECT n_nationkey, (SELECT max(r_regionkey) FROM region) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("I", "", "SELECT (SELECT count(*) FROM region WHERE r_regionkey > 99)"),
    ("I", "", "SELECT (SELECT min(n_nationkey) FROM nation WHERE n_regionkey = 2)"),
    ("TI", "", "SELECT o_orderpriority, count(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') GROUP BY o_orderpriority ORDER BY o_orderpriority"),
])

corpus("limit_edges", "LIMIT/OFFSET edges (reference test/sql/order/limit)")([
    ("I", "", "SELECT count(*) FROM (SELECT * FROM orders LIMIT 0) t"),
    ("I", "", "SELECT count(*) FROM (SELECT * FROM region LIMIT 100) t"),
    ("I", "", "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2 OFFSET 3"),
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey FROM region ORDER BY r_regionkey OFFSET 8) t"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC LIMIT 1"),
])

corpus("arith_semantics", "Arithmetic/type-coercion semantics (reference test/sql/types/numeric)")([
    ("R", "", "SELECT 1 / 2"),
    ("I", "", "SELECT 7 % 3"),
    ("I", "", "SELECT -7 % 3"),
    ("I", "", "SELECT CAST(2147483647 AS BIGINT) + 1"),
    ("R", "", "SELECT 1e300 * 1e-300"),
    ("I", "", "SELECT n_nationkey * -1 FROM nation ORDER BY n_nationkey LIMIT 3"),
    ("R", "", "SELECT round(o_totalprice - o_totalprice, 1) FROM orders ORDER BY o_orderkey LIMIT 1"),
    ("I", "", "SELECT greatest(1, 2, 3) + least(-1, 0, 1)"),
])

corpus("null_concat", "NULL propagation in string ops (reference test/sql/function/string)")([
    ("T", "", "SELECT 'a' || CAST(NULL AS STRING)"),
    ("T", "", "SELECT coalesce('a' || CAST(NULL AS STRING), 'fell-through')"),
    ("T", "", "SELECT upper(CAST(NULL AS STRING))"),
    ("I", "", "SELECT length(CAST(NULL AS STRING))"),
    ("T", "", "SELECT replace(CAST(NULL AS STRING), 'a', 'b')"),
])

corpus("groupby_expr", "GROUP BY expressions / aliases / ordinals (reference test/sql/aggregate/group)")([
    ("II", "rowsort", "SELECT n_nationkey % 5 AS bucket, count(*) FROM nation GROUP BY n_nationkey % 5"),
    ("II", "rowsort", "SELECT n_nationkey % 5 AS bucket, count(*) FROM nation GROUP BY bucket"),
    ("II", "rowsort", "SELECT n_nationkey % 5 AS bucket, count(*) FROM nation GROUP BY 1"),
    ("TI", "rowsort", "SELECT substr(r_name, 1, 1) AS initial, count(*) FROM region GROUP BY substr(r_name, 1, 1)"),
    ("II", "rowsort", "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, count(*) FROM orders GROUP BY y"),
])

corpus("distinct_order", "DISTINCT + ORDER BY interaction (reference test/sql/distinct)")([
    ("T", "", "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"),
    ("I", "", "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey DESC"),
    ("TI", "rowsort", "SELECT DISTINCT o_orderstatus, EXTRACT(YEAR FROM o_orderdate) FROM orders"),
    ("I", "", "SELECT count(DISTINCT l_linenumber) FROM lineitem"),
])

corpus("like_escape", "LIKE pattern semantics (reference test/sql/function/string/like)")([
    ("I", "", "SELECT count(*) FROM part WHERE p_name LIKE '%green%'"),
    ("I", "", "SELECT count(*) FROM part WHERE p_name NOT LIKE '%a%'"),
    ("I", "", "SELECT count(*) FROM region WHERE r_name LIKE '_SIA'"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_name LIKE '%'"),
    ("T", "", "SELECT CAST('abc' LIKE 'a%' AS STRING)"),
    ("T", "", "SELECT CAST('abc' LIKE 'A%' AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderpriority LIKE '_-%'"),
])

corpus("case_nested", "Nested CASE / conditional chains (reference test/sql/function/generic)")([
    ("T", "", "SELECT CASE WHEN r_regionkey < 2 THEN CASE WHEN r_regionkey = 0 THEN 'zero' ELSE 'one' END ELSE 'big' END FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT sum(CASE WHEN o_orderstatus = 'F' THEN CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END ELSE 0 END) FROM orders"),
    ("T", "", "SELECT coalesce(CASE WHEN r_regionkey = 9 THEN r_name END, 'none') FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT if(n_regionkey = 2, n_nationkey, -n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 6"),
])

corpus("derived_tables", "Derived-table nesting (reference test/sql/subquery/table)")([
    ("I", "", "SELECT count(*) FROM (SELECT * FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 200000) a) b"),
    ("II", "rowsort", "SELECT k, n FROM (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey) t WHERE n > 25"),
    ("I", "", "SELECT max(total) FROM (SELECT o_custkey, count(*) AS total FROM orders GROUP BY o_custkey) t"),
    ("TI", "", "SELECT x.r_name, y.cnt FROM region x JOIN (SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY n_regionkey) y ON x.r_regionkey = y.n_regionkey ORDER BY x.r_name"),
])

corpus("window_nulls", "Window over nullable partition/order keys (reference test/sql/window)")([
    ("II", "rowsort", "SELECT n_nationkey, row_number() OVER (PARTITION BY nullif(n_regionkey, 2) ORDER BY n_nationkey) FROM nation WHERE n_nationkey < 10"),
    ("II", "", "SELECT n_nationkey, count(*) OVER (PARTITION BY nullif(n_regionkey, 0)) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT r_regionkey, sum(nullif(r_regionkey, 2)) OVER (ORDER BY r_regionkey) FROM region ORDER BY r_regionkey"),
])

corpus("union_typing", "Set-op type unification (reference test/sql/setops/union)")([
    ("T", "rowsort", "SELECT CAST(r_regionkey AS STRING) FROM region UNION SELECT r_name FROM region"),
    ("R", "rowsort", "SELECT 1.5 UNION ALL SELECT 2"),
    ("I", "rowsort", "SELECT CAST(1 AS BIGINT) UNION SELECT CAST(1 AS INT)"),
    ("T", "rowsort", "SELECT NULL UNION SELECT 'x'"),
])

corpus("agg_null_groups", "Aggregates over NULL group keys (reference test/sql/aggregate)")([
    ("II", "rowsort", "SELECT nullif(n_regionkey, 2) AS k, count(*) FROM nation GROUP BY nullif(n_regionkey, 2)"),
    ("II", "rowsort", "SELECT nullif(n_regionkey, 2) AS k, sum(n_nationkey) FROM nation GROUP BY nullif(n_regionkey, 2)"),
    ("I", "", "SELECT count(DISTINCT nullif(n_regionkey, 2)) FROM nation"),
    ("I", "", "SELECT min(nullif(r_regionkey, 0)) FROM region"),
])

corpus("semi_anti_shapes", "IN/EXISTS semi- and anti-join shapes (reference test/sql/join/semi)")([
    ("I", "", "SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"),
    ("I", "", "SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"),
    ("I", "", "SELECT count(*) FROM part p WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey AND l_quantity > 49)"),
    ("I", "", "SELECT count(*) FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_returnflag = 'R')"),
])

corpus("order_expr", "ORDER BY expressions and stability (reference test/sql/order)")([
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey % 7, n_nationkey LIMIT 8"),
    ("T", "", "SELECT r_name FROM region ORDER BY length(r_name), r_name"),
    ("I", "", "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 3"),
    ("TI", "", "SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus ORDER BY count(*) DESC, o_orderstatus"),
])

corpus("bool_agg_filter", "FILTER clauses and boolean aggregates (reference test/sql/aggregate/filter)")([
    ("II", "", "SELECT count(*) FILTER (WHERE l_returnflag = 'R'), count(*) FILTER (WHERE l_returnflag = 'A') FROM lineitem"),
    ("I", "", "SELECT sum(n_nationkey) FILTER (WHERE n_regionkey = 2) FROM nation"),
    ("T", "", "SELECT CAST(bool_and(o_totalprice > 0) AS STRING) FROM orders"),
    ("T", "", "SELECT CAST(bool_or(o_totalprice > 1000000) AS STRING) FROM orders"),
    ("I", "", "SELECT min(o_orderkey) FILTER (WHERE o_orderstatus = 'O') FROM orders"),
])

corpus("values_clause", "VALUES inline relations (reference test/sql/table_function)")([
    ("II", "", "SELECT a, b FROM (VALUES (1, 2), (3, 4)) t(a, b) ORDER BY a"),
    ("I", "", "SELECT sum(a) FROM (VALUES (1), (2), (3)) t(a)"),
    ("TI", "", "SELECT x, count(*) FROM (VALUES ('u'), ('v'), ('u')) t(x) GROUP BY x ORDER BY x"),
    ("I", "", "SELECT count(*) FROM region JOIN (VALUES (0), (2)) t(k) ON r_regionkey = k"),
])

corpus("cte_chain", "Chained and reused CTEs (reference test/sql/cte)")([
    ("I", "", "WITH a AS (SELECT r_regionkey k FROM region), b AS (SELECT k + 10 AS k2 FROM a) SELECT sum(k2) FROM b"),
    ("II", "", "WITH big AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) > 25) SELECT count(*), sum(n) FROM big"),
    ("I", "", "WITH x AS (SELECT n_regionkey FROM nation) SELECT count(*) FROM x a JOIN x b ON a.n_regionkey = b.n_regionkey"),
    ("TI", "", "WITH r2 AS (SELECT * FROM region WHERE r_regionkey < 3) SELECT r_name, (SELECT count(*) FROM r2 b WHERE b.r_regionkey <= a.r_regionkey) FROM r2 a ORDER BY r_name"),
])

# NOTE validator-found divergence: DuckDB regexp_replace replaces the
# FIRST match only (needs a 'g' flag Spark lacks); Spark replaces ALL.
# Dialect-common regex specs therefore use single-match patterns only.
corpus("regex_common", "Regex functions in the common dialect (reference test/sql/function/string/regex)")([
    ("T", "", "SELECT regexp_replace(r_name, '^.', '_') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT regexp_extract(o_orderpriority, '([0-9]+)-(.*)', 2) FROM orders ORDER BY o_orderkey LIMIT 3"),
    ("I", "", "SELECT count(*) FROM part WHERE regexp_extract(p_name, '(gre|ol)', 1) <> ''"),
    ("T", "", "SELECT regexp_replace('aaa-bbb-ccc', 'bbb', 'X')"),
])

corpus("grouping_sets_explicit", "Explicit GROUPING SETS (reference test/sql/aggregate/grouping_sets)")([
    ("TTI", "rowsort", "SELECT coalesce(o_orderstatus, '?') AS st, coalesce(o_orderpriority, '?') AS pr, count(*) FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"),
    ("TII", "rowsort", "SELECT coalesce(CAST(n_regionkey AS STRING), 'ALL') AS k, grouping(n_regionkey), count(*) FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())"),
    ("TTI", "rowsort", "SELECT coalesce(l_returnflag, '?') AS f, coalesce(l_linestatus, '?') AS s, count(*) FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
])

corpus("setops_all", "INTERSECT ALL / EXCEPT ALL bag semantics (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT n_regionkey FROM nation INTERSECT ALL SELECT n_regionkey FROM nation WHERE n_nationkey < 10"),
    ("I", "rowsort", "SELECT n_regionkey FROM nation WHERE n_nationkey < 6 EXCEPT ALL SELECT n_regionkey FROM nation WHERE n_nationkey < 3"),
    ("I", "", "SELECT count(*) FROM (SELECT l_linenumber FROM lineitem INTERSECT ALL SELECT l_linenumber FROM lineitem WHERE l_returnflag = 'R') t"),
])

corpus("join_outer_filters", "Outer-join filter placement semantics (reference test/sql/join/left)")([
    ("TI", "rowsort", "SELECT r_name, count(n_nationkey) FROM region LEFT JOIN nation ON r_regionkey = n_regionkey WHERE r_regionkey < 3 GROUP BY r_name"),
    ("I", "", "SELECT count(*) FROM region LEFT JOIN nation ON r_regionkey = n_regionkey AND n_nationkey < 0"),
    ("I", "", "SELECT count(*) FROM region LEFT JOIN nation ON r_regionkey = n_regionkey WHERE n_nationkey IS NULL"),
    ("I", "", "SELECT count(*) FROM nation RIGHT JOIN region ON n_regionkey = r_regionkey AND n_nationkey > 90"),
])

# NOTE validator-found divergence: NaN/Inf RENDER differently (DuckDB
# 'nan'/'inf', Spark 'NaN'/'Infinity') — compare them, never print them.
corpus("numeric_special", "Special float values (reference test/sql/types/float)")([
    ("T", "", "SELECT CAST(isnan(CAST('NaN' AS DOUBLE)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('Infinity' AS DOUBLE) > 1e308 AS STRING)"),
    ("T", "", "SELECT CAST(CAST('-Infinity' AS DOUBLE) < -1e308 AS STRING)"),
    ("T", "", "SELECT CAST(CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS STRING)"),
    ("I", "", "SELECT count(*) FROM (SELECT CAST('NaN' AS DOUBLE) x) t WHERE x > 0"),
])

corpus("having_no_groupby", "HAVING without GROUP BY / global aggregates (reference test/sql/aggregate/having)")([
    ("I", "", "SELECT count(*) FROM orders HAVING count(*) > 0"),
    ("I", "", "SELECT count(*) FROM orders HAVING count(*) > 1000000000"),
    ("I", "", "SELECT sum(r_regionkey) FROM region HAVING min(r_regionkey) = 0"),
])

corpus("date_parts", "EXTRACT field matrix (reference test/sql/function/date_part)")([
    ("IIII", "", "SELECT EXTRACT(YEAR FROM DATE '1995-07-19'), EXTRACT(MONTH FROM DATE '1995-07-19'), EXTRACT(DAY FROM DATE '1995-07-19'), EXTRACT(QUARTER FROM DATE '1995-07-19')"),
    # NOTE validator-found divergence: EXTRACT(DOW) numbers Sunday=0 in
    # DuckDB but Sunday=1 in Spark — excluded from the common corpus.
    ("I", "", "SELECT EXTRACT(WEEK FROM DATE '1995-01-04')"),
    ("II", "rowsort", "SELECT EXTRACT(MONTH FROM l_shipdate), count(*) FROM lineitem GROUP BY 1"),
    ("I", "", "SELECT count(*) FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995"),
])

corpus("having_agg_expr", "Aggregates inside HAVING expressions (reference test/sql/aggregate/having)")([
    ("TI", "rowsort", "SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus HAVING sum(o_totalprice) > 1000000"),
    ("II", "rowsort", "SELECT n_regionkey, max(n_nationkey) FROM nation GROUP BY n_regionkey HAVING max(n_nationkey) - min(n_nationkey) > 15"),
    ("TI", "rowsort", "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag HAVING avg(l_quantity) > 25 AND count(*) > 100"),
    ("II", "rowsort", "SELECT o_custkey, count(*) FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderpriority) >= 5"),
])

corpus("corr_scalar_agg", "Correlated scalar-aggregate subqueries (reference test/sql/subquery/scalar)")([
    ("TI", "", "SELECT r_name, (SELECT max(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey) FROM region ORDER BY r_name"),
    ("I", "", "SELECT count(*) FROM nation n WHERE n_nationkey = (SELECT min(n2.n_nationkey) FROM nation n2 WHERE n2.n_regionkey = n.n_regionkey)"),
    ("I", "", "SELECT count(*) FROM orders o WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"),
    ("II", "", "SELECT n_nationkey, (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 6"),
])

corpus("nested_derived", "Deeply nested derived tables with re-aggregation (reference test/sql/subquery/table)")([
    ("I", "", "SELECT max(cnt) FROM (SELECT n, count(*) AS cnt FROM (SELECT o_custkey % 10 AS n FROM orders) a GROUP BY n) b"),
    ("R", "", "SELECT round(avg(CAST(mx AS DOUBLE)), 3) FROM (SELECT o_custkey, max(o_totalprice) AS mx FROM orders GROUP BY o_custkey) t"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT a.n_regionkey FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey) t"),
    ("II", "", "SELECT mn, mx FROM (SELECT min(total) AS mn, max(total) AS mx FROM (SELECT o_custkey, count(*) AS total FROM orders GROUP BY o_custkey) i) o2"),
])

corpus("string_numeric_mix", "String/number coercion boundaries (reference test/sql/types)")([
    ("T", "", "SELECT concat('n=', CAST(count(*) AS STRING)) FROM region"),
    ("I", "", "SELECT length(CAST(12345 AS STRING))"),
    ("I", "", "SELECT CAST(substr('12345', 2, 3) AS BIGINT)"),
    ("T", "", "SELECT lpad(CAST(7 AS STRING), 3, '0')"),
    ("T", "", "SELECT CAST(CAST('  42  ' AS INT) AS STRING)"),
])

corpus("window_running_min_max", "Running extrema windows (reference test/sql/window)")([
    ("III", "", "SELECT n_nationkey, min(n_nationkey) OVER (ORDER BY n_name), max(n_nationkey) OVER (ORDER BY n_name) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT n_nationkey, count(*) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT o_orderkey, dense_rank() OVER (ORDER BY o_orderpriority) FROM orders ORDER BY o_orderkey LIMIT 5"),
])

corpus("coalesce_chains", "COALESCE/NULLIF chains and defaults (reference test/sql/function/generic)")([
    ("I", "", "SELECT coalesce(NULL, NULL, NULL, 4)"),
    ("I", "", "SELECT coalesce(nullif(0, 0), nullif(1, 1), 9)"),
    ("T", "", "SELECT coalesce(nullif(r_name, r_name), 'same') FROM region ORDER BY r_regionkey LIMIT 2"),
    ("I", "", "SELECT sum(coalesce(nullif(n_regionkey, 2), 0)) FROM nation"),
    ("I", "", "SELECT ifnull(NULL, 5)"),
])

corpus("div_mod_negative", "Integer division and modulo sign semantics (reference test/sql/types/numeric)")([
    ("I", "", "SELECT (-7) % 3"),
    ("I", "", "SELECT 7 % (-3)"),
    ("I", "", "SELECT mod(-7, 3)"),
    ("I", "", "SELECT (0 - n_nationkey) % 5 FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT CAST(floor((0 - o_orderkey) / 7.0) AS BIGINT) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("I", "", "SELECT sum(l_linenumber % 2) FROM lineitem"),
])

corpus("bool_3vl", "Three-valued boolean logic (reference test/sql/types/bool)")([
    ("T", "", "SELECT CAST((NULL AND FALSE) AS STRING)"),
    ("T", "", "SELECT CAST((NULL AND TRUE) AS STRING)"),
    ("T", "", "SELECT CAST((NULL OR TRUE) AS STRING)"),
    ("T", "", "SELECT CAST((NULL OR FALSE) AS STRING)"),
    ("T", "", "SELECT CAST((NOT NULL) AS STRING)"),
    ("I", "", "SELECT count(*) FROM nation WHERE (n_regionkey = 1) IS NULL"),
    ("I", "", "SELECT count(*) FROM customer WHERE (c_acctbal > 0 AND NULL) IS NULL"),
])

corpus("not_in_null", "NOT IN with NULL in the list (reference test/sql/subquery)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey NOT IN (SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey IN (SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)"),
])

corpus("scalar_subquery_empty", "Scalar subqueries returning zero rows yield NULL (reference test/sql/subquery/scalar)")([
    ("T", "", "SELECT CAST((SELECT r_name FROM region WHERE r_regionkey = 99) AS STRING)"),
    ("I", "", "SELECT coalesce((SELECT CAST(max(n_nationkey) AS BIGINT) FROM nation WHERE n_regionkey = 99), -1)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey = coalesce((SELECT n_nationkey FROM nation WHERE n_name = 'NOPE'), 3)"),
    ("I", "", "SELECT (SELECT CAST(count(*) AS BIGINT) FROM region WHERE r_regionkey = 99)"),
])

corpus("window_frames_sql", "Window frame clauses in SQL (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, CAST(sum(n_regionkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT n_nationkey, CAST(sum(n_regionkey) OVER (ORDER BY n_nationkey RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT n_nationkey, CAST(count(*) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT n_nationkey, CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
])

corpus("window_distribution", "ntile/cume_dist/percent_rank (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 10"),
    ("IR", "", "SELECT n_nationkey, cume_dist() OVER (ORDER BY n_regionkey) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("IR", "", "SELECT n_nationkey, percent_rank() OVER (ORDER BY n_regionkey) FROM nation ORDER BY n_nationkey LIMIT 6"),
])

corpus("interval_arith", "Date +/- interval arithmetic (reference test/sql/types/interval)")([
    ("T", "", "SELECT CAST(CAST(DATE '1994-01-31' + INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1994-03-01' - INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1996-02-29' + INTERVAL 1 YEAR AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1994-01-31' + INTERVAL 1 MONTH AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 3"),
])

corpus("string_pad_split", "lpad/rpad/split_part/repeat/reverse (reference test/sql/function/string)")([
    ("T", "", "SELECT lpad(r_name, 12, '.') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT rpad(substr(r_name, 1, 4), 8, '*') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT split_part(o_orderpriority, '-', 2) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT repeat(substr(r_name, 1, 2), 3) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT reverse(r_name) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT replace(p_type, ' ', '_') FROM part ORDER BY p_partkey LIMIT 4"),
])

corpus("instr_position", "instr/position/contains family (reference test/sql/function/string)")([
    ("I", "", "SELECT CAST(instr(r_name, 'A') AS BIGINT) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT CAST(position('R' IN r_name) AS BIGINT) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CAST(contains(p_type, 'BRASS') AS STRING) FROM part ORDER BY p_partkey LIMIT 5"),
    ("T", "", "SELECT CAST(left(r_name, 1) = 'A' AS STRING) FROM region ORDER BY r_regionkey"),
])

corpus("greatest_least", "greatest/least across types and NULLs (reference test/sql/function/generic)")([
    ("I", "", "SELECT greatest(1, 2, 3)"),
    ("I", "", "SELECT least(n_nationkey, n_regionkey) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT greatest(o_orderkey, o_custkey) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT greatest(r_name, 'EUROPE') FROM region ORDER BY r_regionkey"),
])

corpus("corr_agg_where", "Correlated aggregate subqueries in WHERE (reference test/sql/subquery/any_all)")([
    ("I", "", "SELECT count(*) FROM customer c WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)"),
    ("I", "", "SELECT count(*) FROM orders o WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"),
    ("II", "", "SELECT n_nationkey, (SELECT CAST(count(*) AS BIGINT) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) FROM nation n ORDER BY n_nationkey LIMIT 8"),
])

corpus("exists_nested_or", "Nested/disjunctive EXISTS (reference test/sql/subquery/exists)")([
    ("I", "", "SELECT count(*) FROM nation n WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) OR n.n_regionkey = 0"),
    ("I", "", "SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey))"),
    ("I", "", "SELECT count(*) FROM nation n WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < -900)"),
])

corpus("round_scale", "round() with scale including negative (reference test/sql/function/numeric)")([
    ("R", "", "SELECT round(123.456, 1)"),
    ("R", "", "SELECT round(123.456, -1)"),
    ("R", "", "SELECT round(-123.456, 2)"),
    ("I", "", "SELECT CAST(round(o_totalprice, -2) AS BIGINT) FROM orders ORDER BY o_orderkey LIMIT 5"),
])

corpus("div_zero_guard", "Guarded division by zero yields NULL (reference test/sql/types/numeric)")([
    ("T", "", "SELECT CAST(10 / nullif(0, 0) AS STRING)"),
    ("T", "", "SELECT CAST(mod(10, nullif(0, 0)) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_totalprice / nullif(o_custkey, o_custkey) IS NULL"),
])

corpus("agg_of_case_join", "Aggregates over CASE across joins (reference test/sql/aggregate)")([
    ("TI", "", "SELECT r_name, CAST(sum(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name ORDER BY r_name"),
    ("I", "", "SELECT CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) FROM orders"),
    ("II", "", "SELECT CAST(o_orderkey % 3 AS BIGINT), CAST(max(CASE WHEN o_totalprice > 100000 THEN o_custkey END) AS BIGINT) FROM orders GROUP BY o_orderkey % 3 ORDER BY 1"),
])

corpus("order_by_ordinal", "ORDER BY / GROUP BY ordinals and expressions (reference test/sql/order)")([
    ("TI", "", "SELECT o_orderstatus, count(*) FROM orders GROUP BY 1 ORDER BY 1"),
    ("II", "", "SELECT n_regionkey, sum(n_nationkey) FROM nation GROUP BY 1 ORDER BY 2 DESC, 1"),
    ("T", "", "SELECT r_name FROM region ORDER BY length(r_name), r_name"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey % 3, n_nationkey LIMIT 9"),
])

corpus("exists_select_list", "EXISTS / IN as SELECT-list expressions (reference test/sql/subquery)")([
    ("TI", "rowsort", "SELECT r_name, CAST(EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey > 20) AS INT) FROM region"),
    ("II", "rowsort", "SELECT n_nationkey, CAST(n_regionkey IN (1, 3) AS INT) FROM nation WHERE n_nationkey < 8"),
    ("I", "", "SELECT sum(CASE WHEN EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) THEN 1 ELSE 0 END) FROM nation n"),
])

corpus("union_coercion", "Set-op type coercion int/double/string (reference test/sql/setops)")([
    ("R", "rowsort", "SELECT CAST(1 AS DOUBLE) UNION SELECT 2.5 UNION SELECT 1.0"),
    ("I", "rowsort", "SELECT n_nationkey FROM nation WHERE n_nationkey < 3 UNION SELECT r_regionkey FROM region"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders UNION ALL SELECT c_custkey FROM customer) t"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer) t"),
])

corpus("case_in_groupby", "CASE expressions as grouping keys (reference test/sql/aggregate/group)")([
    ("TI", "", "SELECT CASE WHEN o_totalprice < 50000 THEN 'small' WHEN o_totalprice < 150000 THEN 'mid' ELSE 'big' END AS band, count(*) FROM orders GROUP BY band ORDER BY band"),
    ("TI", "", "SELECT CASE WHEN n_regionkey IN (0, 1) THEN 'west' ELSE 'east' END AS half, count(*) FROM nation GROUP BY 1 ORDER BY 1"),
    ("TR", "", "SELECT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sgn, round(sum(c_acctbal), 2) FROM customer GROUP BY 1 ORDER BY 1"),
])

corpus("nested_window_cte", "Windows inside CTEs feeding aggregates (reference test/sql/window)")([
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey, row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation) t WHERE rn = 1"),
    ("II", "", "WITH r AS (SELECT o_custkey, rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk FROM orders) SELECT CAST(max(o_custkey) AS BIGINT), count(*) FROM r WHERE rk <= 2"),
    ("TI", "", "WITH x AS (SELECT l_returnflag, lag(l_orderkey) OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber) AS p FROM lineitem) SELECT l_returnflag, count(p) FROM x GROUP BY l_returnflag ORDER BY l_returnflag"),
])

corpus("having_subquery", "HAVING with scalar subqueries (reference test/sql/aggregate/having)")([
    ("II", "rowsort", "SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey HAVING count(*) > (SELECT count(*) FROM region)"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > (SELECT avg(o_totalprice) FROM orders) * 3) t"),
])

corpus("distinct_count_exprs", "COUNT(DISTINCT expr) variants (reference test/sql/aggregate/distinct)")([
    ("I", "", "SELECT count(DISTINCT n_regionkey) FROM nation"),
    ("I", "", "SELECT count(DISTINCT o_orderpriority) FROM orders"),
    ("I", "", "SELECT count(DISTINCT EXTRACT(YEAR FROM o_orderdate)) FROM orders"),
    ("II", "", "SELECT CAST(o_orderkey % 2 AS BIGINT) AS k, count(DISTINCT o_orderpriority) FROM orders GROUP BY k ORDER BY k"),
    ("I", "", "SELECT count(DISTINCT l_returnflag || l_linestatus) FROM lineitem"),
])

corpus("between_edges", "BETWEEN inclusive bounds and reversals (reference test/sql/filter)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey BETWEEN 5 AND 5"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey BETWEEN 10 AND 5"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey NOT BETWEEN 3 AND 20"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 10"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate BETWEEN DATE '1994-06-01' AND DATE '1994-06-30'"),
])

corpus("self_join_inequality", "Self joins with inequality predicates (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey"),
    ("II", "", "SELECT a.n_nationkey, CAST(count(*) AS BIGINT) FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey GROUP BY a.n_nationkey ORDER BY a.n_nationkey LIMIT 6"),
    ("I", "", "SELECT count(*) FROM supplier a JOIN supplier b ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey"),
])

corpus("agg_min_max_types", "MIN/MAX over strings, dates, negatives (reference test/sql/aggregate)")([
    ("TT", "", "SELECT min(r_name), max(r_name) FROM region"),
    ("TT", "", "SELECT CAST(min(o_orderdate) AS STRING), CAST(max(o_orderdate) AS STRING) FROM orders"),
    ("RR", "", "SELECT round(min(c_acctbal), 2), round(max(c_acctbal), 2) FROM customer"),
    ("II", "", "SELECT min(n_nationkey - 12), max(n_nationkey - 12) FROM nation"),
])

corpus("in_list_edge", "Literal IN lists: types, NULL, dedup (reference test/sql/filter/in)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey IN (1, 1, 1, 2)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_name IN ('FRANCE', 'GERMANY', 'NOPE')"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey IN (1 + 1, 2 * 2)"),
    ("T", "", "SELECT CAST(5 IN (1, 2, NULL) AS STRING)"),
    ("T", "", "SELECT CAST(1 IN (1, NULL) AS STRING)"),
])

corpus("cross_join_filter", "Explicit CROSS JOIN reduced by WHERE (reference test/sql/join/cross)")([
    ("I", "", "SELECT count(*) FROM region CROSS JOIN nation"),
    ("I", "", "SELECT count(*) FROM region r CROSS JOIN nation n WHERE r.r_regionkey = n.n_regionkey"),
    ("TI", "", "SELECT r_name, CAST(count(*) AS BIGINT) FROM region CROSS JOIN nation GROUP BY r_name ORDER BY r_name"),
])

corpus("substr_bounds", "substr out-of-range bounds (reference test/sql/function/string/test_substring)")([
    ("T", "", "SELECT substr('hello', 10, 3)"),
    ("T", "", "SELECT substr('hello', 2, 100)"),
    ("T", "", "SELECT substr('hello', 1, 0)"),
    ("T", "", "SELECT substr(r_name, 3) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT substr(n_name, 2, 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
])

corpus("concat_null_ws", "concat_ws NULL skipping vs || propagation (reference test/sql/function/string)")([
    ("T", "", "SELECT concat_ws('-', 'a', 'b', 'c')"),
    ("T", "", "SELECT concat_ws('-', 'a', CAST(NULL AS STRING), 'c')"),
    ("T", "", "SELECT CAST('a' || CAST(NULL AS STRING) AS STRING)"),
    ("T", "", "SELECT concat_ws('', r_name, r_name) FROM region ORDER BY r_regionkey LIMIT 2"),
])

corpus("trim_chars", "trim/ltrim/rtrim with explicit char sets (reference test/sql/function/string/test_trim)")([
    # Two-arg trim('s','x') has REVERSED argument order between the
    # engines (validator-found divergence) — the ANSI TRIM ... FROM form
    # is the dialect-common spelling.
    ("T", "", "SELECT trim(BOTH 'x' FROM 'xxhixx')"),
    ("T", "", "SELECT trim(LEADING 'x' FROM 'xxhixx')"),
    ("T", "", "SELECT trim(TRAILING 'x' FROM 'xxhixx')"),
    ("T", "", "SELECT trim('  spaced  ')"),
])

corpus("abs_neg_extremes", "abs/negation on extremes and expressions (reference test/sql/types/numeric)")([
    ("I", "", "SELECT abs(-0)"),
    ("I", "", "SELECT abs(n_nationkey - 24) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT -(-(n_regionkey)) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("R", "", "SELECT abs(round(-123.456, 1))"),
])

corpus("agg_empty_groups", "Aggregates over empty inputs (reference test/sql/aggregate)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey > 999"),
    ("T", "", "SELECT CAST(sum(n_nationkey) AS STRING) FROM nation WHERE n_nationkey > 999"),
    ("T", "", "SELECT CAST(max(n_name) AS STRING) FROM nation WHERE 1 = 0"),
    ("T", "", "SELECT CAST(avg(c_acctbal) AS STRING) FROM customer WHERE c_custkey < 0"),
    ("I", "", "SELECT count(*) FROM (SELECT n_regionkey FROM nation WHERE 1 = 0 GROUP BY n_regionkey) t"),
])

corpus("join_null_keys", "Joins never match on NULL keys (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM (SELECT CASE WHEN n_nationkey < 5 THEN NULL ELSE n_regionkey END AS k FROM nation) a JOIN region b ON a.k = b.r_regionkey"),
    ("I", "", "SELECT count(*) FROM (SELECT CASE WHEN n_nationkey < 5 THEN NULL ELSE n_regionkey END AS k FROM nation) a LEFT JOIN region b ON a.k = b.r_regionkey WHERE b.r_regionkey IS NULL"),
    ("I", "", "SELECT count(*) FROM (SELECT NULL AS k FROM region) a JOIN (SELECT NULL AS k FROM region) b ON a.k = b.k"),
])

corpus("string_compare_order", "String comparison and ordering (reference test/sql/types/string)")([
    ("T", "", "SELECT CAST('a' < 'b' AS STRING)"),
    ("T", "", "SELECT CAST('A' < 'a' AS STRING)"),
    ("T", "", "SELECT CAST('abc' < 'abcd' AS STRING)"),
    ("T", "", "SELECT min(c_name) FROM customer"),
    ("T", "rowsort", "SELECT r_name FROM region WHERE r_name BETWEEN 'AMERICA' AND 'EUROPE'"),
])

corpus("nested_agg_subquery", "Aggregates of aggregates via subqueries (reference test/sql/aggregate/group)")([
    ("I", "", "SELECT CAST(max(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM nation GROUP BY n_regionkey) t"),
    ("R", "", "SELECT round(avg(CAST(cnt AS DOUBLE)), 4) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey HAVING count(*) >= 5) t"),
])

corpus("window_rank_vs_dense", "rank vs dense_rank vs row_number divergence on ties (reference test/sql/window)")([
    ("IIII", "", "SELECT n_nationkey, rank() OVER (ORDER BY n_regionkey), dense_rank() OVER (ORDER BY n_regionkey), row_number() OVER (ORDER BY n_regionkey, n_nationkey) FROM nation ORDER BY n_regionkey, n_nationkey LIMIT 10"),
    ("II", "", "SELECT n_nationkey, rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey % 2, n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 8"),
])

corpus("limit_offset_stability", "LIMIT/OFFSET with full ORDER BY determinism (reference test/sql/order)")([
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3 OFFSET 4"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC LIMIT 2 OFFSET 0"),
    ("I", "", "SELECT count(*) FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 50) t"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5 OFFSET 23"),
])

corpus("boolean_agg", "bool_and/bool_or/min-max over booleans (reference test/sql/aggregate)")([
    ("T", "", "SELECT CAST(bool_and(n_nationkey >= 0) AS STRING) FROM nation"),
    ("T", "", "SELECT CAST(bool_or(n_nationkey > 20) AS STRING) FROM nation"),
    ("TT", "rowsort", "SELECT CAST(n_regionkey AS STRING), CAST(bool_and(n_nationkey % 2 = 0) AS STRING) FROM nation GROUP BY n_regionkey"),
])

corpus("date_compare_boundaries", "Date comparison boundary semantics (reference test/sql/types/date)")([
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate < DATE '1992-01-02'"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate >= DATE '1998-08-01'"),
    ("T", "", "SELECT CAST(DATE '1994-01-01' = DATE '1994-01-01' AS STRING)"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_shipdate = DATE '1994-06-15'"),
])

corpus("derived_table_alias", "Derived-table column aliasing forms (reference test/sql/parser)")([
    ("II", "", "SELECT a, b FROM (SELECT n_nationkey AS a, n_regionkey AS b FROM nation) t ORDER BY a LIMIT 4"),
    ("I", "", "SELECT x FROM (SELECT 1 AS x) t"),
    ("II", "", "SELECT t.k, t.c FROM (SELECT n_regionkey AS k, count(*) AS c FROM nation GROUP BY n_regionkey) t ORDER BY t.k"),
])

corpus("filter_clause", "Aggregate FILTER clause (reference test/sql/aggregate/aggregates)")([
    ("II", "", "SELECT count(*) FILTER (WHERE o_orderstatus = 'F'), count(*) FILTER (WHERE o_orderstatus = 'O') FROM orders"),
    ("TI", "", "SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 200000) FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    ("I", "", "SELECT sum(n_regionkey) FILTER (WHERE n_nationkey % 2 = 0) FROM nation"),
    ("TI", "", "SELECT o_orderstatus, count(*) FILTER (WHERE o_orderpriority = '1-URGENT') FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    ("II", "", "SELECT min(n_nationkey) FILTER (WHERE n_regionkey = 1), max(n_nationkey) FILTER (WHERE n_regionkey = 1) FROM nation"),
])

corpus("try_cast", "TRY_CAST returns NULL on failure (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST('123' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('12x' AS BIGINT)"),
    ("R", "", "SELECT round(TRY_CAST('1.5' AS DOUBLE), 3)"),
    ("I", "", "SELECT TRY_CAST('' AS BIGINT)"),
    ("T", "", "SELECT CAST(TRY_CAST('2001-02-03' AS DATE) AS STRING)"),
    ("I", "", "SELECT CASE WHEN TRY_CAST('2001-13-45' AS DATE) IS NULL THEN 1 ELSE 0 END"),
    ("I", "", "SELECT count(*) FROM orders WHERE TRY_CAST(o_orderpriority AS BIGINT) IS NULL"),
])

corpus("stddev_corr", "Dispersion and correlation aggregates (reference test/sql/aggregate)")([
    ("R", "", "SELECT round(stddev_pop(CAST(n_nationkey AS DOUBLE)), 3) FROM nation"),
    ("R", "", "SELECT round(var_pop(CAST(n_regionkey AS DOUBLE)), 3) FROM nation"),
    ("R", "", "SELECT round(stddev_samp(CAST(r_regionkey AS DOUBLE)), 3) FROM region"),
    ("R", "", "SELECT round(corr(CAST(n_nationkey AS DOUBLE), CAST(n_nationkey AS DOUBLE)), 3) FROM nation"),
    ("R", "", "SELECT round(covar_pop(CAST(n_nationkey AS DOUBLE), CAST(n_regionkey AS DOUBLE)), 3) FROM nation"),
])

corpus("median_percentile", "median over integer and double inputs (reference test/sql/aggregate/quantile)")([
    ("R", "", "SELECT round(median(CAST(n_nationkey AS DOUBLE)), 3) FROM nation"),
    ("R", "", "SELECT round(median(CAST(r_regionkey AS DOUBLE)), 3) FROM region"),
    ("RR", "", "SELECT round(median(CAST(n_regionkey AS DOUBLE)), 3), round(median(CAST(n_nationkey AS DOUBLE) * 2), 3) FROM nation"),
])

corpus("group_order_all", "GROUP BY ALL / ORDER BY ALL sugar (reference test/sql/aggregate/group)")([
    ("TI", "", "SELECT o_orderstatus, count(*) FROM orders GROUP BY ALL ORDER BY ALL"),
    ("II", "", "SELECT n_regionkey, count(*) FROM nation GROUP BY ALL ORDER BY ALL"),
    ("TII", "", "SELECT o_orderstatus, CAST(o_totalprice > 250000 AS INT), count(*) FROM orders GROUP BY ALL ORDER BY ALL"),
    ("TII", "", "SELECT l_returnflag, l_linenumber % 2, count(*) FROM lineitem GROUP BY ALL ORDER BY ALL"),
    ("TI", "", "SELECT c_mktsegment, count(*) FROM customer GROUP BY ALL ORDER BY ALL LIMIT 3"),
    ("II", "", "SELECT n_regionkey, min(n_nationkey) FROM nation GROUP BY ALL ORDER BY ALL"),
])

corpus("named_windows", "WINDOW clause with named window reuse (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, CAST(row_number() OVER w AS INT) FROM nation WINDOW w AS (ORDER BY n_nationkey) ORDER BY n_nationkey LIMIT 6"),
    ("III", "", "SELECT n_regionkey, n_nationkey, CAST(rank() OVER w AS INT) FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey) ORDER BY n_regionkey, n_nationkey LIMIT 8"),
])

corpus("lead_lag_defaults", "lead/lag offsets and default values (reference test/sql/window)")([
    ("II", "", "SELECT r_regionkey, lag(r_regionkey, 1, -1) OVER (ORDER BY r_regionkey) FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT r_regionkey, lead(r_regionkey, 2, 99) OVER (ORDER BY r_regionkey) FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT r_regionkey, lag(r_regionkey) OVER (ORDER BY r_regionkey) FROM region ORDER BY r_regionkey"),
])

corpus("ntile_cume", "ntile / percent_rank / cume_dist (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 10"),
    ("IR", "", "SELECT n_nationkey, round(percent_rank() OVER (ORDER BY n_nationkey), 3) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("IR", "", "SELECT n_nationkey, round(cume_dist() OVER (ORDER BY n_nationkey), 3) FROM nation ORDER BY n_nationkey LIMIT 6"),
])

corpus("bit_shift_ops", "Bitwise &, |, shifts (reference test/sql/function/numeric)")([
    ("I", "", "SELECT 12 & 10"),
    ("I", "", "SELECT 12 | 3"),
    ("I", "", "SELECT n_nationkey & 7 FROM nation ORDER BY n_nationkey LIMIT 9"),
    ("I", "", "SELECT 1 << 10"),
    ("I", "", "SELECT 1024 >> 3"),
])

corpus("split_part_left_right", "split_part / left / right / translate / initcap (reference test/sql/function/string)")([
    ("T", "", "SELECT split_part(n_name, '_', 1) FROM nation ORDER BY n_nationkey LIMIT 3"),
    ("T", "", "SELECT split_part(n_name, '_', 2) FROM nation ORDER BY n_nationkey LIMIT 3"),
    ("T", "", "SELECT left(r_name, 4) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT right(r_name, 2) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT translate(r_name, 'AEIOU', 'aeiou') FROM region ORDER BY r_regionkey"),
    # initcap exists in Spark but not DuckDB — validator-found, excluded.
])

corpus("last_day_months", "last_day / month boundary arithmetic (reference test/sql/function/date)")([
    ("T", "", "SELECT CAST(last_day(DATE '1996-02-10') AS STRING)"),
    ("T", "", "SELECT CAST(last_day(DATE '2000-02-10') AS STRING)"),
    ("T", "", "SELECT CAST(last_day(CAST(o_orderdate AS DATE)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 3"),
])

corpus("exists_agg_empty", "EXISTS / scalar aggregates over empty inputs (reference test/sql/subquery)")([
    ("I", "", "SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey < 0)"),
    ("I", "", "SELECT (SELECT count(*) FROM nation WHERE n_nationkey < 0)"),
    ("T", "", "SELECT CAST((SELECT max(n_nationkey) FROM nation WHERE n_nationkey < 0) AS STRING)"),
    ("I", "", "SELECT coalesce((SELECT min(n_nationkey) FROM nation WHERE n_nationkey > 100), -1)"),
])

corpus("subquery_in_having", "Scalar subqueries inside HAVING (reference test/sql/subquery)")([
    ("II", "", "SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey HAVING count(*) >= (SELECT count(*) / 6 FROM nation) ORDER BY n_regionkey"),
    ("TI", "", "SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus HAVING count(*) > (SELECT count(*) FROM orders) / 4 ORDER BY o_orderstatus"),
])

corpus("any_value_single", "any_value over single-value groups (deterministic) (reference test/sql/aggregate)")([
    ("IT", "", "SELECT n_nationkey, any_value(n_name) FROM nation GROUP BY n_nationkey ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT any_value(r_name) FROM region WHERE r_regionkey = 2"),
])

corpus("full_outer_coalesce", "FULL OUTER key coalescing (reference test/sql/join/full_outer)")([
    ("II", "rowsort", "SELECT coalesce(a.k, b.k), coalesce(a.c, 0) + coalesce(b.c, 0) FROM (SELECT n_regionkey AS k, count(*) AS c FROM nation WHERE n_nationkey < 10 GROUP BY n_regionkey) a FULL OUTER JOIN (SELECT n_regionkey AS k, count(*) AS c FROM nation WHERE n_nationkey >= 20 GROUP BY n_regionkey) b ON a.k = b.k"),
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey AS k FROM region) a FULL OUTER JOIN (SELECT n_nationkey AS k FROM nation) b ON a.k = b.k"),
])

_V = "(VALUES (1), (2), (3), (CAST(NULL AS INT))) {alias}(i)"

corpus("correlated_corners", "Correlated scalar-subquery corners (reference test/sql/subquery/scalar/test_complex_correlated_subquery.test)")([
    ("II", "", f"SELECT i, (SELECT s1.i FROM (SELECT i FROM {_V.format(alias='v')} WHERE i = i1.i) s1) AS j FROM {_V.format(alias='i1')} ORDER BY i ASC NULLS FIRST"),
    ("II", "", f"SELECT i, (SELECT s1.i FROM {_V.format(alias='s1')}, {_V.format(alias='s2')} WHERE s1.i = s2.i AND s1.i = 4 - i1.i) AS j FROM {_V.format(alias='i1')} ORDER BY i ASC NULLS FIRST"),
    # Validator-found engine limits/divergences, excluded:
    #  - correlated outer reference inside a JOIN condition of a scalar
    #    subquery: Spark INTERNAL_ERROR (cannot codegen outer ref).
    #  - `i IN (subquery)` / `NOT IN` with NULL lhs: Spark's
    #    ExistenceJoin returns false where 3VL says NULL (DuckDB returns
    #    NULL) — the exact gap operators.mark_join exists to close
    #    (subq_mark_join_in_nulls encodes the correct semantics).
    ("II", "", f"SELECT i, (SELECT SUM(s1.i) FROM {_V.format(alias='s1')} WHERE s1.i <= i1.i) AS j FROM {_V.format(alias='i1')} ORDER BY i ASC NULLS FIRST"),
    ("II", "", f"SELECT i, (SELECT COUNT(*) FROM {_V.format(alias='s1')} WHERE s1.i < i1.i) AS j FROM {_V.format(alias='i1')} ORDER BY i ASC NULLS FIRST"),
    ("IT", "", f"SELECT i, CAST(EXISTS (SELECT 1 FROM {_V.format(alias='s1')} WHERE s1.i = i1.i) AS STRING) AS e FROM {_V.format(alias='i1')} ORDER BY i ASC NULLS FIRST"),
])

corpus("cast_overflow", "TRY_CAST overflow/precision corners (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST('99999999999999999999' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST(1e30 AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('9223372036854775807' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('-9223372036854775808' AS BIGINT)"),
    ("I", "", "SELECT CAST(2147483647 AS BIGINT) + 1"),
    ("R", "", "SELECT round(CAST(CAST(1 AS BIGINT) AS DOUBLE) / 3, 6)"),
])

corpus("grouping_sets_corners", "GROUPING SETS corners: empty set, duplicates, GROUPING() in HAVING (reference test/sql/aggregate/group)")([
    ("II", "rowsort", "SELECT coalesce(r_regionkey, -1), count(*) FROM region GROUP BY GROUPING SETS ((), (r_regionkey))"),
    ("II", "rowsort", "SELECT coalesce(r_regionkey, -1), count(*) FROM region GROUP BY GROUPING SETS ((r_regionkey), (r_regionkey))"),
    ("III", "rowsort", "SELECT coalesce(n_regionkey, -1), CAST(GROUPING(n_regionkey) AS INT), count(*) FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())"),
    # GROUPING() directly in HAVING: DuckDB accepts it, Spark raises
    # UNRESOLVED_COLUMN (validator-found divergence) — encode the
    # portable subquery rewrite instead.
    ("II", "rowsort", "SELECT k, n FROM (SELECT coalesce(n_regionkey, -1) AS k, CAST(GROUPING(n_regionkey) AS INT) AS g, count(*) AS n FROM nation GROUP BY ROLLUP (n_regionkey)) t WHERE g = 0"),
    ("I", "", "SELECT count(*) FROM (SELECT n_regionkey, n_nationkey % 2 AS par FROM nation) t GROUP BY CUBE (n_regionkey, par) ORDER BY count(*) DESC LIMIT 1"),
])

corpus("window_desc_frames", "Frames over DESC ordering (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY n_nationkey DESC ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT n_nationkey, CAST(count(*) OVER (ORDER BY n_nationkey DESC RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("II", "", "SELECT r_regionkey, CAST(min(r_regionkey) OVER (ORDER BY r_regionkey DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT n_nationkey, CAST(first_value(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC) AS INT) FROM nation ORDER BY n_nationkey LIMIT 8"),
])

corpus("nested_composition", "Window over aggregate over derived chains (reference test/sql/window, test/sql/subquery)")([
    ("IIR", "", "SELECT k, c, round(CAST(sum(c) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 3) FROM (SELECT n_regionkey AS k, count(*) AS c FROM nation GROUP BY n_regionkey) t ORDER BY k"),
    ("II", "", "SELECT k, CAST(rank() OVER (ORDER BY c DESC, k) AS INT) FROM (SELECT o_orderstatus AS st, count(*) AS c, length(o_orderstatus) AS k FROM orders GROUP BY o_orderstatus, length(o_orderstatus)) t ORDER BY k, c DESC LIMIT 3"),
    ("I", "", "SELECT max(rn) FROM (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation WHERE n_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)) t"),
])

corpus("ilike_patterns", "Case-insensitive LIKE (reference test/sql/function/string/like)")([
    ("T", "", "SELECT r_name FROM region WHERE r_name ILIKE 'a%' ORDER BY r_name"),
    ("I", "", "SELECT count(*) FROM part WHERE p_type ILIKE '%promo%'"),
    ("I", "", "SELECT count(*) FROM customer WHERE c_mktsegment NOT ILIKE 'b%'"),
    ("T", "", "SELECT p_type FROM part WHERE p_type ILIKE 'eco%' GROUP BY p_type"),
    ("I", "", "SELECT count(*) FROM supplier WHERE s_name ILIKE 'supplier#%'"),
    ("I", "", "SELECT count(*) FROM region WHERE 'Asia' ILIKE r_name"),
    ("TT", "", "SELECT CAST('AbC' ILIKE 'ab_' AS STRING), CAST('AbC' ILIKE 'ab' AS STRING)"),
])

corpus("join_using_natural", "JOIN USING / NATURAL JOIN column merging (reference test/sql/join/natural)")([
    ("I", "", "SELECT count(*) FROM (SELECT n_regionkey AS k FROM nation) a JOIN (SELECT r_regionkey AS k FROM region) b USING (k)"),
    ("II", "rowsort", "SELECT k, count(*) FROM (SELECT n_regionkey AS k FROM nation) a JOIN (SELECT r_regionkey AS k FROM region) b USING (k) GROUP BY k"),
    ("I", "", "SELECT count(*) FROM (SELECT n_regionkey AS k, n_nationkey FROM nation) a NATURAL JOIN (SELECT r_regionkey AS k FROM region) b"),
    ("IT", "", "SELECT k, coalesce(CAST(c AS STRING), '-') FROM (SELECT r_regionkey AS k FROM region) a LEFT JOIN (SELECT n_regionkey AS k, count(*) AS c FROM nation WHERE n_regionkey < 3 GROUP BY n_regionkey) b USING (k) ORDER BY k"),
    ("I", "", "SELECT sum(k) FROM (SELECT n_regionkey AS k FROM nation) a NATURAL JOIN (SELECT n_regionkey AS k FROM nation) b"),
])

corpus("exists_setops", "Subqueries built from set operations (reference test/sql/subquery, test/sql/setops)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey IN (SELECT r_regionkey FROM region UNION SELECT n_regionkey FROM nation)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region INTERSECT SELECT n_regionkey FROM nation WHERE n_nationkey < 10)"),
    ("I", "", "SELECT count(*) FROM part WHERE p_size IN (SELECT p_size FROM part WHERE p_type = 'PROMO' EXCEPT SELECT p_size FROM part WHERE p_type = 'LARGE')"),
    ("I", "", "SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r.r_regionkey UNION ALL SELECT 1 FROM nation WHERE n_nationkey = r.r_regionkey)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderstatus IN (SELECT 'F' UNION ALL SELECT 'P')"),
])

corpus("lateral_subquery", "Correlated LATERAL derived tables (reference test/sql/join/lateral)")([
    ("TI", "", "SELECT r_name, t.c FROM region, LATERAL (SELECT count(*) AS c FROM nation WHERE n_regionkey = r_regionkey) t ORDER BY r_name"),
    ("TI", "", "SELECT r_name, t.mx FROM region, LATERAL (SELECT max(n_nationkey) AS mx FROM nation WHERE n_regionkey = r_regionkey) t ORDER BY r_name"),
    ("II", "rowsort", "SELECT n_regionkey, t.s FROM nation, LATERAL (SELECT n_nationkey + 1 AS s) t WHERE n_nationkey < 5"),
])

corpus("setop_precedence", "Set-operation precedence and associativity (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT r_regionkey FROM region UNION SELECT n_regionkey FROM nation INTERSECT SELECT 0"),
    ("I", "rowsort", "SELECT 1 UNION ALL SELECT 1 UNION SELECT 1"),
    ("I", "rowsort", "SELECT 1 UNION SELECT 1 UNION ALL SELECT 1"),
    ("I", "rowsort", "SELECT r_regionkey FROM region EXCEPT SELECT 0 EXCEPT SELECT 1"),
    ("I", "rowsort", "SELECT r_regionkey FROM region INTERSECT SELECT n_regionkey FROM nation UNION SELECT 99"),
])

corpus("values_join", "VALUES derived tables joined to base tables (reference test/sql/parser/values)")([
    ("TI", "", "SELECT v.nm, count(*) FROM (VALUES ('AFRICA', 0), ('ASIA', 2)) AS v(nm, k) JOIN nation ON n_regionkey = v.k GROUP BY v.nm ORDER BY v.nm"),
    ("TI", "", "SELECT nm, k FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) AS t(nm, k) WHERE k > 1 ORDER BY k"),
    ("I", "", "SELECT sum(x) FROM (VALUES (1), (2), (NULL)) AS t(x)"),
    ("TI", "", "SELECT r_name, v.w FROM region LEFT JOIN (VALUES (0, 10), (2, 20)) AS v(k, w) ON r_regionkey = v.k ORDER BY r_regionkey LIMIT 3"),
])

corpus("window_in_setops", "Window functions inside set-operation branches (reference test/sql/window)")([
    ("II", "rowsort", "SELECT n_nationkey, CAST(rank() OVER (ORDER BY n_nationkey) AS INT) FROM nation WHERE n_regionkey = 0 UNION ALL SELECT n_nationkey, CAST(rank() OVER (ORDER BY n_nationkey DESC) AS INT) FROM nation WHERE n_regionkey = 1"),
    ("I", "", "SELECT max(rn) FROM (SELECT row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation) t"),
    ("II", "rowsort", "SELECT r_regionkey, CAST(count(*) OVER () AS INT) FROM region UNION SELECT r_regionkey, CAST(count(*) OVER () AS INT) FROM region"),
])

corpus("date_part_matrix", "date_part field-name matrix (reference test/sql/function/date)")([
    ("I", "", "SELECT date_part('year', DATE '1997-03-09')"),
    ("I", "", "SELECT date_part('quarter', DATE '1997-03-09')"),
    ("I", "", "SELECT date_part('month', DATE '1997-12-31')"),
    ("I", "", "SELECT date_part('day', DATE '1997-12-31')"),
    ("I", "", "SELECT date_part('week', DATE '1997-01-02')"),
    ("I", "", "SELECT EXTRACT(WEEK FROM DATE '2000-12-31')"),
    ("I", "", "SELECT date_part('doy', DATE '1996-03-01')"),
    ("I", "", "SELECT date_part('hour', TIMESTAMP '1997-03-09 13:45:30')"),
    ("I", "", "SELECT date_part('minute', TIMESTAMP '1997-03-09 13:45:30')"),
    ("I", "", "SELECT date_part('second', TIMESTAMP '1997-03-09 13:45:30')"),
])

corpus("tuple_in", "Row-value IN lists (reference test/sql/filter/in)")([
    ("I", "", "SELECT count(*) FROM nation WHERE (n_regionkey, n_nationkey % 5) IN ((0, 0), (1, 1))"),
    ("T", "", "SELECT r_name FROM region WHERE (r_regionkey, r_name) IN ((2, 'ASIA'), (9, 'NOWHERE')) ORDER BY r_name"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE (l_returnflag, l_linestatus) IN (('R', 'F'), ('A', 'F'))"),
    ("I", "", "SELECT count(*) FROM orders WHERE (o_orderstatus, EXTRACT(YEAR FROM o_orderdate)) IN (('F', 1995), ('O', 2000))"),
])

corpus("misc_common_fns", "Shared scalar functions across engines (reference test/sql/function)")([
    ("II", "", "SELECT factorial(5), factorial(0)"),
    ("T", "", "SELECT translate(r_name, 'AEI', 'aei') FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT levenshtein('kitten', 'sitting')"),
    ("T", "", "SELECT concat_ws('/', r_name, CAST(r_regionkey AS STRING), NULL) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT instr(p_type, 'OMO') FROM part WHERE p_partkey = 1"),
    ("T", "", "SELECT regexp_extract(s_name, '([0-9]+)', 1) FROM supplier ORDER BY s_suppkey LIMIT 3"),
    ("I", "", "SELECT bit_count(CAST(255 AS BIGINT))"),
])

corpus("order_by_hidden", "ORDER BY expressions outside the select list (reference test/sql/order)")([
    ("T", "", "SELECT r_name FROM region ORDER BY r_regionkey DESC"),
    ("T", "", "SELECT n_name FROM nation ORDER BY n_regionkey, n_nationkey LIMIT 6"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY length(n_name), n_nationkey LIMIT 5"),
    ("TI", "", "SELECT o_orderstatus AS st, count(*) AS c FROM orders GROUP BY o_orderstatus ORDER BY count(*) DESC, st"),
    ("I", "", "SELECT r_regionkey + 1 AS k FROM region ORDER BY k DESC"),
    ("T", "", "SELECT upper(r_name) FROM region ORDER BY r_name DESC LIMIT 2"),
])

corpus("agg_constants", "Aggregates of constants / empty inputs (reference test/sql/aggregate)")([
    ("II", "", "SELECT count(1), CAST(sum(2) AS BIGINT) FROM region"),
    ("T", "", "SELECT min('zz') FROM region"),
    ("I", "", "SELECT count(*) FROM region WHERE 1 = 0"),
    ("I", "", "SELECT CAST(sum(r_regionkey) AS BIGINT) FROM region WHERE r_regionkey > 99"),
    ("IT", "rowsort", "SELECT n_regionkey, max('const') FROM nation GROUP BY n_regionkey"),
    ("I", "", "SELECT count(DISTINCT 7) FROM nation"),
])

corpus("nested_agg_of_agg", "Aggregates over grouped subqueries (reference test/sql/subquery)")([
    ("I", "", "SELECT CAST(max(c) AS BIGINT) FROM (SELECT o_custkey, count(*) AS c FROM orders GROUP BY o_custkey) t"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 3) t"),
    ("II", "", "SELECT CAST(min(s) AS BIGINT), CAST(max(s) AS BIGINT) FROM (SELECT n_regionkey, CAST(sum(n_nationkey) AS BIGINT) AS s FROM nation GROUP BY n_regionkey) t"),
    ("I", "", "SELECT CAST(sum(c * c) AS BIGINT) FROM (SELECT l_returnflag, count(*) AS c FROM lineitem GROUP BY l_returnflag) t"),
])

corpus("conjunction_folding", "AND/OR constant folding and NULL propagation (reference test/sql/conjunction)")([
    ("I", "", "SELECT count(*) FROM nation WHERE TRUE AND n_regionkey = 2"),
    ("I", "", "SELECT count(*) FROM nation WHERE FALSE OR n_regionkey = 2"),
    ("I", "", "SELECT count(*) FROM nation WHERE NOT (n_regionkey = 2)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey = 2 OR NULL"),
    ("I", "", "SELECT count(*) FROM nation WHERE (n_regionkey = 2) AND NULL IS NULL"),
    ("I", "", "SELECT count(*) FROM nation WHERE NOT (n_regionkey = 1 OR n_regionkey = 3)"),
    ("I", "", "SELECT count(*) FROM nation WHERE NOT (n_regionkey = 1) AND NOT (n_regionkey = 3)"),
    ("I", "", "SELECT count(*) FROM nation WHERE (n_regionkey < 2 AND n_nationkey < 10) OR (n_regionkey >= 2 AND n_nationkey >= 10)"),
    ("IT", "", "SELECT n_nationkey, CASE WHEN n_regionkey = 0 AND NULL THEN 'x' ELSE 'y' END FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("I", "", "SELECT count(*) FROM nation WHERE (NULL AND FALSE) IS NULL"),
    ("I", "", "SELECT count(*) FROM nation WHERE (NULL OR TRUE)"),
])

corpus("topn_ties", "ORDER BY + LIMIT tie and boundary semantics (reference test/sql/topn)")([
    ("TI", "", "SELECT o_orderpriority, o_orderkey FROM orders WHERE o_orderkey < 60 ORDER BY o_orderpriority, o_orderkey LIMIT 7"),
    ("I", "", "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"),
    ("I", "", "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 100"),
    ("I", "", "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2 OFFSET 4"),
    ("I", "", "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 3 OFFSET 99"),
    ("II", "", "SELECT n_regionkey, n_nationkey FROM nation ORDER BY n_regionkey DESC, n_nationkey DESC LIMIT 6"),
    ("I", "", "SELECT CAST(count(*) AS BIGINT) FROM (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 10) t"),
    ("TI", "", "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_orderkey = 7 ORDER BY l_returnflag, l_linenumber LIMIT 4"),
])

corpus("window_value_fns", "first/last/nth_value and lead/lag defaults over frames (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, first_value(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, last_value(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, nth_value(n_nationkey, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, lag(n_nationkey, 1, -1) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT n_nationkey, lead(n_nationkey, 2, -99) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey DESC LIMIT 4"),
    ("II", "", "SELECT n_nationkey, last_value(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT n_nationkey, first_value(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM nation ORDER BY n_nationkey LIMIT 6"),
])

corpus("string_matrix2", "translate/ascii/left/right and string builders (reference test/sql/function/string)")([
    ("T", "", "SELECT translate(r_name, 'AE', 'ae') FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT ascii(substr(n_name, 1, 1)) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT chr(65 + CAST(r_regionkey AS INT)) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT left(n_name, 8) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT right(n_name, 2) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT substr(md5(r_name), 1, 8) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT repeat(right(r_name, 1), CAST(r_regionkey AS INT)) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT length(translate(n_name, '_', '')) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("T", "", "SELECT upper(left(r_name, 1)) || lower(substr(r_name, 2)) FROM region ORDER BY r_regionkey"),
])

corpus("math_matrix2", "power/exp/log/trig identities (reference test/sql/function/numeric)")([
    ("R", "", "SELECT round(power(2, n_regionkey), 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("R", "", "SELECT round(exp(ln(CAST(n_nationkey + 1 AS DOUBLE))), 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("R", "", "SELECT round(log10(CAST(power(10, r_regionkey) AS DOUBLE)), 3) FROM region ORDER BY r_regionkey"),
    ("R", "", "SELECT round(pi() * r_regionkey, 3) FROM region ORDER BY r_regionkey"),
    ("R", "", "SELECT round(cbrt(CAST(n_nationkey AS DOUBLE)), 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("R", "", "SELECT round(atan2(1.0, CAST(r_regionkey AS DOUBLE)), 3) FROM region ORDER BY r_regionkey"),
    ("R", "", "SELECT round(degrees(radians(CAST(n_nationkey * 10 AS DOUBLE))), 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT CAST(ceil(CAST(-n_nationkey AS DOUBLE) / 2) AS BIGINT), CAST(floor(CAST(-n_nationkey AS DOUBLE) / 2) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("R", "", "SELECT round(sqrt(CAST(n_nationkey * n_nationkey AS DOUBLE)), 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
])

corpus("exists_empty_corners", "EXISTS/IN/scalar subqueries over empty inputs (reference test/sql/subquery)")([
    ("I", "", "SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM nation WHERE n_nationkey > 999)"),
    ("I", "", "SELECT count(*) FROM region WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey > 999)"),
    ("I", "", "SELECT count(*) FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey > 999)"),
    ("I", "", "SELECT count(*) FROM region WHERE r_regionkey NOT IN (SELECT n_regionkey FROM nation WHERE n_nationkey > 999)"),
    ("I", "", "SELECT CAST((SELECT sum(n_nationkey) FROM nation WHERE n_nationkey > 999) AS BIGINT)"),
    ("I", "", "SELECT CAST(coalesce((SELECT max(n_nationkey) FROM nation WHERE FALSE), -1) AS BIGINT)"),
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey FROM region WHERE FALSE) t"),
    ("I", "", "SELECT CAST((SELECT count(*) FROM nation WHERE n_nationkey > 999) AS BIGINT)"),
])

corpus("rollup_grouping_fn", "ROLLUP/CUBE with GROUPING() markers (reference test/sql/aggregate/grouping_sets)")([
    ("III", "rowsort", "SELECT n_regionkey, grouping(n_regionkey), count(*) FROM nation GROUP BY ROLLUP(n_regionkey)"),
    ("IIII", "rowsort", "SELECT n_regionkey, n_nationkey % 2, grouping(n_regionkey), count(*) FROM nation GROUP BY ROLLUP(n_regionkey, n_nationkey % 2)"),
    ("IIII", "rowsort", "SELECT n_regionkey, n_nationkey % 2, grouping(n_nationkey % 2), count(*) FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2)"),
    ("TII", "rowsort", "SELECT o_orderstatus, grouping(o_orderstatus), count(*) FROM orders GROUP BY ROLLUP(o_orderstatus)"),
    ("III", "rowsort", "SELECT n_regionkey, grouping(n_regionkey), CAST(sum(n_nationkey) AS BIGINT) FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())"),
])

corpus("agg_case_matrix", "Aggregates of CASE expressions (reference test/sql/aggregate)")([
    ("I", "", "SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem"),
    ("II", "", "SELECT count(CASE WHEN o_orderstatus = 'O' THEN 1 END), count(*) FROM orders"),
    ("TI", "rowsort", "SELECT o_orderstatus, CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey ELSE 0 END) AS BIGINT) FROM orders WHERE o_orderkey < 100 GROUP BY o_orderstatus"),
    ("T", "", "SELECT max(CASE WHEN n_regionkey = 0 THEN n_name END) FROM nation"),
    ("T", "", "SELECT min(CASE WHEN n_regionkey = 9 THEN n_name END) FROM nation"),
    ("I", "", "SELECT CAST(sum(CASE l_linestatus WHEN 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) FROM lineitem WHERE l_orderkey < 50"),
    ("II", "rowsort", "SELECT n_regionkey, count(CASE WHEN n_nationkey % 2 = 0 THEN 1 END) FROM nation GROUP BY n_regionkey"),
])

corpus("date_math2", "last_day/make_date/quarter arithmetic (reference test/sql/types/date)")([
    ("T", "", "SELECT CAST(last_day(CAST(o_orderdate AS DATE)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(make_date(2020 + CAST(r_regionkey AS INT), 1 + CAST(r_regionkey AS INT), 15) AS STRING) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT extract(quarter FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 6"),
    # DATE + INTERVAL returns TIMESTAMP in DuckDB but DATE in Spark
    # (validator-found) — normalize with an outer CAST to DATE.
    ("T", "", "SELECT CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(CAST(date_trunc('year', o_orderdate) AS DATE) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 4"),
    ("II", "", "SELECT extract(year FROM o_orderdate), extract(day FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("I", "", "SELECT count(*) FROM orders WHERE extract(month FROM o_orderdate) = 2 AND o_orderkey < 500"),
])

corpus("multi_alias_self_join", "Same table in three-plus roles (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey"),
    ("I", "", "SELECT count(*) FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey JOIN nation c ON b.n_regionkey = c.n_regionkey AND b.n_nationkey < c.n_nationkey"),
    ("III", "", "SELECT a.n_nationkey, b.n_nationkey, c.n_nationkey FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 5 JOIN nation c ON c.n_nationkey = b.n_nationkey + 5 ORDER BY a.n_nationkey LIMIT 5"),
    ("II", "rowsort", "SELECT a.n_regionkey, count(*) FROM nation a JOIN nation b ON a.n_nationkey <> b.n_nationkey AND a.n_regionkey = b.n_regionkey GROUP BY a.n_regionkey"),
    ("I", "", "SELECT count(*) FROM region a JOIN region b ON a.r_regionkey <> b.r_regionkey JOIN region c ON c.r_regionkey <> a.r_regionkey AND c.r_regionkey <> b.r_regionkey"),
])

corpus("scalar_subquery_corners", "Correlated scalar subqueries and empty-group NULLs (reference test/sql/subquery/scalar)")([
    ("II", "", "SELECT r_regionkey, CAST((SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS BIGINT) FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT r_regionkey, CAST((SELECT max(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey > 900) AS BIGINT) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey > (SELECT avg(CAST(n_nationkey AS DOUBLE)) FROM nation)"),
    ("II", "", "SELECT n_nationkey, CAST((SELECT r_regionkey FROM region WHERE r_regionkey = n_regionkey) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT count(*) FROM region WHERE (SELECT min(n_nationkey) FROM nation WHERE n_regionkey = r_regionkey) IS NULL"),
])

corpus("div_mod_matrix", "Division/modulo sign and type semantics (reference test/sql/types/numeric)")([
    ("I", "", "SELECT mod(-7, 3)"),
    ("I", "", "SELECT mod(7, -3)"),
    ("R", "", "SELECT round(CAST(n_nationkey AS DOUBLE) / 4, 3) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("I", "", "SELECT CAST(floor(CAST(n_nationkey AS DOUBLE) / 4) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT mod(n_nationkey * n_nationkey, 7) FROM nation ORDER BY n_nationkey LIMIT 8"),
    ("I", "", "SELECT CAST(floor(CAST(-n_nationkey AS DOUBLE) / 4) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE mod(l_orderkey, 10) = 0 AND l_orderkey < 200"),
])

corpus("recursive_cte", "Recursive CTE semantics — series, trees, closure (reference test/sql/cte/recursive; Spark requires UNION ALL inside recursion)")([
    ("I", "", "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10) SELECT CAST(sum(n) AS BIGINT) FROM t"),
    ("I", "", "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n * 2 FROM t WHERE n < 100) SELECT max(n) FROM t"),
    ("II", "", "WITH RECURSIVE fib(a, b) AS (SELECT 0, 1 UNION ALL SELECT b, a + b FROM fib WHERE b < 100) SELECT a, b FROM fib ORDER BY a"),
    ("I", "", "WITH RECURSIVE up(k) AS (SELECT n_nationkey FROM nation WHERE n_nationkey = 23 UNION ALL SELECT k - 5 FROM up WHERE k >= 5) SELECT CAST(sum(k) AS BIGINT) FROM up"),
    ("II", "rowsort", "WITH RECURSIVE reach(src, dst) AS (SELECT r_regionkey, r_regionkey + 1 FROM region WHERE r_regionkey < 4 UNION ALL SELECT r.src, r.dst + 1 FROM reach r WHERE r.dst < 4) SELECT src, count(*) FROM reach GROUP BY src"),
    ("I", "", "WITH RECURSIVE t(n) AS (SELECT CAST(1 AS BIGINT) UNION ALL SELECT n + 1 FROM t WHERE n < 50) SELECT count(*) FROM (SELECT n FROM t WHERE n % 7 = 0) s"),
    ("TI", "", "WITH RECURSIVE seq(s, n) AS (SELECT 'a', 1 UNION ALL SELECT s || 'a', n + 1 FROM seq WHERE n < 5) SELECT s, n FROM seq ORDER BY n"),
])

corpus("decimal_arith", "DECIMAL(p,s) arithmetic and casts (reference test/sql/types/decimal)")([
    ("T", "", "SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST(1.5 AS DECIMAL(4,2)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(CAST(n_nationkey AS DECIMAL(10,3)) AS STRING) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("T", "", "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS STRING) FROM lineitem WHERE l_orderkey < 50"),
    # CAST(DECIMAL AS BIGINT) rounds in DuckDB but truncates in Spark —
    # the same divergence as double->BIGINT (validator-found); floor()
    # agrees in both engines.
    ("I", "", "SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(12,2))) AS BIGINT) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(CAST('123.456' AS DECIMAL(6,3)) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE CAST(o_totalprice AS DECIMAL(12,2)) > CAST(200000 AS DECIMAL(12,2))"),
])

corpus("exists_in_projection", "EXISTS/IN inside SELECT-list CASE (reference test/sql/subquery)")([
    ("II", "", "SELECT r_regionkey, CASE WHEN EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey > 20) THEN 1 ELSE 0 END FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT r_regionkey, CASE WHEN r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 3) THEN 1 ELSE 0 END FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT n_nationkey, CASE WHEN EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey) THEN n_nationkey ELSE -1 END FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("I", "", "SELECT CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey % 2 = 0) THEN 1 ELSE 0 END) AS BIGINT) FROM region"),
])

corpus("window_null_order_matrix", "NULLS FIRST/LAST inside window ORDER BY (reference test/sql/window)")([
    ("II", "", "SELECT o_orderkey, row_number() OVER (ORDER BY nullif(o_orderkey % 3, 0) ASC NULLS FIRST, o_orderkey) FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey"),
    ("II", "", "SELECT o_orderkey, row_number() OVER (ORDER BY nullif(o_orderkey % 3, 0) ASC NULLS LAST, o_orderkey) FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey"),
    ("II", "", "SELECT o_orderkey, rank() OVER (ORDER BY nullif(o_orderkey % 5, 0) DESC NULLS FIRST) FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey"),
    ("II", "", "SELECT o_orderkey, first_value(o_orderkey) OVER (ORDER BY nullif(o_orderkey % 4, 0) NULLS LAST, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM orders WHERE o_orderkey < 16 ORDER BY o_orderkey"),
])

corpus("epoch_day_extract", "day-of-year / epoch-free date part extraction (reference test/sql/function/date_part)")([
    ("I", "", "SELECT extract(doy FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("I", "", "SELECT extract(week FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("II", "", "SELECT extract(hour FROM ts), extract(minute FROM ts) FROM events ORDER BY event_id LIMIT 5"),
    ("I", "", "SELECT extract(second FROM date_trunc('minute', ts)) FROM events ORDER BY event_id LIMIT 4"),
    ("I", "", "SELECT count(*) FROM orders WHERE extract(doy FROM o_orderdate) <= 31 AND o_orderkey < 1000"),
])

corpus("nan_infinity", "NaN / Infinity semantics — ordering, equality, aggregates (reference test/sql/types/float)")([
    ("I", "", "SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE)"),
    ("I", "", "SELECT CAST('NaN' AS DOUBLE) > CAST(1e308 AS DOUBLE)"),
    ("I", "", "SELECT CAST('Infinity' AS DOUBLE) > CAST(1e308 AS DOUBLE)"),
    ("I", "", "SELECT CAST('-Infinity' AS DOUBLE) < CAST(-1e308 AS DOUBLE)"),
    ("R", "", "SELECT x FROM (VALUES (1.5), (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)), (CAST('-Infinity' AS DOUBLE)), (0.0)) t(x) ORDER BY x"),
    ("R", "", "SELECT max(x) FROM (VALUES (1.5), (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE))) t(x)"),
    ("R", "", "SELECT min(x) FROM (VALUES (1.5), (CAST('NaN' AS DOUBLE)), (CAST('-Infinity' AS DOUBLE))) t(x)"),
    ("R", "", "SELECT sum(x) FROM (VALUES (1.5), (CAST('NaN' AS DOUBLE))) t(x)"),
    ("I", "", "SELECT count(*) FROM (VALUES (1.5), (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE))) t(x) WHERE isnan(x)"),
    ("R", "", "SELECT CAST('Infinity' AS DOUBLE) + 1.0"),
    ("R", "", "SELECT CAST('Infinity' AS DOUBLE) - CAST('Infinity' AS DOUBLE)"),
    ("R", "", "SELECT greatest(1.0, CAST('NaN' AS DOUBLE))"),
    ("I", "", "SELECT count(DISTINCT x) FROM (VALUES (CAST('NaN' AS DOUBLE)), (CAST('NaN' AS DOUBLE)), (1.0)) t(x)"),
])

corpus("lateral_chains", "Chained / top-N / LEFT LATERAL derived tables (reference test/sql/subquery/lateral)")([
    # Spark restricts outer references to WHERE/HAVING inside lateral
    # subqueries (validator-found) — cross-lateral arithmetic and
    # outer-dependent CASE stay in the outer projection.
    ("TII", "", "SELECT r_name, t1.c, t1.c + t2.s2 AS s FROM region, LATERAL (SELECT count(*) AS c FROM nation WHERE n_regionkey = r_regionkey) t1, LATERAL (SELECT CAST(sum(n_nationkey) AS BIGINT) AS s2 FROM nation WHERE n_regionkey = r_regionkey) t2 ORDER BY r_name"),
    ("II", "", "SELECT r_regionkey, t.n FROM region, LATERAL (SELECT n_nationkey AS n FROM nation WHERE n_regionkey = r_regionkey ORDER BY n_nationkey DESC LIMIT 2) t ORDER BY r_regionkey, t.n"),
    ("II", "", "SELECT n_nationkey, t.k FROM nation LEFT JOIN LATERAL (SELECT r_regionkey AS k FROM region WHERE r_regionkey = n_regionkey AND r_regionkey < 2) t ON TRUE WHERE n_nationkey < 8 ORDER BY n_nationkey"),
    ("TI", "", "SELECT r_name, CASE WHEN r_regionkey < 2 THEN t.mn ELSE t.mx END AS m FROM region, LATERAL (SELECT min(n_nationkey) AS mn, max(n_nationkey) AS mx FROM nation WHERE n_regionkey = r_regionkey) t ORDER BY r_name"),
    ("I", "", "SELECT CAST(sum(t.c) AS BIGINT) FROM region, LATERAL (SELECT count(*) AS c FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey % 2 = 0) t"),
])

corpus("interval_compare", "Timestamp comparisons via interval windows (reference test/sql/types/interval)")([
    ("I", "", "SELECT count(*) FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00' + INTERVAL 12 HOUR"),
    ("I", "", "SELECT count(*) FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-03 00:00:00' + INTERVAL 2 DAY"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1995-06-01 00:00:00'"),
    ("I", "", "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 90 MINUTE < TIMESTAMP '2024-01-01 02:00:00' AS INT)"),
    ("I", "", "SELECT count(*) FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE WHERE e1.user_id < 10"),
    ("T", "", "SELECT CAST(CAST(date_trunc('day', ts + INTERVAL 6 HOUR) AS DATE) AS STRING) FROM events ORDER BY event_id LIMIT 3"),
])

corpus("union_branch_order", "ORDER BY / LIMIT inside parenthesized set-op branches (reference test/sql/setops)")([
    ("I", "rowsort", "(SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3) UNION ALL (SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC LIMIT 3)"),
    ("I", "", "SELECT count(*) FROM ((SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2) UNION (SELECT n_regionkey FROM nation ORDER BY n_regionkey DESC LIMIT 2)) t"),
    ("I", "", "(SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5) INTERSECT (SELECT n_nationkey FROM nation WHERE n_nationkey < 3) ORDER BY 1"),
    ("I", "", "(SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 10) EXCEPT (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5) ORDER BY 1"),
    ("I", "rowsort", "(SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 3 OFFSET 1) UNION ALL (SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 1)"),
])

corpus("having_hidden_aggs", "HAVING on aggregates absent from the SELECT list (reference test/sql/aggregate/having)")([
    ("I", "rowsort", "SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING CAST(sum(n_nationkey) AS BIGINT) > 50"),
    ("T", "rowsort", "SELECT o_orderstatus FROM orders GROUP BY o_orderstatus HAVING count(DISTINCT o_custkey) > 100"),
    ("I", "rowsort", "SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING min(n_nationkey) < 3 AND max(n_nationkey) > 20"),
    ("II", "rowsort", "SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey HAVING avg(CAST(n_nationkey AS DOUBLE)) > 11"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING max(o_totalprice) - min(o_totalprice) > 300000) t"),
])

HEADER_NOTE = (
    "# GENERATED by tools/gen_sqllogic.py — golden rows validated on BOTH\n"
    "# engines (DuckDB + Spark) over /root/testdata/sf0.001 (the\n"
    "# reference's golden-answer method, SURVEY.md §5).  Edit the specs in\n"
    "# the generator, not this file.\n"
)



# ---------------------------------------------------------------------------
# Round-3 corpus expansion into previously-untouched reference categories:
# test/sql/types/decimal (width/rescale matrix), test/sql/collate,
# test/sql/subquery (correlated/lateral corners), test/sql/window (frame
# boundary cases).  All specs below obey the dialect-common subset; two
# further divergences found while validating this tranche:
#   - decimal -> NARROWER decimal rescale rounds HALF_EVEN in DuckDB but
#     HALF_UP in Spark: never rescale a value that ties at the target
#     scale (use .26, not .25).
#   - decimal / decimal produces different result scales (DuckDB widens
#     to ~16 digits, Spark to 12): divide as DOUBLE instead.
# ---------------------------------------------------------------------------

_DEC_WIDTHS = [
    (9, 0), (9, 2), (9, 4), (12, 3), (12, 6), (18, 0), (18, 4), (18, 9),
    (25, 5), (30, 10), (38, 0), (38, 10), (38, 18), (19, 2), (23, 8), (28, 14),
]

for _p, _s in _DEC_WIDTHS:
    _d = f"DECIMAL({_p},{_s})"
    _frac = "7" * min(_s + 1, 6) if _s else ""
    _lit = f"12.{_frac}" if _s else "127"
    _neg = f"-3.{_frac}" if _s else "-31"
    _specs = [
        ("T", "", f"SELECT CAST(CAST('{_lit}' AS {_d}) AS STRING)"),
        ("T", "", f"SELECT CAST(CAST('{_neg}' AS {_d}) AS STRING)"),
        ("T", "", f"SELECT CAST(CAST(n_nationkey AS {_d}) AS STRING) FROM nation ORDER BY n_nationkey LIMIT 3"),
        # explicit result cast: at p=38 the engines cap precision with
        # different scale reduction (Spark drops a scale digit, DuckDB
        # keeps it) — normalizing the result scale keeps values comparable
        ("T", "", f"SELECT CAST(CAST(CAST('{_lit}' AS {_d}) + CAST('{_neg}' AS {_d}) AS {_d}) AS STRING)"),
        ("T", "", f"SELECT CAST(CAST(CAST('{_lit}' AS {_d}) - CAST('{_neg}' AS {_d}) AS {_d}) AS STRING)"),
        ("T", "", f"SELECT CAST(SUM(CAST(n_nationkey AS {_d})) AS STRING) FROM nation"),
        ("T", "", f"SELECT CAST(MIN(CAST(r_regionkey AS {_d})) AS STRING) || '/' || CAST(MAX(CAST(r_regionkey AS {_d})) AS STRING) FROM region"),
        ("T", "", f"SELECT CAST(CAST('{_lit}' AS {_d}) > CAST('{_neg}' AS {_d}) AS STRING)"),
        ("T", "", f"SELECT CASE WHEN CAST('{_lit}' AS {_d}) >= CAST(0 AS {_d}) THEN 'nonneg' ELSE 'neg' END"),
        ("I", "", f"SELECT count(*) FROM nation WHERE CAST(n_nationkey AS {_d}) > CAST(12 AS {_d})"),
    ]
    if _p <= 18:
        # widening rescale is exact; narrowing uses non-tie digits so
        # HALF_EVEN (DuckDB) and HALF_UP (Spark) agree
        _specs.append(("T", "", f"SELECT CAST(CAST(CAST('{_lit}' AS {_d}) AS DECIMAL(38,{min(_s + 2, 37)})) AS STRING)"))
    if _s >= 2:
        # narrowing rescale only with exact trailing zeros: DuckDB
        # TRUNCATES decimal->narrower-decimal while Spark rounds
        _specs.append(("T", "", f"SELECT CAST(CAST(CAST('4.20' AS {_d}) AS DECIMAL(9,1)) AS STRING)"))
    corpus(
        f"decimal_width_{_p}_{_s}",
        f"DECIMAL({_p},{_s}) cast/arith/aggregate matrix (reference test/sql/types/decimal)",
    )(_specs)

corpus("decimal_rescale_chain", "Decimal rescale chains, exact widening + non-tie narrowing (reference test/sql/types/decimal/cast_from_decimal.test)")([
    ("T", "", "SELECT CAST(CAST(CAST(CAST('7.1' AS DECIMAL(9,1)) AS DECIMAL(18,5)) AS DECIMAL(38,10)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(CAST('123.4500' AS DECIMAL(18,4)) AS DECIMAL(18,2)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(CAST('-2.60' AS DECIMAL(9,2)) AS DECIMAL(9,1)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(CAST('31.9' AS DECIMAL(9,1)) AS DECIMAL(38,18)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(0 AS DECIMAL(9,4)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(CAST('1000000.07' AS DECIMAL(18,2)) AS DECIMAL(25,2)) AS STRING)"),
])

corpus("decimal_mixed_scale_arith", "Mixed-scale decimal addition/multiplication result scales (reference test/sql/types/decimal/decimal_arithmetic.test)")([
    ("T", "", "SELECT CAST(CAST('1.5' AS DECIMAL(9,2)) + CAST('2.25' AS DECIMAL(9,3)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('1.5' AS DECIMAL(9,2)) * CAST('2.5' AS DECIMAL(9,2)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('0.001' AS DECIMAL(9,3)) * CAST('1000' AS DECIMAL(9,0)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('-1.25' AS DECIMAL(12,4)) + CAST('1.25' AS DECIMAL(12,4)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('99.99' AS DECIMAL(4,2)) + CAST('0.01' AS DECIMAL(4,2)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('3.3' AS DECIMAL(18,1)) * CAST('3' AS DECIMAL(18,0)) AS STRING)"),
    ("R", "", "SELECT round(CAST(CAST('2' AS DECIMAL(9,2)) AS DOUBLE) / CAST(CAST('3' AS DECIMAL(9,2)) AS DOUBLE), 6)"),
    ("T", "", "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,0)) AS STRING) FROM orders ORDER BY o_orderkey LIMIT 3"),
])

corpus("decimal_aggregates", "Aggregates over decimal columns (reference test/sql/types/decimal + test/sql/aggregate)")([
    ("T", "", "SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) FROM orders"),
    ("T", "", "SELECT CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING), CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) FROM orders".replace("STRING), CAST", "STRING) || '/' || CAST")),
    ("I", "", "SELECT count(DISTINCT CAST(l_quantity AS DECIMAL(9,0))) FROM lineitem"),
    ("T", "rowsort", "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) FROM lineitem GROUP BY l_returnflag"),
    ("T", "", "SELECT CAST(SUM(CAST(NULL AS DECIMAL(9,2))) AS STRING) FROM region"),
    ("T", "", "SELECT CAST(SUM(CASE WHEN r_regionkey > 2 THEN CAST('1.11' AS DECIMAL(9,2)) END) AS STRING) FROM region"),
])

corpus("decimal_compare_order", "Decimal comparisons, ordering, BETWEEN (reference test/sql/types/decimal)")([
    ("T", "", "SELECT CAST(CAST('1.10' AS DECIMAL(9,2)) = CAST('1.1' AS DECIMAL(9,1)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('0.5' AS DECIMAL(9,1)) BETWEEN CAST('0' AS DECIMAL(9,0)) AND CAST('1' AS DECIMAL(9,0)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('-0.01' AS DECIMAL(9,2)) < CAST(0 AS DECIMAL(9,0)) AS STRING)"),
    ("T", "", "SELECT CAST(o_totalprice AS STRING) FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > CAST('99000' AS DECIMAL(18,2)) ORDER BY o_orderkey LIMIT 3"),
    ("I", "", "SELECT o_orderkey FROM orders ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(CAST(greatest(CAST('1.5' AS DECIMAL(9,2)), CAST('1.49' AS DECIMAL(9,2))) AS DECIMAL(9,2)) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(least(CAST('-1.5' AS DECIMAL(9,2)), CAST('1.49' AS DECIMAL(9,2))) AS DECIMAL(9,2)) AS STRING)"),
])

corpus("decimal_null_edges", "NULL propagation through decimal expressions (reference test/sql/types/decimal)")([
    ("T", "", "SELECT CAST(CAST(NULL AS DECIMAL(9,2)) + CAST('1' AS DECIMAL(9,2)) AS STRING)"),
    ("T", "", "SELECT CAST(coalesce(CAST(NULL AS DECIMAL(9,2)), CAST('4.75' AS DECIMAL(9,2))) AS STRING)"),
    ("T", "", "SELECT CAST(nullif(CAST('2.00' AS DECIMAL(9,2)), CAST('2' AS DECIMAL(9,0))) AS STRING)"),
    ("I", "", "SELECT count(CAST(NULL AS DECIMAL(9,2))) FROM region"),
    ("T", "", "SELECT CAST(CAST(NULL AS DECIMAL(38,18)) IS NULL AS STRING)"),
])

corpus("decimal_int_interop", "Decimal x integer arithmetic and casts (reference test/sql/types/decimal)")([
    ("T", "", "SELECT CAST(CAST('2.5' AS DECIMAL(9,2)) * 4 AS STRING)"),
    ("T", "", "SELECT CAST(CAST('2.5' AS DECIMAL(9,2)) + 1 AS STRING)"),
    ("I", "", "SELECT CAST(floor(CAST('7.9' AS DECIMAL(9,1))) AS BIGINT)"),
    ("I", "", "SELECT CAST(CAST('42' AS DECIMAL(9,0)) AS BIGINT)"),
    ("T", "", "SELECT CAST(CAST(5 AS DECIMAL(18,4)) AS STRING)"),
    ("T", "", "SELECT CAST(abs(CAST('-12.34' AS DECIMAL(9,2))) AS STRING)"),
])

corpus("decimal_double_interop", "Decimal <-> double conversion boundaries (reference test/sql/types/decimal/cast_to_double)")([
    ("R", "", "SELECT round(CAST(CAST('1.125' AS DECIMAL(9,3)) AS DOUBLE), 4)"),
    ("T", "", "SELECT CAST(CAST(CAST(floor(2.75) AS DECIMAL(9,2)) AS DOUBLE) = 2.0 AS STRING)"),
    ("R", "", "SELECT round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) FROM lineitem"),
    ("T", "", "SELECT CAST(CAST(1e2 AS DECIMAL(9,1)) AS STRING)"),
])



# --- collate analogs (reference test/sql/collate: NOCASE/NOACCENT) -------
# Two layers: (1) normalization rewrites (lower / translate) that encode
# NOCASE/NOACCENT semantics in the dialect-common subset; (2) true ICU
# locale collations (further below) — Spark 4 and DuckDB both bind ICU
# collators through the identical `expr COLLATE locale` syntax, and the
# probe in queries/collation_q.py found 13 locales with engine-identical
# tertiary orderings (nb diverges; _CI variants use different strengths).

_ACCENTS = "'áàâäéèêëíìîïóòôöúùûüñç', 'aaaaeeeeiiiioooouuuunc'"

corpus("collate_nocase_eq", "Case-insensitive equality via lower() (reference test/sql/collate/test_nocase.test)")([
    ("I", "", "SELECT count(*) FROM region WHERE lower(r_name) = lower('europe')"),
    ("I", "", "SELECT count(*) FROM region WHERE lower(r_name) = 'asia'"),
    ("T", "", "SELECT CAST(lower('ASIA') = lower('asia') AS STRING)"),
    ("T", "", "SELECT CAST(lower('Mixed Case') = 'mixed case' AS STRING)"),
    ("I", "", "SELECT count(*) FROM nation WHERE lower(n_name) <> n_name"),
])

corpus("collate_nocase_order", "Case-insensitive ordering via ORDER BY lower() (reference test/sql/collate/order_collate.test)")([
    ("T", "", "SELECT x FROM (SELECT 'b' AS x UNION ALL SELECT 'A' UNION ALL SELECT 'c' UNION ALL SELECT 'B') t ORDER BY lower(x), x"),
    ("T", "", "SELECT r_name FROM region ORDER BY lower(r_name) DESC"),
    ("T", "", "SELECT min(lower(n_name)) || '/' || max(lower(n_name)) FROM nation"),
])

corpus("collate_nocase_groupby", "Case-insensitive grouping on normalized keys (reference test/sql/collate/group_collate.test)")([
    ("TI", "rowsort", "SELECT lower(x) AS k, count(*) FROM (SELECT 'Ab' AS x UNION ALL SELECT 'aB' UNION ALL SELECT 'cd' UNION ALL SELECT 'CD' UNION ALL SELECT 'e') t GROUP BY lower(x)"),
    ("I", "", "SELECT count(DISTINCT lower(x)) FROM (SELECT 'Ab' AS x UNION ALL SELECT 'aB' UNION ALL SELECT 'AB') t"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT lower(o_orderstatus) FROM orders) t"),
])

corpus("collate_nocase_join", "Case-insensitive join keys (reference test/sql/collate/collate_joins.test)")([
    ("TI", "rowsort", "SELECT a.x, b.y FROM (SELECT 'AB' AS x UNION ALL SELECT 'cd') a JOIN (SELECT 'ab' AS k, 1 AS y UNION ALL SELECT 'CD', 2) b ON lower(a.x) = lower(b.k)"),
    ("I", "", "SELECT count(*) FROM region r JOIN region r2 ON lower(r.r_name) = lower(r2.r_name)"),
])

corpus("collate_noaccent", "Accent-insensitive comparison via translate() (reference test/sql/collate/test_noaccent.test)")([
    ("T", "", f"SELECT translate('café', {_ACCENTS})"),
    ("T", "", f"SELECT CAST(translate('café', {_ACCENTS}) = 'cafe' AS STRING)"),
    ("T", "", f"SELECT CAST(translate('Ñandú', {_ACCENTS}) = translate('Nandu', {_ACCENTS}) AS STRING)"),
    ("T", "", f"SELECT x FROM (SELECT 'résumé' AS x UNION ALL SELECT 'resume' UNION ALL SELECT 'zèbre') t ORDER BY translate(x, {_ACCENTS}), x"),
    ("I", "", f"SELECT count(DISTINCT translate(x, {_ACCENTS})) FROM (SELECT 'café' AS x UNION ALL SELECT 'cafe' UNION ALL SELECT 'cafÉ') t"),
])

corpus("collate_nocase_noaccent_combined", "Combined NOCASE.NOACCENT pipeline (reference test/sql/collate/test_combined_collations.test)")([
    ("T", "", f"SELECT CAST(lower(translate('CAFÉ', {_ACCENTS})) = 'cafe' AS STRING)"),
    ("T", "", f"SELECT CAST(lower(translate('Ñandú', {_ACCENTS})) = lower(translate('ñANDU', {_ACCENTS})) AS STRING)"),
    ("TI", "rowsort", f"SELECT lower(translate(x, {_ACCENTS})) AS k, count(*) FROM (SELECT 'café' AS x UNION ALL SELECT 'CAFE' UNION ALL SELECT 'cafÉ' UNION ALL SELECT 'tea') t GROUP BY lower(translate(x, {_ACCENTS}))"),
])

corpus("collate_ilike_family", "ILIKE / case-insensitive LIKE rewrites (reference test/sql/collate + test/sql/function/string/test_ilike.test)")([
    ("I", "", "SELECT count(*) FROM nation WHERE lower(n_name) LIKE 'nation%'"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_name ILIKE 'NaTiOn%'"),
    ("I", "", "SELECT count(*) FROM region WHERE r_name ILIKE '%a%'"),
    ("T", "", "SELECT CAST('ABC' ILIKE 'abc' AS STRING)"),
    ("T", "", "SELECT CAST('ABC' NOT ILIKE 'ab_' AS STRING)"),
])

corpus("collate_in_where_between", "Collation-normalized IN / BETWEEN predicates (reference test/sql/collate/collate_between.test)")([
    ("I", "", "SELECT count(*) FROM region WHERE lower(r_name) IN ('asia', 'europe')"),
    ("T", "", "SELECT CAST(lower('M') BETWEEN 'a' AND 'z' AS STRING)"),
    ("T", "rowsort", "SELECT r_name FROM region WHERE lower(r_name) BETWEEN 'a' AND 'e'"),
])

corpus("collate_icu_locale_order", "True ICU locale collation in ORDER BY (reference extension/icu collations; Spark 4 COLLATE)")([
    # de folds umlauts next to their base letters; binary would put them past z
    ("T", "", "SELECT x FROM (SELECT 'äpfel' AS x UNION ALL SELECT 'apfel' UNION ALL SELECT 'banane' UNION ALL SELECT 'zebra') t ORDER BY x COLLATE de, x"),
    # sv keeps å/ö as distinct letters sorted AFTER z
    ("T", "", "SELECT x FROM (SELECT 'ångström' AS x UNION ALL SELECT 'apple' UNION ALL SELECT 'örn' UNION ALL SELECT 'zebra') t ORDER BY x COLLATE sv, x"),
    # fr accents break ties at secondary strength, base letters first
    ("T", "", "SELECT x FROM (SELECT 'cote' AS x UNION ALL SELECT 'coté' UNION ALL SELECT 'côte' UNION ALL SELECT 'côté') t ORDER BY x COLLATE fr, x"),
    # cs digraph: 'ch' is its own letter after h
    ("T", "", "SELECT x FROM (SELECT 'chata' AS x UNION ALL SELECT 'cukr' UNION ALL SELECT 'hrad' UNION ALL SELECT 'ihla') t ORDER BY x COLLATE cs, x"),
    # tr dotless ı sorts immediately before dotted i
    ("T", "", "SELECT x FROM (SELECT 'ırmak' AS x UNION ALL SELECT 'irmak' UNION ALL SELECT 'hamak' UNION ALL SELECT 'jeton') t ORDER BY x COLLATE tr, x"),
    # pl: ł is a distinct letter after l
    ("T", "", "SELECT x FROM (SELECT 'łódź' AS x UNION ALL SELECT 'lodz' UNION ALL SELECT 'mosty' UNION ALL SELECT 'kra') t ORDER BY x COLLATE pl, x"),
])

corpus("collate_icu_rank_values", "ICU locale collation observable in rank values (reference extension/icu)")([
    ("TI", "rowsort", "SELECT x, DENSE_RANK() OVER (ORDER BY x COLLATE de) FROM (SELECT 'äpfel' AS x UNION ALL SELECT 'apfel' UNION ALL SELECT 'zebra') t"),
    ("TI", "rowsort", "SELECT x, DENSE_RANK() OVER (ORDER BY x COLLATE sv) FROM (SELECT 'ångström' AS x UNION ALL SELECT 'apple' UNION ALL SELECT 'zebra') t"),
    ("TII", "rowsort", "SELECT x, DENSE_RANK() OVER (ORDER BY x COLLATE cs), DENSE_RANK() OVER (ORDER BY x) FROM (SELECT 'chata' AS x UNION ALL SELECT 'cukr' UNION ALL SELECT 'hrad' UNION ALL SELECT 'dub') t"),
    ("TI", "rowsort", "SELECT x, ROW_NUMBER() OVER (ORDER BY x COLLATE tr, x) FROM (SELECT 'ırmak' AS x UNION ALL SELECT 'irmak' UNION ALL SELECT 'hamak') t"),
])

corpus("collate_icu_window_extremes", "first/last under ICU locale window order (reference extension/icu + test/sql/window)")([
    ("T", "", "SELECT DISTINCT first_value(x) OVER (ORDER BY x COLLATE de, x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM (SELECT 'äpfel' AS x UNION ALL SELECT 'banane' UNION ALL SELECT 'apfel') t"),
    ("T", "", "SELECT DISTINCT last_value(x) OVER (ORDER BY x COLLATE sv, x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM (SELECT 'örn' AS x UNION ALL SELECT 'zebra' UNION ALL SELECT 'apple') t"),
    ("TT", "rowsort", "SELECT g, first_value(x) OVER (PARTITION BY g ORDER BY x COLLATE fr, x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM (SELECT 1 AS g, 'coté' AS x UNION ALL SELECT 1, 'cote' UNION ALL SELECT 2, 'côte' UNION ALL SELECT 2, 'côté') t"),
])

corpus("collate_minmax_distinct", "MIN/MAX/DISTINCT under normalized collation (reference test/sql/collate)")([
    ("T", "", "SELECT min(lower(r_name)) FROM region"),
    ("T", "", "SELECT max(lower(r_name)) FROM region"),
    ("I", "", "SELECT count(DISTINCT lower(substr(n_name, 1, 7))) FROM nation"),
    ("T", "", "SELECT CAST(min(lower(x)) = 'a' AS STRING) FROM (SELECT 'A' AS x UNION ALL SELECT 'b') t"),
])

corpus("collate_case_in_expressions", "Normalized collation inside CASE / concat chains (reference test/sql/collate)")([
    ("T", "", "SELECT CASE WHEN lower('X') = 'x' THEN 'ci' ELSE 'cs' END"),
    ("T", "", "SELECT concat(lower('AB'), upper('cd'))"),
    ("T", "", "SELECT CASE lower(r_name) WHEN 'europe' THEN 'eu' ELSE 'other' END FROM region ORDER BY r_regionkey"),
])

corpus("collate_order_stability", "Normalized ordering is total with explicit tiebreaks (reference test/sql/collate/order_collate.test)")([
    ("TT", "", "SELECT x, y FROM (SELECT 'a' AS x, '1' AS y UNION ALL SELECT 'A', '2' UNION ALL SELECT 'a', '0') t ORDER BY lower(x), y"),
    ("T", "", "SELECT upper(x) FROM (SELECT 'b' AS x UNION ALL SELECT 'a' UNION ALL SELECT 'C') t ORDER BY lower(x)"),
])

corpus("collate_unicode_safe", "Unicode-safe normalization ops shared by both engines (reference test/sql/collate)")([
    ("I", "", "SELECT length('héllo')"),
    # upper('straße') diverges: DuckDB -> 'STRASSE' (full case mapping),
    # Spark -> 'STRAßE' (simple mapping); stick to 1:1 case pairs
    ("T", "", "SELECT upper('héllo')"),
    ("T", "", "SELECT substr('héllo', 2, 3)"),
    ("T", "", "SELECT reverse('héllo')"),
    ("I", "", "SELECT length(concat('héllo', 'wörld'))"),
])



# --- subquery corners (reference test/sql/subquery: scalar/exists/any, ---
# --- lateral + correlated edge cases) ------------------------------------

corpus("subq_corr_exists_extra", "Correlated EXISTS with extra local predicates (reference test/sql/subquery/exists)")([
    ("T", "rowsort", "SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20)"),
    ("T", "rowsort", "SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND lower(n.n_name) LIKE 'nation_2%')"),
    ("I", "", "SELECT count(*) FROM nation n WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0)"),
])

corpus("subq_corr_not_exists", "Correlated NOT EXISTS / anti semantics (reference test/sql/subquery/exists/test_not_exists.test)")([
    ("T", "rowsort", "SELECT r_name FROM region r WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 98)"),
    ("I", "", "SELECT count(*) FROM nation n WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)"),
    ("I", "", "SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)"),
])

corpus("subq_corr_scalar_select", "Correlated scalar aggregate in the SELECT list (reference test/sql/subquery/scalar)")([
    ("TI", "", "SELECT r_name, (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) FROM region r ORDER BY r_regionkey"),
    ("II", "", "SELECT n_nationkey, (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) FROM nation n ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT r_regionkey, (SELECT max(n_nationkey) FROM nation n WHERE n.n_regionkey = r.r_regionkey) FROM region r ORDER BY r_regionkey"),
])

corpus("subq_corr_scalar_where", "Correlated scalar aggregate in WHERE (reference test/sql/subquery/scalar/test_correlated_aggregate_subquery.test)")([
    ("T", "rowsort", "SELECT r_name FROM region r WHERE (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) = 5"),
    ("I", "", "SELECT count(*) FROM orders o WHERE o_totalprice > (SELECT 50 * count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"),
    ("I", "rowsort", "SELECT n_nationkey FROM nation n WHERE (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) >= 10"),
])

corpus("subq_corr_in_having", "Scalar subquery threshold in HAVING (reference test/sql/subquery/scalar)")([
    ("TI", "rowsort", "SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus HAVING count(*) > (SELECT count(*) / 10 FROM orders)"),
    ("II", "rowsort", "SELECT c_nationkey, count(*) FROM customer GROUP BY c_nationkey HAVING count(*) >= (SELECT max(r_regionkey) + 8 FROM region)"),
])

corpus("subq_scalar_empty_null", "Scalar subquery over empty input yields NULL (reference test/sql/subquery/scalar/test_scalar_subquery.test)")([
    ("T", "", "SELECT CAST((SELECT max(n_nationkey) FROM nation WHERE n_nationkey > 900) AS STRING)"),
    ("T", "", "SELECT CAST((SELECT max(r_name) FROM region WHERE r_regionkey > 90) IS NULL AS STRING)"),
    ("I", "", "SELECT coalesce((SELECT max(n_nationkey) FROM nation WHERE n_nationkey > 900), -1)"),
    ("I", "", "SELECT (SELECT count(*) FROM nation WHERE n_nationkey > 900)"),
])

corpus("subq_in_nested", "Nested IN chains across three relations (reference test/sql/subquery/any)")([
    ("I", "", "SELECT count(*) FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%'))"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0))"),
])

corpus("subq_not_in_nonnull", "NOT IN over provably non-NULL sets (reference test/sql/subquery/any/test_any_all.test)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region)"),
    ("I", "", "SELECT count(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)"),
    ("T", "rowsort", "SELECT r_name FROM region WHERE r_regionkey NOT IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 3)"),
])

corpus("subq_in_case_expr", "Subqueries inside CASE branches (reference test/sql/subquery/scalar)")([
    ("T", "", "SELECT CASE WHEN (SELECT count(*) FROM region) = 5 THEN 'five' ELSE 'other' END"),
    ("T", "", "SELECT CASE WHEN EXISTS (SELECT 1 FROM nation WHERE n_nationkey = 999) THEN 'yes' ELSE 'no' END"),
    ("I", "", "SELECT CASE WHEN 3 IN (SELECT r_regionkey FROM region) THEN 1 ELSE 0 END"),
])

corpus("subq_corr_two_level", "Two-level nested correlation (reference test/sql/subquery/complex/test_nested_correlated.test)")([
    ("T", "rowsort", "SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey))"),
    ("I", "", "SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey))"),
])

corpus("subq_exists_uncorrelated", "Uncorrelated EXISTS short-circuits (reference test/sql/subquery/exists)")([
    ("I", "", "SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM nation)"),
    ("I", "", "SELECT count(*) FROM region WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey > 500)"),
    ("T", "", "SELECT CAST(EXISTS (SELECT 1 FROM orders WHERE o_orderkey < 0) AS STRING)"),
])

corpus("subq_scalar_arith", "Scalar subqueries inside arithmetic expressions (reference test/sql/subquery/scalar)")([
    ("I", "", "SELECT (SELECT count(*) FROM region) * 10 + (SELECT min(n_nationkey) FROM nation)"),
    ("I", "", "SELECT (SELECT max(n_nationkey) FROM nation) - (SELECT min(n_nationkey) FROM nation)"),
    ("R", "", "SELECT round(CAST((SELECT count(*) FROM nation) AS DOUBLE) / (SELECT count(*) FROM region), 3)"),
])

corpus("subq_in_select_list_bool", "IN / EXISTS as SELECT-list boolean expressions (reference test/sql/subquery/exists/test_exists_select_list.test)")([
    ("TT", "", "SELECT CAST(r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 5) AS STRING), r_name FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CAST(EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20) AS STRING) FROM region r ORDER BY r_regionkey"),
])

corpus("subq_from_derived_chain", "Derived-table chains with inner aggregates (reference test/sql/subquery/table)")([
    ("II", "", "SELECT k, n FROM (SELECT n_regionkey AS k, count(*) AS n FROM nation GROUP BY n_regionkey) t WHERE n >= 5 ORDER BY k"),
    ("I", "", "SELECT max(n) FROM (SELECT count(*) AS n FROM customer GROUP BY c_nationkey) t"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) t"),
    ("R", "", "SELECT round(avg(CAST(n AS DOUBLE)), 3) FROM (SELECT c_nationkey, count(*) AS n FROM customer GROUP BY c_nationkey) t"),
])

corpus("subq_corr_min_max_band", "Correlated min/max band predicates (reference test/sql/subquery/scalar/test_correlated_subquery.test)")([
    ("I", "", "SELECT count(*) FROM orders o WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"),
    ("I", "", "SELECT count(*) FROM lineitem l WHERE l.l_quantity = (SELECT min(l2.l_quantity) FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)"),
])

corpus("subq_union_inside", "Set operations inside subqueries (reference test/sql/subquery/table)")([
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey AS k FROM region UNION SELECT n_regionkey FROM nation) t"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%' UNION ALL SELECT 99)"),
    ("I", "", "SELECT count(*) FROM (SELECT n_regionkey FROM nation EXCEPT SELECT r_regionkey FROM region) t"),
])

corpus("subq_agg_of_subquery", "Aggregating over per-row scalar subquery results (reference test/sql/subquery/scalar)")([
    ("I", "", "SELECT sum(cnt) FROM (SELECT (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS cnt FROM region r) t"),
    ("I", "", "SELECT max(cnt) FROM (SELECT (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS cnt FROM nation n) t"),
])

corpus("subq_corr_multi_pred", "Correlation through multiple equality predicates (reference test/sql/subquery/complex)")([
    ("I", "", "SELECT count(*) FROM lineitem l WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey AND l2.l_linenumber <> l.l_linenumber AND l2.l_suppkey = l.l_suppkey)"),
    ("I", "", "SELECT count(*) FROM orders o WHERE EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = o.o_custkey AND o2.o_orderkey < o.o_orderkey)"),
])

corpus("subq_distinct_inside", "DISTINCT inside subqueries (reference test/sql/subquery/table)")([
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT n_regionkey FROM nation) t"),
    ("I", "", "SELECT count(*) FROM customer WHERE c_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)"),
])

corpus("subq_in_join_condition", "Subquery results joined as relations (reference test/sql/subquery/table)")([
    ("TI", "rowsort", "SELECT r.r_name, t.n FROM region r JOIN (SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey) t ON t.n_regionkey = r.r_regionkey"),
    ("I", "", "SELECT count(*) FROM orders o JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 45) t ON t.l_orderkey = o.o_orderkey"),
])

corpus("subq_corr_inequality", "Correlated subqueries with inequality correlation (reference test/sql/subquery/complex)")([
    ("I", "", "SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey > r.r_regionkey * 5 AND n.n_regionkey = r.r_regionkey)"),
    ("II", "", "SELECT r_regionkey, (SELECT count(*) FROM nation n WHERE n.n_nationkey >= r.r_regionkey * 4) FROM region r ORDER BY r_regionkey"),
])

corpus("subq_scalar_noagg_single", "Non-aggregate scalar subqueries guaranteed single-row (reference test/sql/subquery/scalar/test_single_join.test)")([
    ("T", "", "SELECT (SELECT r_name FROM region WHERE r_regionkey = 2)"),
    ("T", "", "SELECT CAST((SELECT n_nationkey FROM nation WHERE n_nationkey = 7) AS STRING)"),
    ("T", "", "SELECT CAST((SELECT r_name FROM region WHERE r_regionkey = 99) AS STRING)"),
])

corpus("subq_where_between_scalars", "BETWEEN bounds from scalar subqueries (reference test/sql/subquery/scalar)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey BETWEEN (SELECT min(r_regionkey) FROM region) AND (SELECT max(r_regionkey) * 3 FROM region)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_totalprice BETWEEN (SELECT min(o_totalprice) FROM orders) AND (SELECT avg(o_totalprice) FROM orders)"),
])

corpus("subq_group_on_subquery_key", "Grouping by a per-row subquery-derived key (reference test/sql/subquery)")([
    ("II", "rowsort", "SELECT cnt, count(*) FROM (SELECT (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS cnt FROM nation n) t GROUP BY cnt"),
])



# --- window frame boundary cases (reference test/sql/window: frames, ----
# --- rank family, value functions; EXCLUDE is absent from both dialects --
# --- so the adjacent shapes are encoded with explicit bounds) ------------

_ROWS_FRAMES = [
    ("ubp_cur", "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
    ("2p_cur", "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"),
    ("cur_ubf", "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"),
    ("1p_1f", "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
    # the EXCLUDE CURRENT ROW-adjacent shapes: frames that stop short of
    # or start past the current row
    ("ubp_1p", "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"),
    ("1f_ubf", "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"),
    ("3p_2p", "ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING"),
    ("1f_3f", "ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING"),
]

for _tag, _frame in _ROWS_FRAMES:
    _w = f"OVER (PARTITION BY n_regionkey ORDER BY n_nationkey {_frame})"
    _g = f"OVER (ORDER BY n_nationkey {_frame})"
    corpus(
        f"win_rows_{_tag}",
        f"{_frame} across aggregate/value functions (reference test/sql/window/test_window_rows.test)",
    )([
        ("II", "", f"SELECT n_nationkey, sum(n_nationkey) {_w} FROM nation ORDER BY n_nationkey"),
        ("II", "", f"SELECT n_nationkey, count(*) {_w} FROM nation ORDER BY n_nationkey"),
        ("II", "", f"SELECT n_nationkey, min(n_nationkey) {_w} FROM nation ORDER BY n_nationkey"),
        ("II", "", f"SELECT n_nationkey, max(n_nationkey) {_w} FROM nation ORDER BY n_nationkey"),
        ("II", "", f"SELECT n_nationkey, sum(n_regionkey) {_g} FROM nation ORDER BY n_nationkey LIMIT 8"),
        ("IT", "", f"SELECT n_nationkey, CAST(first_value(n_name) {_w} AS STRING) FROM nation ORDER BY n_nationkey"),
        ("IT", "", f"SELECT n_nationkey, CAST(last_value(n_name) {_w} AS STRING) FROM nation ORDER BY n_nationkey"),
    ])

_RANGE_FRAMES = [
    ("ubp_cur", "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
    ("2p_2f", "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING"),
    ("cur_ubf", "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"),
    ("5p_cur", "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW"),
    ("ubp_1p", "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"),
]

for _tag, _frame in _RANGE_FRAMES:
    # duplicate ORDER BY values: customers per nation key exercises the
    # peers-included semantics that distinguishes RANGE from ROWS
    _w = f"OVER (ORDER BY c_nationkey {_frame})"
    corpus(
        f"win_range_{_tag}",
        f"{_frame} with peer groups (reference test/sql/window/test_window_range.test)",
    )([
        ("II", "", f"SELECT c_custkey, count(*) {_w} FROM customer WHERE c_custkey < 40 ORDER BY c_custkey"),
        ("II", "", f"SELECT c_custkey, sum(c_nationkey) {_w} FROM customer WHERE c_custkey < 40 ORDER BY c_custkey"),
        ("II", "", f"SELECT c_custkey, max(c_nationkey) {_w} FROM customer WHERE c_custkey < 40 ORDER BY c_custkey"),
    ])

corpus("win_rank_family_full", "rank/dense_rank/percent_rank/cume_dist/row_number agreement (reference test/sql/window/test_rank.test)")([
    ("III", "", "SELECT n_nationkey, rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey), dense_rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT c_custkey, rank() OVER (ORDER BY c_nationkey) FROM customer WHERE c_custkey < 20 ORDER BY c_custkey"),
    ("II", "", "SELECT c_custkey, dense_rank() OVER (ORDER BY c_nationkey) FROM customer WHERE c_custkey < 20 ORDER BY c_custkey"),
    ("IR", "", "SELECT c_custkey, round(percent_rank() OVER (ORDER BY c_nationkey), 4) FROM customer WHERE c_custkey < 20 ORDER BY c_custkey"),
    ("IR", "", "SELECT c_custkey, round(cume_dist() OVER (ORDER BY c_nationkey), 4) FROM customer WHERE c_custkey < 20 ORDER BY c_custkey"),
    ("II", "", "SELECT n_nationkey, row_number() OVER (ORDER BY n_nationkey DESC) FROM nation ORDER BY n_nationkey"),
])

corpus("win_ntile_sizes", "NTILE bucket boundaries for several bucket counts (reference test/sql/window/test_ntile.test)")([
    ("II", "", "SELECT n_nationkey, ntile(2) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, ntile(3) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, ntile(7) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, ntile(25) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, ntile(2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
])

corpus("win_lead_lag_matrix", "lead/lag offsets, defaults, cross-partition NULLs (reference test/sql/window/test_lead_lag.test)")([
    ("IT", "", "SELECT n_nationkey, CAST(lag(n_name) OVER (ORDER BY n_nationkey) AS STRING) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("IT", "", "SELECT n_nationkey, CAST(lead(n_name) OVER (ORDER BY n_nationkey) AS STRING) FROM nation ORDER BY n_nationkey LIMIT 6"),
    ("II", "", "SELECT n_nationkey, lag(n_nationkey, 3, -1) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, lead(n_nationkey, 2, -1) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, lag(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, lead(n_nationkey, 1, 999) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
])

corpus("win_nth_value_frames", "nth_value under different frames (reference test/sql/window/test_nth_value.test)")([
    ("IT", "", "SELECT r_regionkey, CAST(nth_value(r_name, 2) OVER (ORDER BY r_regionkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) FROM region ORDER BY r_regionkey"),
    ("IT", "", "SELECT r_regionkey, CAST(nth_value(r_name, 2) OVER (ORDER BY r_regionkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS STRING) FROM region ORDER BY r_regionkey"),
    ("IT", "", "SELECT n_nationkey, CAST(nth_value(n_name, 3) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) FROM nation ORDER BY n_nationkey"),
])

corpus("win_desc_and_multi_order", "Descending + multi-key window ordering (reference test/sql/window)")([
    ("II", "", "SELECT n_nationkey, row_number() OVER (ORDER BY n_regionkey DESC, n_nationkey) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM nation ORDER BY n_nationkey"),
    ("II", "", "SELECT o_orderkey, rank() OVER (ORDER BY o_orderstatus, o_orderkey DESC) FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey"),
])

corpus("win_empty_over", "Empty OVER () — whole-input frames (reference test/sql/window/test_window_clause.test)")([
    ("II", "", "SELECT n_nationkey, count(*) OVER () FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT n_nationkey, sum(n_nationkey) OVER () FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("II", "", "SELECT r_regionkey, max(r_regionkey) OVER () FROM region ORDER BY r_regionkey"),
])

corpus("win_agg_with_filter_input", "Windows over pre-filtered/derived inputs (reference test/sql/window)")([
    ("II", "", "SELECT k, sum(n) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM (SELECT n_regionkey AS k, count(*) AS n FROM nation GROUP BY n_regionkey) t ORDER BY k"),
    ("II", "", "SELECT o_orderkey, count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey"),
])

corpus("win_running_min_max", "Running min/max crossover behavior (reference test/sql/window)")([
    ("III", "", "SELECT c_custkey, min(c_nationkey) OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), max(c_nationkey) OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM customer WHERE c_custkey < 25 ORDER BY c_custkey"),
    ("II", "", "SELECT c_custkey, min(c_nationkey) OVER (ORDER BY c_custkey ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) FROM customer WHERE c_custkey < 25 ORDER BY c_custkey"),
])

corpus("win_multiple_windows_one_select", "Several distinct window specs in one SELECT (reference test/sql/window/test_window_clause.test)")([
    ("IIII", "", "SELECT n_nationkey, row_number() OVER (ORDER BY n_nationkey), sum(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), count(*) OVER () FROM nation ORDER BY n_nationkey"),
    ("III", "", "SELECT n_nationkey, rank() OVER (ORDER BY n_regionkey, n_nationkey), ntile(3) OVER (ORDER BY n_nationkey) FROM nation ORDER BY n_nationkey"),
])



# --- datetime boundary + string depth + grouping topper ------------------

corpus("datetime_month_end_arith", "Month-end interval arithmetic clamps (reference test/sql/types/date/date_parts.test)")([
    ("T", "", "SELECT CAST(CAST(DATE '1996-01-31' + INTERVAL 1 MONTH AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1996-02-29' + INTERVAL 1 YEAR AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1995-12-31' + INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1996-03-31' - INTERVAL 1 MONTH AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1900-01-01' - INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1999-12-31' + INTERVAL 1 DAY AS DATE) AS STRING)"),
])

corpus("datetime_leap_years", "Leap-year semantics (reference test/sql/types/date)")([
    ("T", "", "SELECT CAST(EXTRACT(DAY FROM DATE '1996-02-29') AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1996-02-28' + INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '1900-02-28' + INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '2000-02-28' + INTERVAL 1 DAY AS DATE) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE EXTRACT(MONTH FROM o_orderdate) = 2 AND EXTRACT(DAY FROM o_orderdate) = 29"),
])

corpus("datetime_trunc_boundaries", "date_trunc at year/quarter/month/week boundaries (reference test/sql/function/timestamp/date_trunc.test)")([
    ("T", "", "SELECT CAST(CAST(date_trunc('year', DATE '1996-07-15') AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(date_trunc('quarter', DATE '1996-08-20') AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(date_trunc('month', DATE '1996-12-31') AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(date_trunc('week', DATE '1996-01-01') AS DATE) AS STRING)"),
    ("T", "rowsort", "SELECT DISTINCT CAST(CAST(date_trunc('year', o_orderdate) AS DATE) AS STRING) FROM orders"),
])

corpus("datetime_extract_fields", "EXTRACT field coverage (reference test/sql/types/date/date_parts.test)")([
    ("I", "", "SELECT EXTRACT(QUARTER FROM DATE '1996-08-20')"),
    ("I", "", "SELECT EXTRACT(DOY FROM DATE '1996-02-01')"),
    ("I", "", "SELECT EXTRACT(YEAR FROM DATE '1996-01-01') * 100 + EXTRACT(MONTH FROM DATE '1996-01-01')"),
    ("I", "", "SELECT EXTRACT(HOUR FROM TIMESTAMP '1996-01-01 13:45:30')"),
    ("I", "", "SELECT EXTRACT(MINUTE FROM TIMESTAMP '1996-01-01 13:45:30')"),
    ("I", "", "SELECT EXTRACT(SECOND FROM TIMESTAMP '1996-01-01 13:45:30')"),
])

corpus("datetime_compare_order", "Date comparison and ordering totality (reference test/sql/types/date)")([
    ("T", "", "SELECT CAST(DATE '1996-01-01' < DATE '1996-01-02' AS STRING)"),
    ("T", "", "SELECT CAST(DATE '1996-01-01' = CAST('1996-01-01' AS DATE) AS STRING)"),
    ("T", "", "SELECT CAST(min(o_orderdate) AS STRING) || '/' || CAST(max(o_orderdate) AS STRING) FROM orders"),
    ("I", "", "SELECT count(DISTINCT CAST(o_orderdate AS DATE)) FROM orders"),
])

corpus("string_split_part_family", "split/substring coordination (reference test/sql/function/string)")([
    ("T", "", "SELECT split_part('a,b,c', ',', 2)"),
    ("T", "", "SELECT split_part('one-two', '-', 1)"),
    ("T", "", "SELECT CAST(split_part('a,b', ',', 5) = '' AS STRING)"),
    ("T", "", "SELECT substr('abcdef', 3)"),
    ("T", "", "SELECT substr('abcdef', 1, 0) || '|'"),
    ("T", "", "SELECT left('abcdef', 2) || '/' || right('abcdef', 2)"),
])

corpus("string_pad_trim_matrix", "lpad/rpad/trim matrix incl. truncation (reference test/sql/function/string/test_pad.test)")([
    ("T", "", "SELECT lpad('abc', 6, '*')"),
    ("T", "", "SELECT rpad('abc', 6, 'xy')"),
    ("T", "", "SELECT lpad('abcdef', 3, '*')"),
    ("T", "", "SELECT rpad('', 3, 'z')"),
    ("T", "", "SELECT ltrim('  a  ') || '|' || rtrim('  a  ') || '|' || trim('  a  ')"),
    ("I", "", "SELECT length(lpad('x', 10, ' '))"),
])

corpus("string_regexp_matrix", "regexp_replace/extract families, dialect-common subset (reference test/sql/function/string/regex).  RLIKE is Spark-only (DuckDB: regexp_matches) and bare regexp_replace replaces FIRST match in DuckDB but ALL in Spark — encode matches via regexp_extract(s,p,0) <> '' and replace only single-occurrence patterns")([
    ("T", "", "SELECT regexp_replace('abc123xyz', '[0-9]+', '#')"),
    ("T", "", "SELECT regexp_extract('order-12345-x', '([0-9]+)', 1)"),
    ("T", "", "SELECT regexp_extract('a1b2c3', '[a-z][0-9]', 0)"),
    ("T", "", "SELECT CAST(regexp_extract('hello123', '[a-z]+[0-9]+', 0) <> '' AS STRING)"),
    ("T", "", "SELECT CAST(regexp_extract('HELLO', '^[a-z]+$', 0) <> '' AS STRING)"),
    ("I", "", "SELECT count(*) FROM nation WHERE regexp_extract(n_name, 'NATION_[0-9]$', 0) <> ''"),
    ("I", "", "SELECT count(*) FROM nation WHERE regexp_extract(n_name, 'NATION_1[0-9]', 0) <> ''"),
])

corpus("string_instr_position", "instr/position/strpos agreement (reference test/sql/function/string/test_position.test)")([
    ("I", "", "SELECT instr('abcabc', 'bc')"),
    ("I", "", "SELECT instr('abc', 'z')"),
    ("I", "", "SELECT position('b' IN 'abc')"),
    ("II", "", "SELECT instr(r_name, 'A'), r_regionkey FROM region ORDER BY r_regionkey"),
])

corpus("grouping_sets_rollup_matrix", "GROUPING SETS / ROLLUP / CUBE null-marker matrix (reference test/sql/aggregate/group/test_grouping_sets.test)")([
    ("TTI", "rowsort", "SELECT CAST(o_orderstatus AS STRING), CAST(o_orderpriority AS STRING), count(*) FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"),
    ("TI", "rowsort", "SELECT CAST(o_orderstatus AS STRING), count(*) FROM orders GROUP BY ROLLUP (o_orderstatus)"),
    ("TTI", "rowsort", "SELECT CAST(o_orderstatus AS STRING), CAST(l_returnflag AS STRING), count(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY CUBE (o_orderstatus, l_returnflag)"),
    ("III", "rowsort", "SELECT grouping(o_orderstatus), grouping(o_orderpriority), count(*) FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())"),
])

corpus("having_without_select_agg", "HAVING on aggregates absent from SELECT (reference test/sql/aggregate/having)")([
    ("T", "rowsort", "SELECT o_orderstatus FROM orders GROUP BY o_orderstatus HAVING count(*) > 5"),
    ("I", "rowsort", "SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING min(c_acctbal) < 0 AND max(c_acctbal) > 0"),
    ("I", "rowsort", "SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING sum(n_nationkey) > 50"),
])

corpus("limit_offset_matrix", "LIMIT/OFFSET combinations (reference test/sql/limit)")([
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3 OFFSET 4"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 100 OFFSET 20"),
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 7) t"),
    ("I", "", "SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC LIMIT 2 OFFSET 0"),
])

corpus("union_type_coercion", "Set-op type coercion across branches (reference test/sql/setops)")([
    ("T", "rowsort", "SELECT CAST(x AS STRING) FROM (SELECT 1 AS x UNION ALL SELECT CAST(2.5 AS DOUBLE)) t"),
    ("T", "rowsort", "SELECT CAST(x AS STRING) FROM (SELECT CAST(1 AS BIGINT) AS x UNION SELECT CAST(1 AS INT)) t"),
    ("I", "", "SELECT count(*) FROM (SELECT r_regionkey AS k FROM region INTERSECT SELECT n_regionkey FROM nation) t"),
])

corpus("case_sensitivity_identifiers", "Quoted/unquoted identifier case behavior common subset (reference test/sql/parser)")([
    ("I", "", "SELECT N_NATIONKEY FROM nation ORDER BY n_nationkey LIMIT 1"),
    ("I", "", "SELECT count(*) FROM NATION"),
    ("I", "", "SELECT t.k FROM (SELECT 5 AS k) t"),
])

corpus("boolean_expression_matrix", "Boolean algebra truth-table coverage (reference test/sql/types/boolean)")([
    ("T", "", "SELECT CAST(TRUE AND TRUE AS STRING) || '/' || CAST(TRUE AND FALSE AS STRING)"),
    ("T", "", "SELECT CAST(NOT TRUE AS STRING) || '/' || CAST(NOT FALSE AS STRING)"),
    ("T", "", "SELECT CAST((1 < 2) = (3 < 4) AS STRING)"),
    ("T", "", "SELECT CAST(TRUE OR CAST(NULL AS BOOLEAN) AS STRING)"),
    ("T", "", "SELECT CAST(FALSE AND CAST(NULL AS BOOLEAN) AS STRING)"),
    ("I", "", "SELECT count(*) FROM region WHERE (r_regionkey < 2) OR NOT (r_regionkey < 4)"),
])



corpus("cast_matrix_numeric", "Numeric cast matrix through STRING (reference test/sql/cast)")([
    ("T", "", "SELECT CAST(CAST(42 AS SMALLINT) AS STRING)"),
    ("T", "", "SELECT CAST(CAST(-128 AS TINYINT) AS STRING)"),
    ("T", "", "SELECT CAST(CAST('9223372036854775807' AS BIGINT) AS STRING)"),
    ("I", "", "SELECT CAST('123' AS INT) + CAST('7' AS BIGINT)"),
    ("R", "", "SELECT round(CAST('2.5e2' AS DOUBLE), 1)"),
    ("T", "", "SELECT CAST(CAST(1 AS BOOLEAN) AS STRING)"),
])

corpus("cast_string_whitespace", "String-to-number casts with signs (reference test/sql/cast/string_to_integer.test)")([
    ("I", "", "SELECT CAST('+5' AS INT)"),
    ("I", "", "SELECT CAST('-5' AS INT)"),
    ("I", "", "SELECT CAST('0' AS INT)"),
    ("T", "", "SELECT CAST(CAST('00042' AS INT) AS STRING)"),
])

corpus("distinct_on_analogs", "DISTINCT-ON semantics via row_number (reference test/sql/distinct/test_distinct_on.test)")([
    ("II", "rowsort", "SELECT c_nationkey, c_custkey FROM (SELECT c_nationkey, c_custkey, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn FROM customer) t WHERE rn = 1"),
    ("TI", "rowsort", "SELECT o_orderstatus, o_orderkey FROM (SELECT o_orderstatus, o_orderkey, row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn = 1"),
])

corpus("order_by_nulls_positioning", "NULL ordering with explicit NULLS FIRST/LAST (reference test/sql/order)")([
    ("T", "", "SELECT CAST(x AS STRING) FROM (SELECT CAST(NULL AS INT) AS x UNION ALL SELECT 2 UNION ALL SELECT 1) t ORDER BY x NULLS FIRST"),
    ("T", "", "SELECT CAST(x AS STRING) FROM (SELECT CAST(NULL AS INT) AS x UNION ALL SELECT 2 UNION ALL SELECT 1) t ORDER BY x NULLS LAST"),
    ("T", "", "SELECT CAST(x AS STRING) FROM (SELECT CAST(NULL AS INT) AS x UNION ALL SELECT 2 UNION ALL SELECT 1) t ORDER BY x DESC NULLS LAST"),
])

corpus("join_using_syntax", "JOIN USING and output column behavior (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM nation JOIN region USING (r_regionkey)".replace("USING (r_regionkey)", "ON n_regionkey = r_regionkey")),
    ("TI", "rowsort", "SELECT r_name, count(*) FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r_name"),
    ("I", "", "SELECT count(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL"),
])

corpus("values_inline_tables", "Inline VALUES relations (reference test/sql/table_function)")([
    ("II", "", "SELECT * FROM (VALUES (1, 10), (2, 20), (3, 30)) AS t(a, b) ORDER BY a"),
    ("I", "", "SELECT sum(a) FROM (VALUES (1), (2), (3)) AS t(a)"),
    ("TI", "rowsort", "SELECT * FROM (VALUES ('x', 1), ('y', 2)) AS t(s, n)"),
])



# --- SQLite legacy corpus analog (reference test/sqlite/select1.test_slow:
# expression-permutation SELECTs over a tiny two-column table).  The
# original generates hundreds of permutations of {f1, f2} expression
# lists / WHERE forms / ORDER BY directions; these files encode one
# representative slice per permutation axis over the same t1 shape.

_T1 = "(VALUES (11, 22), (33, 44), (55, 66), (77, 88), (99, 110)) AS t1(f1, f2)"

corpus("sqlite_select1_exprs", "select1.test expression-list permutations (reference test/sqlite/select1.test_slow)")([
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY f1"),
    ("II", "", f"SELECT f1, f2 FROM {_T1} ORDER BY f1"),
    ("I", "", f"SELECT f1 + f2 FROM {_T1} ORDER BY f1"),
    ("I", "", f"SELECT f1 - f2 FROM {_T1} ORDER BY f1"),
    ("I", "", f"SELECT f1 * 2 + f2 FROM {_T1} ORDER BY f1"),
    ("II", "", f"SELECT f1, f1 + f2 FROM {_T1} ORDER BY f1"),
    ("R", "", f"SELECT round(CAST(f1 AS DOUBLE) / f2, 4) FROM {_T1} ORDER BY f1"),
])

corpus("sqlite_select1_aggs", "select1.test aggregate permutations (reference test/sqlite/select1.test_slow)")([
    ("I", "", f"SELECT count(*) FROM {_T1}"),
    ("I", "", f"SELECT min(f1) FROM {_T1}"),
    ("I", "", f"SELECT max(f2) FROM {_T1}"),
    ("I", "", f"SELECT sum(f1) + sum(f2) FROM {_T1}"),
    ("R", "", f"SELECT round(avg(CAST(f1 AS DOUBLE)), 3) FROM {_T1}"),
    ("II", "", f"SELECT min(f1), max(f1) FROM {_T1}"),
    ("I", "", f"SELECT count(*) FROM {_T1} WHERE f1 > 33"),
    ("I", "", f"SELECT max(f1 + f2) FROM {_T1}"),
])

corpus("sqlite_select1_where", "select1.test WHERE-form permutations (reference test/sqlite/select1.test_slow)")([
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 = 33"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 <> 33 ORDER BY f1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 BETWEEN 33 AND 77 ORDER BY f1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 IN (11, 55, 99) ORDER BY f1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f2 > 50 AND f1 < 90 ORDER BY f1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 > 100 OR f2 > 100 ORDER BY f1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE NOT (f1 < 50) ORDER BY f1"),
])

corpus("sqlite_select1_order", "select1.test ORDER BY direction/expression permutations (reference test/sqlite/select1.test_slow)")([
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY f1 DESC"),
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY f2 DESC"),
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY f1 + f2"),
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY -f1"),
    ("II", "", f"SELECT f1, f2 FROM {_T1} ORDER BY f2 - f1, f1 DESC"),
    ("I", "", f"SELECT f1 FROM {_T1} ORDER BY CASE WHEN f1 = 55 THEN 0 ELSE 1 END, f1"),
])

corpus("sqlite_select1_compound", "select1.test compound-select permutations (reference test/sqlite/select1.test_slow + select4.test_slow)")([
    ("I", "", f"SELECT f1 FROM {_T1} UNION ALL SELECT f2 FROM {_T1} ORDER BY 1"),
    ("I", "", f"SELECT f1 FROM {_T1} UNION SELECT f1 FROM {_T1} ORDER BY 1"),
    ("I", "", f"SELECT f1 FROM {_T1} WHERE f1 < 50 INTERSECT SELECT f1 FROM {_T1} ORDER BY 1"),
    ("I", "", f"SELECT f1 FROM {_T1} EXCEPT SELECT f1 FROM {_T1} WHERE f1 > 50 ORDER BY 1"),
    ("I", "", f"SELECT max(x) FROM (SELECT f1 AS x FROM {_T1} UNION ALL SELECT f2 FROM {_T1}) u"),
])


# --- round-3 additions: conjunction / scalar-function breadth / common
# list surface (reference test/sql/conjunction, test/sql/function/string,
# test/sql/function/numeric, test/sql/function/date, test/sql/types/list).
# Every function below was probed SAME in both engines before inclusion;
# probe-found divergences documented here so they aren't re-attempted:
#   - LIKE 'a\_c' escape: Spark escapes by default, DuckDB needs ESCAPE.
#   - log(x): natural log in Spark, log10 in DuckDB → always log(base, x).
#   - cbrt(27): 3.0 Spark vs 3.0000000000000004 DuckDB.
#   - sign() returns DOUBLE in Spark, INT in DuckDB.
#   - dayofweek: Monday=1 DuckDB vs Sunday=1 Spark; monthname/dayname
#     full vs abbreviated names.
#   - date_trunc returns DATE in DuckDB, TIMESTAMP in Spark (known; CAST).
#   - typeof/hash: engine-specific by design.

corpus("conjunction_null_logic", "Three-valued AND/OR/NOT (reference test/sql/conjunction)")([
    ("TTTT", "", "SELECT CAST((NULL AND FALSE) AS STRING), CAST((NULL AND TRUE) AS STRING), CAST((NULL OR TRUE) AS STRING), CAST((NULL OR FALSE) AS STRING)"),
    ("T", "", "SELECT CAST((NOT (NULL AND FALSE)) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE (o_totalprice > 100000 OR o_orderstatus = 'F') AND NOT (o_orderkey < 0)"),
    ("I", "", "SELECT count(*) FROM orders WHERE NOT (o_totalprice <= 100000 AND o_orderstatus <> 'F')"),
    ("T", "", "SELECT CAST((1 IS DISTINCT FROM NULL) AS STRING) || '/' || CAST((NULL IS NOT DISTINCT FROM NULL) AS STRING)"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity IS NOT DISTINCT FROM 25"),
    # NULL comparison propagates through the conjunction, not short-circuits
    ("I", "", "SELECT count(*) FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_totalprice END AS p FROM orders) t WHERE p > 0 AND p < 1000000"),
])

corpus("string_pad_trim_pos", "Padding/trim/position functions (reference test/sql/function/string)")([
    ("T", "", "SELECT lpad(CAST(r_regionkey AS STRING), 4, '0') FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT rpad(substr(r_name, 1, 3), 6, '.') FROM region ORDER BY r_regionkey"),
    ("TTT", "", "SELECT ltrim('  pad  '), rtrim('  pad  '), trim('  pad  ')"),
    ("II", "", "SELECT instr('hello world', 'world'), instr('hello', 'zz')"),
    ("I", "", "SELECT position('or' IN 'hello world')"),
    ("TT", "", "SELECT left('spark engine', 5), right('spark engine', 6)"),
    ("TT", "", "SELECT substr('negative', -3), substr('bounded', 2, 3)"),
    ("T", "", "SELECT split_part(p_type || '-extra', '-', 2) FROM part WHERE p_partkey = 1"),
    ("T", "", "SELECT concat_ws('-', r_name, CAST(r_regionkey AS STRING)) FROM region ORDER BY r_regionkey"),
])

corpus("string_search_distance", "Search/distance/format functions (reference test/sql/function/string)")([
    ("T", "", "SELECT CAST(contains(n_name, '_1') AS STRING) FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("I", "", "SELECT levenshtein('kitten', 'sitting')"),
    ("I", "", "SELECT levenshtein(r_name, 'REGION_0') FROM region ORDER BY r_regionkey LIMIT 3"),
    ("T", "", "SELECT replace('banana', 'an', 'AN')"),
    ("T", "", "SELECT translate('abcabc', 'ac', 'xz')"),
    ("IT", "", "SELECT ascii('A'), chr(98)"),
    ("T", "", "SELECT md5('')"),
    ("T", "", "SELECT printf('%d/%s', r_regionkey, r_name) FROM region ORDER BY r_regionkey LIMIT 2"),
    ("TT", "", "SELECT repeat('ab', 3), repeat('x', 0)"),
    ("T", "", "SELECT regexp_extract('order-2024-997', '([0-9]{4})-([0-9]+)', 2)"),
])

corpus("math_trig_exact", "Trigonometry at exact points (reference test/sql/function/numeric)")([
    ("RRR", "", "SELECT sin(0), cos(0), tan(0)"),
    ("RR", "", "SELECT degrees(pi()), radians(180.0)"),
    ("R", "", "SELECT atan2(0, 1)"),
    ("RRR", "", "SELECT asin(1.0), acos(1.0), atan(0.0)"),
    ("R", "", "SELECT round(sin(pi() / 6), 6)"),
    ("T", "", "SELECT CAST(isnan(CAST('nan' AS DOUBLE)) AS STRING) || '/' || CAST(isnan(1.0) AS STRING)"),
])

corpus("math_log_power_bits", "Logarithms, powers, bit functions (reference test/sql/function/numeric + test/sql/types/bit)")([
    ("RRR", "", "SELECT log(2, 8), log2(32), log10(1000)"),
    ("R", "", "SELECT ln(exp(2))"),
    ("RR", "", "SELECT power(2, 10), pow(3, 4)"),
    ("I", "", "SELECT factorial(6)"),
    ("II", "", "SELECT mod(17, 5), 17 % 5"),
    ("III", "", "SELECT bit_count(0), bit_count(7), bit_count(255)"),
    ("TTT", "", "SELECT bin(10), hex(255), CAST(unhex('4f4b') AS STRING)"),
    ("II", "", "SELECT greatest(o_orderkey, 10), least(o_orderkey, 10) FROM orders WHERE o_orderkey = 7"),
])

corpus("date_parts_boundaries", "Date-part extraction at boundaries (reference test/sql/function/date)")([
    ("T", "", "SELECT CAST(last_day(DATE '2024-02-05') AS STRING)"),
    ("T", "", "SELECT CAST(last_day(DATE '2023-02-05') AS STRING)"),
    ("T", "", "SELECT CAST(make_date(2024, 2, 29) AS STRING)"),
    ("II", "", "SELECT quarter(DATE '2024-05-15'), quarter(DATE '2024-12-31')"),
    ("I", "", "SELECT weekofyear(DATE '2024-01-04')"),
    ("I", "", "SELECT CAST(date_part('quarter', DATE '2024-07-01') AS INT)"),
    ("T", "", "SELECT CAST(date_add(DATE '2024-01-31', 30) AS STRING)"),
    ("III", "", "SELECT year(DATE '2024-02-29'), month(DATE '2024-02-29'), day(DATE '2024-02-29')"),
    ("III", "", "SELECT hour(TIMESTAMP '2024-01-01 23:59:58'), minute(TIMESTAMP '2024-01-01 23:59:58'), second(TIMESTAMP '2024-01-01 23:59:58')"),
])

corpus("cond_try_cast_if", "Conditionals and safe casting (reference test/sql/cast + test/sql/function)")([
    ("TT", "", "SELECT CAST(try_cast('xyz' AS INT) AS STRING), CAST(try_cast('12' AS INT) AS STRING)"),
    ("T", "", "SELECT if(2 > 1, 'yes', 'no')"),
    ("TT", "", "SELECT CAST(nullif(5, 5) AS STRING), CAST(nullif(5, 4) AS STRING)"),
    ("I", "", "SELECT coalesce(NULL, NULL, r_regionkey) FROM region WHERE r_regionkey = 3"),
    ("T", "", "SELECT CASE r_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' ELSE 'many' END FROM region ORDER BY r_regionkey LIMIT 3"),
    ("TT", "", "SELECT CAST((2 IN (1, NULL, 3)) AS STRING), CAST((1 IN (1, NULL)) AS STRING)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderstatus IN ('O', 'F')"),
])

corpus("types_list_common", "Common list-function surface over split() arrays (reference test/sql/types/list)")([
    ("T", "", "SELECT CAST(array_contains(split('alpha,beta,gamma', ','), 'beta') AS STRING)"),
    ("T", "", "SELECT CAST(array_contains(split('alpha,beta', ','), 'delta') AS STRING)"),
    ("I", "", "SELECT CAST(array_position(split('a,b,c,d', ','), 'd') AS INT)"),
    ("I", "", "SELECT CAST(array_position(split('a,b', ','), 'z') AS INT)"),
    # concat_ws flattens arrays in Spark but stringifies them in DuckDB —
    # render list results through array equality instead
    ("T", "", "SELECT CAST(filter(split('1,22,3,44', ','), x -> length(x) = 1) = split('1,3', ',') AS STRING)"),
    ("T", "", "SELECT CAST(array_sort(split('pear,apple,fig', ',')) = split('apple,fig,pear', ',') AS STRING)"),
    ("T", "", "SELECT CAST(array_sort(filter(split(p_name, ' '), w -> length(w) > 3)) = filter(array_sort(split(p_name, ' ')), w -> length(w) > 3) AS STRING) FROM part WHERE p_partkey = 1"),
    ("T", "", "SELECT split_part('x:y:z', ':', 3)"),
])


corpus("topn_limit_ties", "Top-N with deterministic tie-breaks (reference test/sql/topn)")([
    ("I", "", "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"),
    ("I", "", "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 3 OFFSET 4"),
    ("I", "", "SELECT l_orderkey FROM lineitem ORDER BY l_quantity, l_orderkey, l_partkey LIMIT 4"),
    ("II", "", "SELECT n_nationkey, n_regionkey FROM nation ORDER BY n_regionkey DESC, n_nationkey LIMIT 6"),
    ("I", "", "SELECT x FROM (SELECT o_orderkey AS x FROM orders ORDER BY o_totalprice DESC LIMIT 10) t ORDER BY x LIMIT 3"),
    ("I", "", "SELECT count(*) FROM (SELECT o_orderkey FROM orders ORDER BY o_totalprice LIMIT 7) t"),
])

corpus("filter_predicate_shapes", "Composite filter predicates over scans (reference test/sql/filter)")([
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.02"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_returnflag IN ('A', 'R') AND l_quantity >= 30"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'"),
    ("I", "", "SELECT count(*) FROM part WHERE p_size * 2 > 40 AND p_retailprice < 1500"),
    ("I", "", "SELECT count(*) FROM customer WHERE c_acctbal > 0 AND NOT c_mktsegment = 'BUILDING'"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END > 25"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'"),
])

corpus("projection_alias_scope", "Alias visibility in ORDER BY / GROUP BY (reference test/sql/projection + binder)")([
    ("TI", "", "SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY st ORDER BY st"),
    ("TI", "", "SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"),
    ("II", "", "SELECT o_orderkey + 0 AS k, o_orderkey * 2 AS dbl FROM orders ORDER BY dbl DESC, k LIMIT 3"),
    ("I", "", "SELECT o_orderkey AS o FROM orders WHERE o_orderkey < 5 ORDER BY o DESC"),
    ("TI", "", "SELECT upper(r_name) AS nm, r_regionkey AS k FROM region ORDER BY 2 DESC LIMIT 2"),
    ("II", "rowsort", "SELECT l_linenumber AS ln, CAST(sum(l_quantity) AS BIGINT) AS q FROM lineitem GROUP BY ln"),
])

corpus("timestamp_arith_cast", "Timestamp arithmetic through explicit casts (reference test/sql/types/timestamp)")([
    ("T", "", "SELECT CAST(TIMESTAMP '2024-01-31 23:30:00' + INTERVAL 1 HOUR AS STRING)"),
    ("T", "", "SELECT CAST(TIMESTAMP '2024-03-01 00:00:00' - INTERVAL 1 DAY AS STRING)"),
    ("T", "", "SELECT CAST(CAST(DATE '2024-02-28' AS TIMESTAMP) + INTERVAL 24 HOUR AS STRING)"),
    ("T", "", "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 90 MINUTE AS STRING)"),
    ("I", "", "SELECT year(CAST(TIMESTAMP '2024-12-31 23:59:59' + INTERVAL 1 SECOND AS TIMESTAMP))"),
    ("T", "", "SELECT CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS STRING) FROM orders WHERE o_orderkey = 1"),
])

corpus("regex_extract_groups", "Regex extraction group permutations (reference test/sql/function/string/regex)")([
    ("T", "", "SELECT regexp_extract('abc-123-xyz', '([a-z]+)-([0-9]+)-([a-z]+)', 1)"),
    ("T", "", "SELECT regexp_extract('abc-123-xyz', '([a-z]+)-([0-9]+)-([a-z]+)', 2)"),
    ("T", "", "SELECT regexp_extract('abc-123-xyz', '([a-z]+)-([0-9]+)-([a-z]+)', 3)"),
    ("T", "", "SELECT regexp_extract('no digits here', '([0-9]+)', 1)"),
    ("T", "", "SELECT regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) FROM part WHERE p_partkey = 1"),
    # RLIKE is Spark-only; regexp_extract-based match is the common form
    ("I", "", "SELECT count(*) FROM nation WHERE regexp_extract(n_name, '(NATION_[0-9])$', 1) <> ''"),
])

corpus("grouping_id_functions", "GROUPING() marker under ROLLUP/CUBE (reference test/sql/aggregate/grouping_sets)")([
    ("TII", "rowsort", "SELECT coalesce(o_orderstatus, '<all>') AS st, CAST(grouping(o_orderstatus) AS INT) AS g, count(*) AS n FROM orders GROUP BY ROLLUP(o_orderstatus)"),
    ("TTI", "rowsort", "SELECT coalesce(l_returnflag, '?') AS rf, coalesce(l_linestatus, '?') AS ls, count(*) AS n FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
    ("TII", "rowsort", "SELECT coalesce(c_mktsegment, '<all>') AS seg, CAST(grouping(c_mktsegment) AS INT) AS g, count(*) AS n FROM customer GROUP BY GROUPING SETS ((c_mktsegment), ())"),
])

corpus("join_mixed_conditions", "Equi joins with residual predicates (reference test/sql/join)")([
    ("I", "", "SELECT count(*) FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey AND n.n_nationkey > r.r_regionkey"),
    ("I", "", "SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal"),
    ("I", "", "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate"),
    ("II", "rowsort", "SELECT n.n_nationkey, count(*) FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000 GROUP BY n.n_nationkey"),
    ("I", "", "SELECT count(*) FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey"),
])

corpus("distinct_forms", "DISTINCT variants (reference test/sql/select + aggregate/distinct)")([
    ("I", "", "SELECT count(DISTINCT o_custkey) FROM orders"),
    ("II", "rowsort", "SELECT DISTINCT n_regionkey, n_nationkey % 2 FROM nation"),
    ("I", "", "SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) t"),
    ("T", "rowsort", "SELECT DISTINCT upper(substr(c_mktsegment, 1, 2)) FROM customer"),
    ("I", "", "SELECT CAST(sum(DISTINCT l_linenumber) AS BIGINT) FROM lineitem"),
    ("II", "rowsort", "SELECT l_linenumber, count(DISTINCT l_returnflag) FROM lineitem GROUP BY l_linenumber"),
])


# NOTE: an unaliased `CAST(x AS STRING)` output is auto-named `x` in
# Spark but not DuckDB, so a trailing `ORDER BY x` binds to the STRING
# output in Spark and the numeric inner column in DuckDB — always alias
# the projection to a fresh name when ordering by the inner column.
corpus("order_nulls_placement", "Explicit NULLS FIRST/LAST ordering (reference test/sql/order)")([
    ("T", "", "SELECT CAST(x AS STRING) AS xs FROM (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS x FROM nation) t ORDER BY x NULLS FIRST"),
    ("T", "", "SELECT CAST(x AS STRING) AS xs FROM (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS x FROM nation) t ORDER BY x DESC NULLS LAST"),
    ("T", "", "SELECT CAST(x AS STRING) AS xs FROM (SELECT nullif(r_regionkey, 2) AS x FROM region) t ORDER BY x ASC NULLS LAST"),
    ("TT", "", "SELECT CAST(a AS STRING) AS a_s, CAST(b AS STRING) AS b_s FROM (SELECT nullif(n_nationkey % 2, 0) AS a, n_nationkey AS b FROM nation) t ORDER BY a NULLS FIRST, b DESC LIMIT 6"),
])

corpus("cast_string_numeric_edges", "String-to-numeric cast edges (reference test/sql/cast)")([
    ("I", "", "SELECT CAST('  42  ' AS INT)"),
    ("II", "", "SELECT CAST('-7' AS INT), CAST('+7' AS INT)"),
    # try_cast('4.9' AS INT) rounds to 5 in DuckDB but is NULL in Spark
    # (string→int parse rejects the fraction) — keep to DOUBLE here
    ("R", "", "SELECT try_cast('4.9' AS DOUBLE)"),
    ("T", "", "SELECT CAST(try_cast('' AS INT) AS STRING)"),
    ("T", "", "SELECT CAST(try_cast('12abc' AS INT) AS STRING)"),
    ("R", "", "SELECT CAST('2.5e2' AS DOUBLE)"),
    ("TT", "", "SELECT CAST(CAST('true' AS BOOLEAN) AS STRING), CAST(CAST('false' AS BOOLEAN) AS STRING)"),
    ("I", "", "SELECT CAST(CAST('1995-06-17' AS DATE) - DATE '1995-06-01' AS INT)"),
])

corpus("not_in_null_trap", "NOT IN vs NOT EXISTS under NULLs (reference test/sql/subquery + conjunction)")([
    ("I", "", "SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < -999999)"),
    ("I", "", "SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < -999999)"),
    # a NULL in the NOT IN list annihilates every row — the classic trap
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey NOT IN (SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"),
    ("I", "", "SELECT count(*) FROM nation n WHERE NOT EXISTS (SELECT 1 FROM region r WHERE nullif(r.r_regionkey, 0) = n.n_nationkey)"),
    ("T", "", "SELECT CAST(1 NOT IN (2, NULL) AS STRING)"),
    ("T", "", "SELECT CAST(1 NOT IN (1, NULL) AS STRING)"),
])

corpus("having_ungrouped", "HAVING without GROUP BY (reference test/sql/aggregate/having)")([
    ("I", "", "SELECT count(*) FROM orders HAVING count(*) > 0"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_totalprice < 0 HAVING count(*) = 0"),
    ("T", "", "SELECT CAST(max(o_totalprice) > min(o_totalprice) AS STRING) FROM orders HAVING count(*) > 1"),
    ("I", "", "SELECT CAST(sum(n_regionkey) AS BIGINT) FROM nation HAVING CAST(sum(n_regionkey) AS BIGINT) > 0"),
])

corpus("case_type_unification", "CASE branch type coercion (reference test/sql/cast + case)")([
    ("R", "", "SELECT CASE WHEN r_regionkey < 2 THEN r_regionkey ELSE 2.5 END FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CAST(CASE WHEN n_nationkey % 2 = 0 THEN NULL ELSE n_nationkey END AS STRING) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("R", "", "SELECT CASE r_regionkey WHEN 0 THEN 1 WHEN 1 THEN 1.5 ELSE 2 END FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CASE WHEN o_orderkey = 1 THEN 'one' END FROM orders WHERE o_orderkey <= 2 ORDER BY o_orderkey"),
])

corpus("window_ntile_lead_lag", "NTILE buckets and LEAD/LAG defaults (reference test/sql/window)")([
    ("II", "rowsort", "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) FROM nation"),
    ("II", "rowsort", "SELECT n_nationkey, ntile(3) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation"),
    ("IT", "rowsort", "SELECT n_nationkey, CAST(lead(n_nationkey) OVER (ORDER BY n_nationkey) AS STRING) FROM nation"),
    ("IT", "rowsort", "SELECT n_nationkey, CAST(lag(n_nationkey, 2) OVER (ORDER BY n_nationkey) AS STRING) FROM nation"),
    ("II", "rowsort", "SELECT n_nationkey, lag(n_nationkey, 1, -1) OVER (ORDER BY n_nationkey) FROM nation"),
    ("II", "rowsort", "SELECT n_nationkey, lead(n_nationkey, 3, 999) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) FROM nation"),
])

corpus("between_boundary_types", "BETWEEN bound inclusivity across types (reference test/sql/filter + types)")([
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 1"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-01'"),
    ("I", "", "SELECT count(*) FROM region WHERE r_name BETWEEN 'REGION_0' AND 'REGION_2'"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07"),
    ("T", "", "SELECT CAST(5 NOT BETWEEN 1 AND 4 AS STRING)"),
    ("T", "", "SELECT CAST(DATE '2024-06-15' BETWEEN DATE '2024-06-01' AND DATE '2024-06-30' AS STRING)"),
])

corpus("setop_branch_coercion", "Set-op branch unification over fixture scans (reference test/sql/setops + cast)")([
    ("T", "", "SELECT CAST(x AS STRING) FROM (SELECT r_regionkey AS x FROM region UNION ALL SELECT NULL) t ORDER BY x NULLS LAST"),
    ("I", "", "SELECT count(*) FROM (SELECT o_orderkey FROM orders UNION SELECT l_orderkey FROM lineitem) t"),
    ("R", "", "SELECT max(x) FROM (SELECT l_quantity AS x FROM lineitem UNION ALL SELECT CAST(l_linenumber AS DOUBLE) FROM lineitem) t"),
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey FROM nation INTERSECT SELECT r_regionkey FROM region) t"),
])


corpus("agg_stats_family", "Statistical aggregates (reference test/sql/aggregate/aggregates: corr/covar/stddev)")([
    ("R", "", "SELECT stddev_pop(l_quantity) FROM lineitem"),
    ("R", "", "SELECT stddev_samp(l_quantity) FROM lineitem"),
    ("R", "", "SELECT var_pop(l_discount) FROM lineitem"),
    ("R", "", "SELECT var_samp(l_discount) FROM lineitem"),
    ("R", "", "SELECT corr(l_quantity, l_extendedprice) FROM lineitem"),
    ("R", "", "SELECT covar_pop(l_quantity, l_extendedprice) FROM lineitem"),
    ("R", "", "SELECT covar_samp(l_quantity, l_discount) FROM lineitem"),
    ("TR", "rowsort", "SELECT l_returnflag, stddev_pop(l_quantity) FROM lineitem GROUP BY l_returnflag"),
])

corpus("like_escape_explicit", "LIKE with an explicit ESCAPE character (reference test/sql/function/string/test_like.test)")([
    ("T", "", "SELECT CAST('a_c' LIKE 'a!_c' ESCAPE '!' AS STRING)"),
    ("T", "", "SELECT CAST('abc' LIKE 'a!_c' ESCAPE '!' AS STRING)"),
    ("T", "", "SELECT CAST('50%' LIKE '50!%' ESCAPE '!' AS STRING)"),
    ("T", "", "SELECT CAST('50x' LIKE '50!%' ESCAPE '!' AS STRING)"),
    ("T", "", "SELECT CAST('a%b_c' LIKE 'a!%b!_c' ESCAPE '!' AS STRING)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_name LIKE 'NATION!_1%' ESCAPE '!'"),
])

corpus("cte_chained_refs", "CTE chains referencing earlier CTEs (reference test/sql/cte)")([
    ("I", "", "WITH a AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10), b AS (SELECT k + 100 AS k FROM a), c AS (SELECT k FROM b WHERE k % 2 = 0) SELECT CAST(sum(k) AS BIGINT) FROM c"),
    ("I", "", "WITH a AS (SELECT count(*) AS n FROM region), b AS (SELECT n * 2 AS n2 FROM a) SELECT n + n2 FROM a, b"),
    ("II", "rowsort", "WITH sizes AS (SELECT p_size, count(*) AS n FROM part GROUP BY p_size) SELECT p_size, n FROM sizes WHERE n > (SELECT avg(n) FROM sizes)"),
    ("I", "", "WITH t AS (SELECT 1 AS x) SELECT (SELECT x FROM t) + (SELECT max(x) FROM t)"),
])

corpus("full_outer_shapes", "FULL OUTER JOIN result shapes (reference test/sql/join/full_outer)")([
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5) a FULL OUTER JOIN (SELECT r_regionkey + 3 AS k FROM region) b ON a.k = b.k"),
    ("TT", "rowsort", "SELECT CAST(a.k AS STRING), CAST(b.k AS STRING) FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 4) a FULL OUTER JOIN (SELECT r_regionkey + 2 AS k FROM region) b ON a.k = b.k"),
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5) a FULL OUTER JOIN (SELECT r_regionkey + 3 AS k FROM region) b ON a.k = b.k WHERE a.k IS NULL"),
    ("I", "", "SELECT count(*) FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5) a FULL OUTER JOIN (SELECT r_regionkey + 3 AS k FROM region) b ON a.k = b.k WHERE b.k IS NULL"),
    ("T", "", "SELECT CAST(coalesce(a.k, b.k) AS STRING) AS k FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3) a FULL OUTER JOIN (SELECT r_regionkey + 1 AS k FROM region WHERE r_regionkey < 3) b ON a.k = b.k ORDER BY coalesce(a.k, b.k)"),
])

# --- select2/select3-corpus analogs (reference test/sqlite/select2.test_slow,
# select3.test_slow): expression-list permutations over a 5-int-column
# relation with scattered NULLs.  The fixture is generated here (30 rows,
# values 101..250, NULLs on a deterministic stride), not lifted from the
# reference files; the *query shapes* are the public sqlite corpus
# families: weighted sums, CASE chains, abs deltas, scalar-avg
# comparisons, correlated counts, EXISTS guards.

def _t2_values() -> str:
    rows = []
    v = 101
    for i in range(30):
        vals = []
        for j in range(5):
            if (i * 5 + j) % 7 == 3:  # deterministic NULL stride
                vals.append("CAST(NULL AS INT)")
            else:
                vals.append(str(v))
            v += 1
        rows.append("(" + ", ".join(vals) + ")")
    return "(VALUES " + ", ".join(rows) + ") AS t2(a, b, c, d, e)"


_T2 = _t2_values()
_CASE_BAND = (
    "CASE WHEN a < b - 3 THEN 111 WHEN a <= b THEN 222 "
    "WHEN a < b + 3 THEN 333 ELSE 444 END"
)
_CASE_SIMPLE = "CASE a + 1 WHEN b THEN 111 WHEN c THEN 222 ELSE 333 END"

corpus("sqlite_select2_exprs", "select2-corpus expression permutations (reference test/sqlite/select2.test_slow)")([
    ("T", "rowsort", f"SELECT CAST(a + b * 2 + c * 3 + d * 4 + e * 5 AS STRING) FROM {_T2}"),
    ("TT", "rowsort", f"SELECT CAST(a + b * 2 AS STRING), CAST(abs(b - c) AS STRING) FROM {_T2}"),
    ("T", "rowsort", f"SELECT CAST({_CASE_BAND} AS STRING) FROM {_T2}"),
    ("T", "rowsort", f"SELECT CAST({_CASE_SIMPLE} AS STRING) FROM {_T2}"),
    ("TR", "rowsort", f"SELECT CAST(e AS STRING), (a + b + c + d + e) / 5 FROM {_T2}"),
    ("T", "rowsort", f"SELECT CAST(CASE WHEN c > (SELECT avg(c) FROM {_T2.replace('t2(', 'x2(')}) THEN a * 2 ELSE b * 10 END AS STRING) FROM {_T2}"),
])

corpus("sqlite_select2_where", "select2-corpus WHERE permutations (reference test/sqlite/select2.test_slow)")([
    ("T", "rowsort", f"SELECT CAST(a + b * 2 AS STRING) FROM {_T2} WHERE d > e"),
    ("T", "rowsort", f"SELECT CAST(abs(b - c) AS STRING) FROM {_T2} WHERE (e > c OR e < d)"),
    ("T", "rowsort", f"SELECT CAST(a AS STRING) FROM {_T2} WHERE b IS NULL OR c IS NULL"),
    ("T", "rowsort", f"SELECT CAST(a + b * 2 AS STRING) FROM {_T2} WHERE a BETWEEN 110 AND 200 AND d IS NOT NULL"),
    ("T", "rowsort", f"SELECT CAST({_CASE_BAND} AS STRING) FROM {_T2} WHERE d > e AND (e > c OR e < d)"),
    ("I", "", f"SELECT count(*) FROM {_T2} WHERE a IS NULL OR b IS NULL OR c IS NULL OR d IS NULL OR e IS NULL"),
])

corpus("sqlite_select3_subqueries", "select3-corpus correlated/scalar subquery permutations (reference test/sqlite/select3.test_slow)")([
    ("TT", "rowsort", f"SELECT CAST((SELECT count(*) FROM {_T2.replace('t2(', 'x2(')} WHERE x2.c > t2.c AND x2.d < t2.d) AS STRING), CAST(t2.a AS STRING) FROM {_T2}"),
    ("T", "rowsort", f"SELECT CAST(a + b * 2 AS STRING) FROM {_T2} WHERE EXISTS (SELECT 1 FROM {_T2.replace('t2(', 'x2(')} WHERE x2.b < t2.b)"),
    ("T", "rowsort", f"SELECT CAST({_CASE_BAND} AS STRING) FROM {_T2} WHERE d > e AND EXISTS (SELECT 1 FROM {_T2.replace('t2(', 'x2(')} WHERE x2.b < t2.b)"),
    ("I", "", f"SELECT count(*) FROM {_T2} WHERE c > (SELECT avg(c) FROM {_T2.replace('t2(', 'x2(')})"),
])

corpus("sqlite_select3_groupby", "select3-corpus GROUP BY matrix (reference test/sqlite/select3.test_slow)")([
    ("TI", "rowsort", f"SELECT CAST(a % 5 AS STRING), count(*) FROM {_T2} GROUP BY a % 5"),
    ("TT", "rowsort", f"SELECT CAST(b % 3 AS STRING), CAST(CAST(sum(c) AS BIGINT) AS STRING) FROM {_T2} GROUP BY b % 3"),
    ("TI", "rowsort", f"SELECT CAST(d % 2 AS STRING), count(e) FROM {_T2} GROUP BY d % 2"),
    ("TR", "rowsort", f"SELECT CAST(a % 4 AS STRING), avg(b) FROM {_T2} WHERE b IS NOT NULL GROUP BY a % 4"),
    ("TI", "rowsort", f"SELECT CAST(c % 3 AS STRING), count(*) FROM {_T2} GROUP BY c % 3 HAVING count(*) > 2"),
])


corpus("agg_selector_family", "min_by/max_by/any_value/count_if/mode (reference test/sql/aggregate/aggregates)")([
    ("TT", "", "SELECT min_by(n_name, n_nationkey), max_by(n_name, n_nationkey) FROM nation"),
    ("TT", "", "SELECT min_by(r_name, r_regionkey), max_by(r_name, r_regionkey) FROM region"),
    ("T", "", "SELECT any_value(x) FROM (SELECT 42 AS x) t"),
    ("I", "", "SELECT CAST(count_if(l_quantity > 25) AS BIGINT) FROM lineitem"),
    ("TT", "", "SELECT CAST(bool_and(o_totalprice > 0) AS STRING), CAST(bool_or(o_totalprice > 500000) AS STRING) FROM orders"),
    ("R", "", "SELECT median(p_size) FROM part"),
    ("T", "", "SELECT CAST(mode(x) AS STRING) FROM (SELECT 7 AS x UNION ALL SELECT 7 UNION ALL SELECT 3) t"),
    ("III", "", "SELECT bit_and(n_nationkey), bit_or(n_nationkey), bit_xor(n_nationkey) FROM nation WHERE n_nationkey < 8"),
    # tiny cardinalities where both HLL sketches are exact
    ("I", "", "SELECT CAST(approx_count_distinct(n_regionkey) AS BIGINT) FROM nation"),
])

corpus("binary_base64_ops", "Binary casts, hex and base64 round-trips (reference test/sql/types/blob)")([
    ("I", "", "SELECT octet_length(CAST('spark' AS BINARY))"),
    ("T", "", "SELECT base64(unhex('4142'))"),
    ("T", "", "SELECT CAST(unhex(hex('OK')) AS STRING)"),
    ("T", "", "SELECT hex(CAST('Az' AS BINARY))"),
    ("I", "", "SELECT octet_length(unhex('DEADBEEF'))"),
    ("T", "", "SELECT base64(CAST('roundtrip' AS BINARY))"),
])


# Per-locale collation file family (reference test/sql/collate has one
# file per collation concern; these cover the probe-verified locale set,
# one file per locale, same spec shapes so a divergence isolates to the
# locale).  Strings exercise that locale's signature letters.
_LOCALE_STRINGS = {
    "de": ["äpfel", "apfel", "Ärger", "arg", "öl", "ohr", "über", "ufer", "zebra"],
    "sv": ["ångström", "apple", "örn", "oxe", "ärta", "zebra", "Åka", "aska"],
    "fr": ["cote", "coté", "côte", "côté", "élan", "elan", "zèbre", "zebre"],
    "cs": ["chata", "cukr", "hrad", "ihla", "dub", "čaj", "car", "zima"],
    "tr": ["ırmak", "irmak", "hamak", "jeton", "iğne", "izmir", "zeytin"],
    "pl": ["łódka", "lodka", "mewa", "kra", "żaba", "zebra", "środa", "sok"],
}
for _loc, _strs in _LOCALE_STRINGS.items():
    _vals = " UNION ALL SELECT ".join(f"'{s}'" for s in _strs)
    _rel = f"(SELECT {_vals}) t(x)"
    corpus(f"collate_icu_{_loc}", f"ICU {_loc} collation: order, ranks, extremes (reference extension/icu + test/sql/collate)")([
        ("T", "", f"SELECT x FROM {_rel} ORDER BY x COLLATE {_loc}, x"),
        ("TI", "rowsort", f"SELECT x, DENSE_RANK() OVER (ORDER BY x COLLATE {_loc}) FROM {_rel}"),
        ("T", "", f"SELECT DISTINCT first_value(x) OVER (ORDER BY x COLLATE {_loc}, x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM {_rel}"),
        ("T", "", f"SELECT DISTINCT last_value(x) OVER (ORDER BY x COLLATE {_loc}, x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM {_rel}"),
        ("TII", "rowsort", f"SELECT x, ROW_NUMBER() OVER (ORDER BY x COLLATE {_loc}, x), ROW_NUMBER() OVER (ORDER BY x) FROM {_rel}"),
    ])

# Join-type matrix family: one file per join form over the same two
# derived relations (reference test/sql/join has per-type files).
_JA = "(SELECT n_nationkey AS k, n_regionkey AS g FROM nation WHERE n_nationkey < 12) a"
_JB = "(SELECT r_regionkey + 2 AS k, r_name AS nm FROM region) b"
_JOIN_FORMS = {
    "inner": f"SELECT a.k, b.k FROM {_JA} JOIN {_JB} ON a.k = b.k",
    "left": f"SELECT a.k, CAST(b.k AS STRING) FROM {_JA} LEFT JOIN {_JB} ON a.k = b.k",
    "right": f"SELECT CAST(a.k AS STRING), b.k FROM {_JA} RIGHT JOIN {_JB} ON a.k = b.k",
    "full": f"SELECT CAST(a.k AS STRING), CAST(b.k AS STRING) FROM {_JA} FULL OUTER JOIN {_JB} ON a.k = b.k",
    "semi": f"SELECT a.k FROM {_JA} WHERE EXISTS (SELECT 1 FROM {_JB} WHERE b.k = a.k)",
    "anti": f"SELECT a.k FROM {_JA} WHERE NOT EXISTS (SELECT 1 FROM {_JB} WHERE b.k = a.k)",
}
for _form, _base in _JOIN_FORMS.items():
    _types = {"inner": "II", "left": "IT", "right": "TI", "full": "TT",
              "semi": "I", "anti": "I"}[_form]
    _extra = []
    if _form in ("semi", "anti"):
        _extra = [
            ("I", "", f"SELECT count(*) FROM ({_base}) q"),
            ("I", "", _base.replace("WHERE EXISTS", "WHERE a.g = 1 AND EXISTS")
                           .replace("WHERE NOT EXISTS", "WHERE a.g = 1 AND NOT EXISTS")
                      + " ORDER BY 1"),
        ]
    else:
        _extra = [
            ("I", "", f"SELECT count(*) FROM ({_base}) q(x, y)"),
            ("I", "", f"SELECT count(*) FROM ({_base}) q(x, y) WHERE x IS NULL OR y IS NULL")
            if _form == "full"
            else (_types, "rowsort", _base + " WHERE a.g = 1"),
        ]
    corpus(f"join_matrix_{_form}", f"Join-type matrix: {_form} (reference test/sql/join)")([
        (_types, "rowsort", _base),
        *_extra,
    ])


# Per-aggregate file family (reference test/sql/aggregate/aggregates has
# one file per aggregate: test_sum.test, test_avg.test, ...).  Same five
# shapes per file — plain, grouped, filtered, DISTINCT, empty-input —
# so a divergence isolates to the aggregate.
_AGG_FAMILY = {
    "sum": ("CAST(sum(l_quantity) AS BIGINT)", "I"),
    "avg": ("round(avg(l_quantity), 6)", "R"),
    "min": ("CAST(min(l_quantity) AS BIGINT)", "I"),
    "max": ("CAST(max(l_quantity) AS BIGINT)", "I"),
    "count": ("count(l_quantity)", "I"),
}
for _name, (_expr, _ty) in _AGG_FAMILY.items():
    _d_expr = {
        "sum": "CAST(sum(DISTINCT l_linenumber) AS BIGINT)",
        "avg": "round(avg(DISTINCT l_linenumber), 6)",
        "min": "min(DISTINCT l_linenumber)",
        "max": "max(DISTINCT l_linenumber)",
        "count": "count(DISTINCT l_linenumber)",
    }[_name]
    _d_ty = "R" if _name == "avg" else "I"
    corpus(f"agg_file_{_name}", f"Aggregate file: {_name} (reference test/sql/aggregate/aggregates/test_{_name}.test)")([
        (_ty, "", f"SELECT {_expr} FROM lineitem"),
        ("T" + _ty, "rowsort", f"SELECT l_returnflag, {_expr} FROM lineitem GROUP BY l_returnflag"),
        (_ty, "", f"SELECT {_expr} FROM lineitem WHERE l_quantity > 25"),
        (_d_ty, "", f"SELECT {_d_expr} FROM lineitem"),
        ("T", "", f"SELECT CAST({_expr} AS STRING) FROM lineitem WHERE l_quantity < 0"),
    ])

# Per-date-part file family (reference test/sql/function/date has one
# file per extraction function).
_DATE_PARTS = {
    "year": ("year(o_orderdate)", "year(DATE '2000-02-29')"),
    "month": ("month(o_orderdate)", "month(DATE '1999-12-31')"),
    "day": ("day(o_orderdate)", "day(DATE '2000-02-29')"),
    "quarter": ("quarter(o_orderdate)", "quarter(DATE '1999-10-01')"),
    "weekofyear": ("weekofyear(o_orderdate)", "weekofyear(DATE '2000-01-02')"),
    "dayofyear": ("dayofyear(o_orderdate)", "dayofyear(DATE '2000-03-01')"),
}
for _name, (_col_expr, _lit_expr) in _DATE_PARTS.items():
    corpus(f"date_file_{_name}", f"Date-part file: {_name} (reference test/sql/function/date)")([
        ("I", "", f"SELECT {_lit_expr}"),
        ("II", "rowsort", f"SELECT {_col_expr} AS p, count(*) FROM orders GROUP BY {_col_expr}"),
        ("I", "", f"SELECT CAST(min({_col_expr}) AS INT) FROM orders"),
        ("I", "", f"SELECT CAST(max({_col_expr}) AS INT) FROM orders"),
        ("I", "", f"SELECT count(DISTINCT {_col_expr}) FROM orders"),
    ])


# Per-window-function file family (reference test/sql/window has one
# file per function: test_row_number.test, test_lag.test, ...).  Same
# four shapes per file: global order, partitioned, filtered input,
# windowed-vs-grouped cross-check.
_WIN_FNS = {
    "row_number": "row_number()",
    "rank": "rank()",
    "dense_rank": "dense_rank()",
    "ntile": "ntile(3)",
    "lag": "lag(n_nationkey, 1, -1)",
    "lead": "lead(n_nationkey, 1, -1)",
    "first_value": "first_value(n_nationkey)",
    "last_value": "last_value(n_nationkey)",
}
for _name, _call in _WIN_FNS.items():
    _frame = (
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
        if _name in ("first_value", "last_value")
        else ""
    )
    corpus(f"window_file_{_name}", f"Window-function file: {_name} (reference test/sql/window/test_{_name}.test)")([
        ("II", "rowsort", f"SELECT n_nationkey, {_call} OVER (ORDER BY n_nationkey{_frame}) FROM nation"),
        ("II", "rowsort", f"SELECT n_nationkey, {_call} OVER (PARTITION BY n_regionkey ORDER BY n_nationkey{_frame}) FROM nation"),
        ("II", "rowsort", f"SELECT n_nationkey, {_call} OVER (ORDER BY n_nationkey DESC{_frame}) FROM nation WHERE n_nationkey % 2 = 0"),
        ("I", "", f"SELECT count(DISTINCT x) FROM (SELECT {_call} OVER (PARTITION BY n_regionkey ORDER BY n_nationkey{_frame}) AS x FROM nation) t"),
    ])


# Per-string-function file family (reference test/sql/function/string
# has one file per function).  Four shapes: literal, column, nested,
# edge (empty/boundary input).
_STR_FNS = {
    "upper": ("upper('mIxEd')", "upper(r_name)", "upper(substr(r_name, 2, 3))", "upper('')"),
    "lower": ("lower('MiXeD')", "lower(r_name)", "lower(concat(r_name, 'X'))", "lower('')"),
    "substr": ("substr('abcdef', 3, 2)", "substr(r_name, 1, 4)", "substr(substr(r_name, 2), 2, 2)", "substr('ab', 5)"),
    "replace": ("replace('aaa', 'a', 'bb')", "replace(r_name, '_', '-')", "replace(replace(r_name, '_', '.'), '.', '!')", "replace('', 'a', 'b')"),
    "trim": ("trim('  pad  ')", "trim(concat('  ', r_name, ' '))", "ltrim(rtrim('  x  '))", "trim('')"),
    "reverse": ("reverse('abc')", "reverse(r_name)", "reverse(reverse(r_name))", "reverse('')"),
    "concat": ("concat('a', 'b', 'c')", "concat(r_name, '-', CAST(r_regionkey AS STRING))", "concat(substr(r_name, 1, 2), reverse(substr(r_name, 1, 2)))", "concat('', '')"),
    "length_fn": ("length('abcde')", "length(r_name)", "length(concat(r_name, r_name))", "length('')"),
}
for _name, (_lit, _col, _nested, _edge) in _STR_FNS.items():
    _ty = "I" if _name == "length_fn" else "T"
    corpus(f"string_file_{_name}", f"String-function file: {_name} (reference test/sql/function/string)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "", f"SELECT {_col} FROM region ORDER BY r_regionkey"),
        (_ty, "", f"SELECT {_nested} FROM region ORDER BY r_regionkey"),
        (_ty if _name != "substr" else "T", "", f"SELECT {_edge}"),
    ])


# Per-math-function file family (reference test/sql/function/numeric).
_MATH_FNS = {
    "abs": ("abs(-7)", "CAST(abs(p_size - 30) AS BIGINT)", "I"),
    "ceil": ("CAST(ceil(1.2) AS BIGINT)", "CAST(ceil(p_retailprice / 100) AS BIGINT)", "I"),
    "floor": ("CAST(floor(1.8) AS BIGINT)", "CAST(floor(p_retailprice / 100) AS BIGINT)", "I"),
    "round": ("round(2.345, 2)", "round(p_retailprice / 7, 2)", "R"),
    "sqrt": ("sqrt(144)", "round(sqrt(p_size), 6)", "R"),
    "mod": ("mod(17, 5)", "CAST(mod(p_partkey, 7) AS BIGINT)", "I"),
    "power": ("power(2, 8)", "round(power(p_size, 0.5), 6)", "R"),
}
for _name, (_lit, _col, _ty) in _MATH_FNS.items():
    corpus(f"math_file_{_name}", f"Math-function file: {_name} (reference test/sql/function/numeric)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "", f"SELECT {_col} FROM part ORDER BY p_partkey LIMIT 6"),
        (_ty, "", f"SELECT {_col} AS v FROM part ORDER BY p_partkey DESC LIMIT 3"),
        ("I", "", f"SELECT count(DISTINCT {_col}) FROM part"),
    ])

# Per-set-op file family (reference test/sql/setops).
_SETOPS = {
    "union": "UNION",
    "union_all": "UNION ALL",
    "intersect": "INTERSECT",
    "except": "EXCEPT",
}
for _name, _op in _SETOPS.items():
    corpus(f"setop_file_{_name}", f"Set-op file: {_name} (reference test/sql/setops)")([
        ("I", "", f"SELECT x FROM (SELECT n_nationkey AS x FROM nation WHERE n_nationkey < 8 {_op} SELECT r_regionkey FROM region) t ORDER BY x"),
        ("I", "", f"SELECT count(*) FROM (SELECT n_regionkey AS x FROM nation {_op} SELECT r_regionkey FROM region) t"),
        ("I", "", f"SELECT x FROM (SELECT o_orderkey AS x FROM orders WHERE o_orderkey < 6 {_op} SELECT l_orderkey FROM lineitem WHERE l_orderkey < 4) t ORDER BY x"),
        ("T", "", f"SELECT CAST(max(x) AS STRING) FROM (SELECT upper(r_name) AS x FROM region {_op} SELECT upper(c_mktsegment) FROM customer) t"),
    ])


# Per-source-type cast file family (reference test/sql/cast has one
# file per type pair; double→int deliberately goes through floor() —
# DuckDB rounds, Spark truncates).
_CAST_FILES = {
    "tinyint": [
        ("I", "SELECT CAST(CAST(100 AS TINYINT) AS SMALLINT)"),
        ("I", "SELECT CAST(CAST(-128 AS TINYINT) AS INT)"),
        ("I", "SELECT CAST(CAST(127 AS TINYINT) AS BIGINT)"),
        ("T", "SELECT CAST(CAST(42 AS TINYINT) AS STRING)"),
        ("R", "SELECT CAST(CAST(7 AS TINYINT) AS DOUBLE)"),
    ],
    "bigint": [
        ("I", "SELECT CAST(CAST(9223372036854775807 AS BIGINT) AS BIGINT)"),
        ("I", "SELECT CAST(CAST(100 AS BIGINT) AS TINYINT)"),
        ("T", "SELECT CAST(CAST(-9223372036854775808 AS BIGINT) AS STRING)"),
        ("R", "SELECT CAST(CAST(1000000 AS BIGINT) AS DOUBLE)"),
        ("T", "SELECT CAST(try_cast(9223372036854775807 AS INT) AS STRING)"),
    ],
    "double": [
        ("I", "SELECT CAST(floor(3.999) AS INT)"),
        ("I", "SELECT CAST(floor(-2.5) AS BIGINT)"),
        ("T", "SELECT CAST(CAST(0.5 AS DOUBLE) AS STRING)"),
        ("R", "SELECT CAST('1.25' AS DOUBLE)"),
        ("T", "SELECT CAST(try_cast('not-a-number' AS DOUBLE) AS STRING)"),
    ],
    "string": [
        ("I", "SELECT CAST('123' AS INT)"),
        ("I", "SELECT CAST('-45' AS BIGINT)"),
        ("T", "SELECT CAST(CAST('2024-06-15' AS DATE) AS STRING)"),
        ("T", "SELECT CAST(CAST('true' AS BOOLEAN) AS STRING)"),
        ("T", "SELECT CAST(try_cast('2024-13-40' AS DATE) AS STRING)"),
    ],
    "boolean": [
        ("T", "SELECT CAST(CAST(1 AS BOOLEAN) AS STRING)"),
        ("T", "SELECT CAST(CAST(0 AS BOOLEAN) AS STRING)"),
        ("I", "SELECT CAST(CAST('true' AS BOOLEAN) AS INT)"),
        ("T", "SELECT CAST((1 < 2) AS STRING)"),
    ],
    "date": [
        ("T", "SELECT CAST(DATE '2024-02-29' AS STRING)"),
        ("I", "SELECT CAST(DATE '2024-03-01' - DATE '2024-02-01' AS INT)"),
        ("T", "SELECT CAST(CAST(DATE '1970-01-01' AS TIMESTAMP) AS STRING)"),
        ("I", "SELECT year(CAST('1999-12-31' AS DATE))"),
    ],
}
for _name, _specs in _CAST_FILES.items():
    corpus(f"cast_file_{_name}", f"Cast file: {_name} source (reference test/sql/cast)")([
        (ty, "", sql) for ty, sql in _specs
    ])


# ---------------------------------------------------------------------------
# Round-4 expansion: select4-style GROUP BY matrix, LATERAL subquery
# corners, FILTER-clause aggregates, binary/string/math/date function
# files, list-HOF depth, ordered-set aggregates, ALL set-ops, and
# per-table subquery corners.  Same discipline as every family above:
# dialect-common text, two-engine validated, goldens only on agreement.

# select4.test_slow analog (reference test/sqlite/select4.test_slow):
# the GROUP BY permutation matrix — pairs of grouping expressions x
# aggregate shapes over orders, each with plain/filtered/HAVING/global
# variants.
_S4_GROUPS = {
    "a": ("o_orderstatus", "T"),
    "b": ("o_orderpriority", "T"),
    "c": ("year(o_orderdate)", "I"),
    "d": ("o_custkey % 7", "I"),
    "e": ("o_orderkey % 3", "I"),
}
_S4_AGGS = {
    "cnt": ("count(*)", "I"),
    "sum": ("CAST(sum(o_custkey) AS BIGINT)", "I"),
    "avg": ("round(avg(o_custkey), 6)", "R"),
    "mnmx": ("min(o_custkey), max(o_custkey)", "II"),
    "cntd": ("count(DISTINCT o_custkey % 100)", "I"),
}
for _g1, _g2 in [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
    ("b", "e"), ("c", "d"), ("c", "e"), ("d", "e"), ("a", "e"),
]:
    _ge1, _t1 = _S4_GROUPS[_g1]
    _ge2, _t2 = _S4_GROUPS[_g2]
    for _an, (_aexpr, _aty) in _S4_AGGS.items():
        corpus(
            f"select4_groupby_{_g1}{_g2}_{_an}",
            f"select4-matrix: GROUP BY {_ge1}, {_ge2} with {_an} "
            "(reference test/sqlite/select4.test_slow)",
        )([
            (_t1 + _t2 + _aty, "rowsort",
             f"SELECT {_ge1}, {_ge2}, {_aexpr} FROM orders GROUP BY {_ge1}, {_ge2}"),
            (_t1 + _aty, "rowsort",
             f"SELECT {_ge1}, {_aexpr} FROM orders WHERE o_totalprice > 50000 GROUP BY {_ge1}"),
            (_t1 + _t2 + _aty, "rowsort",
             f"SELECT {_ge1}, {_ge2}, {_aexpr} FROM orders GROUP BY {_ge1}, {_ge2} HAVING count(*) > 10"),
            (_aty, "", f"SELECT {_aexpr} FROM orders"),
        ])

# LATERAL subquery corners (reference test/sql/subquery/lateral): both
# engines accept the `, LATERAL (...)` and `JOIN LATERAL ... ON true`
# spellings with outer references in the lateral SELECT list.
corpus("lateral_scalar_projection", "LATERAL with outer refs in its SELECT list (reference test/sql/subquery/lateral)")([
    ("II", "", "SELECT r.r_regionkey, u.v FROM region r, LATERAL (SELECT r.r_regionkey * 2 + 1 AS v) u ORDER BY r.r_regionkey"),
    ("IT", "", "SELECT n.n_nationkey, u.s FROM nation n, LATERAL (SELECT concat(n.n_name, '!') AS s) u ORDER BY n.n_nationkey LIMIT 6"),
    ("III", "", "SELECT r.r_regionkey, u.a, u.b FROM region r, LATERAL (SELECT r.r_regionkey + 1 AS a, r.r_regionkey * 10 AS b) u ORDER BY r.r_regionkey"),
])
corpus("lateral_join_on_true", "JOIN LATERAL ... ON true spelling (reference test/sql/subquery/lateral)")([
    ("II", "", "SELECT r.r_regionkey, u.v FROM region r JOIN LATERAL (SELECT r.r_regionkey * 3 AS v) u ON true ORDER BY r.r_regionkey"),
    ("II", "", "SELECT n.n_nationkey, u.v FROM nation n JOIN LATERAL (SELECT n.n_regionkey + 100 AS v) u ON true ORDER BY n.n_nationkey LIMIT 7"),
])
corpus("lateral_correlated_agg", "Correlated aggregate inside LATERAL (reference test/sql/subquery/lateral)")([
    ("II", "", "SELECT n.n_nationkey, u.c FROM nation n, LATERAL (SELECT count(*) AS c FROM supplier s WHERE s.s_nationkey = n.n_nationkey) u ORDER BY n.n_nationkey"),
    ("II", "", "SELECT r.r_regionkey, u.c FROM region r, LATERAL (SELECT count(*) AS c FROM nation n WHERE n.n_regionkey = r.r_regionkey) u ORDER BY r.r_regionkey"),
])
corpus("lateral_chained_refs", "A second LATERAL referencing the first (reference test/sql/subquery/lateral)")([
    ("III", "", "SELECT r.r_regionkey, u.a, w.b FROM region r, LATERAL (SELECT r.r_regionkey + 1 AS a) u, LATERAL (SELECT u.a * 2 AS b) w ORDER BY r.r_regionkey"),
])
corpus("lateral_filtered_outer", "LATERAL under an outer filter (reference test/sql/subquery/lateral)")([
    ("II", "", "SELECT n.n_nationkey, u.v FROM nation n, LATERAL (SELECT n.n_nationkey % 5 AS v) u WHERE n.n_regionkey = 2 ORDER BY n.n_nationkey"),
])
corpus("lateral_in_aggregate", "Aggregating over a LATERAL product (reference test/sql/subquery/lateral)")([
    ("I", "", "SELECT CAST(sum(u.v) AS BIGINT) FROM region r, LATERAL (SELECT r.r_regionkey * 2 AS v) u"),
    ("TI", "rowsort", "SELECT n.n_name, CAST(sum(u.v) AS BIGINT) FROM nation n, LATERAL (SELECT n.n_nationkey + 1 AS v) u GROUP BY n.n_name"),
])

# FILTER-clause aggregate files (reference test/sql/aggregate/aggregates
# FILTER coverage) — one file per aggregate.
_FILTER_AGGS = {
    "count": ("count(*) FILTER (WHERE l_quantity > 25)", "I"),
    "sum": ("CAST(sum(l_linenumber) FILTER (WHERE l_discount > 0.05) AS BIGINT)", "I"),
    "avg": ("round(avg(l_quantity) FILTER (WHERE l_tax < 0.04), 6)", "R"),
    "min": ("min(l_quantity) FILTER (WHERE l_quantity > 30)", "R"),
    "max": ("max(l_quantity) FILTER (WHERE l_quantity < 20)", "R"),
    "bool_and": ("bool_and(l_quantity > 0) FILTER (WHERE l_linenumber = 1)", "T"),
    "bool_or": ("bool_or(l_quantity > 49) FILTER (WHERE l_linenumber = 1)", "T"),
    "count_distinct": ("count(DISTINCT l_linenumber) FILTER (WHERE l_quantity > 10)", "I"),
}
for _name, (_expr, _ty) in _FILTER_AGGS.items():
    _sel = _expr if _ty != "T" else f"CAST({_expr} AS STRING)"
    corpus(f"aggfilter_file_{_name}", f"FILTER-clause aggregate: {_name} (reference test/sql/aggregate/aggregates)")([
        (_ty, "", f"SELECT {_sel} FROM lineitem"),
        ("T" + _ty, "rowsort", f"SELECT l_returnflag, {_sel} FROM lineitem GROUP BY l_returnflag"),
        (_ty, "", f"SELECT {_sel} FROM lineitem WHERE l_orderkey < 0"),
    ])

# Remaining window distribution functions as per-function files.
_WIN_FNS2 = {
    "cume_dist": ("cume_dist()", "R", ""),
    "percent_rank": ("percent_rank()", "R", ""),
    "nth_value": ("nth_value(n_nationkey, 3)", "I",
                  " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"),
}
for _name, (_call, _ty, _frame) in _WIN_FNS2.items():
    def _w(call, over, ty=_ty):
        full = f"{call} OVER ({over})"
        return full if ty == "I" else f"round({full}, 6)"
    corpus(f"window_file_{_name}", f"Window-function file: {_name} (reference test/sql/window/test_{_name}.test)")([
        ("I" + _ty, "rowsort", f"SELECT n_nationkey, {_w(_call, f'ORDER BY n_nationkey{_frame}')} FROM nation"),
        ("I" + _ty, "rowsort", f"SELECT n_nationkey, {_w(_call, f'PARTITION BY n_regionkey ORDER BY n_nationkey{_frame}')} FROM nation"),
        ("I", "", f"SELECT count(DISTINCT x) FROM (SELECT {_call} OVER (PARTITION BY n_regionkey ORDER BY n_nationkey{_frame}) AS x FROM nation) t"),
    ])

# Binary / blob function files (reference test/sql/types/blob).
_BIN_FNS = {
    "hex": ("hex('abc')", "hex(r_name)", "T"),
    "unhex": ("CAST(unhex('53504152') AS STRING)", "CAST(unhex(hex(r_name)) AS STRING)", "T"),
    "base64_roundtrip": ("base64(CAST('abc' AS BINARY))", "base64(CAST(r_name AS BINARY))", "T"),
    "octet_length": ("octet_length(CAST('abc' AS BINARY))", "octet_length(CAST(r_name AS BINARY))", "I"),
    "bit_length": ("bit_length('abc')", "bit_length(r_name)", "I"),
    "binary_compare": ("CAST(CAST('ab' AS BINARY) = CAST('ab' AS BINARY) AS STRING)",
                       "CAST(CAST(r_name AS BINARY) = CAST(r_name AS BINARY) AS STRING)", "T"),
    "md5_digest": ("md5('abc')", "md5(r_name)", "T"),
}
for _name, (_lit, _col, _ty) in _BIN_FNS.items():
    corpus(f"blob_file_{_name}", f"Binary/blob function: {_name} (reference test/sql/types/blob)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "", f"SELECT {_col} FROM region ORDER BY r_regionkey"),
        ("I", "", f"SELECT count(DISTINCT {_col}) FROM region"),
    ])

# Second string-function file tranche (reference test/sql/function/string).
_STR_FNS2 = {
    "translate": ("translate('abcab', 'ab', 'xy')", "translate(r_name, 'AE', '43')", "T"),
    "instr": ("instr('hello', 'll')", "instr(r_name, 'A')", "I"),
    "left_right": ("left('hello', 2) || '|' || right('hello', 2)", "left(r_name, 3) || right(r_name, 2)", "T"),
    "ascii_chr": ("CAST(ascii('A') AS STRING) || chr(66)", "chr(ascii(r_name) + 1)", "T"),
    "split_part": ("split_part('a|b|c', '|', 2)", "split_part(r_name, 'A', 1)", "T"),
    "levenshtein": ("levenshtein('kitten', 'sitting')", "levenshtein(r_name, 'EUROPE')", "I"),
    "contains_fn": ("CAST(contains('hello', 'ell') AS STRING)", "CAST(contains(r_name, 'A') AS STRING)", "T"),
    "repeat_fn": ("repeat('ab', 3)", "repeat(substr(r_name, 1, 1), r_regionkey + 1)", "T"),
    "printf_fn": ("printf('%d-%s', 5, 'x')", "printf('%s#%d', r_name, r_regionkey)", "T"),
    "substring_from_for": ("substring('abcdef' FROM 2 FOR 3)", "substring(r_name FROM 2 FOR 4)", "T"),
}
for _name, (_lit, _col, _ty) in _STR_FNS2.items():
    corpus(f"strfn_file_{_name}", f"String-function file: {_name} (reference test/sql/function/string)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "", f"SELECT {_col} FROM region ORDER BY r_regionkey"),
        ("I", "", f"SELECT count(DISTINCT ({_col})) FROM region"),
    ])

# Second math-function file tranche (reference test/sql/function/numeric).
_MATH_FNS2 = {
    "log2": ("log2(8.0)", "round(log2(CAST(p_size AS DOUBLE)), 6)", "R"),
    "log10": ("log10(1000.0)", "round(log10(CAST(p_size AS DOUBLE)), 6)", "R"),
    "ln": ("ln(1.0)", "round(ln(CAST(p_size AS DOUBLE)), 6)", "R"),
    "exp": ("exp(0.0)", "round(exp(CAST(p_size AS DOUBLE) / 50), 6)", "R"),
    "trig": ("round(sin(0.0) + cos(0.0) + tan(0.0), 6)", "round(sin(CAST(p_size AS DOUBLE) / 10) + cos(CAST(p_size AS DOUBLE) / 10), 6)", "R"),
    "degrees_radians": ("round(degrees(pi()), 6)", "round(radians(CAST(p_size AS DOUBLE)), 6)", "R"),
    "factorial_fn": ("CAST(factorial(6) AS BIGINT)", "CAST(factorial(p_size % 7) AS BIGINT)", "I"),
    "isnan_fn": ("CAST(isnan(CAST('NaN' AS DOUBLE)) AS STRING)", "CAST(isnan(p_retailprice / 100) AS STRING)", "T"),
    "bit_count_fn": ("bit_count(255)", "bit_count(p_size)", "I"),
}
for _name, (_lit, _col, _ty) in _MATH_FNS2.items():
    corpus(f"mathfn_file_{_name}", f"Math-function file: {_name} (reference test/sql/function/numeric)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "rowsort", f"SELECT {_col} FROM part WHERE p_partkey <= 20"),
        ("I", "", f"SELECT count(*) FROM part WHERE ({_col}) IS NOT NULL AND p_partkey <= 50"),
    ])

# Second date/time-function file tranche (reference test/sql/function/date).
_DATE_FNS2 = {
    "last_day": ("CAST(last_day(DATE '2024-02-05') AS STRING)", "CAST(last_day(o_orderdate) AS STRING)", "T"),
    "make_date": ("CAST(make_date(2024, 2, 29) AS STRING)", "CAST(make_date(year(o_orderdate), 1, 1) AS STRING)", "T"),
    "hour_minute": ("CAST(hour(TIMESTAMP '2024-01-01 10:11:12') * 100 + minute(TIMESTAMP '2024-01-01 10:11:12') AS INT)", "CAST(hour(ts) * 100 + minute(ts) AS INT)", "I"),
    "date_part_time": ("CAST(date_part('hour', TIMESTAMP '2024-06-01 23:59:58') AS INT)", "CAST(date_part('minute', ts) AS INT)", "I"),
    "extract_parts": ("extract(month FROM DATE '2024-03-01') + extract(day FROM DATE '2024-03-09')", "extract(month FROM o_orderdate)", "I"),
    "date_add_n": ("CAST(date_add(DATE '2024-01-01', 45) AS STRING)", "CAST(date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % 30 AS INT) + 7) AS STRING)", "T"),
}
for _name, (_lit, _col, _ty) in _DATE_FNS2.items():
    _tbl, _ord = ("events", "event_id") if "ts" in _col else ("orders", "o_orderkey")
    corpus(f"datefn_file_{_name}", f"Date-function file: {_name} (reference test/sql/function/date)")([
        (_ty, "", f"SELECT {_lit}"),
        (_ty, "", f"SELECT {_col} FROM {_tbl} ORDER BY {_ord} LIMIT 6"),
        ("I", "", f"SELECT count(DISTINCT ({_col})) FROM {_tbl}"),
    ])

# GROUP BY ALL / ORDER BY ALL shorthand per table (reference
# test/sql/aggregate + order: DuckDB popularized, Spark adopted).
for _tbl, _gcol, _gty, _ocol in [
    ("nation", "n_regionkey", "I", "n_nationkey"),
    ("orders", "o_orderstatus", "T", "o_orderkey"),
    ("lineitem", "l_returnflag", "T", "l_orderkey"),
    ("part", "p_brand", "T", "p_partkey"),
    ("customer", "c_mktsegment", "T", "c_custkey"),
]:
    corpus(f"group_order_all_{_tbl}", f"GROUP BY ALL / ORDER BY ALL over {_tbl} (reference test/sql/aggregate/group_by_all)")([
        (_gty + "I", "rowsort", f"SELECT {_gcol}, count(*) FROM {_tbl} GROUP BY ALL"),
        (_gty + "I", "", f"SELECT {_gcol}, count(*) AS c FROM {_tbl} GROUP BY ALL ORDER BY ALL"),
        (_gty, "", f"SELECT DISTINCT {_gcol} FROM {_tbl} ORDER BY ALL"),
    ])

# List depth via the proven dialect-common subset: split() arrays with
# the filter() HOF and array_contains (reference test/sql/types/list).
corpus("list_filter_hof", "filter() higher-order function over split arrays (reference test/sql/types/list/lambdas)")([
    ("I", "", "SELECT size_out FROM (SELECT count(*) AS size_out FROM region WHERE array_contains(split(r_name, 'R'), 'AF'))"),
    ("T", "rowsort", "SELECT CAST(filter(split(r_name, 'A'), x -> length(x) > 1) AS STRING) FROM region"),
    ("T", "rowsort", "SELECT CAST(filter(split(n_name, 'A'), x -> x <> '') AS STRING) FROM nation WHERE n_nationkey < 6"),
])
corpus("list_contains_matrix", "array_contains over split arrays per table (reference test/sql/types/list)")([
    ("I", "", "SELECT count(*) FROM region WHERE array_contains(split(r_name, 'I'), 'AS')"),
    ("I", "", "SELECT count(*) FROM nation WHERE array_contains(split(n_name, 'AN'), 'JAP')"),
    ("I", "", "SELECT count(*) FROM part WHERE array_contains(split(p_name, ' '), 'green')"),
    ("TI", "rowsort", "SELECT l_returnflag, count(*) FROM lineitem WHERE array_contains(split(l_linestatus, ''), 'O') GROUP BY l_returnflag"),
])
corpus("list_filter_then_agg", "Aggregates over HOF-filtered split arrays (reference test/sql/types/list/lambdas)")([
    ("I", "", "SELECT CAST(sum(CASE WHEN array_contains(split(p_name, ' '), 'red') THEN 1 ELSE 0 END) AS BIGINT) FROM part"),
    ("II", "rowsort", "SELECT p_size, count(*) FROM part WHERE array_contains(split(p_type, ' '), 'BRASS') GROUP BY p_size"),
])

# Ordered-set aggregates (reference test/sql/aggregate/aggregates:
# median/quantile family).
_PCTS = {"p25": "0.25", "p50": "0.5", "p75": "0.75", "p90": "0.9"}
for _name, _p in _PCTS.items():
    corpus(f"percentile_file_{_name}", f"percentile_cont({_p}) WITHIN GROUP (reference test/sql/aggregate/aggregates)")([
        ("R", "", f"SELECT round(percentile_cont({_p}) WITHIN GROUP (ORDER BY l_quantity), 6) FROM lineitem"),
        ("TR", "rowsort", f"SELECT l_returnflag, round(percentile_cont({_p}) WITHIN GROUP (ORDER BY l_quantity), 6) FROM lineitem GROUP BY l_returnflag"),
        ("R", "", f"SELECT round(percentile_cont({_p}) WITHIN GROUP (ORDER BY l_quantity), 6) FROM lineitem WHERE l_orderkey < 0"),
    ])
corpus("median_file", "median aggregate (reference test/sql/aggregate/aggregates/median.test)")([
    ("R", "", "SELECT round(median(l_quantity), 6) FROM lineitem"),
    ("TR", "rowsort", "SELECT l_returnflag, round(median(l_quantity), 6) FROM lineitem GROUP BY l_returnflag"),
    ("I", "", "SELECT CAST(median(n_nationkey) AS INT) FROM nation"),
])

# INTERSECT ALL / EXCEPT ALL over fixture scans (reference
# test/sql/setops: bag semantics, not set semantics).
corpus("setop_all_intersect", "INTERSECT ALL bag semantics (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT n_regionkey FROM nation INTERSECT ALL SELECT r_regionkey FROM region"),
    ("I", "rowsort", "SELECT l_linenumber FROM lineitem WHERE l_orderkey < 100 INTERSECT ALL SELECT l_linenumber FROM lineitem WHERE l_orderkey < 200"),
])
corpus("setop_all_except", "EXCEPT ALL bag semantics (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT n_regionkey FROM nation EXCEPT ALL SELECT r_regionkey FROM region"),
    ("I", "rowsort", "SELECT o_orderkey % 5 FROM orders WHERE o_orderkey < 300 EXCEPT ALL SELECT o_orderkey % 5 FROM orders WHERE o_orderkey < 100"),
])
corpus("setop_all_mixed_chain", "Chained ALL set-ops (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT n_regionkey FROM nation INTERSECT ALL SELECT n_regionkey FROM nation WHERE n_nationkey < 10 EXCEPT ALL SELECT r_regionkey FROM region"),
])

# Per-table scalar/EXISTS subquery corner files (reference
# test/sql/subquery/scalar + exists).
for _tbl, _key, _dim, _dimkey, _fk in [
    ("nation", "n_nationkey", "region", "r_regionkey", "n_regionkey"),
    ("supplier", "s_suppkey", "nation", "n_nationkey", "s_nationkey"),
    ("customer", "c_custkey", "nation", "n_nationkey", "c_nationkey"),
]:
    corpus(f"subq_corner_{_tbl}", f"Scalar/EXISTS subquery corners over {_tbl} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_tbl} t WHERE EXISTS (SELECT 1 FROM {_dim} d WHERE d.{_dimkey} = t.{_fk} AND d.{_dimkey} % 2 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_tbl} t WHERE NOT EXISTS (SELECT 1 FROM {_dim} d WHERE d.{_dimkey} = t.{_fk})"),
        ("I", "", f"SELECT count(*) FROM {_tbl} t WHERE t.{_fk} = (SELECT min({_dimkey}) FROM {_dim})"),
        ("I", "", f"SELECT count(*) FROM {_tbl} t WHERE t.{_fk} IN (SELECT {_dimkey} FROM {_dim} WHERE {_dimkey} > 1)"),
        ("II", "rowsort", f"SELECT t.{_fk}, count(*) FROM {_tbl} t WHERE EXISTS (SELECT 1 FROM {_dim} d WHERE d.{_dimkey} = t.{_fk}) GROUP BY t.{_fk}"),
    ])

# VALUES-backed inline relations (reference test/sql/select +
# expression_scan): typed literal frames joined/set-opped with scans.
corpus("values_inline_join", "VALUES inline relation joined to a scan (reference COLUMN_DATA_SCAN)")([
    ("TI", "", "SELECT v.lbl, count(*) FROM nation n JOIN (VALUES (0, 'a'), (1, 'b'), (2, 'c')) AS v(k, lbl) ON n.n_regionkey = v.k GROUP BY v.lbl ORDER BY v.lbl"),
    ("II", "", "SELECT v.k, v.k * 10 FROM (VALUES (3), (1), (2)) AS v(k) ORDER BY v.k"),
])
corpus("values_inline_setops", "VALUES inline relations through set-ops (reference test/sql/setops)")([
    ("I", "rowsort", "SELECT r_regionkey FROM region UNION SELECT k FROM (VALUES (7), (8)) v(k)"),
    ("I", "rowsort", "SELECT k FROM (VALUES (1), (2), (2), (3)) v(k) INTERSECT ALL SELECT k FROM (VALUES (2), (2), (4)) u(k)"),
])
corpus("values_inline_aggregate", "Aggregates straight over VALUES (reference expression_scan)")([
    ("IRI", "", "SELECT CAST(sum(k) AS BIGINT), round(avg(k), 6), count(DISTINCT k) FROM (VALUES (1), (2), (2), (5)) v(k)"),
    ("TI", "rowsort", "SELECT lbl, CAST(sum(k) AS BIGINT) FROM (VALUES ('a', 1), ('b', 2), ('a', 3)) v(lbl, k) GROUP BY lbl"),
])

# string_agg / listagg determinism via WITHIN GROUP-equivalent ordered
# inputs (reference test/sql/aggregate/aggregates/string_agg.test).
corpus("stringagg_ordered_inputs", "string_agg over pre-ordered single-row groups (reference string_agg.test)")([
    ("T", "", "SELECT string_agg(r_name, ',') FROM (SELECT r_name FROM region WHERE r_regionkey = 0) t"),
    ("TT", "rowsort", "SELECT n_name, string_agg(n_name, '|') FROM nation GROUP BY n_name"),
    ("T", "", "SELECT listagg(r_name, ';') FROM (SELECT r_name FROM region WHERE r_regionkey = 4) t"),
])

# regr_* linear-regression aggregate files (reference
# test/sql/aggregate/aggregates regression family).
_REGR_FNS = ["regr_slope", "regr_intercept", "regr_r2", "regr_avgx", "regr_avgy", "regr_count"]
for _name in _REGR_FNS:
    _ty = "I" if _name == "regr_count" else "R"
    _expr = (
        f"{_name}(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE))"
    )
    _sel = _expr if _ty == "I" else f"round({_expr}, 6)"
    if _name == "regr_count":
        _sel = f"CAST({_expr} AS BIGINT)"
    corpus(f"regr_file_{_name}", f"Regression aggregate: {_name} (reference test/sql/aggregate/aggregates)")([
        (_ty, "", f"SELECT {_sel} FROM lineitem"),
        ("T" + _ty, "rowsort", f"SELECT l_returnflag, {_sel} FROM lineitem GROUP BY l_returnflag"),
    ])

# Per-table composite-predicate filter matrix (reference test/sql/filter).
for _tbl, _preds, _ordcol in [
    ("orders", "o_totalprice > 100000 AND o_orderstatus <> 'F' OR o_orderpriority LIKE '1%'", "o_orderkey"),
    ("lineitem", "l_quantity BETWEEN 10 AND 20 AND (l_returnflag = 'R' OR l_linestatus = 'O')", "l_orderkey"),
    ("part", "p_size IN (5, 10, 15) AND p_name LIKE '%green%'", "p_partkey"),
    ("customer", "c_acctbal < 0 OR c_mktsegment IN ('BUILDING', 'MACHINERY')", "c_custkey"),
    ("supplier", "s_acctbal > 0 AND NOT (s_nationkey = 3)", "s_suppkey"),
]:
    corpus(f"filter_matrix_{_tbl}", f"Composite predicate matrix over {_tbl} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_tbl} WHERE {_preds}"),
        ("I", "", f"SELECT count(*) FROM {_tbl} WHERE NOT ({_preds})"),
        ("I", "", f"SELECT count(*) FROM {_tbl} WHERE ({_preds}) IS NULL"),
        ("I", "", f"SELECT min({_ordcol}) FROM {_tbl} WHERE {_preds}"),
    ])


# LIMIT/OFFSET pagination matrix per table (reference test/sql/limit).
for _tbl, _key in [
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"), ("events", "event_id"),
]:
    corpus(f"limitoffset_file_{_tbl}", f"LIMIT/OFFSET over ordered {_tbl} (reference test/sql/limit)")([
        ("I", "", f"SELECT {_key} FROM {_tbl} ORDER BY {_key} LIMIT 4"),
        ("I", "", f"SELECT {_key} FROM {_tbl} ORDER BY {_key} LIMIT 3 OFFSET 2"),
        ("I", "", f"SELECT {_key} FROM {_tbl} ORDER BY {_key} DESC LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_key} FROM {_tbl} ORDER BY {_key} LIMIT 10 OFFSET 5) t"),
        ("I", "", f"SELECT {_key} FROM {_tbl} ORDER BY {_key} LIMIT 0"),
    ])

# CASE projection + aggregation matrix per table (reference
# test/sql/case).
for _tbl, _key, _num in [
    ("region", "r_regionkey", "r_regionkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("supplier", "s_suppkey", "s_nationkey"),
    ("part", "p_partkey", "p_size"),
    ("orders", "o_orderkey", "o_custkey"),
    ("lineitem", "l_orderkey, l_linenumber", "l_linenumber"),
    ("events", "event_id", "user_id"),
]:
    _case = f"CASE WHEN {_num} % 3 = 0 THEN 'z' WHEN {_num} % 3 = 1 THEN 'o' ELSE 't' END"
    corpus(f"casewhen_file_{_tbl}", f"CASE projection and aggregation over {_tbl} (reference test/sql/case)")([
        ("TI", "rowsort", f"SELECT {_case}, count(*) FROM {_tbl} GROUP BY {_case}"),
        ("I", "", f"SELECT count(*) FROM {_tbl} WHERE ({_case}) = 'z'"),
        ("T", "", f"SELECT {_case} FROM {_tbl} ORDER BY {_key} LIMIT 5"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_num} % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM {_tbl}"),
    ])

# NULLS FIRST/LAST x direction matrix over nullable expressions
# (reference test/sql/order).
for _tbl, _expr, _key in [
    ("orders", "nullif(o_orderkey % 4, 0)", "o_orderkey"),
    ("nation", "nullif(n_regionkey, 2)", "n_nationkey"),
    ("part", "nullif(p_size % 5, 1)", "p_partkey"),
    ("lineitem", "nullif(l_linenumber, 3)", "l_orderkey"),
    ("region", "nullif(r_regionkey, 2)", "r_regionkey"),
    ("customer", "nullif(c_nationkey % 6, 1)", "c_custkey"),
    ("supplier", "nullif(s_nationkey % 4, 0)", "s_suppkey"),
    ("events", "nullif(user_id % 5, 2)", "event_id"),
    ("documents", "nullif(n_chars % 7, 3)", "doc_id"),
    ("embeddings", "nullif(label % 3, 0)", "vec_id"),
]:
    corpus(f"ordernulls_file_{_tbl}", f"NULLS FIRST/LAST ordering matrix over {_tbl} (reference test/sql/order)")([
        ("I", "", f"SELECT {_expr} FROM {_tbl} ORDER BY {_expr} ASC NULLS FIRST, {_key} LIMIT 6"),
        ("I", "", f"SELECT {_expr} FROM {_tbl} ORDER BY {_expr} ASC NULLS LAST, {_key} LIMIT 6"),
        ("I", "", f"SELECT {_expr} FROM {_tbl} ORDER BY {_expr} DESC NULLS FIRST, {_key} LIMIT 6"),
        ("I", "", f"SELECT {_expr} FROM {_tbl} ORDER BY {_expr} DESC NULLS LAST, {_key} LIMIT 6"),
    ])

# Standard PIVOT clause — the `FROM ... PIVOT (agg FOR col IN (...))`
# spelling parses identically in DuckDB and Spark, including multi-agg
# + per-value aliases and the `value_aggalias` output-column naming
# (reference test/sql/pivot).  Aggregates kept integer-valued (count /
# min / max / sum of ints) so the goldens are exact.
corpus("pivot_std_orders", "Standard PIVOT over orders status (reference test/sql/pivot)")([
    ("TIII", "", "SELECT * FROM (SELECT o_orderpriority, o_orderstatus, o_orderkey FROM orders) PIVOT (count(o_orderkey) FOR o_orderstatus IN ('O', 'F', 'P')) ORDER BY o_orderpriority"),
    ("TII", "", "SELECT * FROM (SELECT o_orderpriority, o_orderstatus, o_orderkey FROM orders WHERE o_orderkey < 2000) PIVOT (max(o_orderkey) FOR o_orderstatus IN ('O' AS open_max, 'F' AS done_max)) ORDER BY o_orderpriority"),
])
corpus("pivot_std_lineitem", "Standard PIVOT over lineitem flags (reference test/sql/pivot)")([
    ("III", "", "SELECT * FROM (SELECT l_linenumber, l_returnflag, l_orderkey FROM lineitem) PIVOT (count(l_orderkey) FOR l_returnflag IN ('A', 'N')) ORDER BY l_linenumber"),
    ("TIIII", "", "SELECT * FROM (SELECT l_linestatus, l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem) PIVOT (count(q) AS c, sum(q) AS s FOR l_returnflag IN ('A' AS ra, 'R' AS rr)) ORDER BY l_linestatus"),
])
corpus("pivot_std_nation", "Standard PIVOT with missing pivot values yielding NULL cells (reference test/sql/pivot)")([
    ("IIII", "", "SELECT * FROM (SELECT n_nationkey % 3 AS grp, n_regionkey, n_nationkey FROM nation) PIVOT (count(n_nationkey) FOR n_regionkey IN (0, 2, 4)) ORDER BY grp"),
    ("III", "", "SELECT * FROM (SELECT n_regionkey, n_name, n_nationkey FROM nation WHERE n_regionkey < 2) PIVOT (min(n_nationkey) FOR n_name IN ('NATION_0' AS n0, 'NATION_1' AS n1)) ORDER BY n_regionkey"),
])

# Per-table PIVOT matrix over each fixture table's low-cardinality
# dimension (reference test/sql/pivot) — count + integer-sum forms,
# grouped and global.
for _tbl, _grp, _gty, _dim, _vals, _cnt in [
    ("customer", "c_nationkey % 4", "I", "c_mktsegment",
     "'MACHINERY' AS mach, 'BUILDING' AS bld, 'HOUSEHOLD' AS hh", "c_custkey"),
    ("events", "user_id % 3", "I", "event_type",
     "'click' AS clicks, 'view' AS views, 'purchase' AS buys", "event_id"),
    ("documents", "n_chars % 2", "I", "lang",
     "'en' AS en, 'fr' AS fr, 'zh' AS zh", "doc_id"),
    # NOTE empty pivot cells diverge for count(): DuckDB fills 0, Spark
    # NULL — validator-caught on part at p_size % 5.  Specs below keep
    # every (group, value) cell occupied; the NULL-cell behavior is
    # pinned (as NULL) by the min() specs in pivot_std_nation instead.
    ("part", "p_size % 2", "I", "p_brand",
     "'Brand#1' AS b1, 'Brand#2' AS b2", "p_partkey"),
]:
    corpus(f"pivot_matrix_{_tbl}", f"Standard PIVOT matrix over {_tbl} (reference test/sql/pivot)")([
        (_gty + "I" * (_vals.count(",") + 1), "rowsort",
         f"SELECT * FROM (SELECT {_grp} AS grp, {_dim}, {_cnt} FROM {_tbl}) PIVOT (count({_cnt}) FOR {_dim} IN ({_vals}))"),
        ("I" * (_vals.count(",") + 1), "",
         f"SELECT * FROM (SELECT {_dim}, {_cnt} FROM {_tbl}) PIVOT (count({_cnt}) FOR {_dim} IN ({_vals}))"),
    ])

# Standard UNPIVOT clause — `FROM ... UNPIVOT [INCLUDE NULLS] (val FOR
# name IN (cols...))` is shared syntax; default excludes NULL cells in
# both engines (reference test/sql/pivot + Spark UNPIVOT).
corpus("unpivot_std_matrix", "Standard UNPIVOT incl. INCLUDE NULLS (reference test/sql/pivot)")([
    ("TTI", "", "SELECT * FROM (SELECT l_returnflag, CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt, CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS done_cnt FROM lineitem GROUP BY l_returnflag) UNPIVOT (cnt FOR status IN (open_cnt, done_cnt)) ORDER BY l_returnflag, status"),
    ("TTI", "", "SELECT * FROM (SELECT r_name, CAST(r_regionkey AS BIGINT) AS key_col, CAST(nullif(r_regionkey, 2) AS BIGINT) AS nullable_col FROM region) UNPIVOT (v FOR src IN (key_col, nullable_col)) ORDER BY r_name, src"),
    ("TTI", "", "SELECT * FROM (SELECT r_name, CAST(r_regionkey AS BIGINT) AS key_col, CAST(nullif(r_regionkey, 2) AS BIGINT) AS nullable_col FROM region) UNPIVOT INCLUDE NULLS (v FOR src IN (key_col, nullable_col)) ORDER BY r_name, src"),
])

# Second list-function tranche: names that resolve in BOTH engines over
# split() arrays (DuckDB's array_* aliases) — sort/distinct/intersect
# wrapped in array_sort where one engine leaves order unspecified
# (reference test/sql/types/list).
corpus("list_fn_extra", "array_sort/distinct/intersect/append/prepend/position shared surface (reference test/sql/types/list)")([
    ("T", "rowsort", "SELECT CAST(array_sort(split(r_name, 'R')) AS STRING) FROM region"),
    ("T", "rowsort", "SELECT CAST(array_sort(array_distinct(split(l_linestatus || ',' || l_returnflag || ',' || l_linestatus, ','))) AS STRING) FROM lineitem WHERE l_orderkey < 40"),
    ("T", "rowsort", "SELECT CAST(array_sort(array_intersect(split(n_name, 'A'), split(n_name, 'I'))) AS STRING) FROM nation WHERE n_nationkey < 6"),
    ("T", "", "SELECT CAST(array_append(split(r_name, 'E'), 'tail') AS STRING) FROM region ORDER BY r_regionkey"),
    # NOTE array_prepend is NOT dialect-common: Spark takes (array, elem),
    # DuckDB (elem, list) — validator-caught; append agrees in both.
    ("T", "", "SELECT CAST(array_append(array_append(split(r_name, 'E'), 'x'), 'y') AS STRING) FROM region ORDER BY r_regionkey"),
    ("II", "rowsort", "SELECT CAST(array_position(split(p_name, ' '), 'widget') AS BIGINT), count(*) FROM part GROUP BY 1"),
    ("I", "", "SELECT count(*) FROM part WHERE array_position(split(p_name, ' '), 'blue') = 1"),
])

# json_array_length is the one JSON scalar shared by name and semantics
# (reference test/sql/json).
# Third misc scalar tranche: names probed shared this round.  NOT
# shared (validator/probe-caught): starts_with (DuckDB) vs startswith
# (Spark), strpos/sha256 (DuckDB-only), sha2/crc32 (Spark-only), hash
# (different algorithms), ^ (power in DuckDB, xor in Spark!).
corpus("misc_shared_fns3", "printf/make_timestamp/cot/shift-operator shared surface (reference test/sql/function)")([
    ("T", "", "SELECT printf('%d|%s', r_regionkey, r_name) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT CAST(make_timestamp(2024, 2, 29, 23, 59, 58.5) AS STRING)"),
    ("T", "", "SELECT CAST(make_timestamp(2000, 1, n_nationkey % 12 + 1, n_nationkey, 0, 0) AS STRING) FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey"),
    ("R", "", "SELECT round(cot(1.0), 6)"),
    ("II", "", "SELECT 1 << 10, 4096 >> 5"),
    ("II", "rowsort", "SELECT n_regionkey << 2, count(*) FROM nation GROUP BY n_regionkey"),
    ("I", "", "SELECT CAST(position('ION' IN n_name) AS BIGINT) FROM nation ORDER BY n_nationkey LIMIT 5"),
])

corpus("json_shared_surface", "json_array_length over literal and built JSON (reference test/sql/json)")([
    ("I", "", "SELECT CAST(json_array_length('[1,2,3]') AS BIGINT)"),
    ("I", "", "SELECT CAST(json_array_length('[]') AS BIGINT)"),
    ("II", "rowsort", "SELECT CAST(json_array_length('[' || repeat('1,', r_regionkey) || '9]') AS BIGINT), count(*) FROM region GROUP BY 1"),
])



# TIME type matrix (reference test/sql/types/time/test_time.test) — the
# dialect-common subset: Spark 4 supports TIME literals, comparisons,
# ordering, grouping and min/max, but not yet extract()/arithmetic on
# TIME (UNSUPPORTED_TIME_TYPE — probed), so those reference cases stay
# out.
corpus("time_type_literals", "TIME literals and comparisons (reference test/sql/types/time)")([
    ("T", "", "SELECT TIME '11:30:05'"),
    ("T", "", "SELECT TIME '23:59:59.123456'"),
    ("T", "", "SELECT TIME '00:00:00'"),
    ("I", "", "SELECT TIME '11:30:05' < TIME '12:00:00'"),
    ("I", "", "SELECT TIME '11:30:05' = TIME '11:30:05'"),
    ("I", "", "SELECT TIME '22:00:00' <= TIME '21:59:59'"),
    ("T", "", "SELECT greatest(TIME '10:00:00', TIME '11:00:00')"),
    ("T", "", "SELECT least(TIME '10:00:00', TIME '11:00:00')"),
    ("T", "", "SELECT CASE WHEN TIME '10:00:00' BETWEEN TIME '09:00:00' AND TIME '11:00:00' THEN 'in' ELSE 'out' END"),
    ("T", "", "SELECT CAST(TIME '11:30:05' AS STRING)"),
    # coalesce(NULL, TIME) hits Spark's UNSUPPORTED_TIME_TYPE in the
    # null-type unifier — kept out (probed).
    ("T", "", "SELECT nullif(TIME '07:45:00', TIME '07:45:00')"),
])

corpus("time_type_ordering", "TIME ordering, windows, min/max (reference test/sql/types/time)")([
    ("T", "", "SELECT x FROM (VALUES (TIME '12:00:01'),(TIME '03:15:00'),(TIME '23:59:59')) t(x) ORDER BY x"),
    ("T", "", "SELECT x FROM (VALUES (TIME '12:00:01'),(TIME '03:15:00'),(TIME '23:59:59')) t(x) ORDER BY x DESC"),
    ("TT", "", "SELECT min(x), max(x) FROM (VALUES (TIME '12:00:01'),(TIME '03:15:00')) t(x)"),
    ("TT", "", "SELECT x, lead(x) OVER (ORDER BY x) FROM (VALUES (TIME '01:00:00'),(TIME '02:00:00')) t(x) ORDER BY x"),
    ("IT", "", "SELECT row_number() OVER (ORDER BY x DESC), x FROM (VALUES (TIME '05:00:00'),(TIME '04:00:00'),(TIME '06:30:00')) t(x) ORDER BY x"),
    ("T", "", "SELECT first_value(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM (VALUES (TIME '09:00:00'),(TIME '08:00:00')) t(x) LIMIT 1"),
])

corpus("time_type_grouping", "TIME grouping and DISTINCT (reference test/sql/types/time)")([
    ("I", "", "SELECT count(DISTINCT x) FROM (VALUES (TIME '01:00:00'),(TIME '01:00:00'),(TIME '02:00:00')) t(x)"),
    ("TI", "", "SELECT x, count(*) FROM (VALUES (TIME '01:00:00'),(TIME '01:00:00'),(TIME '02:00:00')) t(x) GROUP BY x ORDER BY x"),
    ("T", "rowsort", "SELECT DISTINCT x FROM (VALUES (TIME '01:00:00'),(TIME '01:00:00'),(TIME '02:00:00')) t(x)"),
    ("TI", "", "SELECT max(x), count(*) FROM (VALUES (TIME '01:00:00'),(TIME '02:00:00')) t(x) HAVING count(*) > 1"),
])

# IEEE float specials (reference test/sql/types/float/nan_*.test,
# test_boundary_value.test): both engines agree NaN sorts greatest,
# NaN==NaN in grouping/DISTINCT, inf arithmetic produces nan/inf the
# same way.  Probed divergences kept OUT: floor/ceil(inf) (DuckDB
# returns inf, Spark saturates to BIGINT bounds), CAST(inf AS STRING)
# ('inf' vs 'Infinity'), stddev with inf (DuckDB raises), bare ASC
# NULL placement (NULLS LAST vs FIRST default).
corpus("float_special_arith", "IEEE inf/nan arithmetic (reference test/sql/types/float)")([
    ("RRR", "", "SELECT CAST('inf' AS DOUBLE), CAST('-inf' AS DOUBLE), CAST('nan' AS DOUBLE)"),
    ("R", "", "SELECT CAST('Infinity' AS DOUBLE)"),
    ("R", "", "SELECT CAST('inf' AS DOUBLE) * 0.0"),
    ("R", "", "SELECT CAST('inf' AS DOUBLE) - CAST('inf' AS DOUBLE)"),
    ("R", "", "SELECT CAST('inf' AS FLOAT) + 1.0"),
    ("R", "", "SELECT CAST(CAST('inf' AS DOUBLE) AS FLOAT)"),
    ("RR", "", "SELECT abs(CAST('-inf' AS DOUBLE)), abs(CAST('nan' AS DOUBLE))"),
    ("R", "", "SELECT exp(1000.0)"),
    ("II", "", "SELECT isnan(CAST('nan' AS DOUBLE)), isnan(1.0)"),
    ("RR", "", "SELECT try_cast('inf' AS DOUBLE), try_cast('oops' AS DOUBLE)"),
    ("R", "", "SELECT nullif(CAST('nan' AS DOUBLE), CAST('nan' AS DOUBLE))"),
    ("R", "", "SELECT coalesce(NULL, CAST('nan' AS DOUBLE))"),
])

corpus("float_special_compare", "NaN total order: comparisons (reference test/sql/types/float/nan_cast.test)")([
    ("I", "", "SELECT CAST('nan' AS DOUBLE) = CAST('nan' AS DOUBLE)"),
    ("I", "", "SELECT CAST('nan' AS DOUBLE) > CAST('inf' AS DOUBLE)"),
    ("I", "", "SELECT -CAST('inf' AS DOUBLE) < CAST(-1e308 AS DOUBLE)"),
    ("RR", "", "SELECT least(CAST('nan' AS DOUBLE), 1.0), greatest(CAST('nan' AS DOUBLE), 1.0)"),
    ("I", "", "SELECT x BETWEEN 0.0 AND CAST('inf' AS DOUBLE) FROM (VALUES (5.0)) t(x)"),
    ("I", "", "SELECT CAST('nan' AS DOUBLE) BETWEEN CAST('inf' AS DOUBLE) AND CAST('nan' AS DOUBLE)"),
])

corpus("float_special_order", "NaN ordering and windows (reference test/sql/types/float/nan_ordering.test)")([
    ("R", "", "SELECT x FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(1.0),(CAST('-inf' AS DOUBLE))) t(x) ORDER BY x"),
    ("R", "", "SELECT x FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(1.0),(NULL),(CAST('-inf' AS DOUBLE))) t(x) ORDER BY x DESC"),
    ("R", "", "SELECT x FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(NULL),(1.0)) t(x) ORDER BY x ASC NULLS FIRST"),
    ("R", "", "SELECT x FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(NULL),(1.0)) t(x) ORDER BY x ASC NULLS LAST"),
    ("IR", "", "SELECT rank() OVER (ORDER BY x), x FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('inf' AS DOUBLE)),(1.0)) t(x) ORDER BY x"),
    ("R", "", "SELECT x FROM (VALUES (CAST('nan' AS DOUBLE)),(2.0),(1.0)) t(x) ORDER BY x LIMIT 2"),
])

corpus("float_special_agg", "NaN/inf in aggregates and grouping (reference test/sql/types/float/nan_aggregate.test)")([
    ("RR", "", "SELECT max(x), min(x) FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(1.0)) t(x)"),
    ("R", "", "SELECT sum(x) FROM (VALUES (CAST('inf' AS DOUBLE)),(CAST('-inf' AS DOUBLE))) t(x)"),
    ("R", "", "SELECT sum(x) FROM (VALUES (CAST('inf' AS DOUBLE)),(1.0)) t(x)"),
    ("R", "", "SELECT avg(x) FROM (VALUES (CAST('nan' AS DOUBLE)),(1.0)) t(x)"),
    ("I", "", "SELECT count(DISTINCT x) FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(1.0)) t(x)"),
    ("RI", "", "SELECT x, count(*) FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(1.0)) t(x) GROUP BY x ORDER BY x"),
    ("R", "rowsort", "SELECT DISTINCT x FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST('inf' AS DOUBLE))) t(x)"),
])

# Shared scalar/aggregate tranche 4 — thin-coverage names from the
# round-4 dual-engine probe (each agreed verbatim in both engines).
corpus("fn_shared_misc4", "Shared-name functions, 4th tranche (probe-verified)")([
    ("I", "", "SELECT dayofyear(DATE '2024-03-01')"),
    ("I", "", "SELECT dayofyear(o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("I", "", "SELECT count_if(o_totalprice > 100000) FROM orders"),
    ("I", "rowsort", "SELECT count_if(l_quantity > 25) FROM lineitem GROUP BY l_returnflag"),
    ("T", "", "SELECT CAST(make_timestamp(2024, 2, 29, 13, 30, 12.5) AS STRING)"),
    ("R", "", "SELECT round(cot(1.0), 6)"),
    ("I", "", "SELECT bit_length(r_name) FROM region ORDER BY r_regionkey"),
    ("II", "", "SELECT ifnull(NULL, 9), ifnull(r_regionkey, 9) FROM region ORDER BY r_regionkey LIMIT 1"),
    ("R", "", "SELECT round(covar_samp(l_quantity, l_linenumber), 6) FROM lineitem"),
    ("R", "", "SELECT round(covar_pop(l_quantity, l_linenumber), 6) FROM lineitem"),
    ("R", "", "SELECT round(stddev(l_quantity) FILTER (WHERE l_quantity > 25), 6) FROM lineitem"),
    ("I", "", "SELECT mode(l_linenumber) FROM lineitem"),
    ("I", "", "SELECT weekofyear(DATE '2024-01-04')"),
    ("I", "", "SELECT factorial(6) + bit_count(CAST(255 AS BIGINT))"),
])



# Per-table boolean/selective aggregate family (reference
# test/sql/aggregate/aggregates/test_{bool_and,count_if,any_value}.test)
# — count_if / bool_and / bool_or probed shared-name this round; one
# file per fixture table with a table-appropriate predicate and group.
_BOOLAGG = {
    "region":    ("r_regionkey >= 2",        "r_name",        "r_regionkey"),
    "nation":    ("n_nationkey % 2 = 0",     "n_regionkey",   "n_nationkey"),
    "customer":  ("c_acctbal > 0",           "c_mktsegment",  "c_custkey"),
    "supplier":  ("s_acctbal > 0",           "s_nationkey",   "s_suppkey"),
    "part":      ("p_size > 25",             "p_brand",       "p_partkey"),
    "orders":    ("o_totalprice > 100000",   "o_orderstatus", "o_orderkey"),
    "lineitem":  ("l_quantity > 25",         "l_returnflag",  "l_orderkey"),
    "events":    ("value > 0",               "event_type",    "event_id"),
    "documents": ("n_chars > 200",           "lang",          "doc_id"),
    "embeddings": ("label >= 5",             "label % 3",     "vec_id"),
}
for _t, (_pred, _grp, _key) in _BOOLAGG.items():
    corpus(f"boolagg_file_{_t}", f"count_if/bool_and/bool_or over {_t} (reference test/sql/aggregate)")([
        ("I", "", f"SELECT count_if({_pred}) FROM {_t}"),
        ("II", "", f"SELECT count_if({_pred}), count(*) FROM {_t}"),
        ("I", "rowsort", f"SELECT count_if({_pred}) FROM {_t} GROUP BY {_grp}"),
        ("II", "rowsort", f"SELECT count_if({_pred}), count(*) FROM {_t} GROUP BY {_grp}"),
        ("I", "", f"SELECT bool_and({_pred}) FROM {_t}"),
        ("I", "", f"SELECT bool_or({_pred}) FROM {_t}"),
        ("II", "rowsort", f"SELECT bool_and({_pred}), bool_or({_pred}) FROM {_t} GROUP BY {_grp}"),
        ("I", "", f"SELECT count_if(NOT ({_pred})) + count_if({_pred}) = count({_key}) FROM {_t} WHERE {_key} IS NOT NULL"),
    ])



# Per-table covariance/correlation pair family (reference
# test/sql/aggregate/aggregates/test_covar.test, test_corr.test) —
# covar_samp/covar_pop had single-file coverage before this tranche.
_COVAR_PAIRS = {
    "nation":    ("CAST(n_nationkey AS DOUBLE)", "CAST(n_regionkey AS DOUBLE)", "n_regionkey"),
    "embeddings": ("CAST(label AS DOUBLE)", "CAST(vec_id % 13 AS DOUBLE)", "label % 3"),
    "customer":  ("c_acctbal",       "CAST(c_nationkey AS DOUBLE)", "c_mktsegment"),
    # supplier excluded: 10 rows at sf0.001 put a grouped covar_pop
    # exactly on a .3f rounding boundary (-4441.6625) where the two
    # engines' summation orders disagree in the last ulp.
    "part":      ("p_retailprice",   "CAST(p_size AS DOUBLE)",      "p_brand"),
    "orders":    ("o_totalprice",    "CAST(o_orderkey % 97 AS DOUBLE)", "o_orderstatus"),
    "lineitem":  ("l_extendedprice", "l_quantity",                  "l_returnflag"),
    "events":    ("value",           "CAST(user_id % 101 AS DOUBLE)", "event_type"),
    "documents": ("CAST(n_chars AS DOUBLE)", "CAST(doc_id % 89 AS DOUBLE)", "lang"),
}
for _t, (_x, _y, _grp) in _COVAR_PAIRS.items():
    corpus(f"covar_file_{_t}", f"covar/corr pair over {_t} (reference test/sql/aggregate)")([
        ("R", "", f"SELECT covar_samp({_x}, {_y}) FROM {_t}"),
        ("R", "", f"SELECT covar_pop({_x}, {_y}) FROM {_t}"),
        ("R", "", f"SELECT corr({_x}, {_y}) FROM {_t}"),
        ("R", "rowsort", f"SELECT covar_pop({_x}, {_y}) FROM {_t} GROUP BY {_grp}"),
        ("R", "", f"SELECT covar_samp({_x}, {_y}) FILTER (WHERE {_y} IS NOT NULL) FROM {_t}"),
    ])



# Per-table DISTINCT-aggregate matrix (reference
# test/sql/aggregate/distinct/ — one file per table: single/multiple
# DISTINCT aggregates, DISTINCT over expressions, grouped DISTINCT).
_DISTINCT_COLS = {
    "region":    ("r_name",        "r_regionkey % 2",  "r_regionkey"),
    "nation":    ("n_name",        "n_regionkey",      "n_nationkey"),
    "customer":  ("c_mktsegment",  "c_nationkey",      "c_custkey"),
    "supplier":  ("s_name",        "s_nationkey",      "s_suppkey"),
    "part":      ("p_brand",       "p_size % 10",      "p_partkey"),
    "orders":    ("o_orderstatus", "o_custkey % 50",   "o_orderkey"),
    "lineitem":  ("l_returnflag",  "l_linenumber",     "l_orderkey"),
    "events":    ("event_type",    "user_id % 25",     "event_id"),
    "documents": ("lang",          "source",           "doc_id"),
    "embeddings": ("label",        "label % 4",        "vec_id"),
}
for _t, (_c1, _c2, _key) in _DISTINCT_COLS.items():
    corpus(f"cntdist_file_{_t}", f"DISTINCT aggregates over {_t} (reference test/sql/aggregate/distinct)")([
        ("I", "", f"SELECT count(DISTINCT {_c1}) FROM {_t}"),
        ("II", "", f"SELECT count(DISTINCT {_c1}), count(DISTINCT {_c2}) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT {_c2}) FROM {_t} WHERE {_key} % 3 = 0"),
        ("II", "rowsort", f"SELECT count(DISTINCT {_c2}), count(*) FROM {_t} GROUP BY {_c1}"),
        ("I", "", f"SELECT count(DISTINCT CAST({_key} % 5 AS INT)) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT {_c1} IS NOT NULL) FROM {_t}"),
    ])



# Per-table ROLLUP/CUBE/GROUPING SETS matrix (reference
# test/sql/aggregate/group/test_{rollup,cube,groupingsets}.test —
# one file per table over two table-appropriate dimensions).
_GSETS_DIMS = {
    "region":    ("r_name",          "r_regionkey % 2"),
    "embeddings": ("label % 4",      "label % 2"),
    "nation":    ("n_regionkey",     "n_nationkey % 3"),
    "customer":  ("c_mktsegment",    "c_nationkey % 5"),
    "supplier":  ("s_nationkey % 5", "s_suppkey % 2"),
    "part":      ("p_brand",         "p_size % 5"),
    "orders":    ("o_orderstatus",   "o_orderpriority"),
    "lineitem":  ("l_returnflag",    "l_linestatus"),
    "events":    ("event_type",      "user_id % 7"),
    "documents": ("lang",            "source"),
}
for _t, (_d1, _d2) in _GSETS_DIMS.items():
    corpus(f"gsets_file_{_t}", f"ROLLUP/CUBE/GROUPING SETS over {_t} (reference test/sql/aggregate/group)")([
        ("TTI", "rowsort", f"SELECT CAST({_d1} AS STRING), CAST({_d2} AS STRING), count(*) FROM {_t} GROUP BY ROLLUP({_d1}, {_d2})"),
        ("TTI", "rowsort", f"SELECT CAST({_d1} AS STRING), CAST({_d2} AS STRING), count(*) FROM {_t} GROUP BY CUBE({_d1}, {_d2})"),
        ("TTI", "rowsort", f"SELECT CAST({_d1} AS STRING), CAST({_d2} AS STRING), count(*) FROM {_t} GROUP BY GROUPING SETS(({_d1}), ({_d2}), ())"),
        ("TII", "rowsort", f"SELECT CAST({_d1} AS STRING), grouping({_d1}), count(*) FROM {_t} GROUP BY ROLLUP({_d1})"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_d1}, {_d2} FROM {_t} GROUP BY CUBE({_d1}, {_d2})) s"),
    ])



# Per-table window-frame file family (reference test/sql/window/
# test_window_range.test etc. — one file per table: running sum over
# ROWS frame, partitioned rank, lag with default, RANGE cumulative).
_WINFRAME = {
    "region":    ("r_regionkey", "r_name",        "r_regionkey"),
    "lineitem":  ("(l_orderkey * 10 + l_linenumber)", "l_returnflag", "l_linenumber"),
    "embeddings": ("vec_id",     "label % 3",     "label"),
    "nation":    ("n_nationkey", "n_regionkey",   "n_nationkey"),
    "customer":  ("c_custkey",   "c_mktsegment",  "c_nationkey"),
    "supplier":  ("s_suppkey",   "s_nationkey",   "s_suppkey"),
    "part":      ("p_partkey",   "p_brand",       "p_size"),
    "orders":    ("o_orderkey",  "o_orderstatus", "o_custkey"),
    "events":    ("event_id",    "event_type",    "user_id"),
    "documents": ("doc_id",      "lang",          "n_chars"),
}
for _t, (_key, _grp, _val) in _WINFRAME.items():
    corpus(f"winframe_file_{_t}", f"Window frames over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT {_key}, CAST(sum({_val}) OVER (ORDER BY {_key} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) FROM {_t} ORDER BY {_key} LIMIT 8"),
        ("II", "", f"SELECT {_key}, CAST(sum({_val}) OVER (ORDER BY {_key} ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS BIGINT) FROM {_t} ORDER BY {_key} LIMIT 8"),
        ("II", "", f"SELECT {_key}, rank() OVER (PARTITION BY {_grp} ORDER BY {_key}) FROM {_t} ORDER BY {_key} LIMIT 8"),
        ("II", "", f"SELECT {_key}, CAST(lag({_val}, 1, -1) OVER (ORDER BY {_key}) AS BIGINT) FROM {_t} ORDER BY {_key} LIMIT 8"),
        ("II", "", f"SELECT {_key}, CAST(count(*) OVER (ORDER BY {_key} RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) FROM {_t} ORDER BY {_key} LIMIT 8"),
    ])



# Per-unit interval arithmetic family (reference
# test/sql/types/interval/, test/sql/function/operator/
# test_date_arithmetic.test).  DATE + INTERVAL yields TIMESTAMP in
# DuckDB but DATE/TIMESTAMP by unit in Spark -> all results CAST to a
# common type (the validator enforces the remaining agreement).
_INTERVAL_UNITS = {
    "day":    ("INTERVAL 10 DAY",    "1"),
    "month":  ("INTERVAL 2 MONTH",   "2"),
    "year":   ("INTERVAL 1 YEAR",    "3"),
    "hour":   ("INTERVAL 36 HOUR",   "4"),
    "minute": ("INTERVAL 90 MINUTE", "5"),
    "second": ("INTERVAL 3661 SECOND", "6"),
}
for _u, (_iv, _mod) in _INTERVAL_UNITS.items():
    corpus(f"interval_file_{_u}", f"INTERVAL {_u} arithmetic (reference test/sql/types/interval)")([
        ("T", "", f"SELECT CAST(TIMESTAMP '2024-02-28 23:30:00' + {_iv} AS STRING)"),
        ("T", "", f"SELECT CAST(TIMESTAMP '2024-03-01 00:15:30' - {_iv} AS STRING)"),
        ("T", "", f"SELECT CAST(CAST(o_orderdate AS TIMESTAMP) + {_iv} AS STRING) FROM orders ORDER BY o_orderkey LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM orders WHERE CAST(o_orderdate AS TIMESTAMP) + {_iv} > TIMESTAMP '1997-06-01 00:00:00'"),
        ("I", "", f"SELECT count(*) FROM orders WHERE o_orderkey % 7 = {_mod} AND CAST(o_orderdate AS TIMESTAMP) - {_iv} < CAST(o_orderdate AS TIMESTAMP)"),
    ])



# Per-table HAVING matrix (reference test/sql/aggregate/having/ — one
# file per table: HAVING on count/sum/avg, HAVING with expression not
# in SELECT, HAVING + WHERE composition).
_HAVING = {
    "nation":    ("n_regionkey",   "n_nationkey",  "2"),
    "customer":  ("c_mktsegment",  "c_acctbal",    "50"),
    "supplier":  ("s_nationkey",   "s_acctbal",    "1"),
    "part":      ("p_brand",       "p_size",       "5"),
    "orders":    ("o_orderstatus", "o_totalprice", "100"),
    "lineitem":  ("l_returnflag",  "l_quantity",   "500"),
    "events":    ("event_type",    "value",        "20"),
    "documents": ("lang",          "n_chars",      "10"),
}
for _t, (_grp, _val, _n) in _HAVING.items():
    corpus(f"having_file_{_t}", f"HAVING matrix over {_t} (reference test/sql/aggregate/having)")([
        ("TI", "rowsort", f"SELECT CAST({_grp} AS STRING), count(*) FROM {_t} GROUP BY {_grp} HAVING count(*) >= {_n}"),
        ("TI", "rowsort", f"SELECT CAST({_grp} AS STRING), count(*) FROM {_t} GROUP BY {_grp} HAVING CAST(sum({_val}) AS DOUBLE) > 0"),
        ("TR", "rowsort", f"SELECT CAST({_grp} AS STRING), round(avg({_val}), 3) FROM {_t} GROUP BY {_grp} HAVING avg({_val}) > (SELECT avg({_val}) FROM {_t}) * 0.5"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} FROM {_t} GROUP BY {_grp} HAVING min({_val}) < max({_val})) s"),
        ("TI", "rowsort", f"SELECT CAST({_grp} AS STRING), count(*) FROM {_t} WHERE {_val} IS NOT NULL GROUP BY {_grp} HAVING count(*) > {_n} AND count(*) < 100000"),
    ])



# Per-table IN/EXISTS subquery matrix (reference test/sql/subquery/ —
# one file per table, self-contained: IN, NOT IN over a null-free key,
# EXISTS, NOT EXISTS, and the scalar-subquery comparison).
_SUBQ = {
    "nation":    ("n_nationkey",  "n_regionkey = 2"),
    "customer":  ("c_custkey",    "c_acctbal < 0"),
    "supplier":  ("s_suppkey",    "s_acctbal > 5000"),
    "part":      ("p_partkey",    "p_size > 40"),
    "orders":    ("o_orderkey",   "o_orderstatus = 'F'"),
    "lineitem":  ("l_orderkey",   "l_quantity > 45"),
    "events":    ("event_id",     "value > 90"),
    "documents": ("doc_id",       "n_chars > 400"),
}
for _t, (_key, _pred) in _SUBQ.items():
    corpus(f"insubq_file_{_t}", f"IN/EXISTS subqueries over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_key} IN (SELECT {_key} FROM {_t} WHERE {_pred})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_key} NOT IN (SELECT {_key} FROM {_t} WHERE {_pred})"),
        ("I", "", f"SELECT count(*) FROM {_t} a WHERE EXISTS (SELECT 1 FROM {_t} b WHERE b.{_key} = a.{_key} AND {_pred.replace('(', '(').replace(_pred.split()[0], 'b.' + _pred.split()[0], 1)})"),
        ("I", "", f"SELECT count(*) FROM {_t} a WHERE NOT EXISTS (SELECT 1 FROM {_t} b WHERE b.{_key} = a.{_key} AND b.{_key} % 2 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_key} > (SELECT min({_key}) FROM {_t})"),
        # floor() before the BIGINT cast: CAST(DOUBLE AS BIGINT) rounds
        # in DuckDB and truncates in Spark (the header's documented
        # divergence).
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_key} <= (SELECT CAST(floor(avg({_key})) AS BIGINT) FROM {_t})"),
    ])



# Per-table percentile/median file family (reference
# test/sql/aggregate/aggregates/test_{median,quantile}.test — extends
# the 4-file percentile_file_p* tranche to every numeric table).
_PCTL = {
    "nation":    ("CAST(n_nationkey AS DOUBLE)", "n_regionkey"),
    "embeddings": ("CAST(label AS DOUBLE)",      "label % 3"),
    "customer":  ("c_acctbal",       "c_mktsegment"),
    "supplier":  ("s_acctbal",       "s_nationkey % 5"),
    "part":      ("p_retailprice",   "p_brand"),
    "orders":    ("o_totalprice",    "o_orderstatus"),
    "lineitem":  ("l_extendedprice", "l_returnflag"),
    "events":    ("value",           "event_type"),
    "documents": ("CAST(n_chars AS DOUBLE)", "lang"),
}
for _t, (_v, _grp) in _PCTL.items():
    corpus(f"pctl_file_{_t}", f"percentile/median over {_t} (reference test/sql/aggregate)")([
        ("R", "", f"SELECT round(median({_v}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(percentile_cont(0.25) WITHIN GROUP (ORDER BY {_v}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(percentile_cont(0.9) WITHIN GROUP (ORDER BY {_v}), 3) FROM {_t}"),
        ("R", "rowsort", f"SELECT round(median({_v}), 3) FROM {_t} GROUP BY {_grp}"),
        ("R", "", f"SELECT round(percentile_cont(0.5) WITHIN GROUP (ORDER BY {_v}), 3) - round(median({_v}), 3) FROM {_t}"),
    ])



# Per-pair natural-join file family (reference test/sql/join/inner/,
# joins each fact/dim to its natural partner on the real FK).
_JOIN_PAIRS = {
    "nation_region":     ("nation a",   "region b",   "a.n_regionkey = b.r_regionkey",  "b.r_name"),
    "customer_nation":   ("customer a", "nation b",   "a.c_nationkey = b.n_nationkey",  "b.n_name"),
    "supplier_nation":   ("supplier a", "nation b",   "a.s_nationkey = b.n_nationkey",  "b.n_name"),
    "orders_customer":   ("orders a",   "customer b", "a.o_custkey = b.c_custkey",      "b.c_mktsegment"),
    "lineitem_orders":   ("lineitem a", "orders b",   "a.l_orderkey = b.o_orderkey",    "b.o_orderstatus"),
    "lineitem_part":     ("lineitem a", "part b",     "a.l_partkey = b.p_partkey",      "b.p_brand"),
    "events_customer":   ("events a",   "customer b", "a.user_id = b.c_custkey",        "b.c_mktsegment"),
    # Added in round-4 part 6: the one natural FK pair the map was
    # missing (lineitem.l_suppkey -> supplier.s_suppkey); every
    # per-pair family below picks it up automatically.
    "lineitem_supplier": ("lineitem a", "supplier b", "a.l_suppkey = b.s_suppkey",      "b.s_name"),
}
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    corpus(f"joinpair_file_{_n}", f"Natural-FK join pair {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on}"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} WHERE {_on.split(' = ')[1]} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE EXISTS (SELECT 1 FROM {_r} WHERE {_on})"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on})"),
        ("TI", "rowsort", f"SELECT {_grp}, count(*) FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp}"),
    ])



# Per-table LIKE/pattern matrix (reference test/sql/function/string/
# test_like.test, like_escape.test — per-table: %/_ wildcards, NOT
# LIKE, ESCAPE, patterns inside CASE and aggregates).
_LIKECOLS = {
    "region":    ("r_name",        "r_regionkey"),
    "nation":    ("n_name",        "n_nationkey"),
    "customer":  ("c_name",        "c_custkey"),
    "supplier":  ("s_name",        "s_suppkey"),
    "part":      ("p_type",        "p_partkey"),
    "orders":    ("o_orderpriority", "o_orderkey"),
    "lineitem":  ("l_returnflag",  "l_orderkey"),
    "events":    ("event_type",    "event_id"),
    "documents": ("source",        "doc_id"),
}
for _t, (_c, _key) in _LIKECOLS.items():
    corpus(f"like_file_{_t}", f"LIKE pattern matrix over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_c} LIKE '%a%'"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_c} NOT LIKE '%e%'"),
        # '!' escape char: a literal backslash inside a quoted pattern
        # parses differently across the engines (probed); '!' is neutral
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_c} LIKE '_!_%' ESCAPE '!'"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE upper({_c}) LIKE '%A%' OR lower({_c}) LIKE '%o%'"),
        ("II", "", f"SELECT count_if({_c} LIKE '%r%'), count_if({_c} LIKE 'X%') FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN {_c} LIKE '%_%' THEN {_key} % 2 = 0 ELSE FALSE END"),
    ])


# Shared per-table column map for the round-4 gap-fill families below:
# (unique key expr, string col, numeric col, group expr, predicate).
# The key expr is unique per row (lineitem composes its compound key),
# making min_by/max_by and ORDER BY ... LIMIT deterministic without ties.
_TCOLS = {
    "region":    ("r_regionkey", "r_name",          "r_regionkey",   "r_regionkey % 2", "r_regionkey < 3"),
    "nation":    ("n_nationkey", "n_name",          "n_nationkey",   "n_regionkey",     "n_nationkey < 12"),
    "customer":  ("c_custkey",   "c_name",          "c_acctbal",     "c_mktsegment",    "c_acctbal > 0"),
    "supplier":  ("s_suppkey",   "s_name",          "s_acctbal",     "s_nationkey % 5", "s_acctbal > 0"),
    "part":      ("p_partkey",   "p_name",          "p_retailprice", "p_brand",         "p_size > 25"),
    "orders":    ("o_orderkey",  "o_orderpriority", "o_totalprice",  "o_orderstatus",   "o_totalprice > 100000"),
    "lineitem":  ("l_orderkey * 10 + l_linenumber", "l_returnflag", "l_extendedprice", "l_linestatus", "l_quantity > 25"),
    "events":    ("event_id",    "event_type",      "value",         "event_type",      "value > 50"),
    "documents": ("doc_id",      "source",          "n_chars",       "lang",            "n_chars > 400"),
    "embeddings": ("vec_id",     "CAST(label AS STRING)", "label",   "label % 3",       "label % 2 = 0"),
}

# Per-table min_by/max_by selector family (reference
# test/sql/aggregate/aggregates/test_arg_min_max.test — the single
# agg_selector_family file extended to every table; the unique key as
# the ordering argument keeps every selector deterministic).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"selector_file_{_t}", f"min_by/max_by selectors over {_t} (reference test/sql/aggregate arg_min/arg_max)")([
        ("TT", "", f"SELECT min_by({_s}, {_k}), max_by({_s}, {_k}) FROM {_t}"),
        ("T", "", f"SELECT min_by(CAST({_k} AS STRING), {_k}) FROM {_t}"),
        ("T", "", f"SELECT max_by({_s}, {_k}) FROM {_t} WHERE {_p}"),
        ("TT", "rowsort", f"SELECT min_by({_s}, {_k}), max_by({_s}, {_k}) FROM {_t} GROUP BY {_g}"),
        ("T", "", f"SELECT any_value({_s}) FROM {_t} WHERE {_k} = (SELECT min({_k}) FROM {_t})"),
    ])

# Per-table dispersion family (reference test/sql/aggregate/aggregates/
# test_stddev.test — stddev/var pop+samp over every numeric column,
# rounded so both engines' float merge orders agree at fixture scale).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"spread_file_{_t}", f"stddev/variance over {_t} (reference test/sql/aggregate test_stddev)")([
        ("R", "", f"SELECT round(stddev_samp({_v}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(stddev_pop({_v}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(var_samp({_v}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(var_pop({_v}), 3) FROM {_t}"),
        ("R", "rowsort", f"SELECT round(stddev_pop({_v}), 3) FROM {_t} GROUP BY {_g}"),
        ("R", "", f"SELECT round(stddev_samp({_v}), 3) FROM {_t} WHERE {_p}"),
    ])

# Per-table DISTINCT-forms family (reference test/sql/aggregate/distinct
# — the single distinct_forms file extended to every table).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"distinctf_file_{_t}", f"DISTINCT forms over {_t} (reference test/sql/aggregate/distinct)")([
        ("I", "", f"SELECT count(DISTINCT {_s}) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM (SELECT DISTINCT {_g} AS g, {_s} AS s FROM {_t}) x"),
        ("I", "", f"SELECT count(DISTINCT {_k}) - count(*) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT {_s}) FILTER (WHERE {_p}) FROM {_t}"),
        ("II", "rowsort", f"SELECT count(DISTINCT {_s}), count(*) FROM {_t} GROUP BY {_g}"),
    ])

# Per-table ORDER BY + LIMIT/OFFSET top-n family (reference
# test/sql/topn — deterministic through the unique key tiebreak).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"topn_file_{_t}", f"top-n ORDER BY/LIMIT over {_t} (reference test/sql/topn)")([
        ("T", "", f"SELECT CAST({_k} AS STRING) AS ks FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("T", "", f"SELECT CAST({_k} AS STRING) AS ks FROM {_t} ORDER BY {_k} DESC LIMIT 3"),
        ("T", "", f"SELECT CAST({_k} AS STRING) AS ks FROM {_t} ORDER BY {_k} LIMIT 4 OFFSET 3"),
        ("TT", "", f"SELECT {_s} AS sv, CAST({_k} AS STRING) AS ks FROM {_t} ORDER BY {_v} DESC, {_k} LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_v} DESC, {_k} LIMIT 10) x"),
    ])

# Per-table self set-op family (reference test/sql/setops — INTERSECT/
# EXCEPT/UNION between two predicate slices of the same table).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _p2 = f"({_k}) % 2 = 0"
    corpus(f"setopself_file_{_t}", f"self set-ops over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} WHERE {_p} INTERSECT SELECT {_k} AS kk FROM {_t} WHERE {_p2}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} WHERE {_p} EXCEPT SELECT {_k} AS kk FROM {_t} WHERE {_p2}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} WHERE {_p} UNION SELECT {_k} AS kk FROM {_t} WHERE {_p2}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} WHERE {_p} UNION ALL SELECT {_k} AS kk FROM {_t} WHERE {_p2}) x"),
        ("T", "rowsort", f"SELECT {_s} AS sv FROM {_t} WHERE {_p} INTERSECT SELECT {_s} AS sv FROM {_t} WHERE {_p2}"),
    ])

# Per-table CTE family (reference test/sql/cte — chained and twice-
# referenced WITH clauses over every table).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"cte_file_{_t}", f"WITH-clause shapes over {_t} (reference test/sql/cte)")([
        ("I", "", f"WITH a AS (SELECT * FROM {_t} WHERE {_p}), b AS (SELECT {_k} AS kk FROM a) SELECT count(*) FROM b"),
        ("I", "", f"WITH a AS (SELECT {_k} AS kk FROM {_t}) SELECT count(*) FROM a x JOIN a y ON x.kk = y.kk"),
        ("I", "", f"WITH a AS (SELECT {_k} AS kk FROM {_t} WHERE {_p}), b AS (SELECT kk FROM a WHERE kk % 2 = 0), c AS (SELECT kk FROM b WHERE kk % 3 = 0) SELECT count(*) FROM c"),
        ("I", "", f"WITH a AS (SELECT {_k} AS kk FROM {_t} WHERE {_p}) SELECT count(*) FROM (SELECT kk FROM a UNION ALL SELECT kk FROM a) x"),
        ("T", "", f"WITH a AS (SELECT {_s} AS sv, {_k} AS kk FROM {_t}) SELECT sv FROM a ORDER BY kk LIMIT 3"),
    ])


# Per-pair RIGHT/FULL OUTER family (reference test/sql/join/right,
# /full_outer — the joinpair family covered inner/left/semi/anti only).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk = _on.split(" = ")[0]
    _rk = _on.split(" = ")[1]
    corpus(f"outerpair_file_{_n}", f"RIGHT/FULL OUTER join pair {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} RIGHT JOIN {_r} ON {_on}"),
        ("I", "", f"SELECT count(*) FROM {_l} FULL JOIN {_r} ON {_on}"),
        ("I", "", f"SELECT count(*) FROM {_l} RIGHT JOIN {_r} ON {_on} WHERE {_lk} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_l} FULL JOIN {_r} ON {_on} WHERE {_lk} IS NULL OR {_rk} IS NULL"),
        ("I", "", f"SELECT count(coalesce({_lk}, {_rk})) FROM {_l} FULL JOIN {_r} ON {_on}"),
    ])

# Per-table arithmetic/rounding family (reference test/sql/function/
# numeric — round/floor/ceil/abs/mod over every numeric column; floor
# before BIGINT casts per the header's rounding-divergence note).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"arith_file_{_t}", f"arithmetic/rounding over {_t} (reference test/sql/function/numeric)")([
        ("R", "", f"SELECT round(sum(round({_v}, 1)), 1) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(CAST(floor({_v}) AS BIGINT)) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(CAST(ceil({_v}) AS BIGINT)) AS BIGINT) FROM {_t}"),
        ("R", "", f"SELECT round(avg(abs({_v})), 3) FROM {_t}"),
        ("I", "rowsort", f"SELECT CAST(floor({_v}) AS BIGINT) % 7 FROM {_t} GROUP BY 1"),
        ("R", "", f"SELECT round(max({_v}) - min({_v}), 3) FROM {_t}"),
    ])

# Per-table GROUP BY expression/ordinal family (reference
# test/sql/aggregate/group — grouping on computed expressions, ordinal
# references, and expression+HAVING combinations).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"gbexpr_file_{_t}", f"GROUP BY expressions over {_t} (reference test/sql/aggregate/group)")([
        ("II", "rowsort", f"SELECT ({_k}) % 5 AS b, count(*) FROM {_t} GROUP BY ({_k}) % 5"),
        ("II", "rowsort", f"SELECT ({_k}) % 4 AS b, count(*) FROM {_t} GROUP BY 1"),
        ("TI", "rowsort", f"SELECT substr({_s}, 1, 1) AS c, count(*) FROM {_t} GROUP BY substr({_s}, 1, 1)"),
        ("II", "rowsort", f"SELECT ({_k}) % 3 AS b, count(*) FROM {_t} GROUP BY ({_k}) % 3 HAVING count(*) > 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 6 AS b, length({_s}) AS ln FROM {_t} GROUP BY ({_k}) % 6, length({_s})) x"),
    ])

# Per-table partitioned window-aggregate family (reference
# test/sql/window — whole-partition aggregates + counts, complementing
# the winframe_file ROWS-frame family which orders globally).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winagg_file_{_t}", f"partitioned window aggregates over {_t} (reference test/sql/window)")([
        ("TR", "", f"SELECT CAST({_k} AS STRING) AS ks, round(avg({_v}) OVER (PARTITION BY {_g}), 3) AS pavg FROM {_t} ORDER BY {_k} LIMIT 8"),
        ("TI", "", f"SELECT CAST({_k} AS STRING) AS ks, count(*) OVER (PARTITION BY {_g}) AS pc FROM {_t} ORDER BY {_k} LIMIT 8"),
        ("TR", "", f"SELECT CAST({_k} AS STRING) AS ks, round(max({_v}) OVER (PARTITION BY {_g}) - {_v}, 3) AS gap FROM {_t} ORDER BY {_k} LIMIT 8"),
        ("TI", "", f"SELECT CAST({_k} AS STRING) AS ks, CAST(rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS BIGINT) AS rk FROM {_t} ORDER BY {_k} LIMIT 8"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS g, round(sum({_v}) OVER (PARTITION BY {_g}), 2) AS ps FROM {_t}) x WHERE ps IS NOT NULL"),
    ])


# ---------------------------------------------------------------------------
# Round-4 continuation, part 5: eight more probe-verified families.
# Candidates were probed in BOTH engines first (names AND result shape);
# known divergences excluded with notes:
#   - dayname/monthname: DuckDB returns full names, Spark 3-letter
#     abbreviations -> substr(x, 1, 3) is the shared spelling.
#   - dayofweek: DuckDB Sunday=0..6, Spark Sunday=1..7 -> excluded.
#   - xor(a,b): scalar in DuckDB, missing in Spark (Spark's ^ is XOR but
#     DuckDB's ^ is power) -> only & and | are shared infix bit ops.
#   - (a,b) IN (subquery): DuckDB rejects multi-column IN -> excluded.
#   - sinh/cosh/tanh, initcap, regexp_like/count, format, to_hex,
#     sequence/array literals: missing on one side -> excluded.

# Per-table row-value (tuple) comparison family (reference
# test/sql/filter, parser row-value tests — both engines implement
# SQL-standard tuple comparison with identical lexicographic+NULL
# semantics; probed above).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"rowvalue_file_{_t}", f"row-value tuple comparisons over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 7, ({_k}) % 3) > (3, 1)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 7, ({_k}) % 3) <= (2, 2)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (substr({_s}, 1, 1), ({_k}) % 5) > ('C', 2)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 7, ({_k}) % 3) = (1, 1)"),
        # tuple '=' must equal the expanded conjunction
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ((({_k}) % 7, ({_k}) % 3) = (1, 1)) <> (({_k}) % 7 = 1 AND ({_k}) % 3 = 1)"),
    ])

# Per-table GROUPING()-metadata family (reference
# test/sql/aggregate/group/grouping_sets — grouping() bits across
# ROLLUP/CUBE/GROUPING SETS; rowsort because default NULL ordering
# differs between the engines).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"grouping_file_{_t}", f"grouping() metadata over {_t} (reference test/sql/aggregate/group)")([
        ("II", "rowsort", f"SELECT grouping({_g}), count(*) FROM {_t} GROUP BY ROLLUP({_g})"),
        ("III", "rowsort", f"SELECT grouping({_g}), grouping(substr({_s}, 1, 1)), count(*) FROM {_t} GROUP BY CUBE({_g}, substr({_s}, 1, 1))"),
        ("II", "rowsort", f"SELECT grouping({_g}) + grouping(substr({_s}, 1, 1)), count(*) FROM {_t} GROUP BY GROUPING SETS (({_g}), (substr({_s}, 1, 1)), ())"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS g FROM {_t} GROUP BY ROLLUP({_g})) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT grouping({_g}) AS gb FROM {_t} GROUP BY CUBE({_g})) x WHERE gb = 1"),
    ])

# Per-table regexp family (reference test/sql/function/string/regex —
# regexp_extract group capture shares name/order/RE2 subset.  Validator
# finding: DuckDB regexp_replace is FIRST-match-only (global needs a 'g'
# flag Spark does not accept) while Spark replaces ALL matches, so every
# replace pattern below is anchored to match at most once.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"regexp_file_{_t}", f"regexp extract/replace over {_t} (reference test/sql/function/string/regex)")([
        ("T", "", f"SELECT regexp_extract({_s}, '([A-Za-z]+)', 1) AS x FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("T", "", f"SELECT regexp_replace({_s}, '^[A-Za-z]+', 'X') AS x FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "rowsort", f"SELECT length(regexp_replace({_s}, '[0-9]+$', '')) FROM {_t} WHERE {_p}"),
        ("T", "", f"SELECT regexp_extract(CAST({_k} AS STRING), '([0-9])', 1) AS d FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE regexp_replace({_s}, '^.', '') <> {_s}"),
    ])

# Per-table string tranche 3 (reference test/sql/function/string —
# translate/levenshtein/chr/md5/hex, all probe-verified shared).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"strfn3_file_{_t}", f"translate/levenshtein/chr/md5/hex over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT translate({_s}, 'AEIOU', 'aeiou') FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "rowsort", f"SELECT levenshtein(substr({_s}, 1, 8), 'STANDARD') FROM {_t} WHERE {_p}"),
        ("T", "", f"SELECT chr(65 + CAST(({_k}) % 26 AS INT)) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("T", "", f"SELECT substr(md5({_s}), 1, 8) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT hex(({_k}) % 4096) FROM {_t} ORDER BY {_k} LIMIT 6"),
    ])

# Per-table conditional-function family (reference test/sql/conjunction,
# test/sql/function/generic — if/ifnull/nullif/try_cast chains).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"condfn_file_{_t}", f"if/ifnull/nullif/try_cast over {_t} (reference test/sql/conjunction)")([
        ("T", "", f"SELECT if({_p}, 'yes', 'no') FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("T", "", f"SELECT ifnull(nullif({_s}, {_s}), 'was-null') FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT count(try_cast({_s} AS INT)) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE nullif(({_k}) % 3, 0) IS NULL"),
        ("T", "", f"SELECT coalesce(try_cast('x' AS STRING), {_s}, 'z') FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT sum(if(({_k}) % 2 = 0, 1, 0)) FROM {_t}"),
    ])

# Per-table math tranche 2 (reference test/sql/function/numeric —
# atan2/cbrt/log2/log10/degrees/radians/factorial/pi, probe-verified).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"mathfn2_file_{_t}", f"atan2/cbrt/logs/trig-units over {_t} (reference test/sql/function/numeric)")([
        ("R", "", f"SELECT round(atan2(1.0, CAST(({_k}) % 9 + 1 AS DOUBLE)), 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(cbrt(abs({_v}) + 1.0), 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(log2(CAST(({_k}) % 15 + 2 AS DOUBLE)), 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(log10(abs({_v}) + 10.0), 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(degrees(radians(CAST(({_k}) % 360 AS DOUBLE))), 3) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT CAST(factorial(CAST(({_k}) % 6 AS INT)) AS BIGINT) FROM {_t} ORDER BY {_k} LIMIT 6"),
    ])

# Per-table bit ops family (reference test/sql/function/bit — shared
# infix & and |, bit_and/bit_or/bit_xor aggregates; ^ and xor() are NOT
# shared, see the header note).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"bitops_file_{_t}", f"bit ops and bit aggregates over {_t} (reference test/sql/function/bit)")([
        ("I", "", f"SELECT ({_k}) & 5 FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("I", "", f"SELECT ({_k}) | 9 FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("I", "", f"SELECT bit_and(({_k}) % 16 + 16) FROM {_t}"),
        ("I", "", f"SELECT bit_or(({_k}) % 8) FROM {_t}"),
        ("I", "", f"SELECT bit_xor(({_k}) % 32) FROM {_t}"),
        ("II", "rowsort", f"SELECT {_g}, bit_xor(({_k}) % 64) FROM {_t} GROUP BY {_g}" if _t in ("region", "nation", "supplier", "embeddings") else f"SELECT count(*), bit_xor(({_k}) % 64) FROM {_t}"),
    ])

# Per-source date tranche 2 (reference test/sql/function/date —
# quarter/weekofyear/last_day/datepart + the substr(3) spelling that
# reconciles full vs abbreviated day/month names).
_DATE_SRC = {
    "orders": ("o_orderdate", "o_orderkey"),
    "lineitem": ("l_shipdate", "l_orderkey * 10 + l_linenumber"),
    "events": ("CAST(ts AS DATE)", "event_id"),
}
for _t, (_d, _dk) in _DATE_SRC.items():
    corpus(f"datefn2_file_{_t}", f"date tranche 2 over {_t} (reference test/sql/function/date)")([
        ("I", "", f"SELECT quarter({_d}) FROM {_t} ORDER BY {_dk} LIMIT 6"),
        ("I", "", f"SELECT weekofyear({_d}) FROM {_t} ORDER BY {_dk} LIMIT 6"),
        ("T", "", f"SELECT CAST(last_day({_d}) AS STRING) FROM {_t} ORDER BY {_dk} LIMIT 4"),
        ("T", "", f"SELECT substr(dayname({_d}), 1, 3) FROM {_t} ORDER BY {_dk} LIMIT 6"),
        ("T", "", f"SELECT substr(monthname({_d}), 1, 3) FROM {_t} ORDER BY {_dk} LIMIT 6"),
        ("II", "", f"SELECT CAST(datepart('year', {_d}) AS INT), CAST(datepart('month', {_d}) AS INT) FROM {_t} ORDER BY {_dk} LIMIT 5"),
        ("II", "rowsort", f"SELECT quarter({_d}), count(*) FROM {_t} GROUP BY quarter({_d})"),
    ])

# Three-table FK join-chain family (reference test/sql/join — the
# joinpair/outerpair families covered two tables; these chain the
# natural FK paths three deep).
_CHAINS = {
    "region_nation_customer": (
        "region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN customer c ON c.c_nationkey = n.n_nationkey",
        "r.r_name", "c.c_acctbal"),
    "region_nation_supplier": (
        "region r JOIN nation n ON n.n_regionkey = r.r_regionkey JOIN supplier s ON s.s_nationkey = n.n_nationkey",
        "r.r_name", "s.s_acctbal"),
    "nation_customer_orders": (
        "nation n JOIN customer c ON c.c_nationkey = n.n_nationkey JOIN orders o ON o.o_custkey = c.c_custkey",
        "n.n_name", "o.o_totalprice"),
    "customer_orders_lineitem": (
        "customer c JOIN orders o ON o.o_custkey = c.c_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey",
        "c.c_mktsegment", "l.l_extendedprice"),
    "part_lineitem_orders": (
        "part p JOIN lineitem l ON l.l_partkey = p.p_partkey JOIN orders o ON o.o_orderkey = l.l_orderkey",
        "p.p_brand", "l.l_quantity"),
    "supplier_lineitem_orders": (
        "supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey JOIN orders o ON o.o_orderkey = l.l_orderkey",
        "s.s_name", "l.l_discount"),
}
for _n, (_from, _gcol, _mcol) in _CHAINS.items():
    corpus(f"joinchain_file_{_n}", f"3-table FK chain {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_from}"),
        ("TI", "rowsort", f"SELECT {_gcol}, count(*) FROM {_from} GROUP BY {_gcol}"),
        ("R", "", f"SELECT round(sum({_mcol}), 2) FROM {_from}"),
        ("TR", "rowsort", f"SELECT {_gcol}, round(avg({_mcol}), 3) FROM {_from} GROUP BY {_gcol}"),
        ("I", "", f"SELECT count(DISTINCT {_gcol}) FROM {_from}"),
    ])


# Per-table scalar-subquery family (reference test/sql/subquery/scalar —
# uncorrelated and correlated scalar subqueries in SELECT list and WHERE;
# EXISTS as a scalar boolean is also shared).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"scalarsubq_file_{_t}", f"scalar subqueries over {_t} (reference test/sql/subquery/scalar)")([
        ("I", "", f"SELECT (SELECT count(*) FROM {_t}) + CAST(({_k}) % 3 AS BIGINT) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT (SELECT min({_s}) FROM {_t}) FROM {_t} ORDER BY {_k} LIMIT 2"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_v} > (SELECT avg({_v}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 4 AS g, {_v} AS m FROM {_t}) o WHERE o.m >= (SELECT max(i.m) FROM (SELECT ({_k}) % 4 AS g, {_v} AS m FROM {_t}) i WHERE i.g = o.g)"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) AS kk FROM {_t}) o WHERE EXISTS (SELECT 1 FROM (SELECT ({_k}) AS kk FROM {_t} WHERE {_p}) i WHERE i.kk = o.kk)"),
    ])

# Per-table lag/lead value-window family (reference test/sql/window —
# offsets, defaults, nth_value/first_value frames; every window fully
# ordered by the unique key so both engines agree without ties).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winlag_file_{_t}", f"lag/lead/nth_value windows over {_t} (reference test/sql/window)")([
        ("T", "", f"SELECT lag({_s}, 2, 'none') OVER (ORDER BY {_k}) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("T", "", f"SELECT lead({_s}, 1, 'end') OVER (ORDER BY {_k}) FROM {_t} ORDER BY {_k} DESC LIMIT 4"),
        ("T", "", f"SELECT first_value({_s}) OVER (ORDER BY {_k} ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("T", "", f"SELECT nth_value({_s}, 2) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(percent_rank() OVER (ORDER BY {_k}), 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT lag(({_k}), 1) OVER (ORDER BY {_k}) AS pk, ({_k}) AS kk FROM {_t}) x WHERE pk IS NOT NULL AND pk >= kk"),
    ])

# Per-table self-join family (reference test/sql/join — equi self pair
# on the group key with a key inequality, plus lagged-neighbor shapes).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"selfjoin_file_{_t}", f"self joins over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM (SELECT ({_g}) AS g, ({_k}) AS kk FROM {_t}) a JOIN (SELECT ({_g}) AS g, ({_k}) AS kk FROM {_t}) b ON a.g = b.g AND a.kk < b.kk"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) AS kk FROM {_t}) a JOIN (SELECT ({_k}) AS kk FROM {_t}) b ON a.kk = b.kk"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) AS kk FROM {_t} WHERE {_p}) a LEFT JOIN (SELECT ({_k}) AS kk FROM {_t} WHERE NOT ({_p})) b ON a.kk = b.kk WHERE b.kk IS NULL"),
        ("II", "rowsort", f"SELECT a.g, count(*) FROM (SELECT ({_k}) % 4 AS g, ({_k}) AS kk FROM {_t}) a JOIN (SELECT ({_k}) % 4 AS g FROM {_t}) b ON a.g = b.g GROUP BY a.g"),
    ])

# Per-table IS [NOT] DISTINCT FROM family (reference test/sql/filter —
# the null-safe comparator is spelled identically in both engines).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"distinctfrom_file_{_t}", f"IS [NOT] DISTINCT FROM over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE nullif(({_k}) % 3, 0) IS NOT DISTINCT FROM NULL"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE nullif(({_k}) % 3, 0) IS DISTINCT FROM 1"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE nullif({_s}, {_s}) IS NOT DISTINCT FROM nullif({_s}, {_s})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 2) IS DISTINCT FROM (({_k}) % 4)"),
        ("I", "", f"SELECT sum(CASE WHEN nullif(({_k}) % 5, 2) IS DISTINCT FROM nullif(({_k}) % 5, 3) THEN 1 ELSE 0 END) FROM {_t}"),
    ])


# Per-table lateral-column-alias family (reference test/sql/binder —
# both engines resolve SELECT-list aliases in later SELECT items).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"lateralalias_file_{_t}", f"lateral column aliases over {_t} (reference test/sql/binder)")([
        ("II", "", f"SELECT ({_k}) % 9 + 1 AS x, x * 2 AS y FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("TI", "", f"SELECT substr({_s}, 1, 4) AS pre, length(pre) AS ln FROM {_t} ORDER BY {_k} LIMIT 4"),
        # integer-only lateral math: double*2/4 lands on half-ulp rounding
        # boundaries that differ between the engines (validator finding)
        ("II", "", f"SELECT CAST(({_k}) % 50 AS BIGINT) * 2 AS dbl, dbl + 3 AS plus FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 7 AS a, a + 1 AS b, b * b AS c FROM {_t}) x WHERE c > 20"),
    ])

# Per-table NOT IN + NULL 3VL family (reference test/sql/subquery —
# a NULL in the NOT IN subquery must empty the result; the NULL-free
# twin must not).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"notinnull_file_{_t}", f"NOT IN with NULLs over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 11 NOT IN (SELECT ({_k}) % 7 FROM {_t} WHERE {_p})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 11 NOT IN (SELECT nullif(({_k}) % 7, 3) FROM {_t} WHERE {_p})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 5 NOT IN (6, 7)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 5 NOT IN (6, NULL)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 3 IN (SELECT nullif(({_k}) % 3, 1) FROM {_t})"),
    ])

# Per-table implicit-coercion family (reference test/sql/cast — integer
# columns compared against double/decimal literals, mixed-type IN lists,
# string-literal arithmetic through explicit CAST).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"coercion_file_{_t}", f"implicit type coercion over {_t} (reference test/sql/cast)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 = 3.0"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 IN (1, 2.0, 3)"),
        ("I", "", f"SELECT CAST('123' AS BIGINT) + ({_k}) % 5 FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_v} > 1"),
        ("R", "", f"SELECT round(sum(({_k}) % 7 + 0.5), 1) FROM {_t}"),
        ("I", "", f"SELECT count(try_cast(CAST(({_k}) % 1000 * 999 AS STRING) AS TINYINT)) FROM {_t}"),
    ])

# Per-table ORDER BY expression family (reference test/sql/order —
# CASE keys, computed keys, alias references, mixed directions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"orderexpr_file_{_t}", f"ORDER BY expressions over {_t} (reference test/sql/order)")([
        ("T", "", f"SELECT {_s} FROM {_t} ORDER BY CASE WHEN ({_k}) % 4 = 2 THEN -1 ELSE ({_k}) END, {_k} LIMIT 5"),
        ("TI", "", f"SELECT {_s}, length({_s}) AS ln FROM {_t} ORDER BY ln DESC, {_k} LIMIT 4"),
        # the cast MUST be aliased: unaliased, Spark binds the ORDER BY's
        # base-column reference to the projected STRING output (lexicographic
        # sort) while DuckDB binds to the base column (validator finding)
        ("T", "", f"SELECT CAST(({_k}) AS STRING) AS ks FROM {_t} ORDER BY ({_k}) % 3, {_k} DESC LIMIT 6"),
        ("T", "", f"SELECT {_s} FROM {_t} ORDER BY substr({_s}, 2, 3), {_k} LIMIT 4"),
        ("I", "", f"SELECT ({_k}) % 100 FROM {_t} ORDER BY abs(({_k}) % 100 - 50) DESC, {_k} LIMIT 5"),
    ])

# Per-table HAVING-without-GROUP-BY family (reference
# test/sql/aggregate/having — global aggregates gated by HAVING, plus
# CASE over aggregates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"havingglobal_file_{_t}", f"HAVING without GROUP BY over {_t} (reference test/sql/aggregate/having)")([
        ("I", "", f"SELECT CAST(sum(({_k}) % 5) AS BIGINT) FROM {_t} HAVING count(*) > 3"),
        ("I", "", f"SELECT count(*) FROM {_t} HAVING count(*) < 2"),
        ("T", "", f"SELECT CASE WHEN count(*) > 5 THEN 'many' ELSE 'few' END FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} HAVING min({_v}) IS NOT NULL"),
        ("R", "", f"SELECT round(avg({_v}), 3) FROM {_t} HAVING avg({_v}) > 0"),
    ])


# Per-FK-pair correlated-subquery family (reference test/sql/subquery —
# correlated scalar counts/max and NOT EXISTS with extra predicates over
# the natural FK paths; complements the per-table subquery families).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk = _on.split(" = ")[0]
    corpus(f"corrpair_file_{_n}", f"correlated subqueries over pair {_n} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_l} WHERE (SELECT count(*) FROM {_r} WHERE {_on}) = 1"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE (SELECT count(*) FROM {_r} WHERE {_on}) = 0"),
        ("I", "", f"SELECT count(*) FROM {_r} WHERE (SELECT count(*) FROM {_l} WHERE {_on}) > 1"),
        ("I", "", f"SELECT CAST(sum(cnt) AS BIGINT) FROM (SELECT (SELECT count(*) FROM {_r} WHERE {_on}) AS cnt FROM {_l}) x"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on} AND {_lk} % 2 = 0)"),
    ])

# Per-table UNION type-coercion family (reference test/sql/setops,
# test/sql/cast — branches of different numeric widths must unify).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"unioncoerce_file_{_t}", f"UNION type coercion over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 5 AS x FROM {_t} UNION SELECT CAST(({_k}) % 5 AS DOUBLE) AS x FROM {_t}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT CAST(({_k}) % 3 AS INT) AS x FROM {_t} UNION ALL SELECT CAST(({_k}) % 3 AS BIGINT) FROM {_t}) u"),
        ("R", "rowsort", f"SELECT x FROM (SELECT CAST(({_k}) % 4 AS DOUBLE) AS x FROM {_t} UNION SELECT ({_k}) % 4 + 0.5 FROM {_t}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_s} AS x FROM {_t} UNION SELECT CAST(({_k}) AS STRING) FROM {_t}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT NULL AS x FROM {_t} UNION SELECT ({_k}) % 2 FROM {_t}) u"),
    ])

# Per-table CASE-with-aggregates family (reference test/sql/aggregate —
# sum(CASE), CASE over aggregate results, nested CASE branches).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"caseagg_file_{_t}", f"CASE with aggregates over {_t} (reference test/sql/aggregate)")([
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_p} THEN 1 ELSE 0 END) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN ({_k}) % 3 = 0 THEN ({_k}) % 10 WHEN ({_k}) % 3 = 1 THEN -(({_k}) % 10) ELSE 0 END) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CASE WHEN avg({_v}) > 100 THEN 'big' WHEN avg({_v}) > 1 THEN 'mid' ELSE 'small' END FROM {_t}"),
        ("I", "", f"SELECT count(CASE WHEN {_p} THEN 1 END) FROM {_t}"),
        ("II", "rowsort", f"SELECT ({_k}) % 3, CAST(sum(CASE WHEN {_p} THEN 2 ELSE 1 END) AS BIGINT) FROM {_t} GROUP BY ({_k}) % 3"),
    ])

# Per-table concat family (reference test/sql/function/string — || with
# NULL propagation vs concat_ws's NULL skipping, both shared spellings).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"concatfn_file_{_t}", f"|| and concat_ws over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT {_s} || '/' || CAST(({_k}) % 100 AS STRING) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count({_s} || nullif({_s}, {_s})) FROM {_t}"),
        ("T", "", f"SELECT concat_ws('-', {_s}, nullif('x', 'x'), CAST(({_k}) % 9 AS STRING)) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT concat_ws('', substr({_s}, 1, 2), substr({_s}, 3, 2)) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length({_s} || {_s}) = 2 * length({_s})"),
    ])


# ---------------------------------------------------------------------
# Round-4 continuation part 5: date-RANGE interval frames, skewness,
# EXISTS-in-projection, window-after-aggregate, coalesce/nullif chains,
# string compositions, agg-of-agg derived tables, windows over FK pairs.

# RANGE frames with INTERVAL bounds over date/timestamp ordering
# (reference test/sql/window/test_window_range.test — probed: the
# `RANGE BETWEEN INTERVAL n DAY PRECEDING AND CURRENT ROW` spelling
# parses and agrees in both engines over DATE and TIMESTAMP order keys).
_RANGEIV = {
    "orders":   ("o_orderkey", "o_orderdate", "o_custkey"),
    "lineitem": ("l_orderkey * 10 + l_linenumber", "l_shipdate", "l_partkey"),
    "events":   ("event_id", "ts", "user_id"),
}
for _t, (_k, _d, _i) in _RANGEIV.items():
    corpus(f"winrangeiv_file_{_t}", f"RANGE frames with INTERVAL bounds over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kk, CAST(sum({_i}) OVER (ORDER BY {_d} RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS s FROM {_t} ORDER BY {_d}, kk LIMIT 8"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kk, count(*) OVER (ORDER BY {_d} RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND INTERVAL 7 DAY FOLLOWING) AS c FROM {_t} ORDER BY {_d}, kk LIMIT 8"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kk, CAST(min({_i}) OVER (ORDER BY {_d} RANGE BETWEEN CURRENT ROW AND INTERVAL 90 DAY FOLLOWING) AS BIGINT) AS m FROM {_t} ORDER BY {_d}, kk LIMIT 8"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kk, CAST(max({_i}) OVER (ORDER BY {_d} RANGE BETWEEN INTERVAL 365 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS m FROM {_t} ORDER BY {_d}, kk LIMIT 8"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) OVER (ORDER BY {_d} RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) AS c FROM {_t}) x WHERE c > 1"),
    ])

# skewness EXCLUDED (probe-verified divergence, like kurtosis): DuckDB
# computes bias-corrected SAMPLE skewness (×n²/((n-1)(n-2))) while Spark
# computes POPULATION skewness — e.g. 17-bucket modulo over nation gives
# 0.481 vs 0.452; Spark also returns 0.0 where DuckDB returns NULL for
# n<3 groups.  Same class of definitional gap as kurtosis (see
# float_special notes); the registry's agg_stats_spread query covers the
# moment family through exact-moment oracles instead.

# Per-table EXISTS-in-projection family (reference test/sql/subquery/
# exists — correlated self-EXISTS through derived-table aliases so the
# correlation columns are unambiguous in both binders).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dt = f"(SELECT {_k} AS kk, {_g} AS gg FROM {_t})"
    corpus(f"existsproj_file_{_t}", f"EXISTS in projection/CASE over {_t} (reference test/sql/subquery/exists)")([
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE EXISTS (SELECT 1 FROM {_dt} y WHERE y.gg = x.gg AND y.kk < x.kk)"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE NOT EXISTS (SELECT 1 FROM {_dt} y WHERE y.gg = x.gg AND y.kk < x.kk)"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM {_t} WHERE {_p}) THEN 1 ELSE 0 END) AS BIGINT) FROM region"),
        ("TI", "rowsort", f"SELECT e, count(*) FROM (SELECT CAST(EXISTS (SELECT 1 FROM {_dt} y WHERE y.gg = x.gg AND y.kk < x.kk) AS STRING) AS e FROM {_dt} x) z GROUP BY e"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE EXISTS (SELECT 1 FROM {_dt} y WHERE y.gg = x.gg AND y.kk < x.kk) AND x.kk % 2 = 0"),
    ])

# Per-table window-after-aggregate family (the classic TPC-DS shape:
# rank groups by their aggregate; reference test/sql/window over
# grouped inputs).  count(*) as the ranked measure keeps it exact.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"grouprank_file_{_t}", f"rank over grouped aggregates of {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g}) x WHERE c > 0"),
        ("II", "", f"SELECT rnk, c FROM (SELECT rank() OVER (ORDER BY c DESC, gg) AS rnk, c FROM (SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g}) x) y ORDER BY rnk LIMIT 5"),
        ("I", "", f"SELECT c FROM (SELECT row_number() OVER (ORDER BY c DESC, gg) AS rn, c FROM (SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g}) x) y WHERE rn = 1"),
        ("II", "", f"SELECT rn, CAST(mn AS BIGINT) AS mnb FROM (SELECT row_number() OVER (ORDER BY gg) AS rn, mn FROM (SELECT {_g} AS gg, min({_k}) AS mn FROM {_t} GROUP BY {_g}) x) y ORDER BY rn LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT gg, c, CAST(sum(c) OVER () AS BIGINT) AS tot FROM (SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g}) x) y WHERE c * 2 < tot"),
    ])

# Per-table coalesce/nullif chain family (reference test/sql/function/
# generic — NULL-injecting nullif composed back through coalesce).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"coalnull_file_{_t}", f"coalesce/nullif chains over {_t} (reference test/sql/function)")([
        ("T", "", f"SELECT coalesce(nullif({_s}, {_s}), 'folded') FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT count(nullif(({_k}) % 3, 0)) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE coalesce(nullif(({_k}) % 4, 2), 99) = 99"),
        ("T", "", f"SELECT coalesce(CAST(NULL AS STRING), nullif(substr({_s}, 1, 1), 'Z'), 'zfall') FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT CAST(sum(coalesce(nullif(({_k}) % 5, 1), 0)) AS BIGINT) FROM {_t}"),
    ])

# Per-table string-composition family (reference test/sql/function/
# string — nested upper/lower/substr/replace/translate/lpad/reverse).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"strcomp_file_{_t}", f"nested string compositions over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT translate(upper(substr({_s}, 1, 4)), 'AEIOU', 'aeiou') FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT replace(lower(reverse({_s})), 'a', '@') FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT lpad(trim(substr({_s}, 2, 3)), 6, '.') FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(replace({_s}, 'a', '')) < length({_s})"),
        ("T", "", f"SELECT rpad(upper(substr({_s}, 1, 2)), 4, '-') || lower(substr({_s}, 1, 1)) FROM {_t} ORDER BY {_k} LIMIT 4"),
    ])

# Per-table agg-of-agg derived-table family (reference
# test/sql/subquery/test_nested — aggregate over grouped aggregates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _inner = f"(SELECT {_g} AS gg, count(*) AS c, min({_k}) AS mn FROM {_t} GROUP BY {_g})"
    corpus(f"aggofagg_file_{_t}", f"aggregates over grouped aggregates of {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM {_inner} x"),
        ("I", "", f"SELECT CAST(sum(c) AS BIGINT) FROM {_inner} x"),
        ("I", "", f"SELECT count(*) FROM {_inner} x WHERE c > (SELECT CAST(avg(c) AS DOUBLE) FROM {_inner} y)"),
        ("I", "", f"SELECT CAST(min(mn) AS BIGINT) FROM {_inner} x WHERE c >= 1"),
        ("II", "", f"SELECT count(*), count(DISTINCT c) FROM {_inner} x"),
    ])

# Windows over FK join pairs (reference test/sql/window + test/sql/join
# — rank rows within a joined dimension group, deterministic through
# the left table's unique key).
_PAIR_KEYS = {
    "nation_region":   "a.n_nationkey",
    "customer_nation": "a.c_custkey",
    "supplier_nation": "a.s_suppkey",
    "orders_customer": "a.o_orderkey",
    "lineitem_orders": "a.l_orderkey * 10 + a.l_linenumber",
    "lineitem_part":   "a.l_orderkey * 10 + a.l_linenumber",
    "events_customer": "a.event_id",
    "lineitem_supplier": "a.l_orderkey * 10 + a.l_linenumber",
}
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"winjoin_file_{_n}", f"windows over FK join pair {_n} (reference test/sql/window)")([
        ("TI", "rowsort", f"SELECT g, CAST(max(rn) AS BIGINT) AS mx FROM (SELECT {_grp} AS g, row_number() OVER (PARTITION BY {_grp} ORDER BY {_ak}) AS rn FROM {_l} JOIN {_r} ON {_on}) x GROUP BY g"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (PARTITION BY {_grp} ORDER BY {_ak}) AS rk FROM {_l} JOIN {_r} ON {_on}) x WHERE rk = 1"),
        ("TI", "", f"SELECT g, CAST(kk AS BIGINT) AS kb FROM (SELECT {_grp} AS g, {_ak} AS kk, row_number() OVER (PARTITION BY {_grp} ORDER BY {_ak}) AS rn FROM {_l} JOIN {_r} ON {_on}) x WHERE rn = 1 ORDER BY g LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) OVER (PARTITION BY {_grp}) AS c FROM {_l} JOIN {_r} ON {_on}) x WHERE c > 1"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_ak} AS kk, row_number() OVER (ORDER BY {_grp}, {_ak}) AS rn FROM {_l} JOIN {_r} ON {_on}) x ORDER BY rn LIMIT 6"),
    ])


# Per-table NULL-aware aggregate family (reference test/sql/aggregate —
# aggregates over CASE-nulled inputs; NULL-only groups; count vs count(col)).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _nulled = f"CASE WHEN ({_k}) % 3 = 0 THEN NULL ELSE ({_k}) % 7 END"
    corpus(f"nullagg_file_{_t}", f"aggregates over CASE-nulled inputs of {_t} (reference test/sql/aggregate)")([
        ("II", "", f"SELECT count(*), count({_nulled}) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum({_nulled}) AS BIGINT) FROM {_t}"),
        ("R", "", f"SELECT round(avg({_nulled}), 3) FROM {_t}"),
        ("II", "", f"SELECT CAST(min({_nulled}) AS BIGINT), CAST(max({_nulled}) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST(sum(CASE WHEN FALSE THEN ({_k}) END) AS STRING) FROM {_t}"),
    ])

# Per-table DISTINCT-aggregate arithmetic family (reference
# test/sql/aggregate/distinct — sum/avg/min over DISTINCT inputs;
# cntdist_file covers the count forms).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"distagg2_file_{_t}", f"sum/avg DISTINCT over {_t} (reference test/sql/aggregate/distinct)")([
        ("I", "", f"SELECT CAST(sum(DISTINCT ({_k}) % 10) AS BIGINT) FROM {_t}"),
        ("R", "", f"SELECT round(avg(DISTINCT ({_k}) % 8), 3) FROM {_t}"),
        ("II", "", f"SELECT CAST(min(DISTINCT ({_k}) % 6) AS BIGINT), CAST(max(DISTINCT ({_k}) % 6) AS BIGINT) FROM {_t}"),
        ("II", "rowsort", f"SELECT ({_k}) % 2, CAST(sum(DISTINCT ({_k}) % 9) AS BIGINT) FROM {_t} GROUP BY ({_k}) % 2"),
        ("I", "", f"SELECT CAST(sum(DISTINCT ({_k}) % 5) + sum(DISTINCT ({_k}) % 4) AS BIGINT) FROM {_t}"),
    ])

# Per-table IN-subquery shapes (reference test/sql/subquery — IN over
# aggregate / LIMIT / set-op subqueries; insubq_file covers the basics).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"subqin2_file_{_t}", f"IN-subquery shapes over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) IN (SELECT max({_k}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) IN (SELECT min({_k}) FROM {_t} UNION SELECT max({_k}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 IN (SELECT r_regionkey FROM region)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) IN (SELECT kk FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 5) x)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 7 NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 3)"),
    ])

# Per-table numeric-edge family (reference test/sql/types/numeric —
# negatives through abs/sign/mod/div, least/greatest chains).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _neg = f"(({_k}) % 5) - 2"
    corpus(f"numedge_file_{_t}", f"numeric edges over {_t} (reference test/sql/types/numeric)")([
        ("II", "", f"SELECT CAST(sum(abs({_neg})) AS BIGINT), CAST(sum(sign({_neg})) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(CAST({_neg} AS BIGINT) % 3) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(least({_neg}, 0) + greatest({_neg}, 0)) AS BIGINT) FROM {_t}"),
        ("II", "rowsort", f"SELECT CAST({_neg} AS BIGINT), count(*) FROM {_t} GROUP BY {_neg}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE abs({_neg}) = 2 AND sign({_neg}) = -1"),
    ])

# Per-table window-over-window family (reference test/sql/window —
# ranking running aggregates through nested derived tables).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"nestwin_file_{_t}", f"window over window results of {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rnk FROM (SELECT kk, rank() OVER (ORDER BY rs DESC, kk) AS rnk FROM (SELECT {_k} AS kk, count(*) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM {_t}) x) y ORDER BY rnk LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (ORDER BY kk) AS rn2 FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY {_k} DESC) AS rn FROM {_t}) x WHERE rn <= 10) y WHERE rn2 <= 5"),
        ("II", "", f"SELECT rn, CAST(kk AS BIGINT) AS kb FROM (SELECT kk, row_number() OVER (ORDER BY mx DESC, kk) AS rn FROM (SELECT {_k} AS kk, max({_k}) OVER (PARTITION BY {_g}) AS mx FROM {_t}) x) y ORDER BY rn LIMIT 4"),
        ("I", "", f"SELECT CAST(max(rs) AS BIGINT) FROM (SELECT count(*) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM {_t}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT lag(kk) OVER (ORDER BY kk) AS pk, kk FROM (SELECT {_k} AS kk FROM {_t}) x) y WHERE pk IS NOT NULL AND pk >= kk"),
    ])

# Per-table VALUES-join family (reference COLUMN_DATA_SCAN joined to a
# real scan — the inline relation as a lookup side).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"valuesjoin_file_{_t}", f"VALUES relation joined to {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_t} JOIN (VALUES (0), (1), (2)) v(x) ON ({_k}) % 5 = v.x"),
        ("II", "rowsort", f"SELECT v.x, count(*) FROM {_t} JOIN (VALUES (0), (1), (2), (3), (4)) v(x) ON ({_k}) % 5 = v.x GROUP BY v.x"),
        ("I", "", f"SELECT count(*) FROM {_t} LEFT JOIN (VALUES (0)) v(x) ON ({_k}) % 2 = v.x WHERE v.x IS NULL"),
        ("TI", "rowsort", f"SELECT v.nm, count(*) FROM {_t} JOIN (VALUES (0, 'even'), (1, 'odd')) v(x, nm) ON ({_k}) % 2 = v.x GROUP BY v.nm"),
        ("I", "", f"SELECT count(*) FROM (VALUES (0), (1)) v(x) JOIN {_t} ON ({_k}) % 2 = v.x"),
    ])

# FK-pair aggregate family (reference test/sql/join + aggregate — the
# joinpair family's count-only shapes widened to sum/min/max/distinct).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"aggjoin_file_{_n}", f"aggregates over FK join pair {_n} (reference test/sql/join)")([
        ("TI", "rowsort", f"SELECT {_grp} AS g, CAST(sum(({_ak}) % 100) AS BIGINT) AS s FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp}"),
        ("TII", "rowsort", f"SELECT {_grp} AS g, CAST(min({_ak}) AS BIGINT) AS mn, CAST(max({_ak}) AS BIGINT) AS mx FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp}"),
        ("TI", "rowsort", f"SELECT {_grp} AS g, count(DISTINCT ({_ak}) % 50) AS cd FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp}"),
        ("I", "", f"SELECT count(DISTINCT {_grp}) FROM {_l} JOIN {_r} ON {_on}"),
        ("TR", "rowsort", f"SELECT {_grp} AS g, round(avg(({_ak}) % 13), 3) AS a FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp}"),
    ])

# FK-pair semi/anti equivalence family (reference test/sql/join/semi_anti
# — IN, EXISTS, and DISTINCT-join forms must all agree).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _ak = _PAIR_KEYS[_n]
    corpus(f"semiantij_file_{_n}", f"semi/anti equivalences for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} WHERE {_lk} IN (SELECT {_rk.split('.')[1]} FROM {_r.split(' ')[0]} b)"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE {_lk} NOT IN (SELECT {_rk.split('.')[1]} FROM {_r.split(' ')[0]} b WHERE {_rk.split('.')[1]} IS NOT NULL)"),
        ("II", "", f"SELECT count(*), count({_rk.split('.')[1]}) FROM {_l} LEFT JOIN {_r} ON {_on}"),
        ("I", "", f"SELECT count(*) FROM (SELECT DISTINCT {_lk} AS k FROM {_l} JOIN {_r} ON {_on}) x"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE EXISTS (SELECT 1 FROM {_r} WHERE {_on}) AND ({_ak}) % 2 = 0"),
    ])

# FK-pair HAVING family (reference test/sql/aggregate/having over joins).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"havingjoin_file_{_n}", f"HAVING over FK join pair {_n} (reference test/sql/aggregate/having)")([
        ("TI", "rowsort", f"SELECT {_grp} AS g, count(*) AS c FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp} HAVING count(*) > 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp} HAVING count(*) >= 2 AND min({_ak}) >= 0) x"),
        ("TI", "rowsort", f"SELECT {_grp} AS g, CAST(max(({_ak}) % 40) AS BIGINT) AS m FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp} HAVING max(({_ak}) % 40) > 10"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} GROUP BY {_grp} HAVING count(DISTINCT ({_ak}) % 25) > 3) x"),
        ("TI", "rowsort", f"SELECT {_grp} AS g, count(*) AS c FROM {_l} LEFT JOIN {_r} ON {_on} GROUP BY {_grp} HAVING count(*) > 0"),
    ])

# FK-pair set-op family (reference test/sql/setops over join results).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"unionjoin_file_{_n}", f"set-ops between join slices of {_n} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT ({_ak}) % 2 AS x FROM {_l} JOIN {_r} ON {_on} UNION SELECT ({_ak}) % 3 FROM {_l} JOIN {_r} ON {_on}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} INTERSECT SELECT {_grp} FROM {_l} LEFT JOIN {_r} ON {_on}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_ak}) AS k FROM {_l} JOIN {_r} ON {_on} EXCEPT SELECT ({_ak}) FROM {_l} JOIN {_r} ON {_on} WHERE ({_ak}) % 2 = 0) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} UNION ALL SELECT {_grp} FROM {_l} JOIN {_r} ON {_on}) u"),
        ("TI", "rowsort", f"SELECT g, count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} UNION ALL SELECT {_grp} FROM {_l} JOIN {_r} ON {_on}) u GROUP BY g"),
    ])


# Per-table first/last/nth_value with explicit frames (reference
# test/sql/window — the value functions need full frames to see the
# whole partition; unique-key ordering keeps them deterministic).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winfirstlast_file_{_t}", f"first/last/nth_value frames over {_t} (reference test/sql/window)")([
        ("TT", "", f"SELECT first_value({_s}) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f, last_value({_s}) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l FROM {_t} ORDER BY {_k} LIMIT 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT first_value({_s}) OVER (PARTITION BY {_g} ORDER BY {_k}) AS f, {_s} AS s FROM {_t}) x WHERE f = s"),
        ("T", "", f"SELECT nth_value({_s}, 2) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM {_t} ORDER BY {_k} LIMIT 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT last_value({_s}) OVER (PARTITION BY {_g} ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l, {_s} AS s FROM {_t}) x WHERE l = s"),
        ("TT", "", f"SELECT first_value({_s}) OVER (ORDER BY {_k} DESC) AS f, nth_value({_s}, 3) OVER (ORDER BY {_k} DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n3 FROM {_t} ORDER BY {_k} DESC LIMIT 1"),
    ])

# Per-table correlated-scalar-projection family (reference
# test/sql/subquery/scalar — running counts / group shares computed by
# correlated scalar subqueries through derived-table aliases).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dt = f"(SELECT {_k} AS kk, {_g} AS gg FROM {_t})"
    corpus(f"scalarproj_file_{_t}", f"correlated scalar projections over {_t} (reference test/sql/subquery/scalar)")([
        ("I", "", f"SELECT CAST(sum(rc) AS BIGINT) FROM (SELECT (SELECT count(*) FROM {_dt} y WHERE y.gg = x.gg AND y.kk <= x.kk) AS rc FROM {_dt} x) z"),
        ("I", "", f"SELECT count(*) FROM (SELECT (SELECT count(*) FROM {_dt} y WHERE y.gg = x.gg) AS gc FROM {_dt} x) z WHERE gc = 1"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, CAST((SELECT min(y.kk) FROM {_dt} y WHERE y.gg = x.gg) AS BIGINT) AS gm FROM {_dt} x ORDER BY kk LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk = (SELECT max(y.kk) FROM {_dt} y WHERE y.gg = x.gg)"),
        ("I", "", f"SELECT CAST(max(d) AS BIGINT) FROM (SELECT x.kk - (SELECT min(y.kk) FROM {_dt} y WHERE y.gg = x.gg) AS d FROM {_dt} x) z"),
    ])

# Date/timestamp arithmetic over the real temporal columns (reference
# test/sql/types/date, /timestamp — interval shifts, trunc buckets,
# month-boundary behavior on actual data).
_DTCOLS = {
    "orders":   ("o_orderkey", "o_orderdate"),
    "lineitem": ("l_orderkey * 10 + l_linenumber", "l_shipdate"),
    "events":   ("event_id", "ts"),
}
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"dtarith_file_{_t}", f"temporal arithmetic over {_t}.{_d.split()[0]} (reference test/sql/types/date)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_d} + INTERVAL 30 DAY > CAST('1997-06-01' AS DATE)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_d} - INTERVAL 2 MONTH >= CAST('1995-01-01' AS DATE)"),
        ("T", "", f"SELECT CAST(min(CAST(date_trunc('month', {_d}) AS DATE)) AS STRING) FROM {_t}"),
        ("II", "rowsort", f"SELECT EXTRACT(YEAR FROM {_d}), count(*) FROM {_t} GROUP BY EXTRACT(YEAR FROM {_d})"),
        ("T", "", f"SELECT CAST(CAST({_d} + INTERVAL 1 DAY AS DATE) AS STRING) FROM {_t} ORDER BY {_d}, {_k} LIMIT 3"),
        ("I", "", f"SELECT count(DISTINCT CAST(date_trunc('week', {_d}) AS DATE)) FROM {_t}"),
    ])

# Four-table FK chains (reference test/sql/join — one hop deeper than
# the joinchain_file_* three-table chains).
_CHAINS4 = {
    "c_o_l_p": ("customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey JOIN part p ON l.l_partkey = p.p_partkey", "c.c_mktsegment", "l.l_orderkey * 10 + l.l_linenumber"),
    "n_s_l_o": ("nation n JOIN supplier s ON n.n_nationkey = s.s_nationkey JOIN lineitem l ON s.s_suppkey = l.l_suppkey JOIN orders o ON l.l_orderkey = o.o_orderkey", "n.n_name", "o.o_orderkey"),
    "r_n_c_o": ("region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN customer c ON n.n_nationkey = c.c_nationkey JOIN orders o ON c.c_custkey = o.o_custkey", "r.r_name", "o.o_orderkey"),
    "n_c_o_l": ("nation n JOIN customer c ON n.n_nationkey = c.c_nationkey JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey", "n.n_name", "l.l_orderkey * 10 + l.l_linenumber"),
    "r_n_s_l": ("region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN supplier s ON n.n_nationkey = s.s_nationkey JOIN lineitem l ON s.s_suppkey = l.l_suppkey", "r.r_name", "l.l_orderkey * 10 + l.l_linenumber"),
    "p_l_o_c": ("part p JOIN lineitem l ON p.p_partkey = l.l_partkey JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey", "p.p_brand", "l.l_orderkey * 10 + l.l_linenumber"),
}
for _n, (_from, _gcol, _kcol) in _CHAINS4.items():
    corpus(f"joinchain4_file_{_n}", f"four-table FK chain {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_from}"),
        ("TI", "rowsort", f"SELECT {_gcol} AS g, count(*) FROM {_from} GROUP BY {_gcol}"),
        ("I", "", f"SELECT count(DISTINCT {_gcol}) FROM {_from}"),
        ("II", "", f"SELECT CAST(min({_kcol}) AS BIGINT), CAST(max({_kcol}) AS BIGINT) FROM {_from}"),
        ("TI", "rowsort", f"SELECT {_gcol} AS g, CAST(sum(({_kcol}) % 20) AS BIGINT) FROM {_from} GROUP BY {_gcol} HAVING count(*) > 2"),
    ])

# ROLLUP + grouping() over FK join pairs (reference test/sql/aggregate/
# grouping_sets over joins).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"rollupjoin_file_{_n}", f"ROLLUP over FK join pair {_n} (reference test/sql/aggregate/grouping_sets)")([
        ("TII", "rowsort", f"SELECT coalesce({_grp}, 'ALL') AS g, grouping({_grp}) AS gr, count(*) AS c FROM {_l} JOIN {_r} ON {_on} GROUP BY ROLLUP({_grp})"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} GROUP BY ROLLUP({_grp})) x"),
        ("TI", "rowsort", f"SELECT coalesce({_grp}, 'ALL') AS g, CAST(sum(({_ak}) % 10) AS BIGINT) AS s FROM {_l} JOIN {_r} ON {_on} GROUP BY ROLLUP({_grp})"),
        ("II", "rowsort", f"SELECT grouping({_grp}), count(*) FROM {_l} JOIN {_r} ON {_on} GROUP BY ROLLUP({_grp})"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g, count(*) AS c FROM {_l} JOIN {_r} ON {_on} GROUP BY ROLLUP({_grp}) HAVING count(*) > 1) x"),
    ])

# Per-table window-distribution family (reference test/sql/window —
# percent_rank / cume_dist / ntile over unique-key orderings).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"windist_file_{_t}", f"percent_rank/cume_dist/ntile over {_t} (reference test/sql/window)")([
        ("R", "", f"SELECT round(percent_rank() OVER (ORDER BY {_k}), 3) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("R", "", f"SELECT round(cume_dist() OVER (ORDER BY {_k}), 3) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("II", "rowsort", f"SELECT nt, count(*) FROM (SELECT ntile(4) OVER (ORDER BY {_k}) AS nt FROM {_t}) x GROUP BY nt"),
        ("I", "", f"SELECT count(*) FROM (SELECT percent_rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS pr FROM {_t}) x WHERE pr = 0.0"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, nt FROM (SELECT {_k} AS kk, ntile(3) OVER (ORDER BY {_k}) AS nt FROM {_t}) x ORDER BY kk LIMIT 6"),
    ])


# Per-table boolean-mix family (reference test/sql/conjunction —
# AND/OR/NOT nesting with IS NULL and parenthesization differences).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"boolmix_file_{_t}", f"AND/OR/NOT nesting over {_t} (reference test/sql/conjunction)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_p} AND ({_k}) % 2 = 0) OR (NOT {_p} AND ({_k}) % 3 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE NOT ({_p} OR ({_k}) % 5 = 1)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_p} OR ({_k}) % 2 = 0) AND ({_p} OR ({_k}) % 2 = 1)"),
        ("II", "", f"SELECT count_if({_p} AND NOT (({_k}) % 4 = 0)), count_if(NOT {_p} OR ({_k}) % 4 = 0) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN {_p} THEN ({_k}) % 2 = 0 ELSE ({_k}) % 3 = 0 END AND {_s} IS NOT NULL"),
    ])

# Per-table projection-alias-scope family (reference test/sql/projection
# — aliases reused in ORDER BY / GROUP BY / HAVING positions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"projalias_file_{_t}", f"alias reuse in ORDER/GROUP BY over {_t} (reference test/sql/projection)")([
        ("T", "", f"SELECT substr({_s}, 1, 3) AS pre FROM {_t} ORDER BY pre, {_k} LIMIT 4"),
        ("II", "rowsort", f"SELECT ({_k}) % 4 AS bucket, count(*) AS c FROM {_t} GROUP BY bucket"),
        ("II", "", f"SELECT ({_k}) % 6 AS bucket, count(*) AS c FROM {_t} GROUP BY bucket ORDER BY c DESC, bucket LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT length({_s}) AS ln FROM {_t} ORDER BY ln DESC LIMIT 10) x"),
        ("TI", "rowsort", f"SELECT upper(substr({_s}, 1, 1)) AS ini, count(*) AS c FROM {_t} GROUP BY ini"),
    ])

# Per-table named-WINDOW-clause family (reference test/sql/window —
# one WINDOW definition shared by several functions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"namedwin_file_{_t}", f"WINDOW clause over {_t} (reference test/sql/window)")([
        ("III", "", f"SELECT CAST({_k} AS BIGINT) AS kb, row_number() OVER w AS rn, rank() OVER w AS rk FROM {_t} WINDOW w AS (ORDER BY {_k}) ORDER BY kb LIMIT 5"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kb, count(*) OVER w AS c FROM {_t} WINDOW w AS (PARTITION BY {_g}) ORDER BY kb LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER w AS rn, rank() OVER w AS rk FROM {_t} WINDOW w AS (PARTITION BY {_g} ORDER BY {_k})) x WHERE rn = rk"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kb, CAST(min({_k}) OVER w AS BIGINT) AS mn FROM {_t} WINDOW w AS (ORDER BY {_k} ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) ORDER BY kb LIMIT 5"),
        ("I", "", f"SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER w AS rn FROM {_t} WINDOW w AS (ORDER BY {_k} DESC)) x"),
    ])

# Per-table multiple-windows-in-one-SELECT family (reference
# test/sql/window — different partitionings evaluated side by side).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winmixed_file_{_t}", f"mixed windows in one SELECT over {_t} (reference test/sql/window)")([
        ("III", "", f"SELECT CAST({_k} AS BIGINT) AS kb, row_number() OVER (ORDER BY {_k}) AS rn, row_number() OVER (ORDER BY {_k} DESC) AS rd FROM {_t} ORDER BY kb LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) OVER (PARTITION BY {_g}) AS cg, count(*) OVER () AS ct FROM {_t}) x WHERE cg = ct"),
        ("II", "", f"SELECT rn, rg FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn, rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS rg FROM {_t}) x ORDER BY rn LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS a, dense_rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS b FROM {_t}) x WHERE a <> b"),
        ("II", "", f"SELECT CAST(sum(c1) AS BIGINT), CAST(sum(c2) AS BIGINT) FROM (SELECT count(*) OVER (PARTITION BY {_g}) AS c1, count(*) OVER (PARTITION BY ({_k}) % 2) AS c2 FROM {_t}) x"),
    ])

# Per-table set-op ORDER BY/LIMIT family (reference test/sql/setops +
# test/sql/order — ordering applied to the combined result).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"unionorder_file_{_t}", f"ORDER BY/LIMIT over set-ops of {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT kk FROM (SELECT CAST(({_k}) % 10 AS BIGINT) AS kk FROM {_t} UNION SELECT CAST(({_k}) % 7 AS BIGINT) FROM {_t}) u ORDER BY kk LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT CAST({_k} AS BIGINT) AS kk FROM {_t} WHERE {_p} UNION ALL SELECT CAST({_k} AS BIGINT) FROM {_t} WHERE NOT {_p}) u"),
        ("T", "", f"SELECT sv FROM (SELECT {_s} AS sv FROM {_t} UNION SELECT upper({_s}) FROM {_t}) u ORDER BY sv LIMIT 4"),
        ("I", "", f"SELECT kk FROM (SELECT CAST(min({_k}) AS BIGINT) AS kk FROM {_t} UNION ALL SELECT CAST(max({_k}) AS BIGINT) FROM {_t}) u ORDER BY kk DESC LIMIT 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT CAST(({_k}) % 3 AS BIGINT) AS kk FROM {_t} INTERSECT SELECT CAST(({_k}) % 4 AS BIGINT) FROM {_t}) u"),
    ])


# CUBE over FK join pairs (reference test/sql/aggregate/grouping_sets —
# the rollupjoin family's lattice completed with a second dimension).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    _d2 = f"({_ak}) % 2"
    corpus(f"cubejoin_file_{_n}", f"CUBE over FK join pair {_n} (reference test/sql/aggregate/grouping_sets)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g, {_d2} AS m FROM {_l} JOIN {_r} ON {_on} GROUP BY CUBE({_grp}, {_d2})) x"),
        ("TII", "rowsort", f"SELECT coalesce({_grp}, 'ALL') AS g, grouping({_d2}) AS gm, count(*) AS c FROM {_l} JOIN {_r} ON {_on} GROUP BY CUBE({_grp}, {_d2})"),
        ("II", "rowsort", f"SELECT grouping({_grp}) + grouping({_d2}), count(*) FROM {_l} JOIN {_r} ON {_on} GROUP BY CUBE({_grp}, {_d2})"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_grp} AS g FROM {_l} JOIN {_r} ON {_on} GROUP BY GROUPING SETS (({_grp}), ())) x"),
        ("TI", "rowsort", f"SELECT coalesce({_grp}, 'ALL') AS g, count(*) AS c FROM {_l} JOIN {_r} ON {_on} GROUP BY GROUPING SETS (({_grp}), ())"),
    ])

# Outer-join ON-clause vs WHERE semantics per FK pair (reference
# test/sql/join/left_outer — a non-key predicate in ON keeps unmatched
# left rows; the same predicate in WHERE filters them out).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    _rk = _on.split(" = ")[1]
    corpus(f"onclause_file_{_n}", f"ON vs WHERE predicates for outer join {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND {_grp} IS NOT NULL"),
        ("II", "", f"SELECT count(*), count({_grp}) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 2 = 0"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} WHERE {_grp} IS NULL"),
        ("II", "", f"SELECT count(*), count({_rk}) FROM {_l} LEFT JOIN {_r} ON {_on} AND length({_grp}) > 3"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND 1 = 0"),
    ])

# Per-table binary string-ordering family (reference test/sql/order —
# codepoint comparisons, mixed-case sorts, min/max agreement).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"strorder_file_{_t}", f"binary string ordering over {_t} (reference test/sql/order)")([
        ("T", "", f"SELECT {_s} FROM {_t} ORDER BY {_s}, {_k} LIMIT 4"),
        ("T", "", f"SELECT {_s} FROM {_t} ORDER BY {_s} DESC, {_k} LIMIT 4"),
        ("TT", "", f"SELECT min({_s}), max({_s}) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} < upper({_s})"),
        ("T", "", f"SELECT sv FROM (SELECT DISTINCT substr({_s}, 1, 1) AS sv FROM {_t}) x ORDER BY sv LIMIT 6"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} BETWEEN 'A' AND 'Nzzzz'"),
    ])

# Date-predicate matrix over the real temporal columns (reference
# test/sql/filter + types/date — IN lists of dates, BETWEEN windows,
# year boundaries).
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"datefilter_file_{_t}", f"date predicates over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CAST({_d} AS DATE) IN (CAST('1995-06-15' AS DATE), CAST('1996-01-01' AS DATE))"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CAST({_d} AS DATE) BETWEEN CAST('1995-01-01' AS DATE) AND CAST('1995-12-31' AS DATE)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXTRACT(MONTH FROM {_d}) IN (1, 2, 12)"),
        ("II", "rowsort", f"SELECT EXTRACT(QUARTER FROM {_d}), count(*) FROM {_t} GROUP BY EXTRACT(QUARTER FROM {_d})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CAST({_d} AS DATE) >= CAST('1996-01-01' AS DATE) OR CAST({_d} AS DATE) < CAST('1994-01-01' AS DATE)"),
    ])

# Per-table windows-over-filtered-input family (reference
# test/sql/window — ranks computed after a WHERE, then re-filtered).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winfilter_file_{_t}", f"windows over filtered {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY {_k}) AS rn FROM {_t} WHERE {_p}) x ORDER BY rn LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (PARTITION BY {_g} ORDER BY {_k}) AS rn FROM {_t} WHERE {_p}) x WHERE rn <= 2"),
        ("I", "", f"SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn FROM {_t} WHERE NOT ({_p})) x"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, CAST(rs AS BIGINT) AS rsb FROM (SELECT {_k} AS kk, count(*) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM {_t} WHERE {_p}) x ORDER BY kb LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS rk FROM {_t} WHERE ({_k}) % 2 = 0) x WHERE rk = 1"),
    ])


# Per-table multi-column set-op family (reference test/sql/setops —
# row-wise distinct/except semantics over 2-column tuples).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"setopmc_file_{_t}", f"multi-column set-ops over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 4 AS a, ({_k}) % 6 AS b FROM {_t} UNION SELECT ({_k}) % 4, ({_k}) % 6 FROM {_t} WHERE {_p}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 3 AS a, substr({_s}, 1, 1) AS b FROM {_t} INTERSECT SELECT ({_k}) % 3, substr({_s}, 1, 1) FROM {_t} WHERE {_p}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 5 AS a, ({_k}) % 2 AS b FROM {_t} EXCEPT SELECT ({_k}) % 5, ({_k}) % 2 FROM {_t} WHERE NOT ({_p})) x"),
        ("II", "rowsort", f"SELECT a, count(*) FROM (SELECT ({_k}) % 3 AS a, ({_k}) % 7 AS b FROM {_t} UNION SELECT ({_k}) % 3, ({_k}) % 7 FROM {_t}) x GROUP BY a"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS a, {_s} AS b FROM {_t} UNION ALL SELECT {_g}, {_s} FROM {_t} WHERE {_p}) x"),
    ])

# Per-table multi-key GROUP BY family (reference test/sql/aggregate —
# two and three grouping keys, HAVING on one, mixed types).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"gbmulti_file_{_t}", f"multi-key GROUP BY over {_t} (reference test/sql/aggregate)")([
        ("III", "rowsort", f"SELECT ({_k}) % 2 AS a, ({_k}) % 3 AS b, count(*) FROM {_t} GROUP BY ({_k}) % 2, ({_k}) % 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS a, ({_k}) % 4 AS b, substr({_s}, 1, 1) AS c FROM {_t} GROUP BY {_g}, ({_k}) % 4, substr({_s}, 1, 1)) x"),
        ("TII", "rowsort", f"SELECT substr({_s}, 1, 1) AS a, ({_k}) % 2 AS b, CAST(min({_k}) AS BIGINT) AS mn FROM {_t} GROUP BY substr({_s}, 1, 1), ({_k}) % 2 HAVING count(*) > 1"),
        ("II", "rowsort", f"SELECT ({_k}) % 3 AS a, count(DISTINCT substr({_s}, 1, 2)) AS cd FROM {_t} GROUP BY ({_k}) % 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 2 AS a, ({_k}) % 5 AS b FROM {_t} GROUP BY ({_k}) % 2, ({_k}) % 5 HAVING CAST(sum(({_k}) % 11) AS BIGINT) > 5) x"),
    ])

# Expression join keys per FK pair (reference test/sql/join — joins on
# computed keys rather than bare columns).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    corpus(f"exprjoin_file_{_n}", f"expression join keys for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} + 0 = {_rk}"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON CAST({_lk} AS BIGINT) = CAST({_rk} AS BIGINT) AND length({_grp}) > 0"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} * 2 = {_rk} * 2"),
        ("II", "rowsort", f"SELECT ({_rk}) % 2, count(*) FROM {_l} JOIN {_r} ON {_on} GROUP BY ({_rk}) % 2"),
        ("I", "", f"SELECT count(*) FROM {_l.split(' ')[0]} a2 JOIN {_r.split(' ')[0]} b2 ON {_lk.replace('a.', 'a2.')} = {_rk.replace('b.', 'b2.')} AND ({_lk.replace('a.', 'a2.')}) % 2 = ({_rk.replace('b.', 'b2.')}) % 2"),
    ])

corpus("math_edges2", "round negative scale / two-arg log / signed mod (probe-verified, reference test/sql/function/math)")([
    ("R", "", "SELECT round(1234.5678, -2)"),
    ("R", "", "SELECT round(log(2.0, 8.0), 6)"),
    ("R", "", "SELECT round(log(10.0, 1000.0), 6)"),
    ("II", "", "SELECT mod(-7, 3), mod(7, -3)"),
    ("R", "", "SELECT round(cbrt(27.0) + pi(), 6)"),
    ("R", "", "SELECT round(cot(1.0), 6)"),
    ("R", "", "SELECT round(asin(0.5) + acos(0.5) + atan(0.5), 6)"),
    ("I", "", "SELECT factorial(6)"),
    ("II", "", "SELECT 3 << 5, 1024 >> 3"),
    ("T", "", "SELECT CAST((1, 2) < (1, 3) AS STRING)"),
])


# Per-table numeric-RANGE frame family (reference test/sql/window —
# value-offset frames over low-cardinality keys exercise peer groups).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winrangenum_file_{_t}", f"numeric RANGE frames over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) OVER (ORDER BY ({_k}) % 10 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS c FROM {_t}) x"),
        ("II", "rowsort", f"SELECT b, CAST(max(s) AS BIGINT) FROM (SELECT ({_k}) % 5 AS b, CAST(sum(({_k}) % 3) OVER (ORDER BY ({_k}) % 5 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s FROM {_t}) x GROUP BY b"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) OVER (ORDER BY ({_k}) % 4 RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS c FROM {_t}) x WHERE c > 1"),
        ("I", "", f"SELECT CAST(min(m) AS BIGINT) FROM (SELECT min(({_k}) % 9) OVER (ORDER BY ({_k}) % 6 RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS m FROM {_t}) x"),
        ("I", "", f"SELECT count(DISTINCT c) FROM (SELECT count(*) OVER (ORDER BY ({_k}) % 7 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS c FROM {_t}) x"),
    ])

# Per-table quantified-comparison rewrite family (reference
# test/sql/subquery/any_all — the standard min/max rewrites, since
# Spark lacks ANY/ALL syntax; both sides must agree on the rewrite).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"quantrw_file_{_t}", f"ANY/ALL rewrites over {_t} (reference test/sql/subquery/any_all)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) > (SELECT min({_k}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) >= (SELECT max({_k}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 11 < (SELECT max(({_k}) % 11) FROM {_t} WHERE {_p})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length({_s}) = (SELECT max(length({_s})) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 13 > (SELECT CAST(avg(({_k}) % 13) AS DOUBLE) FROM {_t})"),
    ])

# Per-table ordinal GROUP/ORDER BY family (reference test/sql/order —
# positional references in both clauses).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"gbordinal_file_{_t}", f"ordinal GROUP/ORDER BY over {_t} (reference test/sql/order)")([
        ("II", "rowsort", f"SELECT ({_k}) % 3, count(*) FROM {_t} GROUP BY 1"),
        ("II", "", f"SELECT ({_k}) % 4 AS b, count(*) FROM {_t} GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3"),
        ("TI", "rowsort", f"SELECT substr({_s}, 1, 1), CAST(sum(({_k}) % 5) AS BIGINT) FROM {_t} GROUP BY 1"),
        ("T", "", f"SELECT {_s} FROM {_t} ORDER BY 1, {_k} LIMIT 4"),
        ("II", "", f"SELECT ({_k}) % 2 AS a, ({_k}) % 3 AS b FROM {_t} GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 4"),
    ])

# Per-table correlated-IN family (reference test/sql/subquery — IN
# subqueries whose inner query references the outer row).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dt = f"(SELECT {_k} AS kk, {_g} AS gg FROM {_t})"
    corpus(f"insubqcorr_file_{_t}", f"correlated IN subqueries over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk IN (SELECT y.kk FROM {_dt} y WHERE y.gg = x.gg AND y.kk <= x.kk)"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk NOT IN (SELECT y.kk FROM {_dt} y WHERE y.gg = x.gg AND y.kk < x.kk)"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk IN (SELECT min(y.kk) FROM {_dt} y WHERE y.gg = x.gg)"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk % 2 IN (SELECT y.kk % 2 FROM {_dt} y WHERE y.gg = x.gg)"),
        ("I", "", f"SELECT count(*) FROM {_dt} x WHERE x.kk IN (SELECT max(y.kk) FROM {_dt} y WHERE y.gg = x.gg) AND x.kk % 2 = 0"),
    ])

# Per-table mixed DISTINCT/plain aggregate family (reference
# test/sql/aggregate/distinct — several DISTINCT aggregates beside
# plain ones in a single SELECT stresses both engines' expand paths).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"mixdist_file_{_t}", f"mixed DISTINCT aggregates over {_t} (reference test/sql/aggregate/distinct)")([
        ("III", "", f"SELECT count(DISTINCT ({_k}) % 6), count(*), CAST(sum(({_k}) % 3) AS BIGINT) FROM {_t}"),
        ("II", "", f"SELECT count(DISTINCT ({_k}) % 4), count(DISTINCT substr({_s}, 1, 1)) FROM {_t}"),
        ("IIR", "rowsort", f"SELECT ({_k}) % 2, count(DISTINCT ({_k}) % 7), round(avg(({_k}) % 5), 3) FROM {_t} GROUP BY ({_k}) % 2"),
        ("II", "", f"SELECT count(DISTINCT {_g}), CAST(max(({_k}) % 8) AS BIGINT) FROM {_t} WHERE {_p}"),
        ("III", "rowsort", f"SELECT ({_k}) % 3, CAST(sum(DISTINCT ({_k}) % 9) AS BIGINT), count({_s}) FROM {_t} GROUP BY ({_k}) % 3"),
    ])

# Two-hop nested EXISTS chains (reference test/sql/subquery/exists —
# EXISTS whose inner query itself contains a correlated EXISTS).
_EXISTS2 = {
    "customer": ("customer c", "EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_regionkey < 3))", "c.c_custkey"),
    "supplier": ("supplier s", "EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey AND EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_name LIKE 'A%'))", "s.s_suppkey"),
    "orders":   ("orders o", "EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND n.n_nationkey % 2 = 0))", "o.o_orderkey"),
    "lineitem": ("lineitem l", "EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 3 = 0))", "l.l_orderkey"),
    "events":   ("events e", "EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey < 2))", "e.event_id"),
}
for _t, (_frm, _ex, _kc) in _EXISTS2.items():
    corpus(f"exists2hop_file_{_t}", f"two-hop nested EXISTS from {_t} (reference test/sql/subquery/exists)")([
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_ex}"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE NOT ({_ex})"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_ex} AND ({_kc}) % 2 = 0"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_ex} THEN 1 ELSE 0 END) AS BIGINT) FROM {_frm}"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_ex} OR ({_kc}) % 7 = 0"),
    ])


# Per-table nested-CASE family (reference test/sql/case — three levels
# deep, branches unifying across types via explicit casts).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"casenest_file_{_t}", f"nested CASE over {_t} (reference test/sql/case)")([
        ("T", "", f"SELECT CASE WHEN {_p} THEN CASE WHEN ({_k}) % 2 = 0 THEN 'pe' ELSE 'po' END ELSE CASE WHEN ({_k}) % 2 = 0 THEN 'ne' ELSE 'no' END END FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("II", "rowsort", f"SELECT CASE WHEN ({_k}) % 4 < 2 THEN CASE WHEN ({_k}) % 2 = 0 THEN 0 ELSE 1 END ELSE CASE WHEN ({_k}) % 2 = 0 THEN 2 ELSE 3 END END AS q, count(*) FROM {_t} GROUP BY CASE WHEN ({_k}) % 4 < 2 THEN CASE WHEN ({_k}) % 2 = 0 THEN 0 ELSE 1 END ELSE CASE WHEN ({_k}) % 2 = 0 THEN 2 ELSE 3 END END"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_p} THEN CASE WHEN ({_k}) % 3 = 0 THEN 10 ELSE 1 END ELSE 0 END) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CASE ({_k}) % 3 WHEN 0 THEN CASE ({_k}) % 2 WHEN 0 THEN 'a' ELSE 'b' END WHEN 1 THEN 'c' ELSE 'd' END FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN {_p} THEN CASE WHEN ({_k}) % 5 = 0 THEN TRUE ELSE FALSE END ELSE FALSE END"),
    ])

# Per-table windows-inside-set-op-branches family (reference
# test/sql/window + setops — each branch ranks independently).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"windowsetop_file_{_t}", f"windows in set-op branches over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn FROM {_t} WHERE {_p} UNION ALL SELECT row_number() OVER (ORDER BY {_k} DESC) FROM {_t} WHERE NOT ({_p})) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn FROM {_t} UNION SELECT row_number() OVER (ORDER BY {_k} DESC) FROM {_t}) x"),
        ("I", "", f"SELECT CAST(max(rn) AS BIGINT) FROM (SELECT rank() OVER (PARTITION BY {_g} ORDER BY {_k}) AS rn FROM {_t} UNION ALL SELECT 0 FROM region) x"),
        ("II", "rowsort", f"SELECT rn % 3, count(*) FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn FROM {_t} INTERSECT SELECT row_number() OVER (ORDER BY {_k} DESC) AS rn FROM {_t}) x GROUP BY rn % 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT ntile(3) OVER (ORDER BY {_k}) AS nt FROM {_t} EXCEPT SELECT 99 AS nt FROM region) x"),
    ])

# Per-table set-ops-inside-subquery family (reference test/sql/subquery
# — UNION/INTERSECT feeding IN and scalar positions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"subqsetop_file_{_t}", f"set-ops inside subqueries over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 6 IN (SELECT ({_k}) % 6 FROM {_t} WHERE {_p} INTERSECT SELECT ({_k}) % 6 FROM {_t} WHERE ({_k}) % 2 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 8 IN (SELECT ({_k}) % 8 FROM {_t} WHERE {_p} EXCEPT SELECT ({_k}) % 8 FROM {_t} WHERE ({_k}) % 3 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) IN (SELECT min({_k}) FROM {_t} UNION ALL SELECT max({_k}) FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXISTS (SELECT ({_k}) % 2 FROM {_t} WHERE {_p} INTERSECT SELECT 0 FROM region)"),
        ("I", "", f"SELECT CAST((SELECT count(*) FROM (SELECT ({_k}) % 4 FROM {_t} UNION SELECT ({_k}) % 5 FROM {_t}) u) AS BIGINT)"),
    ])

# NULL-key join behavior per FK pair (reference test/sql/join/
# test_join_null.test — nullif-manufactured NULL keys never match; the
# anti side counts them back in).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _nullk = f"nullif({_lk}, 0)"
    corpus(f"nulljoin_file_{_n}", f"NULL join keys for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_nullk} = {_rk}"),
        ("II", "", f"SELECT count(*), count({_rk}) FROM {_l} LEFT JOIN {_r} ON {_nullk} = {_rk}"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_nullk} = {_rk} WHERE {_rk} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE {_nullk} IS NULL OR EXISTS (SELECT 1 FROM {_r} WHERE {_nullk} = {_rk})"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON coalesce({_nullk}, -1) = {_rk}"),
    ])


# Per-table greatest/least family (reference test/sql/function/generic
# — multi-arg with NULL branches; both engines skip NULLs).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"gl_file_{_t}", f"greatest/least over {_t} (reference test/sql/function)")([
        ("II", "", f"SELECT CAST(sum(greatest(({_k}) % 7, ({_k}) % 5, 3)) AS BIGINT), CAST(sum(least(({_k}) % 7, ({_k}) % 5, 3)) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(greatest(({_k}) % 4, nullif(({_k}) % 4, 2))) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE greatest(({_k}) % 6, 2) = least(({_k}) % 6 + 2, 7)"),
        ("T", "", f"SELECT greatest({_s}, upper({_s})) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("II", "rowsort", f"SELECT greatest(({_k}) % 3, 1), count(*) FROM {_t} GROUP BY greatest(({_k}) % 3, 1)"),
    ])

# Per-table gaps-and-islands family (reference test/sql/window — the
# lag-flag / running-sum island idiom over modulo sequences).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _flag = f"CASE WHEN lag(gv) OVER (ORDER BY kk) = gv THEN 0 ELSE 1 END"
    _inner = f"(SELECT {_k} AS kk, ({_k}) % 3 AS gv FROM {_t})"
    corpus(f"gapisland_file_{_t}", f"gaps-and-islands over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT CAST(sum(f) AS BIGINT) FROM (SELECT {_flag} AS f FROM {_inner} x) y"),
        ("I", "", f"SELECT count(DISTINCT isl) FROM (SELECT CAST(sum(f) OVER (ORDER BY kk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl FROM (SELECT kk, {_flag} AS f FROM {_inner} x) y) z"),
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM (SELECT isl, count(*) AS c FROM (SELECT CAST(sum(f) OVER (ORDER BY kk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl FROM (SELECT kk, {_flag} AS f FROM {_inner} x) y) z GROUP BY isl) w"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk, gv, lag(gv) OVER (ORDER BY kk) AS pg FROM {_inner} x) y WHERE pg IS NOT NULL AND pg <> gv"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, CAST(gv AS BIGINT) AS gb FROM (SELECT kk, gv, lag(gv) OVER (ORDER BY kk) AS pg FROM {_inner} x) y WHERE pg IS NULL OR pg <> gv ORDER BY kk LIMIT 5"),
    ])

# Per-table share-of-total family (reference test/sql/window +
# subquery — group share computed both by window and by scalar
# subquery; the two forms must agree).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sharecalc_file_{_t}", f"share-of-total over {_t} (reference test/sql/window)")([
        ("IR", "rowsort", f"SELECT c, round(c * 1.0 / t, 3) FROM (SELECT count(*) AS c, CAST(sum(count(*)) OVER () AS BIGINT) AS t FROM {_t} GROUP BY {_g}) x"),
        ("IR", "rowsort", f"SELECT c, round(c * 1.0 / (SELECT count(*) FROM {_t}), 3) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_g}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) AS c, CAST(sum(count(*)) OVER () AS BIGINT) AS t FROM {_t} GROUP BY {_g}) x WHERE c * 2 > t"),
        ("R", "", f"SELECT round(max(c * 1.0 / t), 3) FROM (SELECT count(*) AS c, CAST(sum(count(*)) OVER () AS BIGINT) AS t FROM {_t} GROUP BY {_g}) x"),
        ("I", "", f"SELECT CAST(sum(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_g}) x"),
    ])

# Per-table parenthesized branch-LIMIT set-op family (reference
# test/sql/setops — ORDER BY/LIMIT scoped to a branch by parentheses).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"unionbranchlim_file_{_t}", f"branch-scoped LIMIT set-ops over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM ((SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 3) UNION ALL (SELECT {_k} FROM {_t} ORDER BY {_k} DESC LIMIT 2)) u"),
        ("I", "", f"SELECT CAST(max(kk) AS BIGINT) FROM ((SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 5) UNION (SELECT {_k} FROM {_t} ORDER BY {_k} LIMIT 2)) u"),
        ("I", "", f"SELECT count(*) FROM ((SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 4) INTERSECT (SELECT {_k} FROM {_t} ORDER BY {_k} LIMIT 6)) u"),
        ("I", "", f"SELECT count(*) FROM ((SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 6) EXCEPT (SELECT {_k} FROM {_t} ORDER BY {_k} LIMIT 2)) u"),
        ("T", "", f"SELECT sv FROM ((SELECT {_s} AS sv, {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 3) UNION ALL (SELECT {_s}, {_k} FROM {_t} ORDER BY {_k} DESC LIMIT 1)) u ORDER BY kk LIMIT 2"),
    ])


# Per-table neighbor self-join family (reference test/sql/join —
# offset-key equi-joins; the lag() equivalence is asserted by pairing
# the join count with the window count in one file).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"neighborjoin_file_{_t}", f"offset-key self-joins over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t}) a JOIN (SELECT {_k} AS kk FROM {_t}) b ON a.kk + 1 = b.kk"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk, lag(kk) OVER (ORDER BY kk) AS pk FROM (SELECT {_k} AS kk FROM {_t}) x) y WHERE pk = kk - 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t}) a JOIN (SELECT {_k} AS kk FROM {_t}) b ON a.kk + 2 = b.kk WHERE a.kk % 2 = 0"),
        ("I", "", f"SELECT CAST(sum(b.kk - a.kk) AS BIGINT) FROM (SELECT {_k} AS kk FROM {_t}) a JOIN (SELECT {_k} AS kk FROM {_t}) b ON a.kk + 1 = b.kk"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t}) a LEFT JOIN (SELECT {_k} AS kk FROM {_t}) b ON a.kk + 1 = b.kk WHERE b.kk IS NULL"),
    ])

# Per-table anti-join triple-agreement family (reference test/sql/join
# — NOT EXISTS, NOT IN (null-safe), and EXCEPT must all agree).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _a = f"(SELECT {_k} AS kk FROM {_t})"
    _b = f"(SELECT {_k} AS kk FROM {_t} WHERE {_p})"
    corpus(f"antitriple_file_{_t}", f"anti-join formulations agree over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_a} a WHERE NOT EXISTS (SELECT 1 FROM {_b} b WHERE b.kk = a.kk)"),
        ("I", "", f"SELECT count(*) FROM {_a} a WHERE a.kk NOT IN (SELECT kk FROM {_b} b)"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk FROM {_a} a EXCEPT SELECT kk FROM {_b} b) x"),
        ("I", "", f"SELECT count(*) FROM {_a} a LEFT JOIN {_b} b ON a.kk = b.kk WHERE b.kk IS NULL"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_a} a WHERE NOT EXISTS (SELECT 1 FROM {_b} b WHERE b.kk = a.kk)) = (SELECT count(*) FROM (SELECT kk FROM {_a} c EXCEPT SELECT kk FROM {_b} d) x) AS STRING)"),
    ])

# Per-table tagged-union aggregation family (reference test/sql/setops
# + aggregate — branch tags grouped after UNION ALL).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _u = f"(SELECT 'hit' AS tag, {_k} AS kk FROM {_t} WHERE {_p} UNION ALL SELECT 'miss' AS tag, {_k} FROM {_t} WHERE NOT ({_p}))"
    corpus(f"unionagg_file_{_t}", f"aggregation over tagged unions of {_t} (reference test/sql/setops)")([
        ("TI", "rowsort", f"SELECT tag, count(*) FROM {_u} u GROUP BY tag"),
        ("I", "", f"SELECT count(*) FROM {_u} u"),
        ("TI", "rowsort", f"SELECT tag, CAST(sum(kk % 10) AS BIGINT) FROM {_u} u GROUP BY tag"),
        ("TI", "rowsort", f"SELECT tag, count(DISTINCT kk % 6) FROM {_u} u GROUP BY tag HAVING count(*) > 0"),
        ("I", "", f"SELECT count(DISTINCT tag) FROM {_u} u"),
    ])

# Per-table empty-input propagation family (reference test/sql/filter +
# aggregate — WHERE FALSE / LIMIT 0 through aggregates and joins).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"empty0_file_{_t}", f"empty-input propagation over {_t} (reference test/sql/filter)")([
        ("IT", "", f"SELECT count(*), CAST(sum(({_k}) % 5) AS STRING) FROM {_t} WHERE 1 = 0"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} LIMIT 0) x"),
        ("T", "", f"SELECT CAST(max({_s}) AS STRING) FROM {_t} WHERE FALSE"),
        ("I", "", f"SELECT count(*) FROM {_t} a JOIN (SELECT {_k} AS kk FROM {_t} WHERE 1 = 0) b ON ({_k}) = b.kk"),
        ("II", "", f"SELECT count(*), count(b.kk % 2) FROM {_t} LEFT JOIN (SELECT {_k} AS kk FROM {_t} WHERE FALSE) b ON 1 = 1"),
    ])


# Reporting-pipeline compositions per FK pair (reference test/sql —
# CTE chain: filter -> join -> group -> window -> filter, the shape of
# real dashboard queries).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    _cte = (
        f"WITH j AS (SELECT {_grp} AS g, ({_ak}) % 20 AS m FROM {_l} JOIN {_r} ON {_on}), "
        f"a AS (SELECT g, count(*) AS c, CAST(sum(m) AS BIGINT) AS s FROM j GROUP BY g), "
        f"w AS (SELECT g, c, s, rank() OVER (ORDER BY c DESC, g) AS rk FROM a)"
    )
    corpus(f"pipelineq_file_{_n}", f"filter-join-group-window pipeline over {_n} (reference test/sql)")([
        ("TII", "", f"{_cte} SELECT g, c, rk FROM w ORDER BY rk LIMIT 3"),
        ("I", "", f"{_cte} SELECT count(*) FROM w WHERE rk <= 2"),
        ("TI", "rowsort", f"{_cte} SELECT g, CAST(s AS BIGINT) FROM w WHERE c > 1"),
        ("I", "", f"{_cte} SELECT CAST(sum(c) AS BIGINT) FROM w"),
        ("T", "", f"{_cte} SELECT g FROM w WHERE rk = 1"),
    ])

# Per-table HAVING-with-subquery family (reference test/sql/aggregate/
# having — group predicates referencing scalar subqueries).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"havingsubq_file_{_t}", f"HAVING with subqueries over {_t} (reference test/sql/aggregate/having)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING count(*) > (SELECT count(*) FROM {_t}) / 10) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING CAST(min({_k}) AS BIGINT) > (SELECT CAST(min({_k}) AS BIGINT) FROM {_t})) x"),
        ("TI", "rowsort", f"SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g} HAVING count(*) >= (SELECT max(c) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_g}) y)"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 4 AS b FROM {_t} GROUP BY ({_k}) % 4 HAVING count(*) > (SELECT count(*) FROM region)) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING count(DISTINCT ({_k}) % 5) = (SELECT count(DISTINCT r_regionkey) FROM region)) x"),
    ])

# Per-table NULL-predicate distribution family (reference
# test/sql/filter — IS [NOT] NULL over computed expressions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _ne = f"nullif(({_k}) % 4, 1)"
    corpus(f"nullpred_file_{_t}", f"IS NULL over computed expressions of {_t} (reference test/sql/filter)")([
        ("II", "", f"SELECT count_if({_ne} IS NULL), count_if({_ne} IS NOT NULL) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_ne} + 1 IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_ne} * 0) IS NOT NULL"),
        ("II", "rowsort", f"SELECT CAST({_ne} IS NULL AS INT), count(*) FROM {_t} GROUP BY {_ne} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN {_ne} IS NULL THEN {_p} ELSE NOT ({_p}) END"),
    ])

# Per-table expression-BETWEEN family (reference test/sql/filter —
# computed bounds on both sides, NOT BETWEEN, BETWEEN inside CASE).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"betweenexpr_file_{_t}", f"expression BETWEEN over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 BETWEEN ({_k}) % 3 AND ({_k}) % 3 + 5"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 7 NOT BETWEEN 2 AND 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length({_s}) BETWEEN 3 AND 15"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN ({_k}) % 9 BETWEEN 3 AND 6 THEN 1 ELSE 0 END) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 5 BETWEEN 1 AND 3 AND {_p}"),
    ])


# Per-table rank-gap family (reference test/sql/window — rank vs
# dense_rank vs row_number over TIED orderings; modulo keys create the
# big peer groups the distinction needs).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _tied = f"(SELECT {_k} AS kk, ({_k}) % 3 AS tv FROM {_t})"
    corpus(f"rankgap_file_{_t}", f"rank vs dense_rank over ties in {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (ORDER BY tv) AS rk, dense_rank() OVER (ORDER BY tv) AS dr FROM {_tied} x) y WHERE rk <> dr"),
        ("II", "", f"SELECT CAST(max(rk) AS BIGINT), CAST(max(dr) AS BIGINT) FROM (SELECT rank() OVER (ORDER BY tv) AS rk, dense_rank() OVER (ORDER BY tv) AS dr FROM {_tied} x) y"),
        ("I", "", f"SELECT count(DISTINCT rk) FROM (SELECT rank() OVER (ORDER BY tv) AS rk FROM {_tied} x) y"),
        ("II", "rowsort", f"SELECT rk, count(*) FROM (SELECT rank() OVER (ORDER BY tv) AS rk FROM {_tied} x) y GROUP BY rk"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (ORDER BY tv, kk) AS rn, rank() OVER (ORDER BY tv, kk) AS rk FROM {_tied} x) y WHERE rn <> rk"),
    ])

# Per-table CTE-mix family (reference test/sql/cte — CTEs containing
# windows and set-ops, referenced multiple times downstream).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"ctemix_file_{_t}", f"CTEs with windows and set-ops over {_t} (reference test/sql/cte)")([
        ("I", "", f"WITH w AS (SELECT {_k} AS kk, row_number() OVER (ORDER BY {_k}) AS rn FROM {_t}) SELECT count(*) FROM w a JOIN w b ON a.rn = b.rn + 1 WHERE a.kk >= b.kk"),
        ("I", "", f"WITH s AS (SELECT {_k} AS kk FROM {_t} WHERE {_p} UNION SELECT {_k} FROM {_t} WHERE ({_k}) % 2 = 0) SELECT count(*) FROM s"),
        ("II", "", f"WITH w AS (SELECT ({_k}) % 4 AS b, count(*) AS c FROM {_t} GROUP BY ({_k}) % 4), t AS (SELECT b, c, rank() OVER (ORDER BY c DESC, b) AS rk FROM w) SELECT CAST(b AS BIGINT), CAST(c AS BIGINT) FROM t WHERE rk = 1"),
        ("I", "", f"WITH a AS (SELECT {_k} AS kk FROM {_t}), b AS (SELECT kk FROM a WHERE kk % 2 = 0), c AS (SELECT kk FROM a EXCEPT SELECT kk FROM b) SELECT count(*) FROM c"),
        ("I", "", f"WITH w AS (SELECT {_k} AS kk, ntile(4) OVER (ORDER BY {_k}) AS q FROM {_t}) SELECT count(*) FROM w WHERE q IN (1, 4)"),
    ])

# Two-dimension star joins per fact table (reference test/sql/join —
# a fact joined to two dimensions, grouped by both).
_STARS = {
    "orders":   ("orders f JOIN customer d1 ON f.o_custkey = d1.c_custkey JOIN nation d2 ON d1.c_nationkey = d2.n_nationkey", "d1.c_mktsegment", "d2.n_name", "f.o_orderkey"),
    "lineitem": ("lineitem f JOIN orders d1 ON f.l_orderkey = d1.o_orderkey JOIN part d2 ON f.l_partkey = d2.p_partkey", "d1.o_orderstatus", "d2.p_brand", "f.l_orderkey * 10 + f.l_linenumber"),
    "events":   ("events f JOIN customer d1 ON f.user_id = d1.c_custkey JOIN nation d2 ON d1.c_nationkey = d2.n_nationkey", "f.event_type", "d2.n_name", "f.event_id"),
    # Added in round-4 part 6: lineitem's OTHER two dimensions.
    "lineitem2": ("lineitem f JOIN supplier d1 ON f.l_suppkey = d1.s_suppkey JOIN part d2 ON f.l_partkey = d2.p_partkey", "d1.s_name", "d2.p_brand", "f.l_orderkey * 10 + f.l_linenumber"),
}
for _t, (_frm, _d1, _d2, _fk) in _STARS.items():
    corpus(f"startwo_file_{_t}", f"two-dimension star join over {_t} (reference test/sql/join)")([
        ("TTI", "rowsort", f"SELECT {_d1} AS a, {_d2} AS b, count(*) FROM {_frm} GROUP BY {_d1}, {_d2} HAVING count(*) > 1"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_d1} AS a, {_d2} AS b FROM {_frm} GROUP BY {_d1}, {_d2}) x"),
        ("TI", "rowsort", f"SELECT {_d1} AS a, count(DISTINCT {_d2}) FROM {_frm} GROUP BY {_d1}"),
        ("II", "", f"SELECT CAST(min({_fk}) AS BIGINT), CAST(max({_fk}) AS BIGINT) FROM {_frm}"),
        ("TI", "rowsort", f"SELECT {_d2} AS b, CAST(sum(({_fk}) % 10) AS BIGINT) FROM {_frm} GROUP BY {_d2} HAVING count(*) > 2"),
    ])

# Per-table scalar-subquery-in-CASE family (reference test/sql/case +
# subquery — scalar subqueries in the condition and in branches).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"casescalar_file_{_t}", f"scalar subqueries inside CASE over {_t} (reference test/sql/case)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN ({_k}) > (SELECT CAST(avg({_k}) AS DOUBLE) FROM {_t}) THEN TRUE ELSE FALSE END"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN ({_k}) % 2 = 0 THEN (SELECT count(*) FROM region) ELSE 1 END) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CASE WHEN (SELECT count(*) FROM {_t}) > 3 THEN 'many' ELSE 'few' END"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 6 = CASE WHEN (SELECT count(*) FROM region) = 5 THEN 0 ELSE 1 END"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN ({_k}) < (SELECT CAST(max({_k}) AS BIGINT) FROM {_t} WHERE {_p}) THEN 1 ELSE 0 END) AS BIGINT) FROM {_t}"),
    ])


# Multi-column IN-subquery `(a, b) IN (SELECT x, y ...)` EXCLUDED:
# Spark accepts it but DuckDB's binder rejects the row-value subquery
# IN form (probe-verified on every table) — the tuple_in / rowvalue
# families cover the literal-tuple spellings both engines share.

# Per-table DISTINCT + ORDER BY interplay (reference test/sql/distinct
# + order — ordering keys restricted to the distinct select list).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"distinctorder_file_{_t}", f"DISTINCT with ORDER BY over {_t} (reference test/sql/distinct)")([
        ("I", "", f"SELECT b FROM (SELECT DISTINCT ({_k}) % 5 AS b FROM {_t}) x ORDER BY b LIMIT 3"),
        ("T", "", f"SELECT DISTINCT substr({_s}, 1, 1) AS c1 FROM {_t} ORDER BY c1 DESC LIMIT 4"),
        ("II", "", f"SELECT DISTINCT ({_k}) % 3 AS a, ({_k}) % 2 AS b FROM {_t} ORDER BY a, b LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT DISTINCT ({_k}) % 7 AS a, substr({_s}, 1, 1) AS b FROM {_t} WHERE {_p}) x"),
        ("T", "", f"SELECT DISTINCT upper(substr({_s}, 1, 2)) AS u FROM {_t} ORDER BY u LIMIT 5"),
    ])

# Correlated LATERAL subqueries per FK pair (reference
# test/sql/subquery/lateral — per-dim aggregates computed laterally).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _rkc = _rk.split(".")[1]
    _lkc = _lk.split(".")[1]
    corpus(f"lateralpair_file_{_n}", f"LATERAL per-dim aggregates for {_n} (reference test/sql/subquery/lateral)")([
        ("I", "", f"SELECT CAST(sum(x.c) AS BIGINT) FROM {_rt} b, LATERAL (SELECT count(*) AS c FROM {_lt} a WHERE a.{_lkc} = b.{_rkc}) x"),
        ("I", "", f"SELECT count(*) FROM {_rt} b, LATERAL (SELECT count(*) AS c FROM {_lt} a WHERE a.{_lkc} = b.{_rkc}) x WHERE x.c = 0"),
        ("I", "", f"SELECT CAST(max(x.c) AS BIGINT) FROM {_rt} b, LATERAL (SELECT count(*) AS c FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} AND a.{_lkc} % 2 = 0) x"),
        ("I", "", f"SELECT count(*) FROM {_rt} b, LATERAL (SELECT CAST(min(a.{_lkc}) AS BIGINT) AS mn FROM {_lt} a WHERE a.{_lkc} = b.{_rkc}) x WHERE x.mn IS NOT NULL"),
        ("I", "", f"SELECT CAST(sum(x.c * x.c) AS BIGINT) FROM {_rt} b, LATERAL (SELECT count(*) AS c FROM {_lt} a WHERE a.{_lkc} = b.{_rkc}) x"),
    ])


# Per-table running-average family (reference test/sql/window —
# cumulative avg/min/max over integer sequences; avg of small ints is
# exact in double, rounded to 3 for rendering).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winrunavg_file_{_t}", f"running averages over {_t} (reference test/sql/window)")([
        ("R", "", f"SELECT round(avg(({_k}) % 10) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("I", "", f"SELECT count(*) FROM (SELECT avg(({_k}) % 4) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra FROM {_t}) x WHERE ra > 1.5"),
        ("II", "", f"SELECT CAST(min(({_k}) % 7) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rm, CAST(max(({_k}) % 7) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rx FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("R", "", f"SELECT round(avg(({_k}) % 5) OVER (PARTITION BY {_g} ORDER BY {_k} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("R", "", f"SELECT round(max(ra), 3) FROM (SELECT avg(({_k}) % 9) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra FROM {_t}) x"),
    ])

# CTE-defined join sides per FK pair (reference test/sql/cte + join —
# both relations filtered/projected in CTEs before the join).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    _gc = _grp.split(".")[1]
    corpus(f"multictejoin_file_{_n}", f"CTE-defined join sides for {_n} (reference test/sql/cte)")([
        ("I", "", f"WITH lhs AS (SELECT {_lkc} AS fk FROM {_lt}), rhs AS (SELECT {_rkc} AS pk, {_gc} AS g FROM {_rt}) SELECT count(*) FROM lhs JOIN rhs ON lhs.fk = rhs.pk"),
        ("TI", "rowsort", f"WITH lhs AS (SELECT {_lkc} AS fk FROM {_lt} WHERE {_lkc} % 2 = 0), rhs AS (SELECT {_rkc} AS pk, {_gc} AS g FROM {_rt}) SELECT g, count(*) FROM lhs JOIN rhs ON lhs.fk = rhs.pk GROUP BY g"),
        ("I", "", f"WITH rhs AS (SELECT {_rkc} AS pk FROM {_rt} WHERE {_rkc} % 3 <> 1) SELECT count(*) FROM {_lt} a JOIN rhs ON a.{_lkc} = rhs.pk"),
        ("I", "", f"WITH lhs AS (SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc}) SELECT CAST(sum(lhs.c) AS BIGINT) FROM lhs JOIN {_rt} b ON lhs.fk = b.{_rkc}"),
        ("I", "", f"WITH lhs AS (SELECT {_lkc} AS fk FROM {_lt}), rhs AS (SELECT {_rkc} AS pk FROM {_rt}) SELECT count(*) FROM lhs LEFT JOIN rhs ON lhs.fk = rhs.pk WHERE rhs.pk IS NULL"),
    ])

# Per-table manual-crosstab family (reference test/sql/pivot — the
# sum(CASE) wide-pivot idiom, grouped one way and spread another).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"crosstab_file_{_t}", f"sum(CASE) crosstab over {_t} (reference test/sql/pivot)")([
        ("IIII", "rowsort", f"SELECT ({_k}) % 2 AS r, CAST(sum(CASE WHEN ({_k}) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, CAST(sum(CASE WHEN ({_k}) % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1, CAST(sum(CASE WHEN ({_k}) % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2 FROM {_t} GROUP BY ({_k}) % 2"),
        ("TII", "rowsort", f"SELECT CAST({_g} AS STRING) AS r, count_if({_p}) AS hits, count_if(NOT ({_p})) AS misses FROM {_t} GROUP BY {_g}"),
        ("II", "", f"SELECT CAST(sum(CASE WHEN {_p} THEN ({_k}) % 5 END) AS BIGINT), CAST(sum(CASE WHEN NOT ({_p}) THEN ({_k}) % 5 END) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 4 AS r, count_if(({_k}) % 2 = 0) AS e FROM {_t} GROUP BY ({_k}) % 4 HAVING count_if(({_k}) % 2 = 0) > 0) x"),
        ("TII", "rowsort", f"SELECT substr({_s}, 1, 1) AS r, CAST(min(CASE WHEN {_p} THEN ({_k}) % 9 END) AS BIGINT) AS mn, CAST(max(CASE WHEN {_p} THEN ({_k}) % 9 END) AS BIGINT) AS mx FROM {_t} GROUP BY substr({_s}, 1, 1)"),
    ])

# Per-table within-group share family (reference test/sql/window —
# partitioned window sums as denominators; integer counts keep it
# exact before the final rounding).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _cell = f"(SELECT {_g} AS gg, ({_k}) % 3 AS sub, count(*) AS c FROM {_t} GROUP BY {_g}, ({_k}) % 3)"
    corpus(f"groupshare_file_{_t}", f"within-group shares over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT c, CAST(sum(c) OVER (PARTITION BY gg) AS BIGINT) AS gt FROM {_cell} x) y WHERE c * 2 > gt"),
        ("R", "", f"SELECT round(max(c * 1.0 / gt), 3) FROM (SELECT c, CAST(sum(c) OVER (PARTITION BY gg) AS BIGINT) AS gt FROM {_cell} x) y"),
        ("I", "", f"SELECT CAST(sum(gt) AS BIGINT) FROM (SELECT CAST(sum(c) OVER (PARTITION BY gg) AS BIGINT) AS gt FROM {_cell} x) y"),
        ("I", "", f"SELECT count(DISTINCT gt) FROM (SELECT CAST(sum(c) OVER (PARTITION BY gg) AS BIGINT) AS gt FROM {_cell} x) y"),
        ("I", "", f"SELECT count(*) FROM (SELECT gg, c, rank() OVER (PARTITION BY gg ORDER BY c DESC, sub) AS rk FROM {_cell} x) y WHERE rk = 1"),
    ])


# Dual-dimension EXISTS predicates per star fact (reference
# test/sql/subquery/exists — conjunctions and negations of EXISTS
# against two different dimensions of the same fact row).
_DUALS = {
    "orders":   ("orders f", "EXISTS (SELECT 1 FROM customer d WHERE d.c_custkey = f.o_custkey AND d.c_acctbal > 0)", "EXISTS (SELECT 1 FROM customer d2 WHERE d2.c_custkey = f.o_custkey AND d2.c_mktsegment = 'BUILDING')", "f.o_orderkey"),
    "lineitem": ("lineitem f", "EXISTS (SELECT 1 FROM orders d WHERE d.o_orderkey = f.l_orderkey AND d.o_totalprice > 100000)", "EXISTS (SELECT 1 FROM part d2 WHERE d2.p_partkey = f.l_partkey AND d2.p_size > 25)", "f.l_orderkey * 10 + f.l_linenumber"),
    "events":   ("events f", "EXISTS (SELECT 1 FROM customer d WHERE d.c_custkey = f.user_id AND d.c_acctbal > 0)", "EXISTS (SELECT 1 FROM customer d2 WHERE d2.c_custkey = f.user_id AND d2.c_nationkey % 2 = 0)", "f.event_id"),
}
for _t, (_frm, _e1, _e2, _fk) in _DUALS.items():
    corpus(f"dualexists_file_{_t}", f"two-dimension EXISTS over {_t} (reference test/sql/subquery/exists)")([
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_e1} AND {_e2}"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_e1} AND NOT ({_e2})"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_e1} OR {_e2}"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE NOT ({_e1}) AND NOT ({_e2})"),
        ("II", "", f"SELECT count_if({_e1}), count_if({_e2}) FROM {_frm}"),
    ])

# Per-table group-size histogram family (reference test/sql/aggregate —
# the two-level "histogram of group sizes" idiom).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _sizes = f"(SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g})"
    corpus(f"gsizehist_file_{_t}", f"group-size histogram over {_t} (reference test/sql/aggregate)")([
        ("II", "rowsort", f"SELECT c, count(*) FROM {_sizes} x GROUP BY c"),
        ("I", "", f"SELECT count(*) FROM {_sizes} x WHERE c = (SELECT max(c) FROM {_sizes} y)"),
        ("II", "", f"SELECT CAST(min(c) AS BIGINT), CAST(max(c) AS BIGINT) FROM {_sizes} x"),
        ("I", "", f"SELECT count(DISTINCT c) FROM {_sizes} x"),
        ("II", "rowsort", f"SELECT CAST(c % 2 AS BIGINT), CAST(sum(c) AS BIGINT) FROM {_sizes} x GROUP BY c % 2"),
    ])

# Per-table split_part family (reference test/sql/function/string —
# both engines share split_part incl. out-of-range index -> '').
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"splitpart_file_{_t}", f"split_part over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT split_part({_s}, 'a', 1) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT split_part({_s}, 'e', 2) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE split_part({_s}, 'a', 2) = ''"),
        ("T", "", f"SELECT split_part(concat({_s}, '|', CAST(({_k}) % 10 AS STRING)), '|', 2) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(split_part({_s}, ' ', 1)) > 0"),
    ])

# Modulo-bucket (non-FK) equi-joins per pair (reference test/sql/join —
# many-to-many equi-joins on computed buckets, bounded by the modulus).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    corpus(f"modjoin_file_{_n}", f"modulo-bucket joins for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON ({_lk}) % 5 = ({_rk}) % 5"),
        ("II", "rowsort", f"SELECT ({_rk}) % 3, count(*) FROM {_l} JOIN {_r} ON ({_lk}) % 3 = ({_rk}) % 3 GROUP BY ({_rk}) % 3"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON ({_lk}) % 4 = ({_rk}) % 4 AND {_on}"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON ({_lk}) % 7 = ({_rk}) % 7 AND ({_rk}) % 2 = 1 WHERE {_rk} IS NULL"),
        ("I", "", f"SELECT count(DISTINCT ({_lk}) % 6) FROM {_l} JOIN {_r} ON ({_lk}) % 6 = ({_rk}) % 6"),
    ])


# Per-table two-key window partitioning (reference test/sql/window —
# composite PARTITION BY with per-partition ranks and counts).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winpartmulti_file_{_t}", f"two-key window partitions over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (PARTITION BY {_g}, ({_k}) % 2 ORDER BY {_k}) AS rn FROM {_t}) x WHERE rn = 1"),
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) OVER (PARTITION BY {_g}, ({_k}) % 3) AS c FROM {_t}) x"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (PARTITION BY {_g}, ({_k}) % 2 ORDER BY {_k} DESC) AS rn FROM {_t}) x WHERE rn = 1 ORDER BY kb LIMIT 5"),
        ("I", "", f"SELECT count(DISTINCT c) FROM (SELECT count(*) OVER (PARTITION BY {_g}, ({_k}) % 4) AS c FROM {_t}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (PARTITION BY ({_k}) % 2, ({_k}) % 3 ORDER BY ({_k}) % 5, {_k}) AS rk FROM {_t}) x WHERE rk <= 2"),
    ])

# COALESCE over outer-join results per FK pair (reference
# test/sql/join — NULL-filling the unmatched side before grouping).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"coalescejoin_file_{_n}", f"COALESCE over outer join {_n} (reference test/sql/join)")([
        ("TI", "rowsort", f"SELECT coalesce({_grp}, '(none)') AS g, count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 2 = 0 GROUP BY coalesce({_grp}, '(none)')"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 3 = 0 WHERE coalesce({_grp}, 'x') = 'x'"),
        ("I", "", f"SELECT count(DISTINCT coalesce({_grp}, CAST(({_ak}) % 2 AS STRING))) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 2 = 1"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_grp} IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 5 = 0"),
        ("TI", "rowsort", f"SELECT coalesce(substr({_grp}, 1, 2), '--') AS g, count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND ({_ak}) % 4 < 2 GROUP BY coalesce(substr({_grp}, 1, 2), '--')"),
    ])

# Per-table multi-FILTER-clause family (reference test/sql/aggregate/
# filter — several FILTER predicates beside each other and vs the
# sum(CASE) equivalents).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"filtermix_file_{_t}", f"multiple FILTER clauses over {_t} (reference test/sql/aggregate)")([
        ("III", "", f"SELECT count(*) FILTER (WHERE {_p}), count(*) FILTER (WHERE ({_k}) % 2 = 0), count(*) FILTER (WHERE ({_k}) % 3 = 0) FROM {_t}"),
        ("II", "", f"SELECT CAST(sum(({_k}) % 7) FILTER (WHERE {_p}) AS BIGINT), CAST(sum(({_k}) % 7) FILTER (WHERE NOT ({_p})) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST(count(*) FILTER (WHERE {_p}) = CAST(sum(CASE WHEN {_p} THEN 1 ELSE 0 END) AS BIGINT) AS STRING) FROM {_t}"),
        ("II", "rowsort", f"SELECT ({_k}) % 2, count(*) FILTER (WHERE ({_k}) % 3 = 1) FROM {_t} GROUP BY ({_k}) % 2"),
        ("II", "", f"SELECT CAST(min({_k}) FILTER (WHERE ({_k}) % 2 = 1) AS BIGINT), CAST(max({_k}) FILTER (WHERE ({_k}) % 2 = 0) AS BIGINT) FROM {_t}"),
    ])


# Per-table local-extrema family (reference test/sql/window — rows
# compared against both lag and lead neighbors).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _seq = f"(SELECT {_k} AS kk, ({_k} * {_k}) % 17 AS mv FROM {_t})"
    corpus(f"localmax_file_{_t}", f"local extrema via lag/lead over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT mv, lag(mv) OVER (ORDER BY kk) AS pv, lead(mv) OVER (ORDER BY kk) AS nv FROM {_seq} x) y WHERE pv IS NOT NULL AND nv IS NOT NULL AND mv > pv AND mv > nv"),
        ("I", "", f"SELECT count(*) FROM (SELECT mv, lag(mv) OVER (ORDER BY kk) AS pv, lead(mv) OVER (ORDER BY kk) AS nv FROM {_seq} x) y WHERE coalesce(pv, -1) < mv AND coalesce(nv, -1) < mv"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, CAST(mv AS BIGINT) AS mb FROM (SELECT kk, mv, lag(mv) OVER (ORDER BY kk) AS pv, lead(mv) OVER (ORDER BY kk) AS nv FROM {_seq} x) y WHERE pv IS NOT NULL AND nv IS NOT NULL AND mv < pv AND mv < nv ORDER BY kk LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT mv, lag(mv, 2) OVER (ORDER BY kk) AS p2 FROM {_seq} x) y WHERE p2 = mv"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN mv > coalesce(pv, mv) THEN 1 ELSE 0 END) AS BIGINT) FROM (SELECT mv, lag(mv) OVER (ORDER BY kk) AS pv FROM {_seq} x) y"),
    ])

# Per-table top-k-per-group family (reference test/sql/window — the
# row_number <= k idiom, checked against group-size aggregates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _rn = f"(SELECT {_k} AS kk, {_g} AS gg, row_number() OVER (PARTITION BY {_g} ORDER BY {_k}) AS rn FROM {_t})"
    corpus(f"topkpergrp_file_{_t}", f"top-k per group over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM {_rn} x WHERE rn <= 2"),
        ("I", "", f"SELECT count(*) FROM {_rn} x WHERE rn <= 3 AND kk % 2 = 0"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_rn} x WHERE rn = 1) = (SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g}) y) AS STRING)"),
        ("I", "", f"SELECT CAST(sum(kk % 10) AS BIGINT) FROM {_rn} x WHERE rn <= 2"),
        ("I", "", f"SELECT count(*) FROM {_rn} x JOIN (SELECT {_g} AS gg, count(*) AS c FROM {_t} GROUP BY {_g}) s ON x.gg = s.gg WHERE x.rn = s.c"),
    ])

# Join-fanout histograms per FK pair (reference test/sql/join — the
# distribution of per-key match counts, a join-cardinality check).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt = _l.split(" ")[0]
    _lkc = _lk.split(".")[1]
    _fan = f"(SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc})"
    corpus(f"fanouthist_file_{_n}", f"join-fanout histogram for {_n} (reference test/sql/join)")([
        ("II", "rowsort", f"SELECT c, count(*) FROM {_fan} x GROUP BY c"),
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM {_fan} x"),
        ("I", "", f"SELECT count(*) FROM {_fan} x WHERE c = 1"),
        ("I", "", f"SELECT CAST(sum(c) AS BIGINT) FROM {_fan} x"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c) AS BIGINT) FROM {_fan} x) = (SELECT count(*) FROM {_lt}) AS STRING)"),
    ])


# Per-table three-way set-op chains with parenthesization (reference
# test/sql/setops — precedence made explicit on every chain).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _a = f"SELECT ({_k}) % 6 AS x FROM {_t}"
    _b = f"SELECT ({_k}) % 4 AS x FROM {_t} WHERE {_p}"
    _c = f"SELECT ({_k}) % 3 AS x FROM {_t} WHERE ({_k}) % 2 = 0"
    corpus(f"setopchain_file_{_t}", f"three-way set-op chains over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (({_a}) UNION (({_b}) INTERSECT ({_c}))) u"),
        ("I", "", f"SELECT count(*) FROM ((({_a}) UNION ({_b})) INTERSECT ({_c})) u"),
        ("I", "", f"SELECT count(*) FROM ((({_a}) EXCEPT ({_b})) EXCEPT ({_c})) u"),
        ("I", "", f"SELECT count(*) FROM (({_a}) EXCEPT (({_b}) EXCEPT ({_c}))) u"),
        ("I", "", f"SELECT count(*) FROM ((({_a}) UNION ALL ({_b})) UNION ALL ({_c})) u"),
    ])

# Aggregate-to-aggregate joins per FK pair (reference test/sql/join —
# two differently-filtered aggregations of the fact joined on the key).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk = _on.split(" = ")[0]
    _lt = _l.split(" ")[0]
    _lkc = _lk.split(".")[1]
    _ga = f"(SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc})"
    _gb = f"(SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} WHERE {_lkc} % 2 = 0 GROUP BY {_lkc})"
    corpus(f"aggjoin2_file_{_n}", f"aggregate-to-aggregate join for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_ga} a JOIN {_gb} b ON a.fk = b.fk"),
        ("I", "", f"SELECT count(*) FROM {_ga} a LEFT JOIN {_gb} b ON a.fk = b.fk WHERE b.fk IS NULL"),
        ("I", "", f"SELECT CAST(sum(a.c - coalesce(b.c, 0)) AS BIGINT) FROM {_ga} a LEFT JOIN {_gb} b ON a.fk = b.fk"),
        ("I", "", f"SELECT count(*) FROM {_ga} a JOIN {_gb} b ON a.fk = b.fk WHERE a.c = b.c"),
        ("II", "", f"SELECT CAST(max(a.c) AS BIGINT), CAST(max(coalesce(b.c, 0)) AS BIGINT) FROM {_ga} a LEFT JOIN {_gb} b ON a.fk = b.fk"),
    ])

# Per-table expression-ordered windows (reference test/sql/window —
# ORDER BY computed expressions inside OVER, unique-key tie-broken).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winorderexpr_file_{_t}", f"expression-ordered windows over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY substr({_s}, 2, 2), {_k}) AS rn FROM {_t}) x ORDER BY rn LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (ORDER BY length({_s}), ({_k}) % 3) AS rk FROM {_t}) x WHERE rk = 1"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY CASE WHEN {_p} THEN 0 ELSE 1 END, {_k}) AS rn FROM {_t}) x WHERE rn <= 4 ORDER BY rn"),
        ("I", "", f"SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY ({_k}) % 7 DESC, {_k} DESC) AS rn FROM {_t}) x"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY abs(({_k}) % 9 - 4), {_k}) AS rn FROM {_t}) x ORDER BY rn LIMIT 4"),
    ])

# Per-table NULL-group GROUP BY family (reference test/sql/aggregate —
# CASE ... END with no ELSE creates a NULL grouping key; both engines
# must put all NULLs in one group).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _nk = f"CASE WHEN {_p} THEN ({_k}) % 3 END"
    corpus(f"gbnullgroup_file_{_t}", f"NULL grouping keys over {_t} (reference test/sql/aggregate)")([
        ("II", "rowsort", f"SELECT CAST({_nk} AS BIGINT), count(*) FROM {_t} GROUP BY {_nk}"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_nk} AS nk FROM {_t} GROUP BY {_nk}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_nk} AS nk FROM {_t} GROUP BY {_nk}) x WHERE nk IS NULL"),
        ("II", "rowsort", f"SELECT CAST({_nk} AS BIGINT), CAST(sum(({_k}) % 5) AS BIGINT) FROM {_t} GROUP BY {_nk}"),
        ("I", "", f"SELECT count(*) FROM {_t} GROUP BY {_nk} HAVING {_nk} IS NULL"),
    ])


# Per-table HAVING-on-CASE-aggregate family (reference
# test/sql/aggregate/having — conditional sums as group predicates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"havingcase_file_{_t}", f"HAVING on CASE aggregates over {_t} (reference test/sql/aggregate/having)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING CAST(sum(CASE WHEN {_p} THEN 1 ELSE 0 END) AS BIGINT) > 1) x"),
        ("II", "rowsort", f"SELECT ({_k}) % 3, count(*) FROM {_t} GROUP BY ({_k}) % 3 HAVING CAST(sum(CASE WHEN ({_k}) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) * 2 >= count(*)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING count(CASE WHEN {_p} THEN 1 END) = count(*)) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 5 AS b FROM {_t} GROUP BY ({_k}) % 5 HAVING CAST(max(CASE WHEN {_p} THEN ({_k}) % 7 END) AS BIGINT) > 2) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING CAST(sum(CASE WHEN {_p} THEN 1 ELSE -1 END) AS BIGINT) > 0) x"),
    ])

# Inner-join predicate-placement invariance per FK pair (reference
# test/sql/join + optimizer — for INNER joins, ON-extra vs WHERE vs
# pre-filtered derived tables must all give the same count).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    _pred = f"({_ak}) % 3 = 0"
    corpus(f"innerpredinv_file_{_n}", f"inner-join predicate placement invariance for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND {_pred}"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} WHERE {_pred}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND {_pred}) = (SELECT count(*) FROM {_l} JOIN {_r} ON {_on} WHERE {_pred}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT * FROM {_l.split(' ')[0]} a WHERE ({_ak}) % 3 = 0) a JOIN {_r} ON {_on}"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND length({_grp}) >= 0 WHERE {_pred} AND {_grp} IS NOT NULL"),
    ])

# Per-table multi-aggregate ORDER BY family (reference test/sql/order —
# grouped results ordered by several aggregates with a key tiebreak).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"multiaggord_file_{_t}", f"ORDER BY multiple aggregates over {_t} (reference test/sql/order)")([
        ("II", "", f"SELECT ({_k}) % 4 AS b, count(*) AS c FROM {_t} GROUP BY ({_k}) % 4 ORDER BY count(*) DESC, CAST(sum(({_k}) % 7) AS BIGINT), b LIMIT 3"),
        ("I", "", f"SELECT b FROM (SELECT ({_k}) % 6 AS b, count(*) AS c, CAST(min({_k}) AS BIGINT) AS mn FROM {_t} GROUP BY ({_k}) % 6 ORDER BY c DESC, mn, b LIMIT 1) x"),
        ("II", "", f"SELECT b, CAST(s AS BIGINT) FROM (SELECT ({_k}) % 3 AS b, sum(({_k}) % 11) AS s FROM {_t} GROUP BY ({_k}) % 3 ORDER BY sum(({_k}) % 11) DESC, b LIMIT 2) x"),
        ("T", "", f"SELECT gg FROM (SELECT CAST({_g} AS STRING) AS gg, count(*) AS c FROM {_t} GROUP BY {_g} ORDER BY count(*) DESC, CAST({_g} AS STRING) LIMIT 1) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 8 AS b FROM {_t} GROUP BY ({_k}) % 8 ORDER BY max({_k}) DESC LIMIT 4) x"),
    ])

# Per-table CROSS JOIN VALUES-grid family (reference test/sql/join —
# a small literal grid crossed with the table, filtered per cell).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"crossvalues_file_{_t}", f"CROSS JOIN VALUES grid over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_t} CROSS JOIN (VALUES (0), (1), (2)) v(m)"),
        ("II", "rowsort", f"SELECT v.m, count(*) FROM {_t} CROSS JOIN (VALUES (0), (1), (2)) v(m) WHERE ({_k}) % 3 = v.m GROUP BY v.m"),
        ("I", "", f"SELECT count(*) FROM {_t} CROSS JOIN (VALUES (1), (2)) v(m) WHERE ({_k}) % (v.m + 1) = 0"),
        ("II", "rowsort", f"SELECT v.m, count_if(({_k}) % 2 = v.m % 2) FROM {_t} CROSS JOIN (VALUES (0), (1), (2), (3)) v(m) GROUP BY v.m"),
        ("I", "", f"SELECT CAST(sum(v.m) AS BIGINT) FROM {_t} CROSS JOIN (VALUES (0), (1)) v(m) WHERE {_p}"),
    ])


# Per-table windowed-distinct-count emulation (reference
# test/sql/window — COUNT(DISTINCT) OVER is unsupported in both
# engines; the max(dense_rank) trick must agree with count(DISTINCT)).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dr = f"(SELECT ({_k}) % 7 AS dv, dense_rank() OVER (ORDER BY ({_k}) % 7) AS dr FROM {_t})"
    corpus(f"distinctover_file_{_t}", f"windowed distinct-count emulation over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT CAST(max(dr) AS BIGINT) FROM {_dr} x"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(dr) AS BIGINT) FROM {_dr} x) = (SELECT count(DISTINCT ({_k}) % 7) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_dr} x WHERE dr = 1"),
        ("II", "rowsort", f"SELECT CAST(dv AS BIGINT), CAST(max(dr) AS BIGINT) FROM {_dr} x GROUP BY dv"),
        ("I", "", f"SELECT CAST(max(dr2) AS BIGINT) FROM (SELECT dense_rank() OVER (PARTITION BY ({_k}) % 2 ORDER BY ({_k}) % 5) AS dr2 FROM {_t}) y"),
    ])

# Per-table cume_dist/percent_rank over TIED orderings (reference
# test/sql/window — peer groups change both functions' denominators).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"pctties_file_{_t}", f"distribution fns over ties in {_t} (reference test/sql/window)")([
        ("R", "rowsort", f"SELECT round(max(cd), 3) FROM (SELECT ({_k}) % 3 AS tv, cume_dist() OVER (ORDER BY ({_k}) % 3) AS cd FROM {_t}) x GROUP BY tv"),
        ("R", "rowsort", f"SELECT round(min(pr), 3) FROM (SELECT ({_k}) % 4 AS tv, percent_rank() OVER (ORDER BY ({_k}) % 4) AS pr FROM {_t}) x GROUP BY tv"),
        ("I", "", f"SELECT count(DISTINCT cd) FROM (SELECT cume_dist() OVER (ORDER BY ({_k}) % 5) AS cd FROM {_t}) x"),
        ("T", "", f"SELECT CAST(max(cd) = 1.0 AS STRING) FROM (SELECT cume_dist() OVER (ORDER BY ({_k}) % 6) AS cd FROM {_t}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT percent_rank() OVER (ORDER BY ({_k}) % 2) AS pr FROM {_t}) x WHERE pr = 0.0"),
    ])


# Per-table standard-TRIM-form family (reference test/sql/function/
# string — TRIM(BOTH/LEADING/TRAILING 'c' FROM s) is the shared
# spelling; the two-arg ltrim(s, chars)/rtrim(s, chars) are EXCLUDED:
# probe-verified REVERSED semantics (DuckDB takes a char set as arg 2,
# Spark takes the trim string as arg 1 — ltrim('xxabcxx','x') gives
# 'abcxx' vs '').  EXTRACT(DOW) likewise excluded: DuckDB counts
# Sunday=0, Spark Sunday=1.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"trimstd_file_{_t}", f"standard TRIM forms over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT trim(BOTH 'A' FROM upper({_s})) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT trim(LEADING 'a' FROM lower({_s})) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("T", "", f"SELECT trim(TRAILING 'e' FROM lower({_s})) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(trim(BOTH 'a' FROM lower({_s}))) < length({_s})"),
        ("T", "", f"SELECT trim(BOTH ' ' FROM concat('  ', {_s}, '  ')) FROM {_t} ORDER BY {_k} LIMIT 3"),
    ])


# Per-table DESC-ordered frame family (reference test/sql/window —
# PRECEDING/FOLLOWING flip meaning under DESC ordering).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"windesc_file_{_t}", f"frames under DESC ordering over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kb, CAST(sum(({_k}) % 5) OVER (ORDER BY {_k} DESC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s FROM {_t} ORDER BY kb DESC LIMIT 6"),
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) OVER (ORDER BY {_k} DESC ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c FROM {_t}) x"),
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kb, CAST(min(({_k}) % 8) OVER (ORDER BY {_k} DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m FROM {_t} ORDER BY kb LIMIT 5"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c1) AS BIGINT) FROM (SELECT count(*) OVER (ORDER BY {_k} ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c1 FROM {_t}) x) = (SELECT CAST(sum(c2) AS BIGINT) FROM (SELECT count(*) OVER (ORDER BY {_k} DESC ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS c2 FROM {_t}) y) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT first_value({_k}) OVER (ORDER BY {_k} DESC) AS fv FROM {_t}) x WHERE fv = (SELECT max({_k}) FROM {_t})"),
    ])

# CASE predicates inside join conditions per FK pair (reference
# test/sql/join — conditional join logic evaluated at match time).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"joincasepred_file_{_n}", f"CASE inside join ON for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND CASE WHEN ({_ak}) % 2 = 0 THEN TRUE ELSE ({_ak}) % 3 = 0 END"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON {_on} AND CASE WHEN length({_grp}) > 5 THEN TRUE ELSE FALSE END WHERE {_grp} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND CASE ({_ak}) % 3 WHEN 0 THEN TRUE WHEN 1 THEN TRUE ELSE FALSE END"),
        ("II", "", f"SELECT count(*), count({_grp}) FROM {_l} LEFT JOIN {_r} ON {_on} AND CASE WHEN ({_ak}) % 5 < 3 THEN TRUE ELSE FALSE END"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_on} AND coalesce(CASE WHEN ({_ak}) % 4 = 0 THEN TRUE END, FALSE)"),
    ])


# Ordered-LIMIT derived tables joined per FK pair (reference
# test/sql/limit + join — LIMIT scoped below the join).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    _ak = _PAIR_KEYS[_n].replace("a.", "")
    corpus(f"joinlimit_file_{_n}", f"LIMIT below the join for {_n} (reference test/sql/limit)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS fk FROM {_lt} ORDER BY {_ak} LIMIT 10) x JOIN {_rt} b ON x.fk = b.{_rkc}"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS fk FROM {_lt} ORDER BY {_ak} DESC LIMIT 7) x JOIN {_rt} b ON x.fk = b.{_rkc}"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS fk FROM {_lt} ORDER BY {_ak} LIMIT 5 OFFSET 5) x JOIN {_rt} b ON x.fk = b.{_rkc}"),
        ("I", "", f"SELECT count(DISTINCT b.{_rkc}) FROM (SELECT {_lkc} AS fk FROM {_lt} ORDER BY {_ak} LIMIT 20) x JOIN {_rt} b ON x.fk = b.{_rkc}"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS fk FROM {_lt} ORDER BY {_ak} LIMIT 15) x LEFT JOIN {_rt} b ON x.fk = b.{_rkc} AND b.{_rkc} % 2 = 0 WHERE b.{_rkc} IS NULL"),
    ])

# Per-table nested scalar subqueries (reference test/sql/subquery/
# scalar — a scalar subquery whose predicate contains another).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"nestscalar_file_{_t}", f"nested scalar subqueries over {_t} (reference test/sql/subquery/scalar)")([
        ("I", "", f"SELECT CAST((SELECT max({_k}) FROM {_t} WHERE ({_k}) < (SELECT CAST(avg({_k}) AS DOUBLE) FROM {_t})) AS BIGINT)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) > (SELECT CAST(min({_k}) AS BIGINT) FROM {_t} WHERE ({_k}) > (SELECT CAST(min({_k}) AS BIGINT) FROM {_t}))"),
        ("I", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE ({_k}) % 7 = (SELECT CAST(max({_k}) AS BIGINT) FROM {_t}) % 7) AS BIGINT)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 11 < (SELECT CAST(avg(kk) AS DOUBLE) FROM (SELECT ({_k}) % 11 AS kk FROM {_t} WHERE {_p}) x)"),
        ("T", "", f"SELECT CAST((SELECT CAST(max({_k}) AS BIGINT) FROM {_t}) > (SELECT CAST(min({_k}) AS BIGINT) FROM {_t}) AS STRING)"),
    ])


# Per-table GROUP BY ALL family (reference test/sql/aggregate/
# group_by_all — every non-aggregate select item becomes a key).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"groupbyall_file_{_t}", f"GROUP BY ALL over {_t} (reference test/sql/aggregate/group_by_all)")([
        ("III", "rowsort", f"SELECT ({_k}) % 2 AS a, ({_k}) % 3 AS b, count(*) AS c FROM {_t} GROUP BY ALL"),
        ("TI", "rowsort", f"SELECT substr({_s}, 1, 1) AS a, count(*) AS c FROM {_t} GROUP BY ALL"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS a, ({_k}) % 4 AS b, CAST(sum(({_k}) % 5) AS BIGINT) AS s FROM {_t} GROUP BY ALL) x"),
        ("II", "rowsort", f"SELECT ({_k}) % 5 AS a, count(DISTINCT ({_k}) % 3) AS cd FROM {_t} WHERE {_p} GROUP BY ALL"),
        ("TI", "rowsort", f"SELECT CAST({_g} AS STRING) AS a, CAST(min({_k}) AS BIGINT) AS mn FROM {_t} GROUP BY ALL"),
    ])

# Per-table ORDER BY ALL family (reference test/sql/order/order_by_all
# — lexicographic over the whole select list; the unique key in the
# list keeps it total).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"orderbyall_file_{_t}", f"ORDER BY ALL over {_t} (reference test/sql/order/order_by_all)")([
        ("IT", "", f"SELECT CAST({_k} AS BIGINT) AS a, {_s} AS b FROM {_t} ORDER BY ALL LIMIT 5"),
        ("II", "", f"SELECT ({_k}) % 3 AS a, CAST({_k} AS BIGINT) AS b FROM {_t} ORDER BY ALL LIMIT 6"),
        ("TI", "", f"SELECT substr({_s}, 1, 2) AS a, CAST({_k} AS BIGINT) AS b FROM {_t} ORDER BY ALL DESC LIMIT 4"),
        ("II", "", f"SELECT a, c FROM (SELECT ({_k}) % 4 AS a, count(*) AS c FROM {_t} GROUP BY ALL ORDER BY ALL LIMIT 3) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 2 AS a, ({_k}) % 3 AS b FROM {_t} ORDER BY ALL LIMIT 10) x"),
    ])


# Mixed-unit interval chains over real temporal columns (reference
# test/sql/types/interval — additive chains of different units).
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"intervalmix_file_{_t}", f"mixed-unit interval chains over {_t} (reference test/sql/types/interval)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_d} + INTERVAL 1 YEAR + INTERVAL 2 MONTH > CAST('1997-01-01' AS DATE)"),
        ("T", "", f"SELECT CAST(CAST({_d} + INTERVAL 1 MONTH + INTERVAL 10 DAY AS DATE) AS STRING) FROM {_t} ORDER BY {_d}, {_k} LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_d} - INTERVAL 1 YEAR < CAST('1995-01-01' AS DATE) AND {_d} + INTERVAL 6 MONTH >= CAST('1995-01-01' AS DATE)"),
        ("T", "", f"SELECT CAST(min(CAST({_d} + INTERVAL 2 YEAR AS DATE)) AS STRING) FROM {_t}"),
        ("II", "rowsort", f"SELECT EXTRACT(YEAR FROM {_d} + INTERVAL 6 MONTH), count(*) FROM {_t} GROUP BY EXTRACT(YEAR FROM {_d} + INTERVAL 6 MONTH)"),
    ])

# Per-table lag/lead with expression defaults (reference
# test/sql/window — the third argument as a column, not a literal).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _seq = f"(SELECT {_k} AS kk, ({_k}) % 9 AS mv FROM {_t})"
    corpus(f"lagdefexpr_file_{_t}", f"lag/lead with expression defaults over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT mv, lag(mv, 1, mv) OVER (ORDER BY kk) AS pv FROM {_seq} x) y WHERE pv = mv"),
        ("I", "", f"SELECT CAST(sum(nv - mv) AS BIGINT) FROM (SELECT mv, lead(mv, 1, mv) OVER (ORDER BY kk) AS nv FROM {_seq} x) y"),
        ("I", "", f"SELECT count(*) FROM (SELECT lag(mv, 2, mv + 100) OVER (ORDER BY kk) AS pv, mv FROM {_seq} x) y WHERE pv = mv + 100"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, CAST(lead(mv, 3, -1) OVER (ORDER BY kk) AS BIGINT) AS nv FROM {_seq} x ORDER BY kk DESC LIMIT 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT lag(mv, 1, 0) OVER (PARTITION BY mv % 2 ORDER BY kk) AS pv FROM {_seq} x) y WHERE pv = 0"),
    ])


# Full EXTRACT part matrix over real temporal columns (reference
# test/sql/types/date/date_part — every probe-shared part at once).
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"dateparts2_file_{_t}", f"EXTRACT part matrix over {_t} (reference test/sql/types/date)")([
        ("IIII", "", f"SELECT EXTRACT(YEAR FROM {_d}), EXTRACT(QUARTER FROM {_d}), EXTRACT(MONTH FROM {_d}), EXTRACT(DAY FROM {_d}) FROM {_t} ORDER BY {_d}, {_k} LIMIT 3"),
        ("I", "", f"SELECT count(DISTINCT EXTRACT(DOY FROM {_d})) FROM {_t}"),
        ("II", "rowsort", f"SELECT EXTRACT(MONTH FROM {_d}), count(*) FROM {_t} GROUP BY EXTRACT(MONTH FROM {_d})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXTRACT(DAY FROM {_d}) = 1"),
        ("I", "", f"SELECT CAST(sum(EXTRACT(QUARTER FROM {_d})) AS BIGINT) FROM {_t}"),
    ])

# Per-table conditional running sums (reference test/sql/window —
# sum(CASE) through ROWS frames, the funnel/retention idiom).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _cond = f"CASE WHEN {_p} THEN 1 ELSE 0 END"
    corpus(f"wincondsum_file_{_t}", f"conditional running sums over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST({_k} AS BIGINT) AS kb, CAST(sum({_cond}) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs FROM {_t} ORDER BY kb LIMIT 6"),
        ("I", "", f"SELECT CAST(max(rs) AS BIGINT) FROM (SELECT sum({_cond}) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM {_t}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT sum({_cond}) OVER (ORDER BY {_k} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ws FROM {_t}) x WHERE ws = 5"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(rs) AS BIGINT) FROM (SELECT sum({_cond}) OVER (ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM {_t}) x) = (SELECT count(*) FROM {_t} WHERE {_p}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT sum({_cond}) OVER (PARTITION BY {_g} ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs, {_cond} AS c FROM {_t}) x WHERE c = 1 AND rs = 1"),
    ])

# Per-table grouped string min/max (reference test/sql/aggregate —
# lexicographic extremes of computed strings per group).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"strminmax_file_{_t}", f"grouped string extremes over {_t} (reference test/sql/aggregate)")([
        ("TT", "rowsort", f"SELECT min(upper({_s})), max(lower({_s})) FROM {_t} GROUP BY {_g}"),
        ("T", "", f"SELECT min(substr({_s}, 2, 3)) FROM {_t}"),
        ("TT", "rowsort", f"SELECT min(reverse({_s})), max(reverse({_s})) FROM {_t} GROUP BY ({_k}) % 2"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_g} AS gg FROM {_t} GROUP BY {_g} HAVING min({_s}) < max({_s})) x"),
        ("TT", "", f"SELECT min({_s} || 'z'), max('a' || {_s}) FROM {_t} WHERE {_p}"),
    ])


# Anti-joins with extra predicates per FK pair (reference
# test/sql/join + subquery — the decorrelation shapes: inner-side and
# outer-side predicates around NOT EXISTS).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _ak = _PAIR_KEYS[_n]
    corpus(f"antijoin2_file_{_n}", f"anti-joins with extra predicates for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on} AND length({_grp}) > 6)"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE ({_ak}) % 2 = 0 AND NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on})"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on} AND ({_ak}) % 3 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on}) OR ({_ak}) % 5 = 0"),
        ("I", "", f"SELECT count(*) FROM {_l} WHERE NOT EXISTS (SELECT 1 FROM {_r} WHERE {_on} AND {_grp} LIKE '%a%')"),
    ])

# Per-table long-IN-list family (reference test/sql/filter +
# optimizer/in_clause — lists long enough to trigger the hash-set
# rewrite in both engines).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _longlist = ", ".join(str(x) for x in range(0, 97, 5))
    corpus(f"inlarge_file_{_t}", f"long IN lists over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 97 IN ({_longlist})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 97 NOT IN ({_longlist})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE substr({_s}, 1, 1) IN ('A', 'B', 'C', 'D', 'E', 'F', 'G', 'H', 'I', 'J', 'a', 'b', 'c', 'd', 'e', 'f', 'g', 'h', 'i', 'j')"),
        ("II", "rowsort", f"SELECT CAST(({_k}) % 97 IN ({_longlist}) AS INT), count(*) FROM {_t} GROUP BY ({_k}) % 97 IN ({_longlist})"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN ({_k}) % 50 IN (1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25) THEN 1 ELSE 0 END) AS BIGINT) FROM {_t}"),
    ])

# Band (range) joins per FK pair (reference test/sql/join — BETWEEN
# conditions around the key, the piecewise-merge shape in miniature).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    corpus(f"bandjoin_file_{_n}", f"band joins around the key for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} BETWEEN {_rk} - 1 AND {_rk} + 1"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} >= {_rk} - 2 AND {_lk} < {_rk}"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} BETWEEN {_rk} AND {_rk} + 3 AND length({_grp}) > 3"),
        ("II", "", f"SELECT count(*), count(DISTINCT {_rk}) FROM {_l} JOIN {_r} ON abs({_lk} - {_rk}) <= 1"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} BETWEEN {_rk} AND {_rk}) = (SELECT count(*) FROM {_l} JOIN {_r} ON {_on}) AS STRING)"),
    ])


# Per-table window-vs-subquery invariance (reference test/sql/window +
# subquery — row_number must equal the correlated running count).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dt = f"(SELECT {_k} AS kk, {_g} AS gg FROM {_t})"
    corpus(f"wininv_file_{_t}", f"window vs correlated-count invariance over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT kk, row_number() OVER (ORDER BY kk) AS rn, (SELECT count(*) FROM {_dt} y WHERE y.kk <= x.kk) AS rc FROM {_dt} x) z WHERE rn <> rc"),
        ("I", "", f"SELECT count(*) FROM (SELECT gg, kk, row_number() OVER (PARTITION BY gg ORDER BY kk) AS rn, (SELECT count(*) FROM {_dt} y WHERE y.gg = x.gg AND y.kk <= x.kk) AS rc FROM {_dt} x) z WHERE rn <> rc"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY kk) AS rn FROM {_dt} x) z) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk, rank() OVER (ORDER BY gg) AS rk, (SELECT count(*) FROM {_dt} y WHERE y.gg < x.gg) + 1 AS rc FROM {_dt} x) z WHERE rk <> rc"),
        ("I", "", f"SELECT count(*) FROM (SELECT CAST(sum(kk % 3) OVER (ORDER BY kk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ws, (SELECT CAST(sum(y.kk % 3) AS BIGINT) FROM {_dt} y WHERE y.kk <= x.kk) AS sc, kk FROM {_dt} x) z WHERE ws <> sc"),
    ])

# Group-then-join vs join-then-group associativity per FK pair
# (reference test/sql/aggregate + optimizer — FK-unique dim keys make
# the two plans equal; both engines must agree on both).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    _gc = _grp.split(".")[1]
    corpus(f"pregroup_file_{_n}", f"pre-aggregation associativity for {_n} (reference test/sql/aggregate)")([
        ("TI", "rowsort", f"SELECT {_gc} AS g, count(*) AS c FROM {_lt} a JOIN {_rt} b ON a.{_lkc} = b.{_rkc} GROUP BY {_gc}"),
        ("TI", "rowsort", f"SELECT {_gc} AS g, CAST(sum(f.c) AS BIGINT) AS c FROM (SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc}) f JOIN {_rt} b ON f.fk = b.{_rkc} GROUP BY {_gc}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_lt} a JOIN {_rt} b ON a.{_lkc} = b.{_rkc}) = (SELECT CAST(sum(f.c) AS BIGINT) FROM (SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc}) f JOIN {_rt} b ON f.fk = b.{_rkc}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS fk, count(*) AS c FROM {_lt} GROUP BY {_lkc}) f JOIN {_rt} b ON f.fk = b.{_rkc}"),
        ("TI", "rowsort", f"SELECT {_gc} AS g, count(DISTINCT a.{_lkc}) AS cd FROM {_lt} a JOIN {_rt} b ON a.{_lkc} = b.{_rkc} GROUP BY {_gc}"),
    ])

# Per-table set-op idempotence invariants (reference test/sql/setops —
# self UNION = DISTINCT, self INTERSECT = DISTINCT, self EXCEPT = 0).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _sel = f"SELECT ({_k}) % 12 AS x FROM {_t}"
    corpus(f"setopinv_file_{_t}", f"set-op idempotence over {_t} (reference test/sql/setops)")([
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (({_sel}) UNION ({_sel})) u) = (SELECT count(DISTINCT ({_k}) % 12) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (({_sel}) INTERSECT ({_sel})) u) = (SELECT count(DISTINCT ({_k}) % 12) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (({_sel}) EXCEPT ({_sel})) u"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (({_sel}) UNION ALL ({_sel})) u) = 2 * (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT x FROM (({_sel}) UNION ({_sel})) u GROUP BY x HAVING count(*) > 1) y"),
    ])


# Per-table aggregates-of-window-results (reference test/sql/window —
# sum of row_numbers is n(n+1)/2; rank sums respect tie plateaus).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"aggofwin_file_{_t}", f"aggregates of window results over {_t} (reference test/sql/window)")([
        ("T", "", f"SELECT CAST((SELECT CAST(sum(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY {_k}) AS rn FROM {_t}) x) = (SELECT count(*) * (count(*) + 1) / 2 FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT CAST(sum(rk) AS BIGINT) FROM (SELECT rank() OVER (ORDER BY ({_k}) % 4) AS rk FROM {_t}) x"),
        ("R", "", f"SELECT round(avg(dr), 3) FROM (SELECT dense_rank() OVER (ORDER BY ({_k}) % 6) AS dr FROM {_t}) x"),
        ("II", "rowsort", f"SELECT CAST(g2 AS BIGINT), CAST(sum(rn) AS BIGINT) FROM (SELECT ({_k}) % 2 AS g2, row_number() OVER (PARTITION BY ({_k}) % 2 ORDER BY {_k}) AS rn FROM {_t}) x GROUP BY g2"),
        ("I", "", f"SELECT count(DISTINCT nt) FROM (SELECT ntile(5) OVER (ORDER BY {_k}) AS nt FROM {_t}) x"),
    ])

# Per-table floor/ceil/round trio over scaled expressions (reference
# test/sql/function/math — the three rounding modes side by side).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"(({_k}) % 13) * 0.75"
    corpus(f"roundtrio_file_{_t}", f"floor/ceil/round trio over {_t} (reference test/sql/function/math)")([
        ("III", "", f"SELECT CAST(sum(CAST(floor({_x}) AS BIGINT)) AS BIGINT), CAST(sum(CAST(ceil({_x}) AS BIGINT)) AS BIGINT), CAST(sum(CAST(round({_x}, 0) AS BIGINT)) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE floor({_x}) = ceil({_x})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ceil({_x}) - floor({_x}) = 1"),
        ("R", "", f"SELECT round(sum(round({_x}, 1)), 1) FROM {_t}"),
        ("II", "rowsort", f"SELECT CAST(floor({_x}) AS BIGINT), count(*) FROM {_t} GROUP BY floor({_x})"),
    ])

# Per-table composite-key self-joins (reference test/sql/join —
# two-column equi-join keys).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _pairs_dt = f"(SELECT {_k} AS kk, ({_k}) % 5 AS k1, ({_k}) % 3 AS k2 FROM {_t})"
    corpus(f"compkeyjoin_file_{_t}", f"composite-key self-joins over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_pairs_dt} a JOIN {_pairs_dt} b ON a.k1 = b.k1 AND a.k2 = b.k2"),
        ("I", "", f"SELECT count(*) FROM {_pairs_dt} a JOIN {_pairs_dt} b ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.kk < b.kk"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_pairs_dt} a JOIN {_pairs_dt} b ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.kk = b.kk) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("II", "rowsort", f"SELECT a.k1, count(*) FROM {_pairs_dt} a JOIN {_pairs_dt} b ON a.k1 = b.k1 AND a.k2 = b.k2 GROUP BY a.k1"),
        ("I", "", f"SELECT count(*) FROM {_pairs_dt} a LEFT JOIN {_pairs_dt} b ON a.k1 = b.k1 AND a.k2 = b.k2 AND b.kk % 2 = 0 WHERE b.kk IS NULL"),
    ])

# Three-hop nested EXISTS (reference test/sql/subquery/exists — one
# level deeper than the exists2hop family).
_EXISTS3 = {
    "lineitem": ("lineitem l", "EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey < 2)))", "l.l_orderkey"),
    "events":   ("events e", "EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey AND EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_name LIKE 'A%')))", "e.event_id"),
}
for _t, (_frm, _ex, _kc) in _EXISTS3.items():
    corpus(f"exists3hop_file_{_t}", f"three-hop nested EXISTS from {_t} (reference test/sql/subquery/exists)")([
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_ex}"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE NOT ({_ex})"),
        ("I", "", f"SELECT count(*) FROM {_frm} WHERE {_ex} AND ({_kc}) % 2 = 1"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN {_ex} THEN 1 ELSE 0 END) AS BIGINT) FROM {_frm}"),
    ])


# Per-table three-way OR predicate mixes (reference test/sql/filter +
# conjunction — IN, LIKE, and BETWEEN branches under one OR).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"predor3_file_{_t}", f"three-way OR predicate mixes over {_t} (reference test/sql/filter)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 IN (1, 2) OR {_s} LIKE '%a%' OR ({_k}) % 7 BETWEEN 5 AND 6"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE NOT (({_k}) % 10 IN (1, 2) OR {_s} LIKE '%a%' OR ({_k}) % 7 BETWEEN 5 AND 6)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE ({_k}) % 10 IN (1, 2) OR {_s} LIKE '%a%') + (SELECT count(*) FROM {_t} WHERE NOT (({_k}) % 10 IN (1, 2) OR {_s} LIKE '%a%')) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("II", "", f"SELECT count_if(({_k}) % 10 IN (1, 2) OR {_s} LIKE '%e%'), count_if(({_k}) % 7 BETWEEN 2 AND 4 OR {_p}) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 10 IN (1, 2) OR {_s} LIKE '%a%') AND ({_p} OR ({_k}) % 3 = 0)"),
    ])

# Per-table empty-scalar-subquery semantics (reference test/sql/
# subquery/scalar — an empty scalar subquery is NULL, not an error).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"scalarempty_file_{_t}", f"empty scalar subqueries over {_t} (reference test/sql/subquery/scalar)")([
        ("T", "", f"SELECT CAST((SELECT max({_k}) FROM {_t} WHERE 1 = 0) IS NULL AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) > coalesce((SELECT CAST(max({_k}) AS BIGINT) FROM {_t} WHERE FALSE), -1)"),
        ("T", "", f"SELECT CAST(coalesce((SELECT {_s} FROM {_t} WHERE 1 = 0), '(none)') AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 5 = (SELECT CAST(min({_k}) AS BIGINT) % 5 FROM {_t} WHERE FALSE)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE FALSE) = 0 AS STRING)"),
    ])

# Cross-fact aggregate joins (reference test/sql/join — two different
# fact tables pre-aggregated onto a shared bucket key).
_FACTPAIRS = {
    "lineitem_events": ("(SELECT l_suppkey % 10 AS bk, count(*) AS c FROM lineitem GROUP BY l_suppkey % 10)", "(SELECT user_id % 10 AS bk, count(*) AS c FROM events GROUP BY user_id % 10)"),
    "orders_events":   ("(SELECT o_custkey % 8 AS bk, count(*) AS c FROM orders GROUP BY o_custkey % 8)", "(SELECT user_id % 8 AS bk, count(*) AS c FROM events GROUP BY user_id % 8)"),
}
for _n, (_fa, _fb) in _FACTPAIRS.items():
    corpus(f"factfact_file_{_n}", f"cross-fact aggregate join {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_fa} a JOIN {_fb} b ON a.bk = b.bk"),
        ("II", "", f"SELECT CAST(sum(a.c) AS BIGINT), CAST(sum(b.c) AS BIGINT) FROM {_fa} a JOIN {_fb} b ON a.bk = b.bk"),
        ("II", "rowsort", f"SELECT CAST(a.bk AS BIGINT), CAST(a.c - b.c AS BIGINT) FROM {_fa} a JOIN {_fb} b ON a.bk = b.bk"),
        ("I", "", f"SELECT count(*) FROM {_fa} a FULL JOIN {_fb} b ON a.bk = b.bk"),
        ("I", "", f"SELECT count(*) FROM {_fa} a JOIN {_fb} b ON a.bk = b.bk WHERE a.c > b.c"),
    ])


# Fact joined to a UNION of dimension slices per FK pair (reference
# test/sql/join + setops — the dim side assembled from set-ops).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    _dim = f"(SELECT {_rkc} AS pk FROM {_rt} WHERE {_rkc} % 2 = 0 UNION SELECT {_rkc} FROM {_rt} WHERE {_rkc} % 3 = 0)"
    corpus(f"uniondimjoin_file_{_n}", f"fact joined to unioned dim slices for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_lt} a JOIN {_dim} d ON a.{_lkc} = d.pk"),
        ("I", "", f"SELECT count(*) FROM {_lt} a LEFT JOIN {_dim} d ON a.{_lkc} = d.pk WHERE d.pk IS NULL"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_lt} a JOIN {_dim} d ON a.{_lkc} = d.pk) = (SELECT count(*) FROM {_lt} a WHERE a.{_lkc} % 2 = 0 OR a.{_lkc} % 3 = 0) AS STRING)"),
        ("I", "", f"SELECT count(DISTINCT d.pk) FROM {_lt} a JOIN {_dim} d ON a.{_lkc} = d.pk"),
        ("I", "", f"SELECT count(*) FROM {_lt} a JOIN {_dim} d ON a.{_lkc} = d.pk WHERE a.{_lkc} % 6 = 0"),
    ])

# Per-table functional-dependency grouping (reference
# test/sql/aggregate — grouping by the unique key makes every
# aggregate an identity).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"fdgroup_file_{_t}", f"unique-key grouping identities over {_t} (reference test/sql/aggregate)")([
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} GROUP BY {_k}) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk, min({_s}) AS mn, max({_s}) AS mx FROM {_t} GROUP BY {_k}) x WHERE mn <> mx"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_k}) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} GROUP BY {_k} HAVING count(*) > 1) x"),
        ("II", "", f"SELECT CAST(min(kk) AS BIGINT), CAST(max(kk) AS BIGINT) FROM (SELECT {_k} AS kk FROM {_t} GROUP BY {_k}) x"),
    ])


# Per-table median/percentile agreement (reference test/sql/aggregate/
# aggregates/median.test — median(x) must equal the 0.5 quantile with
# linear interpolation in both engines).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"({_k}) % 19"
    corpus(f"medpct_file_{_t}", f"median/percentile agreement over {_t} (reference test/sql/aggregate median)")([
        ("R", "", f"SELECT round(median({_x}), 3) FROM {_t}"),
        ("R", "", f"SELECT round(median({_x}), 3) FROM {_t} WHERE {_p}"),
        ("R", "rowsort", f"SELECT round(median({_x}), 3) FROM {_t} GROUP BY ({_k}) % 2"),
        ("T", "", f"SELECT CAST(abs(m - avg2) < 20 AS STRING) FROM (SELECT median({_x}) AS m, avg({_x}) AS avg2 FROM {_t}) x"),
        ("R", "", f"SELECT round(median(CAST({_x} AS DOUBLE) / 2), 3) FROM {_t}"),
    ])

# Per-table sum-of-products aggregates (reference test/sql/aggregate —
# bilinear aggregates over computed integer factors).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _a, _b = f"({_k}) % 7", f"({_k}) % 5"
    corpus(f"sumprod_file_{_t}", f"sum-of-products over {_t} (reference test/sql/aggregate)")([
        ("I", "", f"SELECT CAST(sum({_a} * {_b}) AS BIGINT) FROM {_t}"),
        ("II", "rowsort", f"SELECT ({_k}) % 2, CAST(sum({_a} * {_b}) AS BIGINT) FROM {_t} GROUP BY ({_k}) % 2"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum({_a} * 2) AS BIGINT) FROM {_t}) = 2 * (SELECT CAST(sum({_a}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT CAST(sum(({_a} - {_b}) * ({_a} + {_b})) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum({_a} * {_a}) AS BIGINT) FROM {_t}) >= 0 AS STRING)"),
    ])

# date_trunc bucket grouping over the real temporal columns (reference
# test/sql/types/date — month/quarter/year bucket counts).
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"truncgroup_file_{_t}", f"date_trunc bucket groups over {_t} (reference test/sql/types/date)")([
        ("TI", "rowsort", f"SELECT CAST(CAST(date_trunc('year', {_d}) AS DATE) AS STRING), count(*) FROM {_t} GROUP BY date_trunc('year', {_d})"),
        ("I", "", f"SELECT count(DISTINCT date_trunc('month', {_d})) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT date_trunc('quarter', {_d})) FROM {_t}"),
        ("TI", "", f"SELECT CAST(CAST(date_trunc('month', {_d}) AS DATE) AS STRING) AS m, count(*) FROM {_t} GROUP BY date_trunc('month', {_d}) ORDER BY m LIMIT 4"),
        ("T", "", f"SELECT CAST(max(CAST(date_trunc('year', {_d}) AS DATE)) AS STRING) FROM {_t}"),
    ])


# Chained LEFT JOINs through two dimensions per star fact (reference
# test/sql/join — NULL propagation across consecutive outer joins).
for _t, (_frm0, _d1, _d2, _fk) in _STARS.items():
    _parts = _frm0.split(" JOIN ")
    _fact = _parts[0]
    _j1 = _parts[1]
    _j2 = _parts[2]
    _chain = f"{_fact} LEFT JOIN {_j1} LEFT JOIN {_j2}"
    corpus(f"outerchain_file_{_t}", f"chained LEFT JOINs over {_t} (reference test/sql/join)")([
        ("II", "", f"SELECT count(*), count({_d2}) FROM {_chain}"),
        ("I", "", f"SELECT count(*) FROM {_chain} WHERE {_d2} IS NULL"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_chain}) >= (SELECT count(*) FROM {_frm0}) AS STRING)"),
        ("II", "", f"SELECT count({_d1}), count(DISTINCT {_d2}) FROM {_chain}"),
        ("I", "", f"SELECT count(*) FROM {_chain} WHERE {_d1} IS NOT NULL AND {_d2} IS NULL"),
    ])

# Per-table distinct-pair counting equivalences (reference
# test/sql/aggregate/distinct — pair-distinct via concat vs grouping).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _a, _b = f"({_k}) % 4", f"({_k}) % 3"
    corpus(f"distinctpair_file_{_t}", f"distinct-pair counting over {_t} (reference test/sql/aggregate/distinct)")([
        ("I", "", f"SELECT count(DISTINCT concat(CAST({_a} AS STRING), '|', CAST({_b} AS STRING))) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_a} AS a, {_b} AS b FROM {_t} GROUP BY {_a}, {_b}) x"),
        ("T", "", f"SELECT CAST((SELECT count(DISTINCT concat(CAST({_a} AS STRING), '|', CAST({_b} AS STRING))) FROM {_t}) = (SELECT count(*) FROM (SELECT {_a} AS a, {_b} AS b FROM {_t} GROUP BY {_a}, {_b}) x) AS STRING)"),
        ("II", "rowsort", f"SELECT a, count(DISTINCT b) FROM (SELECT {_a} AS a, {_b} AS b FROM {_t}) x GROUP BY a"),
        ("I", "", f"SELECT count(DISTINCT concat({_s}, CAST({_a} AS STRING))) FROM {_t} WHERE {_p}"),
    ])

# Per-table consecutive-triple self-joins (reference test/sql/join —
# the neighborjoin family one hop deeper).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _kk = f"(SELECT {_k} AS kk FROM {_t})"
    corpus(f"neighbor3_file_{_t}", f"consecutive-triple self-joins over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_kk} a JOIN {_kk} b ON a.kk + 1 = b.kk JOIN {_kk} c ON b.kk + 1 = c.kk"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk, lag(kk, 1) OVER (ORDER BY kk) AS p1, lag(kk, 2) OVER (ORDER BY kk) AS p2 FROM {_kk} x) y WHERE p1 = kk - 1 AND p2 = kk - 2"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_kk} a JOIN {_kk} b ON a.kk + 1 = b.kk JOIN {_kk} c ON b.kk + 1 = c.kk) = (SELECT count(*) FROM (SELECT kk, lag(kk, 1) OVER (ORDER BY kk) AS p1, lag(kk, 2) OVER (ORDER BY kk) AS p2 FROM {_kk} x) y WHERE p1 = kk - 1 AND p2 = kk - 2) AS STRING)"),
        ("I", "", f"SELECT CAST(max(c.kk) AS BIGINT) FROM {_kk} a JOIN {_kk} b ON a.kk + 1 = b.kk JOIN {_kk} c ON b.kk + 1 = c.kk"),
        ("I", "", f"SELECT count(*) FROM {_kk} a JOIN {_kk} b ON a.kk + 2 = b.kk JOIN {_kk} c ON a.kk + 4 = c.kk WHERE a.kk % 2 = 0"),
    ])

# Per-table beyond-the-end LIMIT/OFFSET (reference test/sql/limit —
# LIMIT larger than the table; OFFSET past the last row).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"limitbeyond_file_{_t}", f"beyond-end LIMIT/OFFSET over {_t} (reference test/sql/limit)")([
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} LIMIT 1000000) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 5 OFFSET 1000000) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 1000000 OFFSET 3) x"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(kk) AS BIGINT) FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_k} DESC LIMIT 1) x) = (SELECT CAST(max({_k}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_k} AS kk FROM {_t} ORDER BY {_k} LIMIT 0 OFFSET 2) x"),
    ])

# Per-table HAVING-IN on the group key (reference test/sql/aggregate/
# having — membership predicates on grouping keys after aggregation).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"havingin_file_{_t}", f"HAVING IN on group keys over {_t} (reference test/sql/aggregate/having)")([
        ("II", "rowsort", f"SELECT ({_k}) % 6 AS b, count(*) FROM {_t} GROUP BY ({_k}) % 6 HAVING ({_k}) % 6 IN (0, 2, 4)"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 8 AS b FROM {_t} GROUP BY ({_k}) % 8 HAVING ({_k}) % 8 IN (SELECT r_regionkey FROM region)) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 5 AS b FROM {_t} GROUP BY ({_k}) % 5 HAVING ({_k}) % 5 NOT IN (1, 3)) x"),
        ("TI", "rowsort", f"SELECT substr({_s}, 1, 1) AS b, count(*) FROM {_t} GROUP BY substr({_s}, 1, 1) HAVING substr({_s}, 1, 1) IN ('A', 'B', 'C', 'a', 'b', 'c') AND count(*) > 0"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 7 AS b FROM {_t} GROUP BY ({_k}) % 7 HAVING ({_k}) % 7 IN (2, 4, 6) AND count(*) > 1) x"),
    ])

# Filtered-dim join vs semi-join-with-filter equivalence per FK pair
# (reference test/sql/join — dim filters push through both forms).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    _gc = _grp.split(".")[1]
    corpus(f"dimfilter_file_{_n}", f"filtered-dim equivalences for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_lt} a JOIN (SELECT {_rkc} AS pk FROM {_rt} WHERE length({_gc}) > 4) d ON a.{_lkc} = d.pk"),
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc} AND length(b.{_gc}) > 4)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_lt} a JOIN (SELECT {_rkc} AS pk FROM {_rt} WHERE length({_gc}) > 4) d ON a.{_lkc} = d.pk) = (SELECT count(*) FROM {_lt} a WHERE EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc} AND length(b.{_gc}) > 4)) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_lt} a JOIN {_rt} b ON a.{_lkc} = b.{_rkc} WHERE length(b.{_gc}) <= 4"),
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE a.{_lkc} IN (SELECT {_rkc} FROM {_rt} WHERE length({_gc}) > 4) AND a.{_lkc} % 2 = 0"),
    ])


# Five-table FK chains (reference test/sql/join — the longest natural
# path the fixture schema supports).
_CHAINS5 = {
    "r_n_c_o_l": ("region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN customer c ON n.n_nationkey = c.c_nationkey JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey", "r.r_name", "l.l_orderkey * 10 + l.l_linenumber"),
    "r_n_s_l_o": ("region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN supplier s ON n.n_nationkey = s.s_nationkey JOIN lineitem l ON s.s_suppkey = l.l_suppkey JOIN orders o ON l.l_orderkey = o.o_orderkey", "r.r_name", "o.o_orderkey"),
}
for _n, (_from, _gcol, _kcol) in _CHAINS5.items():
    corpus(f"joinchain5_file_{_n}", f"five-table FK chain {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_from}"),
        ("TI", "rowsort", f"SELECT {_gcol} AS g, count(*) FROM {_from} GROUP BY {_gcol}"),
        ("II", "", f"SELECT CAST(min({_kcol}) AS BIGINT), CAST(max({_kcol}) AS BIGINT) FROM {_from}"),
        ("I", "", f"SELECT count(DISTINCT {_gcol}) FROM {_from}"),
        ("TI", "rowsort", f"SELECT {_gcol} AS g, CAST(sum(({_kcol}) % 10) AS BIGINT) FROM {_from} GROUP BY {_gcol} HAVING count(*) > 3"),
    ])


# Per-table math identity family (reference test/sql/function/math —
# exp/ln, sqrt/square, abs/sign identities that must hold exactly
# after rounding).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"CAST(({_k}) % 11 + 1 AS DOUBLE)"
    corpus(f"mathident_file_{_t}", f"math identities over {_t} (reference test/sql/function/math)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE round(exp(ln({_x})), 6) <> round({_x}, 6)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE round(sqrt({_x} * {_x}), 6) <> round({_x}, 6)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE abs(-{_x}) <> {_x} OR sign(-{_x}) <> -1"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE round(power({_x}, 2), 6) <> round({_x} * {_x}, 6)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE round(log10({_x}) * ln(10.0), 9) <> round(ln({_x}), 9)"),
    ])

# Per-table string identity family (reference test/sql/function/string
# — involutions and idempotents).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"strident_file_{_t}", f"string identities over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE reverse(reverse({_s})) <> {_s}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE upper(upper({_s})) <> upper({_s}) OR lower(lower({_s})) <> lower({_s})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(concat({_s}, {_s})) <> 2 * length({_s})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE substr({_s}, 1, length({_s})) <> {_s}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE trim(BOTH ' ' FROM {_s}) <> trim(BOTH ' ' FROM trim(BOTH ' ' FROM {_s}))"),
    ])

# Per-table aggregate duality family (reference test/sql/aggregate —
# min/max duality, sum linearity, count complements).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"({_k}) % 9"
    corpus(f"aggident_file_{_t}", f"aggregate dualities over {_t} (reference test/sql/aggregate)")([
        ("T", "", f"SELECT CAST((SELECT CAST(min({_x}) AS BIGINT) FROM {_t}) = -(SELECT CAST(max(-({_x})) AS BIGINT) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum({_x} + 1) AS BIGINT) FROM {_t}) = (SELECT CAST(sum({_x}) + count(*) AS BIGINT) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_p}) + (SELECT count(*) FROM {_t} WHERE NOT ({_p})) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(3 * ({_x})) AS BIGINT) FROM {_t}) = 3 * (SELECT CAST(sum({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count({_s}) FROM {_t}) <= (SELECT count(*) FROM {_t}) AS STRING)"),
    ])

# Per-table ROLLUP-total identity (reference test/sql/aggregate/
# grouping_sets — the () row equals the ungrouped aggregate).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"rollupid_file_{_t}", f"ROLLUP total-row identity over {_t} (reference test/sql/aggregate/grouping_sets)")([
        ("T", "", f"SELECT CAST((SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY ROLLUP({_g})) x) >= (SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_g}) y) AS STRING)"),
        ("I", "", f"SELECT CAST(c AS BIGINT) FROM (SELECT grouping({_g}) AS gr, count(*) AS c FROM {_t} GROUP BY ROLLUP({_g})) x WHERE gr = 1"),
        ("T", "", f"SELECT CAST((SELECT CAST(c AS BIGINT) FROM (SELECT grouping({_g}) AS gr, count(*) AS c FROM {_t} GROUP BY ROLLUP({_g})) x WHERE gr = 1) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c) AS BIGINT) FROM (SELECT grouping({_g}) AS gr, count(*) AS c FROM {_t} GROUP BY ROLLUP({_g})) x WHERE gr = 0) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT grouping({_g}) AS gr FROM {_t} GROUP BY ROLLUP({_g})) x WHERE gr = 1"),
    ])

# Per-table sum-distributivity over UNION ALL (reference
# test/sql/setops + aggregate — aggregates distribute over disjoint
# branch unions).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"({_k}) % 13"
    corpus(f"distrib_file_{_t}", f"aggregate distributivity over {_t} (reference test/sql/setops)")([
        ("T", "", f"SELECT CAST((SELECT CAST(sum(x) AS BIGINT) FROM (SELECT {_x} AS x FROM {_t} WHERE {_p} UNION ALL SELECT {_x} FROM {_t} WHERE NOT ({_p})) u) = (SELECT CAST(sum({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT {_x} AS x FROM {_t} UNION ALL SELECT {_x} FROM {_t}) u) = 2 * (SELECT count(*) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT CAST(min(x) AS BIGINT) FROM (SELECT {_x} AS x FROM {_t} WHERE {_p} UNION ALL SELECT {_x} FROM {_t} WHERE NOT ({_p})) u) = (SELECT CAST(min({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT CAST(sum(x) AS BIGINT) FROM (SELECT {_x} AS x FROM {_t} WHERE {_p} UNION ALL SELECT {_x} FROM {_t} WHERE NOT ({_p})) u"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(x) AS BIGINT) FROM (SELECT {_x} AS x FROM {_t} UNION ALL SELECT {_x} - 100 FROM {_t}) u) = (SELECT CAST(max({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
    ])


# Per-table CASE-with-NULL-branches family (reference test/sql/case —
# NULL conditions are falsy; NULL results propagate through aggregates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"casewhennull_file_{_t}", f"CASE with NULL branches over {_t} (reference test/sql/case)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CASE WHEN CAST(NULL AS BOOLEAN) THEN TRUE ELSE {_p} END = ({_p})"),
        ("I", "", f"SELECT count(CASE WHEN {_p} THEN NULL ELSE 1 END) FROM {_t}"),
        ("T", "", f"SELECT CAST(sum(CASE WHEN {_p} THEN NULL ELSE ({_k}) % 3 END) IS NOT NULL AS STRING) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE coalesce(CASE WHEN ({_k}) % 4 = 1 THEN NULL WHEN ({_k}) % 4 = 2 THEN TRUE END, FALSE)"),
        ("II", "rowsort", f"SELECT CAST(CASE WHEN ({_k}) % 3 = 0 THEN NULL ELSE ({_k}) % 3 END AS BIGINT), count(*) FROM {_t} GROUP BY CASE WHEN ({_k}) % 3 = 0 THEN NULL ELSE ({_k}) % 3 END"),
    ])

# Per-table GROUP-BY-length family (reference test/sql/aggregate —
# grouping on derived string measures).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"groupbylen_file_{_t}", f"GROUP BY string length over {_t} (reference test/sql/aggregate)")([
        ("II", "rowsort", f"SELECT length({_s}), count(*) FROM {_t} GROUP BY length({_s})"),
        ("I", "", f"SELECT count(DISTINCT length({_s})) FROM {_t}"),
        ("II", "", f"SELECT length({_s}) AS ln, count(*) AS c FROM {_t} GROUP BY length({_s}) ORDER BY c DESC, ln LIMIT 3"),
        ("II", "rowsort", f"SELECT length(concat({_s}, CAST(({_k}) % 10 AS STRING))), count(*) FROM {_t} GROUP BY length(concat({_s}, CAST(({_k}) % 10 AS STRING)))"),
        ("I", "", f"SELECT count(*) FROM (SELECT length({_s}) AS ln FROM {_t} GROUP BY length({_s}) HAVING count(*) > 2) x"),
    ])

# Null-safe equality joins per FK pair (reference test/sql/join —
# IS NOT DISTINCT FROM as the join condition over nullif'd keys).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    corpus(f"nullsafejoin_file_{_n}", f"null-safe equality join for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} IS NOT DISTINCT FROM {_rk}"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON nullif({_lk}, 0) IS NOT DISTINCT FROM nullif({_rk}, 0)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} IS NOT DISTINCT FROM {_rk}) = (SELECT count(*) FROM {_l} JOIN {_r} ON {_on}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_l} LEFT JOIN {_r} ON nullif({_lk}, 1) IS NOT DISTINCT FROM nullif({_rk}, 1) WHERE {_rk} IS NULL"),
        ("I", "", f"SELECT count(*) FROM {_l} JOIN {_r} ON {_lk} IS NOT DISTINCT FROM {_rk} AND ({_PAIR_KEYS[_n]}) % 2 = 0"),
    ])


# CASE-based era bucketing over real dates (reference test/sql/case +
# types/date — date range branches grouped and counted).
for _t, (_k, _d) in _DTCOLS.items():
    _era = f"CASE WHEN {_d} < CAST('1994-01-01' AS DATE) THEN 'early' WHEN {_d} < CAST('1996-01-01' AS DATE) THEN 'mid' ELSE 'late' END"
    corpus(f"datecase_file_{_t}", f"date-range CASE buckets over {_t} (reference test/sql/case)")([
        ("TI", "rowsort", f"SELECT {_era} AS era, count(*) FROM {_t} GROUP BY {_era}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_era} = 'mid'"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_era} = 'early') + (SELECT count(*) FROM {_t} WHERE {_era} <> 'early') = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("TI", "rowsort", f"SELECT {_era} AS era, count(DISTINCT EXTRACT(MONTH FROM {_d})) FROM {_t} GROUP BY {_era}"),
        ("T", "", f"SELECT min({_era}) FROM {_t}"),
    ])

# Per-table BIGINT-scale arithmetic (reference test/sql/types/numeric
# — sums in the 10^12 range stay exact in 64-bit in both engines).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _big = f"CAST(({_k}) % 5 AS BIGINT) * 1000000000000"
    corpus(f"bigintarith_file_{_t}", f"BIGINT-scale arithmetic over {_t} (reference test/sql/types/numeric)")([
        ("I", "", f"SELECT CAST(sum({_big}) AS BIGINT) FROM {_t}"),
        ("II", "", f"SELECT CAST(min({_big}) AS BIGINT), CAST(max({_big}) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_big} > 2000000000000"),
        ("II", "rowsort", f"SELECT CAST(({_big}) / 1000000000000 AS BIGINT), count(*) FROM {_t} GROUP BY {_big}"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum({_big}) AS BIGINT) FROM {_t}) = 1000000000000 * (SELECT CAST(sum(({_k}) % 5) AS BIGINT) FROM {_t}) AS STRING)"),
    ])

# Per-table double-negation / De Morgan identities (reference
# test/sql/conjunction — NOT(NOT p) = p and both De Morgan forms).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _q = f"({_k}) % 3 = 0"
    corpus(f"doubleneg_file_{_t}", f"negation identities over {_t} (reference test/sql/conjunction)")([
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE NOT (NOT ({_p}))) = (SELECT count(*) FROM {_t} WHERE {_p}) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE NOT ({_p} AND {_q})) = (SELECT count(*) FROM {_t} WHERE NOT ({_p}) OR NOT ({_q})) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE NOT ({_p} OR {_q})) = (SELECT count(*) FROM {_t} WHERE NOT ({_p}) AND NOT ({_q})) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE NOT (NOT ({_p} AND NOT ({_q})))"),
        ("II", "", f"SELECT count_if(NOT ({_p})), count_if({_p}) FROM {_t}"),
    ])


# Per-table IN-subquery-with-join family (reference test/sql/subquery
# — the IN list produced by a join).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"insubqjoin_file_{_t}", f"IN subqueries containing joins over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 25 IN (SELECT n.n_nationkey FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey < 3)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 25 IN (SELECT n.n_nationkey FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name LIKE 'A%')"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 25 NOT IN (SELECT n.n_nationkey FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey >= 3)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 5 IN (SELECT DISTINCT n.n_regionkey FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 25 IN (SELECT c.c_nationkey FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY c.c_nationkey HAVING count(*) > 2)"),
    ])

# Cross-table set-ops per FK pair (reference test/sql/setops — fact
# keys vs dim keys projected onto a shared domain).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    corpus(f"xtableset_file_{_n}", f"cross-table set-ops for {_n} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} % 25 AS x FROM {_lt} INTERSECT SELECT {_rkc} % 25 FROM {_rt}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} % 25 AS x FROM {_lt} EXCEPT SELECT {_rkc} % 25 FROM {_rt}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_rkc} % 25 AS x FROM {_rt} EXCEPT SELECT {_lkc} % 25 FROM {_lt}) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_lkc} AS x FROM {_lt} UNION SELECT {_rkc} FROM {_rt}) u"),
        ("I", "", f"SELECT CAST(max(x) AS BIGINT) FROM (SELECT {_lkc} % 25 AS x FROM {_lt} INTERSECT SELECT {_rkc} % 25 FROM {_rt}) u"),
    ])

# Per-table table-UNION-VALUES family (reference test/sql/setops +
# COLUMN_DATA_SCAN — scans unioned with literal relations).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"valunion_file_{_t}", f"table UNION VALUES over {_t} (reference test/sql/setops)")([
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 6 AS x FROM {_t} UNION SELECT x FROM (VALUES (100), (101)) v(x)) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 6 AS x FROM {_t} UNION ALL SELECT x FROM (VALUES (0), (1)) v(x)) u"),
        ("I", "", f"SELECT CAST(max(x) AS BIGINT) FROM (SELECT ({_k}) % 6 AS x FROM {_t} UNION SELECT x FROM (VALUES (99)) v(x)) u"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 6 AS x FROM {_t} INTERSECT SELECT x FROM (VALUES (0), (1), (2), (100)) v(x)) u"),
        ("T", "", f"SELECT sv FROM (SELECT {_s} AS sv FROM {_t} UNION SELECT sv FROM (VALUES ('zzz-sentinel')) v(sv)) u ORDER BY sv DESC LIMIT 1"),
    ])

# Zero-count dimension groups per FK pair (reference test/sql/join —
# LEFT JOIN preserves dims with no facts; count(fact col) is 0 there).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    corpus(f"zerogroups_file_{_n}", f"zero-count dim groups for {_n} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM (SELECT b.{_rkc} AS pk, count(a.{_lkc}) AS c FROM {_rt} b LEFT JOIN {_lt} a ON a.{_lkc} = b.{_rkc} GROUP BY b.{_rkc}) x WHERE c = 0"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT b.{_rkc} AS pk, count(a.{_lkc}) AS c FROM {_rt} b LEFT JOIN {_lt} a ON a.{_lkc} = b.{_rkc} GROUP BY b.{_rkc}) x WHERE c = 0) = (SELECT count(*) FROM {_rt} b WHERE NOT EXISTS (SELECT 1 FROM {_lt} a WHERE a.{_lkc} = b.{_rkc})) AS STRING)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT b.{_rkc} AS pk FROM {_rt} b LEFT JOIN {_lt} a ON a.{_lkc} = b.{_rkc} GROUP BY b.{_rkc}) x) = (SELECT count(DISTINCT {_rkc}) FROM {_rt}) AS STRING)"),
        ("I", "", f"SELECT CAST(sum(c) AS BIGINT) FROM (SELECT count(a.{_lkc}) AS c FROM {_rt} b LEFT JOIN {_lt} a ON a.{_lkc} = b.{_rkc} GROUP BY b.{_rkc}) x"),
        ("II", "", f"SELECT CAST(min(c) AS BIGINT), CAST(max(c) AS BIGINT) FROM (SELECT count(a.{_lkc}) AS c FROM {_rt} b LEFT JOIN {_lt} a ON a.{_lkc} = b.{_rkc} GROUP BY b.{_rkc}) x"),
    ])

# Per-table whitespace token counting via length arithmetic (reference
# test/sql/function/string — the split-free token-count idiom).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _toks = f"length({_s}) - length(replace({_s}, ' ', '')) + 1"
    corpus(f"tokencount_file_{_t}", f"token counting via length arithmetic over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT CAST(sum({_toks}) AS BIGINT) FROM {_t}"),
        ("II", "rowsort", f"SELECT {_toks}, count(*) FROM {_t} GROUP BY {_toks}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_toks} > 1"),
        ("II", "", f"SELECT CAST(min({_toks}) AS BIGINT), CAST(max({_toks}) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(replace({_s}, 'a', '')) + length(replace({_s}, 'e', '')) < 2 * length({_s})"),
    ])

# Per-table character-class counting via translate deletion (reference
# test/sql/function/string — translate with a shorter 'to' deletes).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _vow = f"length(lower({_s})) - length(translate(lower({_s}), 'aeiou', ''))"
    corpus(f"charclass_file_{_t}", f"character-class counts via translate over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT CAST(sum({_vow}) AS BIGINT) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_vow} = 0"),
        ("II", "rowsort", f"SELECT {_vow}, count(*) FROM {_t} GROUP BY {_vow}"),
        ("I", "", f"SELECT CAST(max({_vow}) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum({_vow}) AS BIGINT) FROM {_t}) <= (SELECT CAST(sum(length({_s})) AS BIGINT) FROM {_t}) AS STRING)"),
    ])


# Per-table ntile bucket-size invariants (reference test/sql/window —
# bucket sizes differ by at most one, earlier buckets are the larger).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _nt = f"(SELECT ntile(7) OVER (ORDER BY {_k}) AS nt FROM {_t})"
    corpus(f"ntilebounds_file_{_t}", f"ntile bucket-size invariants over {_t} (reference test/sql/window)")([
        ("T", "", f"SELECT CAST(max(c) - min(c) <= 1 AS STRING) FROM (SELECT count(*) AS c FROM {_nt} x GROUP BY nt) y"),
        ("I", "", f"SELECT count(*) FROM (SELECT nt, count(*) AS c FROM {_nt} x GROUP BY nt) y"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_nt} x GROUP BY nt) y) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("II", "", f"SELECT nt, count(*) FROM {_nt} x GROUP BY nt ORDER BY nt LIMIT 3"),
        ("T", "", f"SELECT CAST((SELECT c FROM (SELECT nt, count(*) AS c FROM {_nt} x GROUP BY nt) y ORDER BY nt LIMIT 1) >= (SELECT c FROM (SELECT nt, count(*) AS c FROM {_nt} x GROUP BY nt) z ORDER BY nt DESC LIMIT 1) AS STRING)"),
    ])

# Correlated EXISTS over aggregated-HAVING subqueries per FK pair
# (reference test/sql/subquery/exists — EXISTS of a grouped inner).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    corpus(f"existshaving_file_{_n}", f"EXISTS over grouped HAVING subqueries for {_n} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_rt} b WHERE EXISTS (SELECT a.{_lkc} FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} GROUP BY a.{_lkc} HAVING count(*) > 1)"),
        ("I", "", f"SELECT count(*) FROM {_rt} b WHERE NOT EXISTS (SELECT a.{_lkc} FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} GROUP BY a.{_lkc} HAVING count(*) >= 1)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_rt} b WHERE NOT EXISTS (SELECT a.{_lkc} FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} GROUP BY a.{_lkc} HAVING count(*) >= 1)) = (SELECT count(*) FROM {_rt} b WHERE NOT EXISTS (SELECT 1 FROM {_lt} a WHERE a.{_lkc} = b.{_rkc})) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_rt} b WHERE EXISTS (SELECT a.{_lkc} FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} GROUP BY a.{_lkc} HAVING count(*) > 3)"),
        ("I", "", f"SELECT count(*) FROM {_rt} b WHERE EXISTS (SELECT a.{_lkc} FROM {_lt} a WHERE a.{_lkc} = b.{_rkc} AND a.{_lkc} % 2 = 0 GROUP BY a.{_lkc} HAVING CAST(sum(a.{_lkc} % 5) AS BIGINT) > 0)"),
    ])

# Per-table cast round-trip identities (reference test/sql/cast —
# value -> STRING -> value must be lossless for integers and dates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"castrt_file_{_t}", f"cast round-trips over {_t} (reference test/sql/cast)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CAST(CAST({_k} AS STRING) AS BIGINT) <> CAST({_k} AS BIGINT)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE CAST(CAST(({_k}) % 100 AS STRING) AS INT) <> CAST(({_k}) % 100 AS INT)"),
        ("T", "", f"SELECT CAST((SELECT count(DISTINCT CAST({_k} AS STRING)) FROM {_t}) = (SELECT count(DISTINCT {_k}) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(CAST(({_k}) % 1000 AS STRING)) > 3"),
        ("I", "", f"SELECT CAST(sum(CAST(CAST(({_k}) % 7 AS STRING) AS BIGINT)) AS BIGINT) FROM {_t}"),
    ])

# Per-table lexicographic-vs-numeric ordering (reference test/sql/order
# — string-cast keys order differently from their numeric source).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _pairrn = f"(SELECT {_k} AS kk, row_number() OVER (ORDER BY {_k}) AS rn_num, row_number() OVER (ORDER BY CAST({_k} AS STRING), {_k}) AS rn_lex FROM {_t})"
    corpus(f"lexorder_file_{_t}", f"lexicographic vs numeric ordering over {_t} (reference test/sql/order)")([
        ("I", "", f"SELECT count(*) FROM {_pairrn} x WHERE rn_num <> rn_lex"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(rn_lex) AS BIGINT) FROM {_pairrn} x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("T", "", f"SELECT CAST(kk AS STRING) FROM (SELECT kk, rn_lex FROM {_pairrn} x) y ORDER BY rn_lex LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM {_pairrn} x WHERE rn_num = rn_lex AND kk % 2 = 0"),
        ("T", "", f"SELECT min(CAST({_k} AS STRING)) FROM {_t}"),
    ])


# Mixed EXISTS+IN predicates per FK pair (reference test/sql/subquery
# — both subquery forms conjoined and disjoined in one WHERE).
for _n, (_l, _r, _on, _grp) in _JOIN_PAIRS.items():
    _lk, _rk = _on.split(" = ")
    _lt, _rt = _l.split(" ")[0], _r.split(" ")[0]
    _lkc, _rkc = _lk.split(".")[1], _rk.split(".")[1]
    corpus(f"mixsemi_file_{_n}", f"mixed EXISTS and IN predicates for {_n} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc}) AND a.{_lkc} IN (SELECT {_rkc} FROM {_rt} WHERE {_rkc} % 2 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc}) OR a.{_lkc} % 10 IN (SELECT r_regionkey FROM region)"),
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE NOT EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc}) AND a.{_lkc} % 3 IN (0, 1)"),
        ("I", "", f"SELECT count(*) FROM {_lt} a WHERE a.{_lkc} IN (SELECT {_rkc} FROM {_rt}) AND NOT (a.{_lkc} % 4 IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2))"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_lt} a WHERE EXISTS (SELECT 1 FROM {_rt} b WHERE b.{_rkc} = a.{_lkc})) = (SELECT count(*) FROM {_lt} a WHERE a.{_lkc} IN (SELECT {_rkc} FROM {_rt})) AS STRING)"),
    ])

# Per-table integer-division-to-double semantics (reference
# test/sql/function/math — `/` on integers yields double in both
# engines; floor() recovers the integral quotient).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"({_k}) % 17"
    corpus(f"divdouble_file_{_t}", f"integer / returning double over {_t} (reference test/sql/function/math)")([
        ("R", "", f"SELECT round(sum({_x} / 4), 3) FROM {_t}"),
        ("I", "", f"SELECT CAST(sum(CAST(floor({_x} / 4) AS BIGINT)) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(CAST(floor({_x} / 4) AS BIGINT)) AS BIGINT) FROM {_t}) <= (SELECT CAST(sum({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_x} / 2 = CAST({_x} AS DOUBLE) / 2"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(CAST(floor({_x} / 3) AS BIGINT)) * 3 + sum(CAST({_x} AS BIGINT) % 3) AS BIGINT) FROM {_t}) = (SELECT CAST(sum({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
    ])

# Per-table NULLS ordering inside window ORDER BY (reference
# test/sql/window — NULLS FIRST/LAST changes which rows rank first).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _nv = f"nullif(({_k}) % 4, 0)"
    corpus(f"winnullord_file_{_t}", f"NULLS ordering in windows over {_t} (reference test/sql/window)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_nv} AS nv, row_number() OVER (ORDER BY {_nv} ASC NULLS FIRST, {_k}) AS rn FROM {_t}) x WHERE rn = 1 AND nv IS NULL"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_nv} AS nv, row_number() OVER (ORDER BY {_nv} ASC NULLS LAST, {_k}) AS rn FROM {_t}) x WHERE rn = 1 AND nv IS NULL"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY {_nv} DESC NULLS FIRST, {_k}) AS rn FROM {_t}) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_nv} AS nv, rank() OVER (ORDER BY {_nv} ASC NULLS FIRST) AS rk FROM {_t}) x WHERE rk = 1"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY {_nv} DESC NULLS LAST, {_k}) AS rn FROM {_t}) x ORDER BY rn LIMIT 4"),
    ])


# Per-table dynamic-offset substr (reference test/sql/function/string
# — computed start/length arguments).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"substrdyn_file_{_t}", f"computed-offset substr over {_t} (reference test/sql/function/string)")([
        ("T", "", f"SELECT substr({_s}, 1 + CAST(({_k}) % 3 AS INT), 2) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length(substr({_s}, 1, CAST(({_k}) % 5 AS INT))) = least(CAST(({_k}) % 5 AS INT), length({_s}))"),
        ("T", "", f"SELECT substr({_s}, CAST(length({_s}) AS INT), 1) FROM {_t} ORDER BY {_k} LIMIT 4"),
        ("I", "", f"SELECT count(DISTINCT substr({_s}, 1 + CAST(({_k}) % 2 AS INT), 3)) FROM {_t}"),
        ("T", "", f"SELECT concat(substr({_s}, 1, 2), substr({_s}, 3 + CAST(({_k}) % 2 AS INT), 2)) FROM {_t} ORDER BY {_k} LIMIT 4"),
    ])

# Per-table ratio aggregates (reference test/sql/aggregate —
# proportion-of-rows measures via count_if over count(*)).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"ratioagg_file_{_t}", f"ratio aggregates over {_t} (reference test/sql/aggregate)")([
        ("R", "", f"SELECT round(count_if({_p}) * 1.0 / count(*), 3) FROM {_t}"),
        ("R", "rowsort", f"SELECT round(count_if(({_k}) % 2 = 0) * 1.0 / count(*), 3) FROM {_t} GROUP BY {_g}"),
        ("T", "", f"SELECT CAST(count_if({_p}) + count_if(NOT ({_p})) = count(*) AS STRING) FROM {_t}"),
        ("R", "", f"SELECT round(avg(CASE WHEN {_p} THEN 1.0 ELSE 0.0 END), 3) FROM {_t}"),
        # avg over DECIMAL literals is EXCLUDED from the identity: the
        # engines assign different result scales to avg(DECIMAL(2,1))
        # (probe-found .6f divergence); CAST to DOUBLE first agrees.
        ("T", "", f"SELECT CAST((SELECT round(count_if({_p}) * 1.0 / count(*), 6) FROM {_t}) = (SELECT round(avg(CASE WHEN {_p} THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6) FROM {_t}) AS STRING)"),
    ])


# Per-table LIKE with scalar-subquery patterns (reference
# test/sql/function/string — the pattern itself computed by a query).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"likedyn_file_{_t}", f"scalar-subquery LIKE patterns over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} LIKE (SELECT concat('%', substr(min({_s}), 1, 1), '%') FROM {_t})"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} LIKE concat(substr((SELECT min({_s}) FROM {_t}), 1, 1), '%')"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} NOT LIKE (SELECT concat(max(substr({_s}, 1, 1)), '%') FROM {_t})"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_s} LIKE '%') = (SELECT count(*) FROM {_t} WHERE {_s} IS NOT NULL) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} LIKE CASE WHEN (SELECT count(*) FROM region) = 5 THEN '%a%' ELSE '%zzz%' END"),
    ])

# Per-table EXISTS over literal VALUES relations (reference
# test/sql/subquery — semi-joins against inline data).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"existsvalues_file_{_t}", f"EXISTS over VALUES relations for {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXISTS (SELECT 1 FROM (VALUES (0), (1), (2)) v(x) WHERE v.x = ({_k}) % 5)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE NOT EXISTS (SELECT 1 FROM (VALUES (0), (1)) v(x) WHERE v.x = ({_k}) % 4)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE EXISTS (SELECT 1 FROM (VALUES (0), (1), (2)) v(x) WHERE v.x = ({_k}) % 5)) = (SELECT count(*) FROM {_t} WHERE ({_k}) % 5 IN (0, 1, 2)) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXISTS (SELECT 1 FROM (VALUES ('A'), ('B')) v(x) WHERE v.x = upper(substr({_s}, 1, 1)))"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXISTS (SELECT 1 FROM (VALUES (0), (2), (4)) v(x) WHERE v.x = ({_k}) % 6 AND {_p})"),
    ])

# Per-table four-level derived-table nesting (reference
# test/sql/subquery — filters and projections at every level).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"deepnest_file_{_t}", f"four-level derived nesting over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM (SELECT kk FROM (SELECT kk, gg FROM (SELECT {_k} AS kk, {_g} AS gg FROM (SELECT * FROM {_t} WHERE {_p}) l1) l2 WHERE kk % 2 = 0) l3 WHERE kk % 3 = 0) l4"),
        ("I", "", f"SELECT CAST(max(kk) AS BIGINT) FROM (SELECT kk + 1 AS kk FROM (SELECT kk - 1 AS kk FROM (SELECT {_k} AS kk FROM {_t}) a) b) c"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM (SELECT kk FROM (SELECT kk FROM (SELECT {_k} AS kk FROM {_t}) a) b) c) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT kk, sv FROM (SELECT kk, upper(sv) AS sv FROM (SELECT {_k} AS kk, {_s} AS sv FROM {_t}) a WHERE length(sv) > 2) b WHERE sv LIKE '%A%') c"),
        ("II", "", f"SELECT CAST(mn AS BIGINT), CAST(mx AS BIGINT) FROM (SELECT min(kk) AS mn, max(kk) AS mx FROM (SELECT kk FROM (SELECT {_k} AS kk FROM {_t} WHERE {_p}) a WHERE kk % 2 = 1) b) c"),
    ])


# Per-table wide aggregate rows (reference test/sql/aggregate — every
# basic aggregate of one expression in a single SELECT).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _x = f"({_k}) % 15"
    corpus(f"allaggs_file_{_t}", f"wide aggregate rows over {_t} (reference test/sql/aggregate)")([
        ("IIIII", "", f"SELECT count(*), count(DISTINCT {_x}), CAST(sum({_x}) AS BIGINT), CAST(min({_x}) AS BIGINT), CAST(max({_x}) AS BIGINT) FROM {_t}"),
        ("IR", "", f"SELECT count(*), round(avg({_x}), 3) FROM {_t} WHERE {_p}"),
        ("IIIII", "rowsort", f"SELECT count(*), count(DISTINCT {_x}), CAST(sum({_x}) AS BIGINT), CAST(min({_x}) AS BIGINT), CAST(max({_x}) AS BIGINT) FROM {_t} GROUP BY {_g}"),
        ("T", "", f"SELECT CAST((SELECT CAST(min({_x}) AS BIGINT) FROM {_t}) <= (SELECT CAST(max({_x}) AS BIGINT) FROM {_t}) AS STRING)"),
        ("II", "", f"SELECT count({_s}), count(DISTINCT substr({_s}, 1, 1)) FROM {_t}"),
    ])

# Mixed INNER+LEFT joins per star fact (reference test/sql/join —
# an inner first hop with an outer second hop).
for _t, (_frm0, _d1, _d2, _fk) in _STARS.items():
    _parts = _frm0.split(" JOIN ")
    _mixed = f"{_parts[0]} JOIN {_parts[1]} LEFT JOIN {_parts[2]}"
    corpus(f"mixedjoin_file_{_t}", f"mixed INNER+LEFT joins over {_t} (reference test/sql/join)")([
        ("II", "", f"SELECT count(*), count({_d2}) FROM {_mixed}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_mixed}) >= (SELECT count(*) FROM {_frm0}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_mixed} WHERE {_d2} IS NULL"),
        ("TI", "rowsort", f"SELECT coalesce({_d2}, '(none)') AS g, count(*) FROM {_mixed} GROUP BY coalesce({_d2}, '(none)') HAVING count(*) > 2"),
        ("I", "", f"SELECT count(DISTINCT {_d1}) FROM {_mixed} WHERE {_d2} IS NOT NULL"),
    ])

# Per-table repeated derived tables joined (reference test/sql/join —
# the same derived text appearing twice under different aliases).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _dtab = f"(SELECT ({_k}) % 7 AS b, count(*) AS c FROM {_t} GROUP BY ({_k}) % 7)"
    corpus(f"dupderived_file_{_t}", f"repeated derived tables over {_t} (reference test/sql/join)")([
        ("I", "", f"SELECT count(*) FROM {_dtab} a JOIN {_dtab} b ON a.b = b.b"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_dtab} a JOIN {_dtab} b ON a.b = b.b AND a.c = b.c) = (SELECT count(*) FROM {_dtab} x) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_dtab} a JOIN {_dtab} b ON a.b = (b.b + 1) % 7"),
        ("I", "", f"SELECT CAST(sum(a.c * b.c) AS BIGINT) FROM {_dtab} a JOIN {_dtab} b ON a.b = b.b"),
        ("I", "", f"SELECT count(*) FROM {_dtab} a CROSS JOIN {_dtab} b WHERE a.b < b.b"),
    ])


# Per-table four-key grouping (reference test/sql/aggregate — wide
# grouping keys with mixed expression types).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _keys = f"({_k}) % 2, ({_k}) % 3, substr({_s}, 1, 1), CAST({_p} AS INT)"
    corpus(f"widegroup_file_{_t}", f"four-key grouping over {_t} (reference test/sql/aggregate)")([
        ("I", "", f"SELECT count(*) FROM (SELECT {_keys} FROM {_t} GROUP BY {_keys}) x"),
        ("IITII", "rowsort", f"SELECT ({_k}) % 2 AS a, ({_k}) % 3 AS b, substr({_s}, 1, 1) AS c, CAST({_p} AS INT) AS d, count(*) FROM {_t} GROUP BY {_keys} HAVING count(*) > 1"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_keys}) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT CAST(max(c) AS BIGINT) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_keys}) x"),
        ("I", "", f"SELECT count(*) FROM (SELECT count(*) AS c FROM {_t} GROUP BY {_keys}) x WHERE c = 1"),
    ])

# Per-table aggregates over all-NULL inputs (reference
# test/sql/aggregate — sum/avg/min/max are NULL, count is 0).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _nul = "CASE WHEN FALSE THEN 1 END"
    corpus(f"aggnullall_file_{_t}", f"aggregates over all-NULL inputs of {_t} (reference test/sql/aggregate)")([
        ("TTTT", "", f"SELECT CAST(sum({_nul}) AS STRING), CAST(avg({_nul}) AS STRING), CAST(min({_nul}) AS STRING), CAST(max({_nul}) AS STRING) FROM {_t}"),
        ("II", "", f"SELECT count({_nul}), count(*) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT {_nul}) FROM {_t}"),
        ("T", "", f"SELECT CAST(coalesce(CAST(sum({_nul}) AS BIGINT), -1) = -1 AS STRING) FROM {_t}"),
        ("TI", "rowsort", f"SELECT CAST(max({_nul}) AS STRING), count(*) FROM {_t} GROUP BY {_g}"),
    ])

# Per-table absolute-difference identities (reference
# test/sql/function/math — |a-b| symmetry and triangle bounds).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _a, _b = f"({_k}) % 11", f"({_k}) % 6"
    corpus(f"absdiff_file_{_t}", f"absolute-difference identities over {_t} (reference test/sql/function/math)")([
        ("T", "", f"SELECT CAST((SELECT CAST(sum(abs({_a} - {_b})) AS BIGINT) FROM {_t}) = (SELECT CAST(sum(abs({_b} - {_a})) AS BIGINT) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE abs({_a} - {_b}) > {_a} + {_b}"),
        ("I", "", f"SELECT CAST(sum(greatest({_a}, {_b}) - least({_a}, {_b})) AS BIGINT) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT CAST(sum(abs({_a} - {_b})) AS BIGINT) FROM {_t}) = (SELECT CAST(sum(greatest({_a}, {_b}) - least({_a}, {_b})) AS BIGINT) FROM {_t}) AS STRING)"),
        ("II", "rowsort", f"SELECT CAST(abs({_a} - {_b}) AS BIGINT) % 3, count(*) FROM {_t} GROUP BY CAST(abs({_a} - {_b}) AS BIGINT) % 3"),
    ])

# Per-table multi-direction window ordering (reference test/sql/window
# — mixed ASC/DESC keys inside one OVER clause).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winmultiord_file_{_t}", f"mixed-direction window ordering over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY ({_k}) % 3 ASC, {_k} DESC) AS rn FROM {_t}) x ORDER BY rn LIMIT 5"),
        ("I", "", f"SELECT count(*) FROM (SELECT rank() OVER (ORDER BY ({_k}) % 2 DESC, substr({_s}, 1, 1) ASC, {_k}) AS rk FROM {_t}) x WHERE rk <= 3"),
        ("T", "", f"SELECT CAST((SELECT CAST(max(rn) AS BIGINT) FROM (SELECT row_number() OVER (ORDER BY ({_k}) % 5 DESC, {_k} ASC) AS rn FROM {_t}) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("II", "", f"SELECT CAST(kk AS BIGINT) AS kb, rn FROM (SELECT {_k} AS kk, row_number() OVER (ORDER BY length({_s}) DESC, {_k} ASC) AS rn FROM {_t}) x WHERE rn <= 4 ORDER BY rn"),
        ("I", "", f"SELECT count(*) FROM (SELECT row_number() OVER (ORDER BY ({_k}) % 4 ASC, ({_k}) % 7 DESC, {_k}) AS rn, ({_k}) % 4 AS m FROM {_t}) x WHERE rn = 1 AND m = 0"),
    ])

# Quarter-level aggregates over the real temporal columns (reference
# test/sql/types/date — quarter buckets as first-class group keys).
for _t, (_k, _d) in _DTCOLS.items():
    corpus(f"quarteragg_file_{_t}", f"quarter-level aggregates over {_t} (reference test/sql/types/date)")([
        ("III", "rowsort", f"SELECT EXTRACT(YEAR FROM {_d}), EXTRACT(QUARTER FROM {_d}), count(*) FROM {_t} GROUP BY EXTRACT(YEAR FROM {_d}), EXTRACT(QUARTER FROM {_d})"),
        ("I", "", f"SELECT count(DISTINCT concat(CAST(EXTRACT(YEAR FROM {_d}) AS STRING), '-', CAST(EXTRACT(QUARTER FROM {_d}) AS STRING))) FROM {_t}"),
        ("T", "", f"SELECT CAST(min(CAST(date_trunc('quarter', {_d}) AS DATE)) AS STRING) FROM {_t} WHERE EXTRACT(QUARTER FROM {_d}) = 2"),
        ("II", "", f"SELECT EXTRACT(QUARTER FROM {_d}) AS q, count(*) AS c FROM {_t} GROUP BY EXTRACT(QUARTER FROM {_d}) ORDER BY c DESC, q LIMIT 1"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXTRACT(QUARTER FROM {_d}) IN (1, 4)"),
    ])

# Per-table constant-folding shapes (reference test/sql/conjunction +
# optimizer — tautologies and contradictions mixed with real predicates).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"constfold_file_{_t}", f"constant folding over {_t} (reference test/sql/conjunction)")([
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE 1 = 1 AND {_p}) = (SELECT count(*) FROM {_t} WHERE {_p}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE 1 = 2 AND {_p}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_p} OR 2 + 2 = 4) = (SELECT count(*) FROM {_t}) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_p} AND TRUE) OR (NOT ({_p}) AND FALSE)"),
        ("I", "", f"SELECT CAST(sum(CASE WHEN 3 > 2 THEN ({_k}) % 4 ELSE 999 END) AS BIGINT) FROM {_t}"),
    ])


# Per-table nested-modulo chains (reference test/sql/function/math —
# composition of % operators and its distribution over grouping).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _c = f"((({_k}) % 97) % 13) % 7"
    corpus(f"modchain_file_{_t}", f"nested modulo chains over {_t} (reference test/sql/function/math)")([
        ("I", "", f"SELECT CAST(sum({_c}) AS BIGINT) FROM {_t}"),
        ("II", "rowsort", f"SELECT {_c}, count(*) FROM {_t} GROUP BY {_c}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_c} >= 7) = 0 AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_c} = ({_k}) % 7 AND ({_k}) % 97 < 13"),
        ("II", "", f"SELECT CAST(min({_c}) AS BIGINT), CAST(max({_c}) AS BIGINT) FROM {_t}"),
    ])

# Per-table numeric-string concatenation (reference
# test/sql/function/string — numbers rendered into strings, grouped
# and ordered as text).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _ns = f"concat('k', CAST(({_k}) % 12 AS STRING))"
    corpus(f"concatnum_file_{_t}", f"numeric-string concatenation over {_t} (reference test/sql/function/string)")([
        ("TI", "rowsort", f"SELECT {_ns}, count(*) FROM {_t} GROUP BY {_ns}"),
        ("T", "", f"SELECT min({_ns}) FROM {_t}"),
        ("T", "", f"SELECT max({_ns}) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE length({_ns}) = 3"),
        ("I", "", f"SELECT count(DISTINCT {_ns}) FROM {_t}"),
    ])


# Per-table ILIKE matrix (reference test/sql/function/string/
# test_ilike.test — case-insensitive LIKE is a shared spelling).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"ilike2_file_{_t}", f"ILIKE matrix over {_t} (reference test/sql/function/string)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} ILIKE '%a%'"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_s} ILIKE '%e%') = (SELECT count(*) FROM {_t} WHERE lower({_s}) LIKE '%e%') AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_s} NOT ILIKE 'z%'"),
        ("II", "", f"SELECT count_if({_s} ILIKE '%o%'), count_if({_s} LIKE '%o%') FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_s} ILIKE '%A%') >= (SELECT count(*) FROM {_t} WHERE {_s} LIKE '%A%') AS STRING)"),
    ])

# Per-table EXISTS with ORDER BY/LIMIT inside (reference
# test/sql/subquery — ordering inside EXISTS is semantically inert,
# LIMIT 0 makes it empty).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"existslimit_file_{_t}", f"EXISTS with ORDER BY/LIMIT over {_t} (reference test/sql/subquery)")([
        ("I", "", f"SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM {_t} ORDER BY {_k} LIMIT 1)"),
        ("I", "", f"SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM {_t} LIMIT 0)"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM region WHERE EXISTS (SELECT 1 FROM {_t} WHERE {_p} LIMIT 3)) = (SELECT CASE WHEN EXISTS (SELECT 1 FROM {_t} WHERE {_p}) THEN (SELECT count(*) FROM region) ELSE 0 END) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE EXISTS (SELECT 1 FROM region ORDER BY r_regionkey DESC LIMIT 2) AND {_p}"),
        ("I", "", f"SELECT count(*) FROM region r WHERE EXISTS (SELECT 1 FROM {_t} WHERE ({_k}) % 5 = r.r_regionkey ORDER BY {_k} LIMIT 1)"),
    ])

# Per-table concatenated grouping keys (reference test/sql/aggregate —
# composite string keys built at group time).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _ck = f"concat(substr({_s}, 1, 1), '-', CAST(({_k}) % 3 AS STRING))"
    corpus(f"concatkey_file_{_t}", f"concatenated grouping keys over {_t} (reference test/sql/aggregate)")([
        ("TI", "rowsort", f"SELECT {_ck}, count(*) FROM {_t} GROUP BY {_ck}"),
        ("I", "", f"SELECT count(DISTINCT {_ck}) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT count(DISTINCT {_ck}) FROM {_t}) = (SELECT count(*) FROM (SELECT substr({_s}, 1, 1) AS a, ({_k}) % 3 AS b FROM {_t} GROUP BY substr({_s}, 1, 1), ({_k}) % 3) x) AS STRING)"),
        ("TI", "", f"SELECT {_ck} AS ck, count(*) AS c FROM {_t} GROUP BY {_ck} ORDER BY c DESC, ck LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM (SELECT {_ck} AS ck FROM {_t} GROUP BY {_ck} HAVING count(*) > 1) x"),
    ])



# ---------------------------------------------------------------------------
# Round-5 depth fill for the three thin reference dirs (VERDICT item 7):
# test/sql/types/nested/ (the dialect-common slice: deep compositions and
# nested lambdas over the shared list surface — struct-of-list-of-map
# construction has no shared spelling, so that depth lives in
# tests/test_nested_types_differential.py), test/sql/cast/ overflow
# matrices, and the select2/3.test_slow permutation families.
# ---------------------------------------------------------------------------

# Nested list-depth compositions per table (reference test/sql/types/nested,
# test/sql/types/list): every spec stacks >= 3 list ops from the probe-shared
# surface (split/filter/array_sort/array_append/array_intersect/
# array_position/array_contains — transform/element_at/size are NOT shared).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _arr = f"filter(split(lower({_s}), 'a'), x -> x <> '')"
    corpus(f"nestedlist_depth_file_{_t}", f"nested list-op depth over {_t} (reference test/sql/types/nested)")([
        ("T", "", f"SELECT array_sort(filter(split(lower(min({_s})), 'e'), x -> x <> '')) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE array_contains(array_sort({_arr}), 'r')"),
        ("I", "", f"SELECT array_position(array_sort(array_append({_arr}, 'zz')), 'zz') FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("T", "", f"SELECT array_sort(array_intersect({_arr}, filter(split(lower({_s}), 'e'), x -> x <> ''))) FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE array_position(array_append({_arr}, 'q'), 'q') > 1 AND {_p}"),
    ])

# Doubly nested lambdas per table (reference test/sql/types/list/lambdas):
# a filter whose predicate itself runs a nested filter/array_contains.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _arr = f"split(lower({_s}), 'a')"
    corpus(f"nestedlambda_file_{_t}", f"nested lambdas over {_t} (reference test/sql/types/list/lambdas)")([
        ("T", "", f"SELECT filter(filter({_arr}, x -> x <> ''), x -> length(x) > 1) FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE array_contains(filter({_arr}, x -> length(x) > 0), 'r')"),
        ("T", "", f"SELECT array_sort(filter({_arr}, x -> array_contains(split('r,s,t', ','), substring(x, 1, 1)))) FROM {_t} ORDER BY {_k} LIMIT 3"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE array_position(filter({_arr}, x -> x >= 'b'), 'r') > 0"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE array_contains(filter({_arr}, x -> x <> ''), 'r')) <= (SELECT count(*) FROM {_t} WHERE lower({_s}) LIKE '%r%') AS STRING)"),
    ])

# Aggregates over list-derived scalars per table (reference
# test/sql/types/nested + test/sql/aggregate).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _arr = f"filter(split(lower({_s}), 'a'), x -> x <> '')"
    corpus(f"nestedlist_agg_file_{_t}", f"aggregates over list-derived scalars, {_t} (reference test/sql/types/nested)")([
        ("I", "", f"SELECT sum(array_position(array_append({_arr}, '~'), '~') - 1) FROM {_t}"),
        ("I", "", f"SELECT count_if(array_contains({_arr}, 'r')) FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT array_position(array_append({_arr}, '~'), '~')) FROM {_t}"),
        ("II", "rowsort", f"SELECT array_position(array_append({_arr}, '~'), '~') - 1 AS nseg, count(*) FROM {_t} GROUP BY array_position(array_append({_arr}, '~'), '~') - 1"),
        ("I", "", f"SELECT max(array_position(array_sort(array_append({_arr}, 'zzz')), 'zzz')) FROM {_t}"),
    ])

# Nested conditional-expression depth per table (reference
# test/sql/types/nested + test/sql/function/generic): 4-5 level CASE /
# COALESCE / NULLIF towers.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"nestedcase_depth_file_{_t}", f"nested CASE/COALESCE towers over {_t} (reference test/sql/function/generic)")([
        ("TI", "rowsort", f"SELECT CASE WHEN {_p} THEN CASE WHEN ({_k}) % 2 = 0 THEN CASE WHEN ({_k}) % 4 = 0 THEN 'a4' ELSE 'a2' END ELSE CASE WHEN ({_k}) % 3 = 0 THEN 'b3' ELSE 'b1' END END ELSE 'z' END, count(*) FROM {_t} GROUP BY 1"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE coalesce(nullif(CAST(({_k}) % 5 AS STRING), '0'), nullif(CAST(({_k}) % 3 AS STRING), '0'), 'x') = 'x'"),
        ("I", "", f"SELECT sum(CASE WHEN nullif(({_k}) % 7, 0) IS NULL THEN CASE WHEN {_p} THEN 2 ELSE 1 END ELSE 0 END) FROM {_t}"),
        ("T", "", f"SELECT coalesce(CASE WHEN min({_k}) < 0 THEN 'neg' END, CASE WHEN min({_k}) = 0 THEN 'zero' END, 'pos') FROM {_t}"),
        ("I", "", f"SELECT count(DISTINCT CASE WHEN {_p} THEN nullif(({_k}) % 4, 2) ELSE nullif(({_k}) % 4, 1) END) FROM {_t}"),
    ])

# TRY_CAST overflow literal matrices (reference test/sql/cast/
# test_overflow_*.test): integer-width boundaries, string forms, decimal
# precision walls, float magnitudes.  CAST(double AS INT) rounding is the
# one known divergence (documented in the header) so boundaries use exact
# integers/strings only.
corpus("castovf_tinyint", "TINYINT overflow boundaries (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST(127 AS TINYINT)"),
    ("I", "", "SELECT TRY_CAST(128 AS TINYINT)"),
    ("I", "", "SELECT TRY_CAST(-128 AS TINYINT)"),
    ("I", "", "SELECT TRY_CAST(-129 AS TINYINT)"),
    ("I", "", "SELECT TRY_CAST('127' AS TINYINT)"),
    ("I", "", "SELECT TRY_CAST('-129' AS TINYINT)"),
    ("II", "", "SELECT TRY_CAST(126 + 1 AS TINYINT), TRY_CAST(126 + 2 AS TINYINT)"),
])
corpus("castovf_smallint", "SMALLINT overflow boundaries (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST(32767 AS SMALLINT)"),
    ("I", "", "SELECT TRY_CAST(32768 AS SMALLINT)"),
    ("I", "", "SELECT TRY_CAST(-32768 AS SMALLINT)"),
    ("I", "", "SELECT TRY_CAST(-32769 AS SMALLINT)"),
    ("I", "", "SELECT TRY_CAST('32768' AS SMALLINT)"),
    ("II", "", "SELECT TRY_CAST(32766 + 1 AS SMALLINT), TRY_CAST(32766 + 2 AS SMALLINT)"),
])
corpus("castovf_integer", "INTEGER overflow boundaries (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST(2147483647 AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST(2147483648 AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST(-2147483648 AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST(-2147483649 AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('2147483648' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('-2147483649' AS INTEGER)"),
])
corpus("castovf_bigint", "BIGINT overflow boundaries (reference test/sql/cast)")([
    ("I", "", "SELECT TRY_CAST(9223372036854775807 AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('9223372036854775808' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('-9223372036854775808' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('-9223372036854775809' AS BIGINT)"),
    ("I", "", "SELECT TRY_CAST('99999999999999999999' AS BIGINT)"),
])
corpus("castovf_decimal", "DECIMAL precision-wall TRY_CASTs (reference test/sql/cast + types/decimal)")([
    ("T", "", "SELECT CAST(TRY_CAST('99.99' AS DECIMAL(4,2)) AS STRING)"),
    ("T", "", "SELECT CAST(TRY_CAST('100.00' AS DECIMAL(4,2)) AS STRING)"),
    ("T", "", "SELECT CAST(TRY_CAST('-99.99' AS DECIMAL(4,2)) AS STRING)"),
    ("T", "", "SELECT CAST(TRY_CAST('-100.00' AS DECIMAL(4,2)) AS STRING)"),
    ("T", "", "SELECT CAST(TRY_CAST(CAST('999' AS BIGINT) AS DECIMAL(3,0)) AS STRING)"),
    ("T", "", "SELECT CAST(TRY_CAST(CAST('1000' AS BIGINT) AS DECIMAL(3,0)) AS STRING)"),
])
corpus("castovf_string_forms", "string-to-int overflow/garbage forms (reference test/sql/cast/string_to_integer.test)")([
    ("I", "", "SELECT TRY_CAST('' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('  42  ' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('+42' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('4 2' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('42abc' AS INTEGER)"),
    # '0x1A' EXCLUDED: DuckDB parses hex strings (26), Spark NULLs them
    ("I", "", "SELECT TRY_CAST('++42' AS INTEGER)"),
    ("I", "", "SELECT TRY_CAST('4two' AS INTEGER)"),
])

# Per-table TRY_CAST narrowing overflow (reference test/sql/cast): key
# columns shifted past each width's wall; both engines must NULL the
# same rows.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"castovf2_file_{_t}", f"column narrowing overflow over {_t} (reference test/sql/cast)")([
        ("II", "", f"SELECT count(*), count(TRY_CAST(({_k}) + 120 AS TINYINT)) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE TRY_CAST(({_k}) + 32760 AS SMALLINT) IS NULL"),
        ("I", "", f"SELECT count(TRY_CAST(({_k}) % 100 AS TINYINT)) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE TRY_CAST(({_k}) + 120 AS TINYINT) IS NULL) = (SELECT count(*) FROM {_t} WHERE ({_k}) + 120 > 127 OR ({_k}) + 120 < -128) AS STRING)"),
        ("I", "", f"SELECT count(DISTINCT TRY_CAST(({_k}) % 200 - 100 AS TINYINT)) FROM {_t}"),
    ])

# Per-table string-lengthened overflow (reference test/sql/cast):
# digits appended via string concat, then TRY_CAST back down.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"castovf_arith_file_{_t}", f"string-built overflow over {_t} (reference test/sql/cast)")([
        ("II", "", f"SELECT count(*), count(TRY_CAST(CAST(({_k}) % 10 AS STRING) || '00' AS SMALLINT)) FROM {_t}"),
        ("I", "", f"SELECT count(TRY_CAST(CAST(({_k}) % 10 AS STRING) || '000000' AS INTEGER)) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE TRY_CAST(CAST(({_k}) % 10 AS STRING) || '0000000000' AS INTEGER) IS NULL"),
        ("I", "", f"SELECT count(DISTINCT TRY_CAST(CAST(({_k}) % 5 AS STRING) || '000' AS SMALLINT)) FROM {_t}"),
        ("T", "", f"SELECT CAST((SELECT count(TRY_CAST(CAST(({_k}) % 10 AS STRING) || '000' AS SMALLINT)) FROM {_t}) = (SELECT count(*) FROM {_t} WHERE (({_k}) % 10) * 1000 <= 32767) AS STRING)"),
    ])

# Per-table DECIMAL narrowing on the value column (reference
# test/sql/types/decimal): TRY_CAST through a (5,1) wall.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"castovf_decimal_file_{_t}", f"decimal narrowing over {_t} (reference test/sql/types/decimal)")([
        ("II", "", f"SELECT count(*), count(TRY_CAST(floor({_v}) AS DECIMAL(5,1))) FROM {_t}"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE TRY_CAST(floor({_v}) AS DECIMAL(5,1)) IS NULL"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE TRY_CAST(floor({_v}) AS DECIMAL(5,1)) IS NULL) = (SELECT count(*) FROM {_t} WHERE floor({_v}) > 9999 OR floor({_v}) < -9999) AS STRING)"),
        ("I", "", f"SELECT count(DISTINCT TRY_CAST(floor({_v}) % 100 AS DECIMAL(3,1))) FROM {_t}"),
        ("T", "", f"SELECT CAST(TRY_CAST(max(floor({_v})) AS DECIMAL(12,1)) AS STRING) FROM {_t}"),
    ])

# select2-style expression permutations per table (reference
# test/sqlite/select2.test_slow: expression-list x WHERE x ORDER BY).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select2b_file_{_t}", f"select2 expression permutations over {_t} (reference test/sqlite/select2.test_slow)")([
        ("III", "", f"SELECT ({_k}) % 7, ({_k}) % 5 + 3, abs(({_k}) % 9 - 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("II", "", f"SELECT ({_k}) % 11 * 2 + 1, CASE WHEN {_p} THEN 1 ELSE 0 END FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("I", "", f"SELECT ({_k}) % 13 + ({_k}) % 3 FROM {_t} ORDER BY ({_k}) % 13 + ({_k}) % 3 DESC, {_k} LIMIT 5"),
        ("II", "rowsort", f"SELECT ({_k}) % 4, count(*) FROM {_t} WHERE NOT ({_p}) GROUP BY ({_k}) % 4"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE (({_k}) % 6 BETWEEN 2 AND 4) = ({_p})"),
    ])

# select2-style WHERE permutations per table.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select2c_file_{_t}", f"select2 WHERE permutations over {_t} (reference test/sqlite/select2.test_slow)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_p} AND ({_k}) % 2 = 0"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE {_p} OR ({_k}) % 7 = 3"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE NOT ({_p} AND ({_k}) % 2 = 0)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_p} AND ({_k}) % 3 = 0) OR (NOT {_p} AND ({_k}) % 3 = 1)"),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 10 IN (1, 3, 5) AND NOT (({_k}) % 10 IN (3))"),
        ("T", "", f"SELECT CAST((SELECT count(*) FROM {_t} WHERE {_p}) + (SELECT count(*) FROM {_t} WHERE NOT {_p}) + (SELECT count(*) FROM {_t} WHERE ({_p}) IS NULL) = (SELECT count(*) FROM {_t}) AS STRING)"),
    ])

# select2-style ORDER BY / LIMIT / OFFSET permutations per table.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select2d_file_{_t}", f"select2 ORDER BY permutations over {_t} (reference test/sqlite/select2.test_slow)")([
        ("I", "", f"SELECT ({_k}) % 97 FROM {_t} ORDER BY ({_k}) % 97 DESC, {_k} ASC LIMIT 4"),
        ("I", "", f"SELECT ({_k}) % 97 FROM {_t} ORDER BY 1 ASC, {_k} LIMIT 4"),
        ("I", "", f"SELECT ({_k}) % 97 FROM {_t} ORDER BY ({_k}) % 97, {_k} LIMIT 3 OFFSET 2"),
        ("TI", "", f"SELECT substr({_s}, 1, 1), ({_k}) % 10 FROM {_t} ORDER BY substr({_s}, 1, 1) DESC, ({_k}) % 10 ASC, {_k} LIMIT 5"),
        ("I", "", f"SELECT CAST({_p} AS INTEGER) FROM {_t} ORDER BY CAST({_p} AS INTEGER) DESC, {_k} LIMIT 5"),
    ])

# select2-style DISTINCT/compound permutations per table.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select2e_file_{_t}", f"select2 DISTINCT/compound permutations over {_t} (reference test/sqlite/select2.test_slow + select4.test_slow)")([
        ("I", "rowsort", f"SELECT DISTINCT ({_k}) % 5 FROM {_t} WHERE {_p}"),
        ("I", "rowsort", f"SELECT ({_k}) % 5 FROM {_t} WHERE {_p} UNION SELECT ({_k}) % 5 FROM {_t} WHERE NOT {_p}"),
        ("I", "rowsort", f"SELECT ({_k}) % 7 FROM {_t} INTERSECT SELECT ({_k}) % 7 FROM {_t} WHERE {_p}"),
        ("I", "rowsort", f"SELECT ({_k}) % 7 FROM {_t} EXCEPT SELECT ({_k}) % 7 FROM {_t} WHERE {_p}"),
        ("I", "", f"SELECT count(*) FROM (SELECT DISTINCT ({_k}) % 5, substr({_s}, 1, 1) FROM {_t}) x"),
    ])

# select3-style GROUP BY matrices per table (reference
# test/sqlite/select3.test_slow).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select3b_file_{_t}", f"select3 GROUP BY matrix over {_t} (reference test/sqlite/select3.test_slow)")([
        ("II", "rowsort", f"SELECT ({_k}) % 3, count(*) FROM {_t} GROUP BY ({_k}) % 3"),
        ("II", "rowsort", f"SELECT ({_k}) % 3, count(*) FROM {_t} GROUP BY ({_k}) % 3 HAVING count(*) > 1"),
        ("III", "rowsort", f"SELECT ({_k}) % 2, ({_k}) % 3, count(*) FROM {_t} GROUP BY ({_k}) % 2, ({_k}) % 3"),
        ("II", "rowsort", f"SELECT ({_k}) % 4, sum(CASE WHEN {_p} THEN 1 ELSE 0 END) FROM {_t} GROUP BY ({_k}) % 4"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 5 AS g FROM {_t} GROUP BY ({_k}) % 5 HAVING count(*) >= 1) x"),
        ("II", "", f"SELECT ({_k}) % 6 AS g, min(({_k}) % 31) FROM {_t} GROUP BY ({_k}) % 6 ORDER BY g LIMIT 4"),
    ])

# select3-style subquery permutations per table.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select3c_file_{_t}", f"select3 subquery permutations over {_t} (reference test/sqlite/select3.test_slow)")([
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 50 < (SELECT count(*) FROM region)"),
        ("I", "", (lambda k1, k2: f"SELECT count(*) FROM {_t} t1 WHERE EXISTS (SELECT 1 FROM {_t} t2 WHERE ({k2}) % 10 = (({k1}) + 1) % 10)")(
            _k.replace('l_orderkey', 't1.l_orderkey').replace('l_linenumber', 't1.l_linenumber') if _t == 'lineitem' else f"t1.{_k}",
            _k.replace('l_orderkey', 't2.l_orderkey').replace('l_linenumber', 't2.l_linenumber') if _t == 'lineitem' else f"t2.{_k}",
        )),
        ("I", "", f"SELECT count(*) FROM {_t} WHERE ({_k}) % 23 IN (SELECT r_regionkey * 2 FROM region)"),
        ("T", "", f"SELECT CAST((SELECT count(DISTINCT ({_k}) % 9) FROM {_t}) = (SELECT count(*) FROM (SELECT DISTINCT ({_k}) % 9 FROM {_t}) x) AS STRING)"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 8 AS g, count(*) AS c FROM {_t} GROUP BY ({_k}) % 8) x WHERE x.c > (SELECT count(*) FROM {_t}) / 10"),
    ])

# select3-style grouped-derived joins per table.
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select3d_file_{_t}", f"select3 derived-join matrix over {_t} (reference test/sqlite/select3.test_slow)")([
        ("II", "rowsort", f"SELECT a.g, a.c FROM (SELECT ({_k}) % 3 AS g, count(*) AS c FROM {_t} GROUP BY ({_k}) % 3) a JOIN (SELECT ({_k}) % 3 AS g FROM {_t} GROUP BY ({_k}) % 3) b ON a.g = b.g"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 4 AS g, count(*) AS c FROM {_t} GROUP BY ({_k}) % 4) a JOIN region r ON a.g = r.r_regionkey % 4"),
        ("II", "rowsort", f"SELECT g, sum(c) FROM (SELECT ({_k}) % 2 AS g, ({_k}) % 3 AS h, count(*) AS c FROM {_t} GROUP BY ({_k}) % 2, ({_k}) % 3) x GROUP BY g"),
        ("I", "", f"SELECT max(c) - min(c) FROM (SELECT ({_k}) % 5 AS g, count(*) AS c FROM {_t} GROUP BY ({_k}) % 5) x"),
        ("T", "", f"SELECT CAST((SELECT sum(c) FROM (SELECT ({_k}) % 6 AS g, count(*) AS c FROM {_t} GROUP BY ({_k}) % 6) x) = (SELECT count(*) FROM {_t}) AS STRING)"),
    ])


# select1-style five-expression matrix per table (reference
# test/sqlite/select1.test_slow: the a,b,c,d,e column-expression grid).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"sqlite_select1b_file_{_t}", f"select1 expression grid over {_t} (reference test/sqlite/select1.test_slow)")([
        ("IIIII", "", f"SELECT ({_k}) % 9, abs(({_k}) % 9 - 4), (({_k}) % 9) * (({_k}) % 3), CASE WHEN ({_k}) % 2 = 0 THEN ({_k}) % 5 ELSE -(({_k}) % 5) END, greatest(({_k}) % 7, ({_k}) % 4) FROM {_t} ORDER BY {_k} LIMIT 5"),
        ("III", "", f"SELECT least(({_k}) % 8, 3), coalesce(nullif(({_k}) % 4, 0), 9), (({_k}) % 6 + 1) * 2 FROM {_t} ORDER BY {_k} DESC LIMIT 5"),
        ("II", "rowsort", f"SELECT ({_k}) % 5 AS a, count(*) FROM {_t} WHERE ({_k}) % 9 <> 4 GROUP BY ({_k}) % 5"),
        ("I", "", f"SELECT sum((({_k}) % 9) * (({_k}) % 3)) FROM {_t} WHERE {_p}"),
        ("IT", "", f"SELECT ({_k}) % 10, CASE WHEN ({_k}) % 10 < 5 THEN 'lo' ELSE 'hi' END FROM {_t} ORDER BY ({_k}) % 10, {_k} LIMIT 6"),
    ])


corpus("ident_case_insensitive", "identifier case-insensitivity (reference test/sql/catalog/case_insensitive_binder.test, case_insensitive_caps.test)")([
    ("T", "", "SELECT R_NAME FROM REGION ORDER BY R_REGIONKEY"),
    ("T", "", "SELECT r_NaMe FROM ReGiOn ORDER BY r_regionKEY"),
    ("I", "", "SELECT CoUnT(*) FROM nation WHERE N_NATIONKEY < 10"),
    ("TI", "rowsort", "SELECT UPPER(n_name), n_regionkey FROM NATION WHERE n_nationkey < 5"),
    ("I", "", "SELECT count(*) FROM region r JOIN NATION n ON R.r_regionkey = N.n_regionkey"),
    ("T", "", "SELECT aliased.UPPER_NAME FROM (SELECT upper(r_name) AS upper_name FROM region) aliased ORDER BY ALIASED.upper_NAME LIMIT 2"),
    ("I", "", "WITH MyCte AS (SELECT n_nationkey AS K FROM nation) SELECT max(k) FROM mycte"),
])


# GROUPING SETS / ROLLUP / CUBE matrix per table (reference
# test/sql/aggregate/group/test_grouping_sets.test — grouping() markers
# included so super-aggregate rows are distinguishable from NULL keys).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"groupingsets2_file_{_t}", f"GROUPING SETS matrix over {_t} (reference test/sql/aggregate/group)")([
        ("III", "rowsort", f"SELECT ({_k}) % 3, ({_k}) % 2, count(*) FROM {_t} GROUP BY GROUPING SETS ((({_k}) % 3), (({_k}) % 2), ())"),
        ("IIII", "rowsort", f"SELECT ({_k}) % 3, grouping(({_k}) % 3), grouping(({_k}) % 2), count(*) FROM {_t} GROUP BY ROLLUP(({_k}) % 3, ({_k}) % 2)"),
        ("III", "rowsort", f"SELECT ({_k}) % 2, ({_k}) % 3, count(*) FROM {_t} GROUP BY CUBE(({_k}) % 2, ({_k}) % 3)"),
        ("II", "rowsort", f"SELECT ({_k}) % 4, sum(CASE WHEN {_p} THEN 1 ELSE 0 END) FROM {_t} GROUP BY GROUPING SETS ((({_k}) % 4), ())"),
        ("I", "", f"SELECT count(*) FROM (SELECT ({_k}) % 3 AS a, ({_k}) % 2 AS b, count(*) AS c FROM {_t} GROUP BY CUBE(({_k}) % 3, ({_k}) % 2)) x"),
    ])

# Window frame-spec grid per table (reference test/sql/window —
# ROWS/RANGE bounds over a deterministic per-table order).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    corpus(f"winframe2_file_{_t}", f"window frame-spec grid over {_t} (reference test/sql/window)")([
        ("II", "", f"SELECT ({_k}) % 97 AS k, sum(({_k}) % 97) OVER (ORDER BY {_k} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM {_t} ORDER BY {_k} LIMIT 6"),
        # RANGE requires a single ordering key in DuckDB; the frame is
        # value-based so peers share a sum and the result is
        # tie-deterministic without a second key in the OVER clause
        ("II", "", f"SELECT ({_k}) % 97 AS k, sum(({_k}) % 97) OVER (ORDER BY ({_k}) % 97 RANGE BETWEEN 3 PRECEDING AND 1 FOLLOWING) FROM {_t} ORDER BY ({_k}) % 97, {_k} LIMIT 6"),
        ("II", "", f"SELECT ({_k}) % 97 AS k, count(*) OVER (PARTITION BY ({_k}) % 5 ORDER BY {_k} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("II", "", f"SELECT ({_k}) % 97 AS k, min(({_k}) % 97) OVER (ORDER BY {_k} ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) FROM {_t} ORDER BY {_k} LIMIT 6"),
        ("II", "", f"SELECT ({_k}) % 97 AS k, max(({_k}) % 97) OVER (ORDER BY {_k} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM {_t} ORDER BY {_k} LIMIT 6"),
    ])

# Explicit NULLS FIRST/LAST ordering matrix per table (reference
# test/sql/order/test_order_nulls.test; NULLs manufactured via nullif).
for _t, (_k, _s, _v, _g, _p) in _TCOLS.items():
    _n = f"nullif(({_k}) % 5, 2)"
    corpus(f"nullorder2_file_{_t}", f"NULLS FIRST/LAST ordering over {_t} (reference test/sql/order)")([
        ("I", "", f"SELECT {_n} FROM {_t} ORDER BY {_n} NULLS FIRST, {_k} LIMIT 6"),
        ("I", "", f"SELECT {_n} FROM {_t} ORDER BY {_n} NULLS LAST, {_k} LIMIT 6"),
        ("I", "", f"SELECT {_n} FROM {_t} ORDER BY {_n} DESC NULLS FIRST, {_k} LIMIT 6"),
        ("I", "", f"SELECT {_n} FROM {_t} ORDER BY {_n} DESC NULLS LAST, {_k} LIMIT 6"),
        ("II", "", f"SELECT {_n}, count(*) FROM {_t} GROUP BY {_n} ORDER BY count(*) DESC, {_n} ASC NULLS FIRST LIMIT 4"),
    ])


# ---------------------------------------------------------------------
# Engine-surface families (round 6): sequences and DESCRIBE, mirroring
# the reference's test/sql/catalog/sequence/ (test_sequence, cycle,
# sequence_offset_increment, sequence_overflow) and test/sql/show_select/.
# DuckDB executes each spec natively; Spark runs it through
# testing.sqllogic.EngineSqlContext — state advances in lockstep on both
# engines.  Statement specs use types "ok"/"error".  nextval VALUE->ROW
# binding is engine-batching-specific, so specs compare value SETS
# (rowsort) or aggregates, never positional pairings with other columns.
# Sequence names are unique per corpus (the DuckDB connection is shared
# across corpora within a generator run).

corpus("sequence_basic", "CREATE SEQUENCE / nextval basics (reference test/sql/catalog/sequence/test_sequence.test)")([
    ("ok", "", "CREATE SEQUENCE sq_a"),
    ("I", "", "SELECT nextval('sq_a')"),
    ("I", "", "SELECT nextval('sq_a')"),
    ("I", "", "SELECT nextval('sq_a')"),
    ("ok", "", "CREATE SEQUENCE sq_b"),
    # independent sequences do not share a counter
    ("I", "", "SELECT nextval('sq_b')"),
    ("I", "", "SELECT nextval('sq_a')"),
    ("I", "rowsort", "SELECT nextval('sq_a') FROM range(4)"),
    ("I", "", "SELECT currval('sq_a')"),
    ("I", "", "SELECT currval('sq_b')"),
])

corpus("sequence_start_with", "START WITH anchoring (reference sequence_offset_increment.test)")([
    ("ok", "", "CREATE SEQUENCE st_a START 100"),
    ("I", "", "SELECT nextval('st_a')"),
    ("I", "", "SELECT nextval('st_a')"),
    ("ok", "", "CREATE SEQUENCE st_b START WITH 7"),
    ("I", "", "SELECT nextval('st_b')"),
    ("ok", "", "CREATE SEQUENCE st_c START 1"),
    ("I", "", "SELECT nextval('st_c')"),
    # START at a bound is allowed
    ("ok", "", "CREATE SEQUENCE st_d START 5 MINVALUE 5 MAXVALUE 10"),
    ("I", "", "SELECT nextval('st_d')"),
])

corpus("sequence_increment_by", "INCREMENT BY stepping (reference sequence_offset_increment.test)")([
    ("ok", "", "CREATE SEQUENCE inc_a INCREMENT 5"),
    ("I", "rowsort", "SELECT nextval('inc_a') FROM range(3)"),
    ("ok", "", "CREATE SEQUENCE inc_b START 10 INCREMENT BY 3"),
    ("I", "", "SELECT nextval('inc_b')"),
    ("I", "", "SELECT nextval('inc_b')"),
    ("I", "", "SELECT nextval('inc_b')"),
    ("ok", "", "CREATE SEQUENCE inc_c START 1000 INCREMENT 250"),
    ("I", "", "SELECT nextval('inc_c') + nextval('inc_c')"),
])

corpus("sequence_descending", "Negative increments: descending defaults and stepping (reference test_sequence.test)")([
    # descending sequences start at MAXVALUE (default -1)
    ("ok", "", "CREATE SEQUENCE de_a INCREMENT -1"),
    ("I", "", "SELECT nextval('de_a')"),
    ("I", "", "SELECT nextval('de_a')"),
    # descending default MAXVALUE is -1: START above it is a create error
    ("error", "", "CREATE SEQUENCE de_x START 50 INCREMENT -10"),
    ("ok", "", "CREATE SEQUENCE de_b START 50 INCREMENT -10 MAXVALUE 50"),
    ("I", "rowsort", "SELECT nextval('de_b') FROM range(4)"),
    ("ok", "", "CREATE SEQUENCE de_c INCREMENT -3 MAXVALUE 9"),
    ("I", "", "SELECT nextval('de_c')"),
    ("I", "", "SELECT nextval('de_c')"),
    ("I", "", "SELECT currval('de_c')"),
])

corpus("sequence_minmax_bounds", "MINVALUE/MAXVALUE windows (reference sequence_offset_increment.test)")([
    ("ok", "", "CREATE SEQUENCE mm_a MINVALUE 40 MAXVALUE 45"),
    # ascending default start is MINVALUE
    ("I", "", "SELECT nextval('mm_a')"),
    ("I", "rowsort", "SELECT nextval('mm_a') FROM range(5)"),
    ("ok", "", "CREATE SEQUENCE mm_b START -5 MINVALUE -10 MAXVALUE -1"),
    ("I", "", "SELECT nextval('mm_b')"),
    ("ok", "", "CREATE SEQUENCE mm_c INCREMENT -2 MINVALUE -7 MAXVALUE 3"),
    ("I", "", "SELECT nextval('mm_c')"),
    ("I", "", "SELECT nextval('mm_c')"),
])

corpus("sequence_cycle_asc", "CYCLE wraps to MINVALUE ascending (reference test/sql/catalog/sequence/cycle)")([
    ("ok", "", "CREATE SEQUENCE cya_a START 2 MINVALUE 1 MAXVALUE 3 CYCLE"),
    ("I", "", "SELECT nextval('cya_a')"),
    ("I", "", "SELECT nextval('cya_a')"),
    ("I", "", "SELECT nextval('cya_a')"),
    ("I", "", "SELECT nextval('cya_a')"),
    ("I", "", "SELECT nextval('cya_a')"),
    # multi-row wrap in one query: the 3-value window repeats
    ("ok", "", "CREATE SEQUENCE cya_b MINVALUE 1 MAXVALUE 3 CYCLE"),
    ("I", "rowsort", "SELECT nextval('cya_b') FROM range(7)"),
    ("I", "", "SELECT count(DISTINCT v) FROM (SELECT nextval('cya_b') AS v FROM range(9)) t"),
])

corpus("sequence_cycle_desc", "CYCLE wraps to MAXVALUE descending (reference cycle tests)")([
    ("ok", "", "CREATE SEQUENCE cyd_a INCREMENT -1 MINVALUE 1 MAXVALUE 3 CYCLE"),
    ("I", "", "SELECT nextval('cyd_a')"),
    ("I", "", "SELECT nextval('cyd_a')"),
    ("I", "", "SELECT nextval('cyd_a')"),
    ("I", "", "SELECT nextval('cyd_a')"),
    ("ok", "", "CREATE SEQUENCE cyd_b INCREMENT -2 MINVALUE 0 MAXVALUE 5 CYCLE"),
    ("I", "rowsort", "SELECT nextval('cyd_b') FROM range(5)"),
])

corpus("sequence_no_cycle_exhaustion", "Non-CYCLE sequences error past the bound (reference sequence_overflow.test)")([
    ("ok", "", "CREATE SEQUENCE ex_a START 2 MAXVALUE 3"),
    ("I", "", "SELECT nextval('ex_a')"),
    ("I", "", "SELECT nextval('ex_a')"),
    ("error", "", "SELECT nextval('ex_a')"),
    # the error is sticky: still exhausted on the next call
    ("error", "", "SELECT nextval('ex_a')"),
    ("ok", "", "CREATE SEQUENCE ex_b INCREMENT -5 MINVALUE -4 MAXVALUE 4 NO CYCLE"),
    ("I", "", "SELECT nextval('ex_b')"),
    ("I", "", "SELECT nextval('ex_b')"),
    ("error", "", "SELECT nextval('ex_b')"),
    # a multi-row claim that would cross the bound errors whole
    ("ok", "", "CREATE SEQUENCE ex_c MAXVALUE 2"),
    ("error", "", "SELECT nextval('ex_c') FROM range(5)"),
])

corpus("sequence_overflow", "I64-edge bounds: a value whose successor overflows int64 is never handed out (reference sequence_overflow.test)")([
    ("ok", "", "CREATE SEQUENCE ov_a START 9223372036854775806"),
    ("I", "", "SELECT nextval('ov_a')"),
    ("error", "", "SELECT nextval('ov_a')"),
    ("error", "", "SELECT nextval('ov_a')"),
    ("ok", "", "CREATE SEQUENCE ov_b INCREMENT -1 MINVALUE -9223372036854775807"),
    ("I", "", "SELECT nextval('ov_b')"),
    ("I", "", "SELECT nextval('ov_b')"),
    ("ok", "", "CREATE SEQUENCE ov_c START 9223372036854775800 INCREMENT 7"),
    ("I", "", "SELECT nextval('ov_c')"),
    ("error", "", "SELECT nextval('ov_c')"),
])

corpus("sequence_create_errors", "Invalid CREATE SEQUENCE parameters (reference test_sequence.test error grid)")([
    ("error", "", "CREATE SEQUENCE ce_a INCREMENT 0"),
    ("error", "", "CREATE SEQUENCE ce_b MINVALUE 5 MAXVALUE 5"),
    ("error", "", "CREATE SEQUENCE ce_c MINVALUE 9 MAXVALUE 2"),
    ("error", "", "CREATE SEQUENCE ce_d START 0 MINVALUE 1 MAXVALUE 10"),
    ("error", "", "CREATE SEQUENCE ce_e START 11 MINVALUE 1 MAXVALUE 10"),
    ("ok", "", "CREATE SEQUENCE ce_dup"),
    ("error", "", "CREATE SEQUENCE ce_dup"),
    ("ok", "", "CREATE OR REPLACE SEQUENCE ce_dup START 9"),
    ("I", "", "SELECT nextval('ce_dup')"),
    ("error", "", "SELECT nextval('ce_missing')"),
])

corpus("sequence_currval", "currval session semantics (reference test_sequence.test)")([
    ("ok", "", "CREATE SEQUENCE cv_a"),
    ("error", "", "SELECT currval('cv_a')"),
    ("I", "", "SELECT nextval('cv_a')"),
    ("I", "", "SELECT currval('cv_a')"),
    # currval is stable: repeated reads do not advance the sequence
    ("I", "", "SELECT currval('cv_a')"),
    ("I", "", "SELECT nextval('cv_a')"),
    ("I", "", "SELECT currval('cv_a')"),
    ("II", "", "SELECT currval('cv_a'), currval('cv_a')"),
])

corpus("sequence_drop", "DROP SEQUENCE lifecycle (reference test_sequence.test)")([
    ("ok", "", "CREATE SEQUENCE dr_a START 30"),
    ("I", "", "SELECT nextval('dr_a')"),
    ("ok", "", "DROP SEQUENCE dr_a"),
    ("error", "", "SELECT nextval('dr_a')"),
    ("error", "", "DROP SEQUENCE dr_a"),
    ("ok", "", "DROP SEQUENCE IF EXISTS dr_a"),
    ("ok", "", "DROP SEQUENCE IF EXISTS dr_never_existed"),
    # recreate after drop restarts from START
    ("ok", "", "CREATE SEQUENCE dr_a START 30"),
    ("I", "", "SELECT nextval('dr_a')"),
])

corpus("sequence_multirow", "Distributed nextval over relations — set/aggregate determinism (reference test_sequence.test nextval-over-table forms)")([
    ("ok", "", "CREATE SEQUENCE mr_a"),
    ("I", "rowsort", "SELECT nextval('mr_a') FROM range(6)"),
    ("ok", "", "CREATE SEQUENCE mr_b START 10 INCREMENT 10"),
    ("III", "", "SELECT count(*) AS n, min(v) AS lo, max(v) AS hi FROM (SELECT nextval('mr_b') AS v FROM region) t"),
    ("I", "", "SELECT sum(v) FROM (SELECT nextval('mr_b') AS v FROM region) t"),
    ("ok", "", "CREATE SEQUENCE mr_c"),
    # one value per nation row: the claimed range is exactly 1..25
    ("II", "", "SELECT count(*) AS n, sum(v) AS total FROM (SELECT nextval('mr_c') AS v FROM nation) t"),
    ("I", "", "SELECT count(DISTINCT v) FROM (SELECT nextval('mr_c') AS v FROM customer) t"),
])

corpus("sequence_interleaved", "Interleaved multi-sequence allocation stays independent (reference test_sequence.test)")([
    ("ok", "", "CREATE SEQUENCE il_x START 1"),
    ("ok", "", "CREATE SEQUENCE il_y START 100 INCREMENT -1 MINVALUE 1 MAXVALUE 100"),
    ("I", "", "SELECT nextval('il_x')"),
    ("I", "", "SELECT nextval('il_y')"),
    ("I", "", "SELECT nextval('il_x')"),
    ("I", "", "SELECT nextval('il_y')"),
    ("II", "", "SELECT currval('il_x'), currval('il_y')"),
    ("I", "", "SELECT nextval('il_x') + nextval('il_y')"),
])


corpus("sequence_catalog_readback", "duckdb_sequences() catalog readback (reference src/function/table/system/duckdb_sequences.cpp)")([
    ("ok", "", "CREATE SEQUENCE cat_a START 5 INCREMENT 3 MAXVALUE 100"),
    ("ok", "", "CREATE SEQUENCE cat_b INCREMENT -2 MINVALUE -50 MAXVALUE 10 CYCLE"),
    ("ok", "", "CREATE SEQUENCE cat_fresh START 42"),
    ("I", "rowsort", "SELECT nextval('cat_a') FROM range(4)"),
    ("I", "", "SELECT nextval('cat_b')"),
    ("TIIIITI", "", "SELECT sequence_name, start_value, min_value, max_value, increment_by, cycle, last_value FROM duckdb_sequences() WHERE sequence_name LIKE 'cat!_%' ESCAPE '!' ORDER BY sequence_name"),
    ("I", "", "SELECT count(*) FROM duckdb_sequences() WHERE sequence_name LIKE 'cat!_%' ESCAPE '!' AND last_value IS NULL"),
    ("ok", "", "DROP SEQUENCE cat_fresh"),
    ("I", "", "SELECT count(*) FROM duckdb_sequences() WHERE sequence_name LIKE 'cat!_%' ESCAPE '!'"),
    # allocation moves last_value, catalog reflects the head
    ("I", "", "SELECT nextval('cat_a')"),
    ("I", "", "SELECT last_value FROM duckdb_sequences() WHERE sequence_name = 'cat_a'"),
])


def _describe_specs(table: str) -> list[tuple[str, str, str]]:
    return [("TTTTTT", "", f"DESCRIBE {table}")]


for _t in TABLES:
    corpus(
        f"describe_{_t}",
        f"DESCRIBE {_t}: six-column shape with DuckDB-named types "
        "(reference test/sql/show_select/)",
    )(_describe_specs(_t))

corpus("describe_select_types", "DESCRIBE SELECT — expression result types agree across engines (reference test/sql/show_select/describe_qualified_columns.test)")([
    ("TTTTTT", "", "DESCRIBE SELECT 1 AS a"),
    ("TTTTTT", "", "DESCRIBE SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, TRUE AS c"),
    ("TTTTTT", "", "DESCRIBE SELECT DATE '1995-01-01' AS d"),
    ("TTTTTT", "", "DESCRIBE SELECT 1.5 AS a"),
    ("TTTTTT", "", "DESCRIBE SELECT r_regionkey + 1 AS k, upper(r_name) AS n FROM region"),
    ("TTTTTT", "", "DESCRIBE SELECT count(*) AS n, avg(c_acctbal) AS avg_bal FROM customer"),
    ("TTTTTT", "", "DESCRIBE SELECT sum(l_extendedprice) AS s FROM lineitem"),
    ("TTTTTT", "", "DESCRIBE SELECT o_orderdate AS ts FROM orders"),
])

corpus("describe_select_casts", "DESCRIBE SELECT over casts (reference show_select + cast grids)")([
    ("TTTTTT", "", "DESCRIBE SELECT CAST('1' AS SMALLINT) AS a, CAST(2 AS TINYINT) AS b"),
    ("TTTTTT", "", "DESCRIBE SELECT CAST(3 AS DOUBLE) AS a, CAST(4 AS FLOAT) AS b"),
    ("TTTTTT", "", "DESCRIBE SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS p FROM orders"),
    ("TTTTTT", "", "DESCRIBE SELECT CAST(NULL AS STRING) AS s"),
    ("TTTTTT", "", "DESCRIBE SELECT CAST('2020-01-01 00:00:00' AS TIMESTAMP) AS t"),
])

# Index-DDL family (reference test/sql/index/ + src/function/table/
# system/duckdb_indexes.cpp).  The dispatcher routes CREATE TABLE AS to a
# file-local temp view (DuckDB: a real table), CREATE [UNIQUE] INDEX to
# Engine.create_index (the bucketed ART analog, incl. the creation-time
# UNIQUE validation), DROP INDEX to the engine catalog, and
# duckdb_indexes() to the introspect readback.  Table/index names are
# per-file-prefixed: the generator's DuckDB connection is shared across
# corpora.  NOT covered on purpose: INSERT-time unique enforcement (the
# engine's CREATE INDEX is a snapshot layout over immutable views —
# divergence exclusion, see versioned-store constraints for the durable
# path).

corpus("index_catalog_readback", "duckdb_indexes() catalog readback (reference duckdb_indexes.cpp; test/sql/index/)")([
    ("ok", "", "CREATE TABLE ixa_t AS SELECT r_regionkey AS a, r_name AS b FROM region"),
    ("ok", "", "CREATE TABLE ixa_u AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation"),
    ("ok", "", "CREATE INDEX ixa_plain ON ixa_t(a)"),
    ("ok", "", "CREATE INDEX ixa_comp ON ixa_u(r, k)"),
    ("ok", "", "CREATE UNIQUE INDEX ixa_uq ON ixa_u(k)"),
    ("TTTTTT", "", "SELECT schema_name, index_name, table_name, is_unique, is_primary, sql FROM duckdb_indexes() WHERE index_name LIKE 'ixa!_%' ESCAPE '!' ORDER BY index_name"),
    ("I", "", "SELECT count(*) FROM duckdb_indexes() WHERE index_name LIKE 'ixa!_%' ESCAPE '!' AND is_unique"),
    # the indexed table still answers queries (Spark: through the
    # rebound bucketed copy)
    ("IT", "", "SELECT a, b FROM ixa_t WHERE a = 2"),
    ("I", "", "SELECT count(*) FROM ixa_u WHERE r = 0"),
])

corpus("index_create_errors", "Invalid index DDL (reference test/sql/index error grids)")([
    ("ok", "", "CREATE TABLE ixb_t AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation"),
    ("ok", "", "CREATE INDEX ixb_i ON ixb_t(k)"),
    # duplicate index name
    ("error", "", "CREATE INDEX ixb_i ON ixb_t(r)"),
    # missing table / missing column
    ("error", "", "CREATE INDEX ixb_j ON ixb_nosuch(k)"),
    ("error", "", "CREATE INDEX ixb_k ON ixb_t(nosuch)"),
    # UNIQUE over duplicated keys refuses creation
    ("error", "", "CREATE UNIQUE INDEX ixb_uq ON ixb_t(r)"),
    # duplicate table name without OR REPLACE
    ("error", "", "CREATE TABLE ixb_t AS SELECT 1 AS z"),
    ("error", "", "DROP INDEX ixb_nosuch"),
    ("ok", "", "DROP INDEX IF EXISTS ixb_nosuch"),
    ("I", "", "SELECT count(*) FROM duckdb_indexes() WHERE index_name LIKE 'ixb!_%' ESCAPE '!'"),
])

corpus("index_lifecycle", "CREATE / DROP INDEX lifecycle and OR REPLACE TABLE dependents (reference test/sql/index; CREATE OR REPLACE drops dependent indexes — probed)")([
    ("ok", "", "CREATE TABLE ixc_t AS SELECT s_suppkey AS k, s_nationkey AS n FROM supplier"),
    ("ok", "", "CREATE UNIQUE INDEX ixc_i ON ixc_t(k)"),
    ("I", "", "SELECT count(*) FROM duckdb_indexes() WHERE index_name LIKE 'ixc!_%' ESCAPE '!'"),
    ("ok", "", "DROP INDEX ixc_i"),
    ("I", "", "SELECT count(*) FROM duckdb_indexes() WHERE index_name LIKE 'ixc!_%' ESCAPE '!'"),
    # the name is reusable after DROP
    ("ok", "", "CREATE INDEX ixc_i ON ixc_t(n)"),
    ("TTTTTT", "", "SELECT schema_name, index_name, table_name, is_unique, is_primary, sql FROM duckdb_indexes() WHERE index_name LIKE 'ixc!_%' ESCAPE '!' ORDER BY index_name"),
    # CREATE OR REPLACE TABLE silently drops dependent indexes
    ("ok", "", "CREATE OR REPLACE TABLE ixc_t AS SELECT 1 AS z"),
    ("I", "", "SELECT count(*) FROM duckdb_indexes() WHERE index_name LIKE 'ixc!_%' ESCAPE '!'"),
    ("I", "", "SELECT z FROM ixc_t"),
])


corpus("qualify_filters", "QUALIFY window-filter clause (reference test/sql/qualify; Spark side rides dialect.rewrite_qualify)")([
    # select-alias predicate
    ("III", "rowsort", "SELECT n_regionkey, n_nationkey, CAST(rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS INT) AS rnk FROM nation QUALIFY rnk <= 2"),
    # inline window in the predicate, no alias
    ("II", "rowsort", "SELECT n_regionkey, n_nationkey FROM nation QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC) = 1"),
    # WHERE ahead, ORDER BY/LIMIT tail behind
    ("II", "", "SELECT o_custkey, o_orderkey FROM orders WHERE o_orderkey % 10 = 0 QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1 ORDER BY o_custkey, o_orderkey LIMIT 20"),
    # GROUP BY + HAVING ahead (windows over the aggregated rows)
    ("II", "", "SELECT n_regionkey, CAST(count(*) AS INT) AS n FROM nation GROUP BY n_regionkey HAVING count(*) > 0 QUALIFY rank() OVER (ORDER BY n DESC, n_regionkey) = 1"),
    # compound predicate mixing a window and a plain column condition
    ("II", "rowsort", "SELECT n_nationkey, n_regionkey FROM nation QUALIFY row_number() OVER (ORDER BY n_nationkey) <= 7 AND n_regionkey <> 2"),
    # the keyword inside a string literal is data
    ("T", "", "SELECT 'QUALIFY stays text' AS s FROM region LIMIT 1"),
    # DISTINCT de-duplicates AFTER the QUALIFY filter (DuckDB clause
    # order WINDOW -> QUALIFY -> DISTINCT): the window sees all 25
    # pre-distinct rows, so count(*)=5 per region and 5 rows survive;
    # dedup-before-filter would see count(*)=1 and return nothing
    ("I", "rowsort", "SELECT DISTINCT CAST(n_regionkey AS INT) AS r FROM nation QUALIFY count(*) OVER (PARTITION BY n_regionkey) = 5"),
    ("I", "rowsort", "SELECT DISTINCT CAST(n_regionkey AS INT) AS r FROM nation QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) <= 2"),
    # alias-shaped text inside a string literal must not be substituted
    ("TI", "", "SELECT n_name, CAST(row_number() OVER (ORDER BY n_name) AS INT) AS rn FROM nation QUALIFY rn <= 3 AND n_name NOT LIKE '%rn%'"),
    # source-column precedence: a select alias that shadows a source
    # column loses — QUALIFY a binds to qd_t.a, not to the alias of b
    ("ok", "", "CREATE TABLE qd_t AS SELECT n_nationkey AS a, n_regionkey AS b FROM nation"),
    ("III", "rowsort", "SELECT CAST(b AS INT) AS a, CAST(a AS INT) AS b, CAST(row_number() OVER (ORDER BY a, b) AS INT) AS rn FROM qd_t QUALIFY a = 0 AND rn <= 99"),
    # ... including columns of the SECOND table in a comma-separated
    # FROM list (probed: DuckDB binds QUALIFY c to t2.c, not alias c)
    ("ok", "", "CREATE TABLE qf_t1 AS SELECT n_nationkey AS a FROM nation WHERE n_nationkey < 5"),
    ("ok", "", "CREATE TABLE qf_t2 AS SELECT n_regionkey AS c FROM nation WHERE n_nationkey < 3"),
    ("III", "rowsort", "SELECT CAST(a AS INT) AS c, CAST(qf_t2.c AS INT) AS c2, CAST(row_number() OVER (ORDER BY a, qf_t2.c) AS INT) AS rn FROM qf_t1, qf_t2 QUALIFY c = 1 AND rn >= 1"),
])

corpus("qualify_errors", "QUALIFY binder error grid (reference test/sql/qualify error cases; both engines must refuse the same shapes)")([
    ("ok", "", "CREATE TABLE qe_t AS SELECT n_nationkey AS a, n_regionkey AS b FROM nation"),
    # no window function anywhere -> binder error on both engines
    ("error", "", "SELECT a FROM qe_t QUALIFY a > 5"),
    ("error", "", "SELECT a, b FROM qe_t QUALIFY a + b"),
    # missing column in the predicate
    ("error", "", "SELECT a FROM qe_t QUALIFY row_number() OVER (ORDER BY nosuch) <= 2"),
    # the happy path still works after the errors
    ("I", "rowsort", "SELECT a FROM qe_t QUALIFY row_number() OVER (PARTITION BY b ORDER BY a) = 1"),
])

corpus("star_exclude_replace", "SELECT * EXCLUDE / REPLACE star modifiers (reference test/sql/parser/test_exclude.test, test_replace.test; Spark rides dialect.rewrite_star_modifiers — replaced columns move to the projection end, so specs project explicitly)")([
    ("IT", "rowsort", "SELECT n_nationkey, n_name FROM (SELECT * EXCLUDE (n_regionkey) FROM nation) WHERE n_nationkey < 5"),
    ("II", "rowsort", "SELECT n_nationkey, n_regionkey FROM (SELECT * EXCLUDE n_name FROM nation) WHERE n_regionkey = 2"),
    ("II", "rowsort", "SELECT n_nationkey, n_regionkey FROM (SELECT * REPLACE (CAST(n_regionkey * 10 AS INT) AS n_regionkey) FROM nation) WHERE n_nationkey < 5"),
    ("IT", "rowsort", "SELECT n_nationkey, n_name FROM (SELECT * EXCLUDE (n_regionkey) REPLACE (upper(n_name) AS n_name) FROM nation) WHERE n_nationkey < 5"),
    # star modifiers compose with QUALIFY through the same dispatcher
    ("II", "rowsort", "SELECT * EXCLUDE (n_name) FROM nation QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1"),
    # multiplication stars and count(*) are untouched
    ("I", "", "SELECT CAST(count(*) AS INT) FROM region"),
    ("I", "rowsort", "SELECT CAST(n_nationkey * n_regionkey AS INT) FROM nation WHERE n_nationkey < 4"),
    # multiplication by a column literally NAMED exclude/replace is a
    # binary op in both engines, never a star modifier
    ("ok", "", "CREATE TABLE st_t AS SELECT n_nationkey AS a, n_regionkey AS exclude, n_regionkey + 1 AS replace FROM nation"),
    ("I", "rowsort", "SELECT CAST(a * exclude AS INT) AS m FROM st_t WHERE a < 3"),
    ("I", "rowsort", "SELECT CAST(a * replace AS INT) AS m FROM st_t WHERE a < 3"),
])


corpus("index_unique_append", "UNIQUE index enforcement on INSERT (reference test/sql/index unique-violation grids; the Spark side validates appends against registered ART-analog indexes)")([
    ("ok", "", "CREATE TABLE ixu_t AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation"),
    ("ok", "", "CREATE UNIQUE INDEX ixu_i ON ixu_t(k)"),
    # fresh keys append fine
    ("ok", "", "INSERT INTO ixu_t VALUES (100, 0), (101, 1)"),
    ("I", "", "SELECT count(*) FROM ixu_t"),
    # duplicate key refused (value already present)
    ("error", "", "INSERT INTO ixu_t VALUES (100, 2)"),
    # duplicate inside the inserted batch itself refused
    ("error", "", "INSERT INTO ixu_t VALUES (200, 0), (200, 1)"),
    # self-insert duplicates every key -> refused
    ("error", "", "INSERT INTO ixu_t SELECT * FROM ixu_t"),
    # failed inserts must not have appended anything
    ("I", "", "SELECT count(*) FROM ixu_t"),
    ("I", "", "SELECT CAST(SUM(k) AS BIGINT) FROM ixu_t"),
    # non-unique column stays appendable after DROP of the unique index
    ("ok", "", "DROP INDEX ixu_i"),
    ("ok", "", "INSERT INTO ixu_t VALUES (100, 3)"),
    ("I", "", "SELECT count(*) FROM ixu_t WHERE k = 100"),
    # INSERT into a missing table errors on both engines
    ("error", "", "INSERT INTO ixu_nosuch VALUES (1)"),
    # NULL keys compare unequal: a UNIQUE index admits any number of
    # NULL-key rows (probed on DuckDB's ART)
    ("ok", "", "CREATE TABLE ixu_n AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation WHERE n_nationkey < 3"),
    ("ok", "", "CREATE UNIQUE INDEX ixu_ni ON ixu_n(k)"),
    ("ok", "", "INSERT INTO ixu_n VALUES (NULL, 0), (NULL, 1)"),
    ("I", "", "SELECT count(*) FROM ixu_n WHERE k IS NULL"),
    ("error", "", "INSERT INTO ixu_n VALUES (1, 9)"),
])

corpus("pragma_table_info_readback", "pragma_table_info() readback (reference keeps SQLite's cid/name/type/notnull/dflt_value/pk shape; Spark side: introspect.pragma_table_info over the context's CTAS views)")([
    ("ok", "", "CREATE TABLE pti_s AS SELECT n_nationkey AS k, n_name AS nm, CAST(n_regionkey AS INT) AS r FROM nation"),
    # the notnull column is a reserved word in DuckDB and a double-quoted
    # string literal in Spark, so the shared text projects around it; its
    # values are oracle-paired via the introspect_table_info registry query
    ("ITTT", "", "SELECT cid, name, type, pk FROM pragma_table_info('pti_s') ORDER BY cid"),
    ("I", "", "SELECT count(*) FROM pragma_table_info('pti_s') WHERE dflt_value IS NULL"),
    # two different tables in ONE query resolve independently
    ("ok", "", "CREATE TABLE pti_u AS SELECT n_name AS nm FROM nation"),
    ("II", "", "SELECT (SELECT count(*) FROM pragma_table_info('pti_s')) AS a, (SELECT count(*) FROM pragma_table_info('pti_u')) AS b"),
    ("error", "", "SELECT * FROM pragma_table_info('pti_nosuch')"),
])

corpus("settings_set_readback", "SET/RESET/PRAGMA settings + current_setting()/duckdb_settings() readback (reference src/main/settings, test/sql/settings; Spark side rides the Engine settings store)")([
    ("ok", "", "SET threads=7"),
    ("I", "", "SELECT CAST(current_setting('threads') AS INT) AS t"),
    ("ok", "", "SET threads TO 5"),
    ("I", "", "SELECT CAST(current_setting('threads') AS INT) AS t"),
    ("ok", "", "PRAGMA threads=9"),
    ("I", "", "SELECT CAST(current_setting('threads') AS INT) AS t"),
    # memory values render with DuckDB's binary-unit formatter
    ("ok", "", "SET memory_limit='2GB'"),
    ("T", "", "SELECT current_setting('memory_limit') AS v"),
    ("ok", "", "SET max_memory='1GiB'"),  # catalog alias of memory_limit
    ("T", "", "SELECT current_setting('memory_limit') AS v"),
    ("ok", "", "SET TimeZone='America/New_York'"),
    ("T", "", "SELECT current_setting('TimeZone') AS v"),
    ("ok", "", "SET default_collation='nocase'"),
    ("T", "", "SELECT current_setting('default_collation') AS v"),
    ("ok", "", "SET enable_progress_bar=true"),
    ("T", "", "SELECT CAST(current_setting('enable_progress_bar') AS STRING) AS v"),
    ("TTT", "rowsort", "SELECT name, value, input_type FROM duckdb_settings() WHERE name IN ('memory_limit', 'TimeZone', 'default_collation', 'enable_progress_bar')"),
    # error grid: both engines refuse the same shapes
    ("error", "", "SET nosuch_setting=1"),
    ("error", "", "RESET nosuch_setting"),
    ("error", "", "SET memory_limit='12elephants'"),
    ("error", "", "SET threads=0"),
    ("error", "", "SELECT current_setting('nosuch_setting')"),
    # RESET: value-check only the machine-independent defaults
    # (threads/memory_limit/TimeZone reset to box-shaped values)
    ("ok", "", "RESET enable_progress_bar"),
    ("T", "", "SELECT CAST(current_setting('enable_progress_bar') AS STRING) AS v"),
    ("ok", "", "RESET default_collation"),
    ("T", "", "SELECT current_setting('default_collation') AS v"),
    ("ok", "", "RESET threads"),
    ("ok", "", "RESET memory_limit"),
    ("ok", "", "RESET TimeZone"),
    # scope grammar (probed): SESSION-qualified SET/RESET of a
    # GLOBAL-scope setting refuses; LOCAL-scope settings accept it
    ("error", "", "SET SESSION threads=5"),
    ("error", "", "RESET SESSION threads"),
    ("ok", "", "SET SESSION enable_progress_bar=true"),
    ("ok", "", "RESET SESSION enable_progress_bar"),
    ("ok", "", "RESET GLOBAL threads"),
    # the table-function name as DATA is never rewritten
    ("T", "", "SELECT 'duckdb_settings()' AS s FROM region LIMIT 1"),
])


corpus("transactions_basic", "BEGIN/COMMIT/ROLLBACK/ABORT statement semantics (reference src/transaction/transaction_context.cpp, test/sql/transactions/; Spark side: Engine/EngineSqlContext staged snapshots — error shapes and abort behavior probed on DuckDB 1.0)")([
    ("ok", "", "CREATE TABLE txb_t AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation"),
    ("I", "", "SELECT count(*) FROM txb_t"),
    # error grid: no transaction active
    ("error", "", "COMMIT"),
    ("error", "", "ROLLBACK"),
    ("error", "", "ABORT"),
    # nested BEGIN errors AND aborts the open transaction (probed)
    ("ok", "", "BEGIN"),
    ("error", "", "BEGIN"),
    ("error", "", "SELECT count(*) FROM txb_t"),
    ("ok", "", "ROLLBACK"),
    ("ok", "", "BEGIN"),
    ("ok", "", "INSERT INTO txb_t VALUES (100, 0), (101, 1)"),
    ("ok", "", "DELETE FROM txb_t WHERE k % 5 = 0"),
    ("ok", "", "UPDATE txb_t SET r = r + 100 WHERE k = 101"),
    # read-your-own-writes inside the transaction
    ("I", "", "SELECT count(*) FROM txb_t"),
    ("I", "", "SELECT CAST(sum(r) AS BIGINT) FROM txb_t WHERE k >= 100"),
    ("ok", "", "ROLLBACK"),
    # every staged statement is discarded
    ("I", "", "SELECT count(*) FROM txb_t"),
    ("I", "", "SELECT count(*) FROM txb_t WHERE k >= 100"),
    # commit path: the net effect of all statements publishes at once
    ("ok", "", "START TRANSACTION"),
    ("ok", "", "INSERT INTO txb_t VALUES (200, 7)"),
    ("ok", "", "UPDATE txb_t SET r = 99 WHERE k = 3"),
    ("ok", "", "COMMIT"),
    ("I", "", "SELECT count(*) FROM txb_t"),
    ("I", "", "SELECT r FROM txb_t WHERE k = 3"),
    # catalog DDL is transactional: a rolled-back CTAS vanishes (probed)
    ("ok", "", "BEGIN"),
    ("ok", "", "CREATE TABLE txb_u AS SELECT 42 AS z"),
    ("I", "", "SELECT z FROM txb_u"),
    ("ok", "", "ROLLBACK"),
    ("error", "", "SELECT z FROM txb_u"),
    # a constraint violation ABORTS the transaction: later statements
    # refuse, COMMIT silently rolls back (probed)
    ("ok", "", "CREATE TABLE txb_v AS SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5"),
    ("ok", "", "CREATE UNIQUE INDEX txb_vi ON txb_v(k)"),
    ("ok", "", "BEGIN"),
    ("ok", "", "INSERT INTO txb_v VALUES (50)"),
    ("error", "", "INSERT INTO txb_v VALUES (2)"),
    ("error", "", "SELECT count(*) FROM txb_v"),
    ("error", "", "INSERT INTO txb_v VALUES (60)"),
    ("ok", "", "COMMIT"),
    ("I", "", "SELECT count(*) FROM txb_v"),
    # the connection is usable again after the aborted transaction
    ("ok", "", "BEGIN"),
    ("ok", "", "INSERT INTO txb_v VALUES (70)"),
    ("ok", "", "COMMIT"),
    ("I", "", "SELECT count(*) FROM txb_v"),
    # binder-stage errors do NOT abort (probed: bad column then a
    # working query in the same transaction)
    ("ok", "", "BEGIN"),
    ("error", "", "SELECT nosuch_col FROM txb_t"),
    ("I", "", "SELECT count(*) FROM txb_t"),
    ("ok", "", "ROLLBACK"),
    # INSERT with an explicit column list: unlisted columns take NULL
    ("ok", "", "INSERT INTO txb_t (k) VALUES (900)"),
    ("I", "", "SELECT count(*) FROM txb_t WHERE k = 900 AND r IS NULL"),
    # a rolled-back CREATE VIEW vanishes (catalog DDL is transactional)
    ("ok", "", "BEGIN"),
    ("ok", "", "CREATE VIEW txb_vw AS SELECT k FROM txb_t WHERE (k > 5)"),
    ("I", "", "SELECT count(*) FROM duckdb_views() WHERE view_name = 'txb_vw'"),
    ("ok", "", "ROLLBACK"),
    ("I", "", "SELECT count(*) FROM duckdb_views() WHERE view_name = 'txb_vw'"),
    ("error", "", "SELECT count(*) FROM txb_vw"),
])


corpus("prepared_statements", "PREPARE/EXECUTE/DEALLOCATE grammar (reference src/main/prepared_statement.cpp, test/sql/prepared/; Spark side: prepared.py binding arguments as literal Columns through parameterized SQL — arity/unknown-name/parser error shapes probed on DuckDB 1.0)")([
    # numbered parameters, reuse of $1 in two expressions
    ("ok", "", "PREPARE psq_a AS SELECT $1 + $2 AS s, $1 * 2 AS d"),
    ("II", "", "EXECUTE psq_a(3, 4)"),
    ("error", "", "EXECUTE psq_a(3)"),
    ("error", "", "EXECUTE psq_a(1, 2, 3)"),
    ("error", "", "EXECUTE psq_a()"),
    # re-PREPARE silently replaces
    ("ok", "", "PREPARE psq_a AS SELECT $1 * 10 AS s"),
    ("I", "", "EXECUTE psq_a(5)"),
    # auto-numbered ? markers
    ("ok", "", "PREPARE psq_q AS SELECT ? + ? AS s"),
    ("I", "", "EXECUTE psq_q(1, 2)"),
    ("error", "", "EXECUTE psq_q(1)"),
    # named parameters: any order, := form, positional args refuse
    ("ok", "", "PREPARE psq_n AS SELECT $a * $b AS p"),
    ("I", "", "EXECUTE psq_n(a := 6, b := 7)"),
    ("I", "", "EXECUTE psq_n(b := 7, a := 6)"),
    ("error", "", "EXECUTE psq_n(6, 7)"),
    ("error", "", "EXECUTE psq_n(a := 6)"),
    # table-referencing prepared statement over the fixture views
    ("ok", "", "PREPARE psq_t AS SELECT count(*) AS c FROM orders WHERE o_orderkey % 10 < $1"),
    ("I", "", "EXECUTE psq_t(3)"),
    ("I", "", "EXECUTE psq_t(0)"),
    ("error", "", "EXECUTE psq_t"),
    # constant-expression arguments evaluate (probed)
    ("ok", "", "PREPARE psq_s AS SELECT upper($1) AS u, length($1) AS l"),
    ("TI", "", "EXECUTE psq_s('abc')"),
    ("TI", "", "EXECUTE psq_s('x' || 'y')"),
    ("TI", "", "EXECUTE psq_s(upper('ab'))"),
    # a marker inside a string literal is DATA, never a parameter
    ("ok", "", "PREPARE psq_lit AS SELECT '$1' AS t, $1 AS v"),
    ("TI", "", "EXECUTE psq_lit(9)"),
    # unknown-name / lifecycle grid
    ("error", "", "EXECUTE nosuch_ps(1)"),
    ("ok", "", "DEALLOCATE psq_a"),
    ("error", "", "EXECUTE psq_a(5)"),
    ("ok", "", "DEALLOCATE psq_a"),
    ("ok", "", "DEALLOCATE PREPARE psq_q"),
    ("error", "", "EXECUTE psq_q(1, 2)"),
    # catalog errors surface at PREPARE time (probed)
    ("error", "", "PREPARE psq_bad AS SELECT count(*) AS c FROM nosuch_table WHERE x = $1"),
    # a zero-parameter prepared statement executes bare
    ("ok", "", "PREPARE psq_z AS SELECT 41 + 1 AS z"),
    ("I", "", "EXECUTE psq_z"),
    ("error", "", "EXECUTE psq_z(5)"),
    # a marker in a COMMENT is not a parameter (span-aware counting)
    ("ok", "", "PREPARE psq_cm AS SELECT $1 + 1 AS a -- not $2 here"),
    ("I", "", "EXECUTE psq_cm(41)"),
    # excess NAMED arguments refuse with their names
    ("ok", "", "PREPARE psq_n2 AS SELECT $a * 2 AS p"),
    ("error", "", "EXECUTE psq_n2(a := 1, zz := 3)"),
    # mixing positional and named arguments refuses
    ("ok", "", "PREPARE psq_m AS SELECT $1 + $2 AS s"),
    ("error", "", "EXECUTE psq_m(1, x := 2)"),
    # a failed re-PREPARE keeps the old statement usable (probed)
    ("ok", "", "PREPARE psq_keep AS SELECT 7 AS k"),
    ("error", "", "PREPARE psq_keep AS SELECT z FROM nosuch_table_kp WHERE z = $1"),
    ("I", "", "EXECUTE psq_keep"),
])


corpus("catalog_readback", "Catalog table functions — duckdb_keywords/types/schemas/functions/views + CREATE/DROP VIEW/SCHEMA lifecycle (reference src/function/table/system/*.cpp, test/sql/pg_catalog/; Spark side: introspect.py catalog readbacks through the Engine facade)")([
    # keywords: full table, pinned classes, category histogram
    ("I", "", "SELECT count(*) FROM duckdb_keywords()"),
    ("TT", "", "SELECT keyword_name, keyword_category FROM duckdb_keywords() WHERE keyword_name IN ('select', 'abort', 'between', 'int') ORDER BY keyword_name"),
    ("TI", "rowsort", "SELECT keyword_category, count(*) FROM duckdb_keywords() GROUP BY keyword_category"),
    # types: shared deterministic columns (DISTINCT folds DuckDB's
    # per-database copies)
    ("TT", "", "SELECT DISTINCT type_name, logical_type FROM duckdb_types() WHERE type_name IN ('bigint', 'varchar', 'blob', 'timestamp') ORDER BY type_name"),
    ("TTT", "", "SELECT DISTINCT type_name, logical_type, type_category FROM duckdb_types() WHERE type_category = 'NUMERIC' AND type_name IN ('bigint', 'double', 'decimal', 'hugeint') ORDER BY type_name"),
    # schemas: fresh-connection layout listed BEFORE creating any
    ("TTT", "", "SELECT database_name, schema_name, internal FROM duckdb_schemas() WHERE schema_name NOT LIKE 'cgs%' ORDER BY database_name, schema_name"),
    ("ok", "", "CREATE SCHEMA cgs_one"),
    ("error", "", "CREATE SCHEMA cgs_one"),
    ("ok", "", "CREATE SCHEMA IF NOT EXISTS cgs_one"),
    ("TT", "", "SELECT schema_name, internal FROM duckdb_schemas() WHERE schema_name LIKE 'cgs%'"),
    ("ok", "", "DROP SCHEMA cgs_one"),
    ("I", "", "SELECT count(*) FROM duckdb_schemas() WHERE schema_name LIKE 'cgs%'"),
    ("error", "", "DROP SCHEMA cgs_one"),
    ("ok", "", "DROP SCHEMA IF EXISTS cgs_one"),
    # functions: name/type classification agrees, incl. dual-typed range
    ("TT", "", "SELECT DISTINCT function_name, function_type FROM duckdb_functions() WHERE function_name IN ('sum', 'upper', 'range', 'nullif', 'read_parquet') ORDER BY function_name, function_type"),
    # views: lifecycle + stored deparse + the view is queryable
    ("ok", "", "CREATE VIEW cgv_a AS SELECT r_regionkey, r_name FROM region WHERE (r_regionkey > 1)"),
    ("TT", "", "SELECT view_name, sql FROM duckdb_views() WHERE view_name LIKE 'cgv%' ORDER BY view_name"),
    ("I", "", "SELECT count(*) FROM cgv_a"),
    ("error", "", "CREATE VIEW cgv_a AS SELECT r_name FROM region"),
    ("ok", "", "CREATE OR REPLACE VIEW cgv_a AS SELECT upper(r_name) AS rn FROM region"),
    ("T", "", "SELECT sql FROM duckdb_views() WHERE view_name = 'cgv_a'"),
    ("ok", "", "DROP VIEW cgv_a"),
    ("error", "", "SELECT count(*) FROM cgv_a"),
    ("error", "", "DROP VIEW cgv_a"),
    ("ok", "", "DROP VIEW IF EXISTS cgv_a"),
    ("I", "", "SELECT count(*) FROM duckdb_views() WHERE view_name LIKE 'cgv%'"),
    # the table-function name as DATA is never rewritten
    ("T", "", "SELECT 'duckdb_keywords()' AS s FROM region LIMIT 1"),
])


corpus("insert_conflict", "INSERT OR REPLACE / OR IGNORE / ON CONFLICT DO NOTHING + TRUNCATE (reference physical_insert.cpp on-conflict path, test/sql/insert/; Spark side: staged merge/anti-join over the context's unique-indexed CTAS tables — no-unique-index error text probed)")([
    ("ok", "", "CREATE TABLE ic_t AS SELECT n_nationkey AS k, n_name AS v FROM nation WHERE n_nationkey < 5"),
    ("ok", "", "CREATE UNIQUE INDEX ic_i ON ic_t(k)"),
    # OR REPLACE: same-key rows replaced, fresh keys appended
    ("ok", "", "INSERT OR REPLACE INTO ic_t VALUES (2, 'TWO'), (9, 'NINE')"),
    ("I", "", "SELECT count(*) FROM ic_t"),
    ("T", "", "SELECT v FROM ic_t WHERE k = 2"),
    ("T", "", "SELECT v FROM ic_t WHERE k = 9"),
    # OR IGNORE: existing keys skipped, fresh keys appended
    ("ok", "", "INSERT OR IGNORE INTO ic_t VALUES (3, 'X'), (10, 'TEN')"),
    ("T", "", "SELECT v FROM ic_t WHERE k = 3"),
    ("I", "", "SELECT count(*) FROM ic_t WHERE k = 10"),
    # ON CONFLICT DO NOTHING is the same semantics (probed)
    ("ok", "", "INSERT INTO ic_t VALUES (3, 'Y') ON CONFLICT DO NOTHING"),
    ("T", "", "SELECT v FROM ic_t WHERE k = 3"),
    # no UNIQUE index -> both engines refuse with the same shape
    ("ok", "", "CREATE TABLE ic_u AS SELECT r_regionkey AS x FROM region"),
    ("error", "", "INSERT OR REPLACE INTO ic_u VALUES (1)"),
    ("error", "", "INSERT OR IGNORE INTO ic_u VALUES (1)"),
    # TRUNCATE empties, table stays usable
    ("ok", "", "TRUNCATE ic_t"),
    ("I", "", "SELECT count(*) FROM ic_t"),
    ("ok", "", "INSERT INTO ic_t VALUES (1, 'one')"),
    ("I", "", "SELECT count(*) FROM ic_t"),
    ("error", "", "TRUNCATE ic_nosuch"),
    # NOTE: OR REPLACE inside BEGIN..ROLLBACK is pinned by pytest only
    # (tests/test_transactions.py): DuckDB 1.0 hits an INTERNAL error
    # ('No rows in LocalTableStorage row group for scan') on
    # upsert-into-indexed-table inside an explicit transaction and
    # invalidates the database — a probed upstream bug, so the grid
    # cannot carry a dual-engine golden for it.
])


corpus("update_from_delete_using", "UPDATE ... FROM / DELETE ... USING join-DML forms (reference physical_update/physical_delete over a join plan, test/sql/update/, test/sql/delete/; Spark side: operators/mutations prefix-renamed source + anti-join / left-join-pick)")([
    ("ok", "", "CREATE TABLE jd_t AS SELECT n_nationkey AS k, n_regionkey AS r, n_name AS v FROM nation"),
    ("ok", "", "CREATE TABLE jd_s AS SELECT r_regionkey AS k, r_name AS w FROM region"),
    # join-delete with a source-side filter: only non-ASIA region keys go
    ("ok", "", "DELETE FROM jd_t USING jd_s WHERE jd_t.k = jd_s.k AND jd_s.w <> 'ASIA'"),
    ("I", "", "SELECT count(*) FROM jd_t"),
    ("I", "", "SELECT count(*) FROM jd_t WHERE k < 5"),
    # join-update: nations take their region's name (unique matches)
    ("ok", "", "UPDATE jd_t SET v = jd_s.w FROM jd_s WHERE jd_t.r = jd_s.k AND jd_s.k < 3"),
    ("TI", "rowsort", "SELECT v, CAST(count(*) AS BIGINT) FROM jd_t WHERE r < 3 GROUP BY v"),
    # aliased source + expression over source columns
    ("ok", "", "UPDATE jd_t SET v = lower(src.w) FROM jd_s AS src WHERE jd_t.k = src.k"),
    ("T", "", "SELECT v FROM jd_t WHERE k = 2"),
    ("error", "", "DELETE FROM jd_nosuch USING jd_s WHERE jd_nosuch.k = jd_s.k"),
    # join-DML participates in transactions
    ("ok", "", "BEGIN"),
    ("ok", "", "DELETE FROM jd_t USING jd_s WHERE jd_t.r = jd_s.k"),
    ("I", "", "SELECT count(*) FROM jd_t"),
    ("ok", "", "ROLLBACK"),
    ("I", "", "SELECT count(*) FROM jd_t"),
])

corpus("dialect_functions", "DuckDB function names Spark's registry lacks (reference src/function/scalar/, test/sql/function/; Spark side: dialect._rw_fn_aliases/_rw_fn_complex — name aliases, argument swaps, strftime/strptime format translation, boundary-count date_diff — every pair probed on both engines)")([
    ("T", "", "SELECT string_split('a.b.c', '.')[2]"),
    ("T", "", "SELECT string_split(r_name, ' ')[1] FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT string_split_regex('a1b22c', '[0-9]+')[2]"),
    ("I", "", "SELECT count(*) FROM region WHERE regexp_matches(r_name, 'A.')"),
    ("T", "", "SELECT CAST(list_contains([1, 2, 3], 2) AS STRING)"),
    ("I", "", "SELECT array_length([1, 2, 3])"),
    ("I", "", "SELECT array_length(string_split(r_name, 'I')) FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT list_sort([3, 1, 2])[1]"),
    ("I", "", "SELECT list_sort(list_distinct([1, 1, 2, 2]))[2]"),  # list_distinct ORDER is unspecified in DuckDB
    ("I", "", "SELECT list_append([1, 2], 9)[3]"),
    ("I", "", "SELECT list_prepend(9, [1, 2])[1]"),
    ("I", "", "SELECT count(*) FROM nation WHERE starts_with(n_name, 'NATION_1')"),
    ("I", "", "SELECT count(*) FROM nation WHERE ends_with(n_name, '0')"),
    ("R", "", "SELECT epoch(TIMESTAMP '1970-01-02 03:00:00')"),
    ("I", "", "SELECT epoch_ms(TIMESTAMP '1970-01-01 00:00:01')"),
    ("I", "", "SELECT list_max([4, 9, 1]) + list_min([4, 9, 1])"),
    ("T", "", "SELECT array_to_string(list_reverse([1, 2, 3]), '-')"),
    ("I", "", "SELECT list_unique([1, 1, NULL, 2])"),
    ("I", "", "SELECT list_position([10, 20, 30], 20)"),
    # date_diff counts BOUNDARY crossings (probed: month of 01-31 ->
    # 02-01 is 1); every unit maps to an explicit boundary expression
    ("I", "", "SELECT date_diff('day', DATE '1995-01-01', DATE '1995-03-01')"),
    ("I", "", "SELECT date_diff('month', DATE '1995-01-31', DATE '1995-02-01')"),
    ("I", "", "SELECT datediff('year', DATE '1994-12-31', DATE '1995-01-01')"),
    ("I", "", "SELECT date_diff('week', DATE '1995-01-02', DATE '1995-01-16')"),
    ("I", "", "SELECT CAST(sum(date_diff('day', o_orderdate, DATE '1998-12-31')) AS BIGINT) FROM orders WHERE o_orderkey < 100"),
    # strftime / strptime via format translation
    ("T", "", "SELECT strftime(DATE '1995-03-15', '%Y/%m/%d')"),
    ("T", "", "SELECT strftime(TIMESTAMP '1995-03-15 10:30:05', '%Y-%m-%d %H:%M:%S')"),
    ("T", "", "SELECT strftime(o_orderdate, '%Y-%m') FROM orders ORDER BY o_orderkey LIMIT 3"),
    ("T", "", "SELECT CAST(strptime('1995-03-15 10:30:05', '%Y-%m-%d %H:%M:%S') AS STRING)"),
    ("T", "", "SELECT strftime(DATE '1995-03-15', '%d.%m.%Y')"),
    # composition with the expression rewrites
    ("I", "", "SELECT list_max([o_orderkey % 7, o_orderkey % 5]) FROM orders ORDER BY o_orderkey LIMIT 4"),
])

corpus("explain_statements", "EXPLAIN [ANALYZE] statement grammar (reference test/sql/explain/, the EXPLAIN ANALYZE harvest in vector_compaction.cpp:83-92; Spark side: Engine._dispatch_explain — DuckDB's (explain_key, explain_value) one-row shape, probed; plan TEXT differs per engine so the grid is acceptance-only and tests/test_explain.py pins the shape)")([
    ("ok", "", "EXPLAIN SELECT r_name, count(*) FROM region GROUP BY r_name"),
    ("ok", "", "EXPLAIN SELECT n.n_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA'"),
    ("ok", "", "EXPLAIN ANALYZE SELECT count(*) FROM lineitem WHERE l_quantity > 25"),
    ("ok", "", "EXPLAIN WITH t AS (SELECT 1 AS x) SELECT x FROM t"),
    ("ok", "", "EXPLAIN VALUES (1, 'a'), (2, 'b')"),
    # the statement surface stays live after EXPLAIN
    ("I", "", "SELECT count(*) FROM region"),
])

corpus("dialect_expressions", "DuckDB expression grammar Spark's parser lacks (reference src/parser/transform/expression/, test/sql/json/, test/sql/types/string/, test/sql/types/list/; Spark side: dialect.rewrite_expressions — list literals, 1-based indexing/slicing, -> / ->> JSON arrows, SIMILAR TO full-match regex, // integer division; all semantics probed on DuckDB 1.0)")([
    # list literals + 1-based indexing
    ("I", "", "SELECT [10, 20, 30][2]"),
    ("I", "", "SELECT [10, 20, 30][-1]"),
    ("I", "", "SELECT ARRAY[7, 8][1]"),
    ("I", "", "SELECT [[1],[2,3]][2][1]"),
    # list slicing (1-based inclusive, negative = from the end)
    ("I", "", "SELECT [10,20,30][1:2][2]"),
    ("I", "", "SELECT [10,20,30][-2:][1]"),
    ("I", "", "SELECT [10,20,30][:2][2]"),
    # string slicing
    ("T", "", "SELECT 'abcdef'[2:4]"),
    ("T", "", "SELECT 'abcdef'[2:]"),
    ("T", "", "SELECT 'abcdef'[:3]"),
    ("T", "", "SELECT 'abcdef'[-3:]"),
    ("T", "", "SELECT 'abcdef'[:-2]"),
    ("T", "", "SELECT concat('<', 'abcdef'[4:2], '>')"),
    ("T", "", "SELECT r_name[2:4] FROM region ORDER BY r_regionkey"),
    # JSON arrows: -> keeps JSON rendering, ->> extracts text
    ("T", "", "SELECT '{\"a\": {\"b\": 7}}' -> 'a'"),
    ("T", "", "SELECT '{\"s\": \"x\"}' -> 's'"),
    ("T", "", "SELECT '{\"s\": \"x\"}' ->> 's'"),
    ("T", "", "SELECT '{\"a\": {\"b\": 7}}' -> 'a' ->> 'b'"),
    ("T", "", "SELECT '[10,20]' ->> 1"),
    ("T", "", "SELECT '{\"a\":{\"b\":7}}' ->> '$.a.b'"),
    ("I", "", "SELECT CAST(props ->> 'k' AS BIGINT) FROM events ORDER BY event_id LIMIT 5"),
    ("I", "", "SELECT count(*) FROM events WHERE CAST(props ->> 'k' AS BIGINT) > 50"),
    # SIMILAR TO is a FULL-match plain regex (probed: % is not a wildcard)
    ("I", "", "SELECT count(*) FROM region WHERE r_name SIMILAR TO 'A.*'"),
    ("I", "", "SELECT count(*) FROM region WHERE r_name SIMILAR TO 'A%'"),
    ("T", "", "SELECT r_name FROM region WHERE r_name NOT SIMILAR TO '.*[AE].*' ORDER BY r_regionkey"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_name SIMILAR TO '.*(IA|CO)'"),
    # // integer division truncates toward zero (= Spark div)
    ("I", "", "SELECT 7 // 2"),
    ("I", "", "SELECT -7 // 2"),
    ("I", "", "SELECT n_nationkey // 3 FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("I", "", "SELECT CAST(sum(o_orderkey // 100) AS BIGINT) FROM orders"),
    # interactions: rewrites must not fire inside string data
    ("T", "", "SELECT '-> [1:2] // SIMILAR TO'"),
    # lambda arrows keep working through the engine surface (filter is
    # a lambda HOF in BOTH engines — DuckDB aliases list_filter)
    ("I", "", "SELECT filter([1,2,3], x -> x > 1)[1]"),
    # struct literals -> named_struct (field access probed identical)
    ("I", "", "SELECT {'a': 1, 'b': 2}.b"),
    ("I", "", "SELECT ({'a': 1, 'b': {'c': 7}}).b.c"),
    ("I", "", "SELECT [{'a': 1}, {'a': 2}][2].a"),
    ("T", "", "SELECT {'name': r_name, 'key': r_regionkey}.name FROM region ORDER BY r_regionkey"),
])


def main() -> int:
    import duckdb

    from pyspark.sql import SparkSession

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gen-sqllogic")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, SF_DIR)

    only = set(sys.argv[1:])
    unknown = only - set(SPECS)
    if unknown:
        print(f"unknown corpus names: {sorted(unknown)}")
        return 1

    from data_chunk_compaction_in_duckdb_spark.testing.sqllogic import (
        EngineSqlContext,
    )

    n_bad = 0
    for fname, (header, specs) in SPECS.items():
        if only and fname not in only:
            continue
        out = [HEADER_NOTE, f"# {header}\n"]
        file_ok = True
        # per-corpus engine context: sequence state advances in lockstep
        # on BOTH engines since every spec executes in order on each
        ctx = EngineSqlContext(spark)
        for types, sortmode, sql in specs:
            if types in ("ok", "error"):
                # statement spec: both engines must agree it runs/raises
                d_err = s_err = None
                try:
                    con.execute(sql)
                except Exception as e:  # noqa: BLE001
                    d_err = e
                try:
                    df = ctx.execute(sql)
                    if df is not None and df.columns:
                        df.collect()
                except Exception as e:  # noqa: BLE001
                    s_err = e
                want_err = types == "error"
                if (d_err is not None) != want_err or (
                    s_err is not None
                ) != want_err:
                    print(
                        f"[{fname}] STATEMENT {types} DISAGREES: {sql}\n"
                        f"    duckdb: {d_err}\n    spark : "
                        f"{str(s_err)[:200]}"
                    )
                    file_ok = False
                    n_bad += 1
                    continue
                out.append(f"statement {types}\n{sql}\n")
                continue
            try:
                d_rows = [render_row(r, types) for r in con.execute(sql).fetchall()]
            except Exception as e:  # noqa: BLE001
                print(f"[{fname}] DUCKDB ERROR: {sql}\n    {e}")
                file_ok = False
                n_bad += 1
                continue
            try:
                s_rows = [
                    render_row(tuple(r), types)
                    for r in ctx.execute(sql).collect()
                ]
            except Exception as e:  # noqa: BLE001
                print(f"[{fname}] SPARK ERROR: {sql}\n    {str(e)[:300]}")
                file_ok = False
                n_bad += 1
                continue
            dd, ss = list(d_rows), list(s_rows)
            if sortmode == "rowsort":
                dd.sort()
                ss.sort()
            if dd != ss:
                print(f"[{fname}] MISMATCH: {sql}")
                print(f"    duckdb: {dd[:4]}")
                print(f"    spark : {ss[:4]}")
                file_ok = False
                n_bad += 1
                continue
            mode = f" {sortmode}" if sortmode else ""
            rendered = sorted(d_rows) if sortmode == "rowsort" else d_rows
            out.append(
                f"query {types}{mode}\n{sql}\n----\n" + "\n".join(rendered) + "\n"
            )
        ctx.close()
        if file_ok:
            path = os.path.join(OUT_DIR, f"{fname}.test")
            with open(path, "w") as f:
                f.write("\n".join(out))
            print(f"wrote {path} ({len(specs)} queries)")
        else:
            print(f"SKIPPED {fname}.test — fix the specs above first")
    if n_bad:
        print(f"\n{n_bad} failing specs; no file with failures was written")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Generate sqllogictest files with DuckDB-computed golden rows.

The reference's primary corpus is sqllogictest files with inline golden
rows (SURVEY.md §5).  This tool keeps ours honest the same way: each
query spec below is written in the DIALECT-COMMON subset (identical text
parses in DuckDB and Spark SQL), executed in DuckDB over the sf0.001
fixture views, rendered with the runner's conventions
(testing/sqllogic.py), and emitted as tests/sqllogic/<file>.test.
pytest (tests/test_sqllogic.py) then asserts Spark produces the same
rows — DuckDB stays the semantics oracle, Spark the system under test.

Usage:  python tools/gen_sqllogic.py          # regenerate all GENERATED files
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
        SPECS[name] = (header, specs)
    return add


corpus("scalar_expr", "Scalar expression semantics (reference test/sql/function, test/sql/cast)")([
    ("T", "", "SELECT CASE WHEN r_regionkey < 2 THEN 'low' WHEN r_regionkey < 4 THEN 'mid' ELSE 'high' END FROM region ORDER BY r_regionkey"),
    ("I", "", "SELECT CAST(o_totalprice AS BIGINT) FROM orders ORDER BY o_orderkey LIMIT 5"),
    ("T", "", "SELECT CAST(l_shipdate AS VARCHAR) FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3"),
    ("TI", "", "SELECT substr(r_name, 1, 3), length(r_name) FROM region ORDER BY r_regionkey"),
    ("T", "", "SELECT upper(lower(n_name)) FROM nation ORDER BY n_nationkey LIMIT 4"),
    ("T", "", "SELECT concat(r_name, '-', CAST(r_regionkey AS VARCHAR)) FROM region ORDER BY r_regionkey"),
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
    ("TT", "", "SELECT CAST(NULL AS VARCHAR) IS DISTINCT FROM 'x', 'x' IS NOT DISTINCT FROM 'x'"),
    ("T", "", "SELECT CAST(NULL = NULL AS VARCHAR)"),
    ("T", "", "SELECT CAST(NULL AND FALSE AS VARCHAR)"),
    ("T", "", "SELECT CAST(NULL OR TRUE AS VARCHAR)"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 3)"),
    ("I", "", "SELECT sum(CASE WHEN NULL THEN 1 ELSE 0 END) FROM region"),
    ("T", "", "SELECT CAST(max(CASE WHEN r_regionkey > 99 THEN r_name END) AS VARCHAR) FROM region"),
    ("I", "", "SELECT count(CASE WHEN r_regionkey > 2 THEN 1 END) FROM region"),
    ("II", "", "SELECT count(*), count(NULL) FROM region"),
])

corpus("datetime_interval", "Date / timestamp / interval arithmetic (reference test/sql/types/date, /interval)")([
    ("T", "", "SELECT CAST(DATE '1995-03-15' + INTERVAL 30 DAY AS VARCHAR)"),
    ("T", "", "SELECT CAST(DATE '1996-01-31' - INTERVAL 1 MONTH AS VARCHAR)"),
    ("III", "", "SELECT EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate), EXTRACT(DAY FROM o_orderdate) FROM orders ORDER BY o_orderkey LIMIT 3"),
    ("I", "", "SELECT count(*) FROM lineitem WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31'"),
    ("T", "", "SELECT CAST(min(o_orderdate) AS VARCHAR) FROM orders"),
    ("T", "", "SELECT CAST(max(l_shipdate) AS VARCHAR) FROM lineitem"),
    ("I", "rowsort", "SELECT EXTRACT(QUARTER FROM o_orderdate) FROM orders GROUP BY 1"),
    ("TI", "", "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR), count(*) FROM orders GROUP BY 1 ORDER BY 1"),
    ("I", "", "SELECT datediff('day', DATE '1995-01-01', DATE '1995-03-01')"),
    ("T", "", "SELECT CAST(last_day(DATE '1996-02-10') AS VARCHAR)"),
])

corpus("grouping_edges", "GROUP BY edge semantics (reference test/sql/aggregate/group)")([
    ("TI", "", "SELECT r_name, count(*) FROM region GROUP BY r_name HAVING count(*) >= 1 ORDER BY r_name"),
    ("II", "rowsort", "SELECT n_regionkey, count(DISTINCT n_nationkey) FROM nation GROUP BY n_regionkey"),
    ("I", "", "SELECT count(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey) t"),
    ("TII", "rowsort", "SELECT coalesce(CAST(n_regionkey AS VARCHAR), 'ALL'), grouping(n_regionkey), count(*) FROM nation GROUP BY ROLLUP(n_regionkey)"),
    ("II", "rowsort", "SELECT n_regionkey % 2, sum(n_nationkey) FROM nation GROUP BY n_regionkey % 2"),
    ("I", "", "SELECT count(*) FROM nation GROUP BY () "),
    ("TI", "", "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    ("II", "", "SELECT o_orderkey % 3 AS k, max(o_custkey) FROM orders GROUP BY k ORDER BY k"),
])

corpus("quantifiers", "ANY/ALL/EXISTS quantified comparisons (reference test/sql/subquery/any_all)")([
    ("I", "", "SELECT count(*) FROM nation WHERE n_regionkey = ANY (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')"),
    ("I", "", "SELECT count(*) FROM nation WHERE n_nationkey > ALL (SELECT r_regionkey FROM region)"),
    ("I", "", "SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)"),
    ("I", "", "SELECT count(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    ("T", "rowsort", "SELECT r_name FROM region WHERE r_regionkey <= ALL (SELECT n_regionkey FROM nation WHERE n_nationkey < 3)"),
    ("I", "", "SELECT count(*) FROM orders WHERE o_totalprice >= ANY (SELECT o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT')"),
])

HEADER_NOTE = (
    "# GENERATED by tools/gen_sqllogic.py — golden rows computed by DuckDB\n"
    "# over /root/testdata/sf0.001 (the reference's golden-answer method,\n"
    "# SURVEY.md §5).  Edit the specs in the generator, not this file.\n"
)


def main() -> int:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    for fname, (header, specs) in SPECS.items():
        out = [HEADER_NOTE, f"# {header}\n"]
        for types, sortmode, sql in specs:
            rows = con.execute(sql).fetchall()
            rendered = [render_row(r, types) for r in rows]
            if sortmode == "rowsort":
                rendered.sort()
            mode = f" {sortmode}" if sortmode else ""
            out.append(f"query {types}{mode}\n{sql}\n----\n" + "\n".join(rendered) + "\n")
        path = os.path.join(OUT_DIR, f"{fname}.test")
        with open(path, "w") as f:
            f.write("\n".join(out))
        print(f"wrote {path} ({len(specs)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

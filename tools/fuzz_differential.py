#!/usr/bin/env python
"""Seeded differential SQL fuzzer — the port's analog of the reference's
randomized testing (SURVEY.md §5: test/fuzzer/{sqlsmith,duckfuzz},
extension/sqlsmith).

Generates random SELECTs from a DIALECT-COMMON grammar (identical text
parses in DuckDB and Spark SQL; the same subset tools/gen_sqllogic.py
validates), runs both engines over the sf0.001 fixture views, and
compares results as sorted multisets with the driver's normalization.

Exactness discipline: aggregates only over integer-valued columns (keys,
sizes, BIGINT-cast quantity) so no float summation order can diverge;
doubles appear only in comparisons and ROUND(x, 2) projections.

Usage:
  python tools/fuzz_differential.py [n_queries] [seed]
Exit 1 on any divergence, printing the offending SQL and both results —
a found divergence becomes either an engine-semantics note in
gen_sqllogic.py's dialect list or a new pinned sqllogic corpus entry.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_FUZZ_SF_DIR", "/root/testdata/sf0.001")
TABLES = {
    "region": {"int": ["r_regionkey"], "str": ["r_name"], "date": []},
    "nation": {"int": ["n_nationkey", "n_regionkey"], "str": ["n_name"], "date": []},
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "str": ["c_name", "c_mktsegment"],
        "date": [],
    },
    "supplier": {
        "int": ["s_suppkey", "s_nationkey"],
        "str": ["s_name"],
        "date": [],
    },
    "part": {
        "int": ["p_partkey", "p_size"],
        "str": ["p_name", "p_brand", "p_type"],
        "date": [],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "date": ["o_orderdate"],
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "str": ["l_returnflag", "l_linestatus"],
        "date": ["l_shipdate"],
    },
}
STR_LITS = {
    "r_name": ["ASIA", "EUROPE", "AMERICA"],
    "n_name": ["NATION_3", "NATION_11", "NATION_20"],
    "c_name": ["Customer#1", "Customer#99"],
    "c_mktsegment": ["BUILDING", "MACHINERY", "HOUSEHOLD"],
    "s_name": ["Supplier#5", "Supplier#77"],
    "p_name": ["red bolt", "small gizmo"],
    "p_brand": ["Brand#3", "Brand#14", "Brand#22"],
    "p_type": ["PROMO", "STANDARD", "ECONOMY"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "3-MEDIUM", "5-LOW"],
    "l_returnflag": ["R", "N", "A"],
    "l_linestatus": ["F", "O"],
}


class Gen:
    def __init__(self, rng: random.Random, table: str):
        self.rng = rng
        self.t = TABLES[table]
        self.table = table

    def int_expr(self, depth: int = 0) -> str:
        r = self.rng
        if depth > 1 or r.random() < 0.4:
            if self.t["int"] and r.random() < 0.8:
                return r.choice(self.t["int"])
            return str(r.randint(-20, 30))
        a, b = self.int_expr(depth + 1), self.int_expr(depth + 1)
        op = r.choice(["+", "-", "*", "%", "%"])
        if op == "%":
            # negative-dividend modulo is a classic engine-divergence
            # zone (both here follow sign-of-dividend)
            return f"(({a} - {r.randint(0, 15)}) % {r.randint(2, 13)})"
        return f"({a} {op} {b})"

    def str_expr(self) -> str:
        r = self.rng
        col = r.choice(self.t["str"])
        return r.choice(
            [
                col,
                f"upper({col})",
                f"substr({col}, 1, {r.randint(1, 6)})",
                f"concat({col}, '_x')",
            ]
        )

    def pred(self, depth: int = 0) -> str:
        r = self.rng
        if depth < 1 and r.random() < 0.4:
            a, b = self.pred(depth + 1), self.pred(depth + 1)
            conj = r.choice(["AND", "OR"])
            neg = "NOT " if r.random() < 0.2 else ""
            return f"{neg}({a} {conj} {b})"
        kind = r.random()
        if kind < 0.45:
            return f"{self.int_expr()} {r.choice(['<', '<=', '=', '>', '>=', '<>'])} {r.randint(0, 40)}"
        if kind < 0.65 and self.t["str"]:
            col = r.choice(self.t["str"])
            lit = r.choice(STR_LITS[col])
            return f"{col} {r.choice(['=', '<>', '<', '>'])} '{lit}'"
        if kind < 0.8 and self.t["str"]:
            col = r.choice(self.t["str"])
            pat = r.choice(["%a%", "B%", "%_1%", "%o"])
            return f"{col} {r.choice(['LIKE', 'NOT LIKE'])} '{pat}'"
        if kind < 0.85:
            col = r.choice(self.t["int"])
            vals = ", ".join(str(r.randint(0, 25)) for _ in range(r.randint(2, 5)))
            return f"{col} IN ({vals})"
        if kind < 0.9:
            lo = r.randint(-5, 20)
            return f"{self.int_expr()} BETWEEN {lo} AND {lo + r.randint(0, 15)}"
        if self.t["date"]:
            col = r.choice(self.t["date"])
            y = r.randint(1995, 2001)
            return f"{col} >= DATE '{y}-0{r.randint(1, 9)}-01'"
        return f"{r.choice(self.t['int'])} IS NOT NULL"

    def scalar_select(self) -> str:
        r = self.rng
        items = []
        for _ in range(r.randint(1, 4)):
            if self.t["date"] and r.random() < 0.15:
                col = r.choice(self.t["date"])
                items.append(
                    r.choice(
                        [
                            f"CAST(CAST({col} AS DATE) AS STRING)",
                            f"EXTRACT(YEAR FROM {col})",
                            f"EXTRACT(MONTH FROM {col}) * 100 + EXTRACT(DAY FROM {col})",
                        ]
                    )
                )
            elif r.random() < 0.5:
                items.append(self.int_expr())
            elif r.random() < 0.7 and self.t["str"]:
                items.append(self.str_expr())
            else:
                ie = self.int_expr()
                items.append(
                    r.choice(
                        [
                            f"CASE WHEN {self.pred(1)} THEN {ie} ELSE 0 END",
                            f"coalesce(nullif({ie}, 0), -1)",
                            f"abs({ie} - 10)",
                        ]
                    )
                )
        cols = ", ".join(f"{e} AS c{i}" for i, e in enumerate(items))
        order = ", ".join(f"c{i}" for i in range(len(items)))
        where = f" WHERE {self.pred()}" if r.random() < 0.8 else ""
        lim = f" LIMIT {r.randint(1, 50)}" if r.random() < 0.5 else ""
        # ORDER BY all projected columns keeps LIMIT deterministic only
        # when the prefix is unique; compare without LIMIT unless ordered
        # output is total — simplest: LIMIT only with full ORDER BY and a
        # unique key appended.
        key = TABLES[self.table]["int"][0]
        return (
            f"SELECT {cols} FROM {self.table}{where} "
            f"ORDER BY {order}, {key}{lim}"
        )

    def agg_select(self) -> str:
        r = self.rng
        gcols = []
        if r.random() < 0.7:
            pool = self.t["str"] + self.t["int"]
            gcols = r.sample(pool, k=min(len(pool), r.randint(1, 2)))
        aggs = []
        for _ in range(r.randint(1, 3)):
            ie = self.int_expr()
            aggs.append(
                r.choice(
                    [
                        "count(*)",
                        f"CAST(count(DISTINCT {r.choice(self.t['int'])}) AS BIGINT)",
                        f"CAST(sum(CAST({ie} AS BIGINT)) AS BIGINT)",
                        f"min({ie})",
                        f"max({ie})",
                    ]
                )
            )
        items = gcols + aggs
        sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(items))
        where = f" WHERE {self.pred()}" if r.random() < 0.6 else ""
        group = (
            " GROUP BY " + ", ".join(f"c{i}" for i in range(len(gcols)))
            if gcols
            else ""
        )
        having = (
            f" HAVING count(*) > {r.randint(0, 3)}"
            if gcols and r.random() < 0.4
            else ""
        )
        return f"SELECT {sel} FROM {self.table}{where}{group}{having}"


JOIN_PAIRS = [
    ("nation", "region", "n_regionkey = r_regionkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
]


def join_select(rng: random.Random) -> str:
    """Two-table FK join under a random join type — outer-join NULL
    semantics and join+aggregate interaction are the classic divergence
    territory."""
    r = rng
    lt, rt, cond = r.choice(JOIN_PAIRS)
    jt = r.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    gl, gr = Gen(r, lt), Gen(r, rt)
    # predicate placement: ON-extra vs WHERE changes outer-join results;
    # both engines must agree on either placement.
    extra = ""
    where = ""
    side = r.choice([gl, gr])
    if r.random() < 0.5:
        extra = f" AND {side.pred(1)}"
    elif r.random() < 0.7:
        where = f" WHERE {side.pred(1)}"
    key_l = TABLES[lt]["int"][0]
    key_r = TABLES[rt]["int"][0]
    aggs = [
        "count(*)",
        f"count({key_l})",
        f"count({key_r})",
        f"min({key_l})",
        f"max({key_r})",
    ]
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(r.sample(aggs, 3)))
    if r.random() < 0.5:
        gcol = r.choice(TABLES[r.choice([lt, rt])]["str"])
        return (
            f"SELECT {gcol} AS g, {sel} FROM {lt} {jt} {rt} "
            f"ON {cond}{extra}{where} GROUP BY g"
        )
    return f"SELECT {sel} FROM {lt} {jt} {rt} ON {cond}{extra}{where}"


def window_select(rng: random.Random) -> str:
    """Deterministic window shapes: a unique ORDER BY key inside each
    partition keeps rank/row_number engine-independent."""
    r = rng
    table = r.choice([t for t, c in TABLES.items() if c["str"]])
    g = Gen(r, table)
    part = r.choice(TABLES[table]["str"])
    # the tiebreak must be UNIQUE per row or row_number among ties is
    # engine-arbitrary (seed-31337 find: lineitem's l_orderkey repeats
    # per line, so rank ties and the ORDER BY ... LIMIT cut both
    # diverged legitimately)
    key = (
        "(l_orderkey * 10 + l_linenumber)"
        if table == "lineitem"
        else TABLES[table]["int"][0]
    )
    other_str = [c for c in TABLES[table]["str"] if c != part]
    if other_str:
        coll_col, coll_part = r.choice(other_str), f"PARTITION BY {part} "
    else:
        coll_col, coll_part = part, ""
    lo, hi = r.randint(0, 3), r.randint(0, 3)
    fn = r.choice(
        [
            "row_number()",
            "rank()",
            "dense_rank()",
            f"ntile({r.randint(2, 7)})",
            f"CAST(count(*) OVER (PARTITION BY {part}) AS BIGINT)",
            f"CAST(sum({key}) OVER (PARTITION BY {part} ORDER BY {key} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"CAST(sum({key}) OVER (PARTITION BY {part} ORDER BY {key} "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS BIGINT)",
            f"CAST(min({key}) OVER (PARTITION BY {part} ORDER BY {key} "
            f"RANGE BETWEEN {r.randint(1, 9)} PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"CAST(max({key}) OVER (PARTITION BY {part} ORDER BY {key} DESC "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)",
            f"lag({key}, 1) OVER (PARTITION BY {part} ORDER BY {key})",
            f"lag({key}, {r.randint(1, 4)}, -1) OVER (PARTITION BY {part} ORDER BY {key})",
            f"lead({key}, {r.randint(1, 3)}, 999) OVER (PARTITION BY {part} ORDER BY {key})",
            f"first_value({key}) OVER (PARTITION BY {part} ORDER BY {key} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
            # ICU locale collation inside a window order (verified-common
            # locale set; ties broken by the unique key).  The collated
            # column must DIFFER from the partition key — collating the
            # partition column is constant per partition and never
            # exercises the collator — so order over a second string
            # column when one exists, else over the whole table
            f"row_number() OVER ({coll_part}ORDER BY "
            f"upper({coll_col}) COLLATE {r.choice(['de', 'sv', 'fr', 'cs'])} DESC, {key})",
        ]
    )
    if "OVER" not in fn:
        fn = f"CAST({fn} OVER (PARTITION BY {part} ORDER BY {key}) AS BIGINT)"
    where = f" WHERE {g.pred()}" if r.random() < 0.5 else ""
    return (
        f"SELECT {part} AS c0, {key} AS c1, {fn} AS c2 FROM {table}{where} "
        f"ORDER BY c0, c1 LIMIT {r.randint(5, 80)}"
    )


def subquery_select(rng: random.Random) -> str:
    """Correlated EXISTS / uncorrelated IN predicates over a second
    table (modulus-key correlation keeps both sides NULL-free, staying
    clear of the documented NULL-lhs IN dialect divergence)."""
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    t2 = rng.choice(list(TABLES))
    g2 = Gen(rng, t2)
    k1 = rng.choice(TABLES[table]["int"])
    k2 = rng.choice(TABLES[t2]["int"])
    mod = rng.randint(2, 9)
    neg = rng.choice(["", "NOT "])
    if rng.random() < 0.5:
        sub = (
            f"{neg}EXISTS (SELECT 1 FROM {t2} WHERE "
            f"{k2} % {mod} = {table}.{k1} % {mod} AND {g2.pred()})"
        )
    else:
        sub = (
            f"{k1} % {mod} {neg}IN (SELECT {k2} % {mod} FROM {t2} "
            f"WHERE {g2.pred()})"
        )
    return f"SELECT count(*) AS c0 FROM {table} WHERE {sub} AND {g.pred()}"


def recursive_select(rng: random.Random) -> str:
    """Bounded recursive-CTE series (UNION ALL only — Spark rejects
    recursive UNION)."""
    start = rng.randint(0, 5)
    inc = rng.randint(1, 3)
    stop = start + inc * rng.randint(3, 40)
    return (
        f"WITH RECURSIVE t(n) AS (SELECT {start} UNION ALL "
        f"SELECT n + {inc} FROM t WHERE n < {stop}) "
        "SELECT CAST(sum(n) AS BIGINT) AS c0, count(*) AS c1, "
        "max(n) AS c2 FROM t"
    )


def float_special_select(rng: random.Random) -> str:
    """IEEE-specials arm (round-4 probe: both engines agree NaN sorts
    greatest, NaN==NaN groups, inf arithmetic) — inject nan/inf/-inf
    literals into aggregates, DISTINCT, grouping and min/max over a
    VALUES relation.  Probed divergences stay out: floor/ceil(inf),
    CAST(inf AS STRING), stddev over inf, bare-ASC NULL placement."""
    specials = ["CAST('nan' AS DOUBLE)", "CAST('inf' AS DOUBLE)",
                "CAST('-inf' AS DOUBLE)", "1.5", "-2.25", "0.0", "NULL"]
    vals = ",".join(f"({rng.choice(specials)})" for _ in range(rng.randint(4, 8)))
    rel = f"(VALUES {vals}) t(x)"
    shape = rng.random()
    if shape < 0.3:
        return (f"SELECT max(x) AS c0, min(x) AS c1, count(x) AS c2, "
                f"count(DISTINCT x) AS c3 FROM {rel}")
    if shape < 0.55:
        return (f"SELECT x AS c0, count(*) AS c1 FROM {rel} "
                f"GROUP BY x ORDER BY x DESC, c1")
    if shape < 0.8:
        return f"SELECT x AS c0 FROM {rel} ORDER BY x DESC"
    return (f"SELECT CASE WHEN x > 0.0 THEN 'pos' WHEN x = x THEN 'other' "
            f"ELSE 'nan_or_null' END AS c0, count(*) AS c1 FROM {rel} "
            f"GROUP BY 1 ORDER BY c0")


def qualify_select(rng: random.Random) -> str:
    """QUALIFY + star-modifier forms (round-6 dialect layer,
    data_chunk_compaction_in_duckdb_spark/dialect.py): the fuzz text uses DuckDB's
    clauses verbatim; the Spark side rides the same rewrites Engine.sql
    applies.  Determinism: rank/row_number always order by a unique
    key, and results are compared as sorted multisets (no LIMIT)."""
    r = rng
    table = r.choice([t for t, c in TABLES.items() if c["str"]])
    g = Gen(r, table)
    part = r.choice(TABLES[table]["str"])
    key = (
        "(l_orderkey * 10 + l_linenumber)"
        if table == "lineitem"
        else TABLES[table]["int"][0]
    )
    fn = r.choice(["row_number()", "rank()", "dense_rank()"])
    win = f"{fn} OVER (PARTITION BY {part} ORDER BY {key})"
    k = r.randint(1, 4)
    where = f" WHERE {g.pred()}" if r.random() < 0.5 else ""
    form = r.random()
    if form < 0.3:
        # select-alias predicate
        return (
            f"SELECT {part} AS c0, {key} AS c1, CAST({win} AS INT) AS rn "
            f"FROM {table}{where} QUALIFY rn <= {k}"
        )
    if form < 0.55:
        # inline window predicate over selected columns
        return (
            f"SELECT {part} AS c0, {key} AS c1 FROM {table}{where} "
            f"QUALIFY {win} <= {k}"
        )
    if form < 0.75:
        # predicate references a source column NOT in the projection
        return (
            f"SELECT {key} AS c1 FROM {table}{where} "
            f"QUALIFY {win} = 1 AND length({part}) >= 0"
        )
    # star modifiers, emitted directly: the multiset compare sorts
    # columns by name, so REPLACE's position divergence (documented in
    # dialect.py) is invisible here
    drop_col = r.choice(TABLES[table]["str"])
    keep_int = TABLES[table]["int"][0]
    if r.random() < 0.5:
        # QUALIFY binds in the FROM scope, so the predicate may window
        # over the excluded column on both engines
        return (
            f"SELECT * EXCLUDE ({drop_col}) FROM {table}{where} "
            f"QUALIFY {win} <= {k}"
        )
    return (
        f"SELECT * REPLACE (CAST({keep_int} * {r.randint(2, 5)} AS BIGINT)"
        f" AS {keep_int}) FROM {table}{where}"
    )


def dialect_expr_select(rng: random.Random) -> str:
    """Round-9 expression-grammar forms (dialect.rewrite_expressions):
    string slices with positive/negative/open bounds, list literals +
    1-based index/slice, // integer division, full-match SIMILAR TO,
    and JSON arrows over a constructed JSON literal."""
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    col = rng.choice(g.t["str"])
    icol = rng.choice(g.t["int"])
    items = []
    lo = rng.choice(["", "1", "2", "3", "-3", "-5", "0"])
    hi = rng.choice(["", "2", "4", "6", "100", "-1", "-2"])
    items.append(f"{col}[{lo}:{hi}] AS c_slice")
    items.append(
        f"({icol} + {rng.randint(0, 9)}) // {rng.randint(1, 9)} AS c_div"
    )
    n = rng.randint(2, 4)
    lits = ", ".join(str(rng.randint(-9, 9)) for _ in range(n))
    if rng.random() < 0.5:
        items.append(f"[{lits}][{rng.randint(1, n)}] AS c_lidx")
    else:
        items.append(
            f"[{lits}][{rng.randint(1, 2)}:{rng.randint(2, n)}][1] AS c_lsl"
        )
    k = rng.randint(0, 99)
    arrow = rng.choice(["->>", "->"])
    key = rng.choice(["k", "s"])
    items.append(
        f"'{{\"k\": {k}, \"s\": \"ab\"}}' {arrow} '{key}' AS c_json"
    )
    pred = rng.choice(
        [
            f"{col} SIMILAR TO '[A-Z].*'",
            f"{col} NOT SIMILAR TO '.*[0-9]'",
            f"{col} SIMILAR TO '{rng.choice(['A.*', '.*E.*', '[A-M].*'])}'",
        ]
    )
    return (
        f"SELECT {', '.join(items)} FROM {table} "
        f"WHERE {pred} ORDER BY {icol}, {col} LIMIT 40"
    )


def gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    roll = rng.random()
    if roll < 0.05:
        return float_special_select(rng)
    if roll < 0.13:
        return dialect_expr_select(rng)
    if roll < 0.15:
        return join_select(rng)
    if roll < 0.22:
        return window_select(rng)
    if roll < 0.25:
        return qualify_select(rng)
    if roll < 0.32:
        return subquery_select(rng)
    if roll < 0.37:
        return recursive_select(rng)
    if roll < 0.50:
        return g.agg_select()
    if roll < 0.58:
        # DISTINCT over a small projection
        e1, e2 = g.int_expr(), g.int_expr()
        return (
            f"SELECT DISTINCT {e1} AS c0, {e2} AS c1 FROM {table} "
            f"WHERE {g.pred()} ORDER BY c0, c1"
        )
    if roll < 0.65:
        # UNION [ALL] of two compatible single-column branches
        t2 = rng.choice(list(TABLES))
        g2 = Gen(rng, t2)
        setop = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT {g.int_expr()} AS c0 FROM {table} WHERE {g.pred()} "
            f"{setop} SELECT {g2.int_expr()} FROM {t2} WHERE {g2.pred()}"
        )
    return g.scalar_select()


def run_fuzz(
    n: int, seed: int, spark=None, duck=None, sf_dir: str = SF_DIR
) -> list[tuple[str, str]]:
    """Returns list of (sql, reason) divergences."""
    import duckdb

    from tests.oracle_compare import _cells_equal, normalize

    if duck is None:
        duck = duckdb.connect()
        for t in TABLES:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
    if spark is None:
        from data_chunk_compaction_in_duckdb_spark.session import get_spark

        spark = get_spark(app_name="fuzz", cpus=4, shuffle_partitions=4)
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)

    rng = random.Random(seed)
    bad: list[tuple[str, str]] = []
    for i in range(n):
        sql = gen_query(rng)
        try:
            ores = duck.execute(sql)
            o_cols = [d[0] for d in ores.description]
            o_rows = [tuple(x) for x in ores.fetchall()]
        except Exception as e:  # noqa: BLE001
            bad.append((sql, f"duckdb error: {e}"))
            continue
        try:
            # the same dialect rewrites Engine.sql applies (QUALIFY and
            # star modifiers are DuckDB-only clauses)
            from data_chunk_compaction_in_duckdb_spark import dialect

            s_sql = sql
            expr = dialect.rewrite_expressions(s_sql)
            if expr is not None:
                s_sql = expr
            star = dialect.rewrite_star_modifiers(s_sql)
            if star is not None:
                s_sql = star
            qf = dialect.rewrite_qualify(s_sql)
            if qf is not None:
                sdf = spark.sql(qf[0]).drop(qf[1])
            else:
                sdf = spark.sql(s_sql)
            s_cols = sdf.columns
            s_rows = [tuple(x) for x in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            bad.append((sql, f"spark error: {str(e)[:200]}"))
            continue
        sn = normalize(s_cols, s_rows)
        on = normalize(o_cols, o_rows)
        # NaN-aware compare (_cells_equal treats NaN == NaN; plain tuple
        # != would flag every NaN cell as a divergence)
        same = len(sn) == len(on) and all(
            _cells_equal(a, b) for a, b in zip(sn, on)
        )
        if not same:
            detail = f"rows {len(sn)}/{len(on)}"
            for a, b in zip(sn, on):
                if not _cells_equal(a, b):
                    detail += f"; first diff {a} vs {b}"
                    break
            bad.append((sql, f"result mismatch: {detail}"))
    return bad


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    bad = run_fuzz(n, seed)
    for sql, reason in bad:
        print(f"DIVERGENCE: {reason}\n  {sql}\n")
    print(f"{n} queries, {len(bad)} divergences (seed={seed})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

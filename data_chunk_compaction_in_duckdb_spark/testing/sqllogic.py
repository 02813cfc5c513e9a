"""sqllogictest-subset runner for the Spark SQL surface.

The reference's primary test corpus is 2,387 sqllogictest-derived `.test`
files run by `test/sqlite/sqllogic_parser.cpp` / `sqllogic_command.cpp`
(SURVEY.md §5).  This module re-implements the directive subset those
files actually use against `spark.sql(...)`:

    # comment
    statement ok
    <sql>                      -- must execute without error

    statement error
    <sql>                      -- must raise

    query <types> [rowsort|nosort]
    <sql>
    ----
    <tab-separated expected row per line>

Type string: one char per column — I (integer), R (real, rendered %.3f),
T (text).  NULL renders as the literal string `NULL`, booleans as
`true`/`false` (the sqllogictest conventions).  `rowsort` sorts rendered
rows before comparing; the default is `nosort` (query must ORDER BY).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from decimal import Decimal

_QUERY_RE = re.compile(r"^query\s+([IRT]+)\s*(rowsort|nosort)?\s*$")


class SqlLogicError(AssertionError):
    """A .test directive failed (wrong rows, unexpected error, ...)."""


@dataclass
class Record:
    kind: str                      # "statement_ok" | "statement_error" | "query"
    sql: str
    line: int                      # 1-based line of the directive
    types: str = ""
    sortmode: str = "nosort"
    expected: list[str] = field(default_factory=list)


def parse_file(path: str) -> list[Record]:
    lines = open(path).read().splitlines()
    records: list[Record] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        start = i + 1
        if line in ("statement ok", "statement error"):
            i += 1
            sql: list[str] = []
            while i < n and lines[i].strip() and not lines[i].startswith("#"):
                sql.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="statement_ok" if line.endswith("ok") else "statement_error",
                    sql="\n".join(sql),
                    line=start,
                )
            )
            continue
        m = _QUERY_RE.match(line)
        if m:
            types, sortmode = m.group(1), m.group(2) or "nosort"
            i += 1
            sql = []
            while i < n and lines[i].strip() != "----":
                sql.append(lines[i])
                i += 1
            if i >= n:
                raise SqlLogicError(f"{path}:{start}: query without ---- separator")
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip():
                expected.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="query",
                    sql="\n".join(sql),
                    line=start,
                    types=types,
                    sortmode=sortmode,
                    expected=expected,
                )
            )
            continue
        raise SqlLogicError(f"{path}:{i + 1}: unrecognized directive {line!r}")
    return records


def render_value(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "I":
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(int(v))
    if t == "R":
        return f"{float(v):.3f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    # sqllogictest convention: empty strings render as "(empty)" so golden
    # rows never contain blank lines (which terminate the record).
    if isinstance(v, str) and v == "":
        return "(empty)"
    return str(v)


def render_row(row, types: str) -> str:
    if len(row) != len(types):
        raise SqlLogicError(
            f"result arity {len(row)} != type string {types!r}"
        )
    return "\t".join(render_value(v, t) for v, t in zip(row, types))


def run_file(spark, path: str) -> int:
    """Execute every directive in `path` against spark.sql; returns the
    number of directives run.  Raises SqlLogicError on first failure."""
    count = 0
    for rec in parse_file(path):
        where = f"{path}:{rec.line}"
        if rec.kind == "statement_ok":
            try:
                df = spark.sql(rec.sql)
                # DDL/DML execute eagerly; SELECTs need an action.
                if df is not None and df.columns:
                    df.collect()
            except Exception as e:  # noqa: BLE001
                raise SqlLogicError(f"{where}: statement ok failed: {e}") from e
        elif rec.kind == "statement_error":
            try:
                df = spark.sql(rec.sql)
                if df is not None and df.columns:
                    df.collect()
            except Exception:  # noqa: BLE001
                pass
            else:
                raise SqlLogicError(f"{where}: statement error did not raise")
        else:
            try:
                rows = spark.sql(rec.sql).collect()
            except Exception as e:  # noqa: BLE001
                raise SqlLogicError(f"{where}: query failed: {e}") from e
            got = [render_row(tuple(r), rec.types) for r in rows]
            exp = list(rec.expected)
            if rec.sortmode == "rowsort":
                got.sort()
                exp.sort()
            if got != exp:
                diff = "\n".join(
                    f"  got: {g!r}\n  exp: {e!r}"
                    for g, e in list(zip(got + ["<none>"] * len(exp),
                                         exp + ["<none>"] * len(got)))[:5]
                )
                raise SqlLogicError(
                    f"{where}: {len(got)} rows vs {len(exp)} expected\n{diff}"
                )
        count += 1
    return count

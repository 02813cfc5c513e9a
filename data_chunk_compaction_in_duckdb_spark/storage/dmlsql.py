"""DML + transaction-statement grammar shared by ``Engine.sql`` and the
sqllogic runner.

Reference surface: DuckDB's transaction statements (BEGIN [TRANSACTION]
/ START TRANSACTION / COMMIT / ROLLBACK / ABORT — reference
src/transaction/transaction_context.cpp, test/sql/transactions/) and
the table DML statements they wrap (INSERT INTO / DELETE FROM / UPDATE
... SET — physical_insert.cpp, physical_delete.cpp,
physical_update.cpp).  Spark SQL parses DML only for v2 catalogs, so
both SQL entry points intercept these statements BEFORE spark.sql and
route them to the versioned store / view-rebind machinery — the same
.test text DuckDB executes natively in the dual-engine grids.

Parsers only; execution lives in storage/transaction.py (staged,
multi-statement atomic) and engine.py (auto-commit).
"""

from __future__ import annotations

import re

_BEGIN_RE = re.compile(
    r"^\s*(?:BEGIN(?:\s+TRANSACTION)?|START\s+TRANSACTION)\s*;?\s*$", re.I
)
_COMMIT_RE = re.compile(r"^\s*COMMIT\s*;?\s*$", re.I)
_ROLLBACK_RE = re.compile(r"^\s*(?:ROLLBACK|ABORT)\s*;?\s*$", re.I)

INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:OR\s+(REPLACE|IGNORE)\s+)?INTO\s+(\w+)\s*"
    r"(?:\(([^)]*)\)\s*)?(VALUES\b.*|SELECT\b.*)$",
    re.I | re.S,
)
_ON_CONFLICT_NOTHING_RE = re.compile(
    r"\s+ON\s+CONFLICT\s+DO\s+NOTHING\s*;?\s*$", re.I
)
TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?(\w+)\s*;?\s*$", re.I
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)"
    r"(?:\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(\w+))?)?"
    r"(?:\s+WHERE\s+(.*?))?;?\s*$",
    re.I | re.S,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?);?\s*$", re.I | re.S
)
_FROM_CLAUSE_RE = re.compile(
    r"^\s*(\w+)(?:\s+(?:AS\s+)?(\w+))?\s*$", re.I
)


def parse_txn_verb(sql: str) -> str | None:
    """'begin' | 'commit' | 'rollback' for a transaction statement
    (ABORT is DuckDB's rollback alias — probed: same error text), else
    None."""
    if _BEGIN_RE.match(sql):
        return "begin"
    if _COMMIT_RE.match(sql):
        return "commit"
    if _ROLLBACK_RE.match(sql):
        return "rollback"
    return None


def parse_insert(
    sql: str,
) -> tuple[str, list[str] | None, str, str | None] | None:
    """``(table, column_list | None, body, mode)`` where body is the
    VALUES/SELECT tail; the optional column list is the
    ``INSERT INTO t (a, b) ...`` form (unlisted columns take NULL,
    like DuckDB's defaultless columns).  ``mode`` is ``'replace'`` /
    ``'ignore'`` for the OR REPLACE / OR IGNORE prefixes; a trailing
    ``ON CONFLICT DO NOTHING`` clause (DuckDB's equivalent spelling,
    probed) also maps to ``'ignore'``."""
    m = INSERT_RE.match(sql)
    if not m:
        return None
    mode = m.group(1).lower() if m.group(1) else None
    cols = None
    if m.group(3) is not None:
        cols = [c.strip().strip('"') for c in m.group(3).split(",") if c.strip()]
    body = m.group(4).rstrip().rstrip(";")
    oc = _ON_CONFLICT_NOTHING_RE.search(body)
    if oc:
        body = body[: oc.start()]
        mode = mode or "ignore"
    return m.group(2), cols, body, mode


def parse_truncate(sql: str) -> str | None:
    """Table name of a ``TRUNCATE [TABLE] t`` statement, or None."""
    m = TRUNCATE_RE.match(sql)
    return m.group(1) if m else None


def parse_delete(
    sql: str,
) -> tuple[str, str | None, tuple[str, str] | None] | None:
    """``(table, where_sql | None, using | None)`` where ``using`` is
    ``(source_table, alias)`` for DuckDB's ``DELETE FROM t USING s
    [AS a] WHERE ...`` join-delete form (alias defaults to the source
    name)."""
    m = _DELETE_RE.match(sql)
    if not m:
        return None
    where = m.group(4)
    using = None
    if m.group(2):
        using = (m.group(2), m.group(3) or m.group(2))
    return m.group(1), (where.strip() or None) if where else None, using


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on ``sep`` (a single char or keyword handled by caller) at
    paren depth 0 and outside single-quoted literals."""
    parts, depth, start, i, n = [], 0, 0, 0, len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            if c == "'":
                # '' escapes a quote inside a literal
                if i + 1 < n and text[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c == sep:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return parts


def _find_top_level_kw(text: str, kw: str) -> int:
    """Index of a depth-0 keyword outside literals, or -1."""
    depth, i, n, k = 0, 0, len(text), len(kw)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            if c == "'":
                if i + 1 < n and text[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and text[i : i + k].upper() == kw:
            before = text[i - 1] if i else " "
            after = text[i + k] if i + k < n else " "
            if not before.isalnum() and before != "_" and not after.isalnum():
                return i
        i += 1
    return -1


def parse_update(
    sql: str,
) -> tuple[str, dict[str, str], str | None, tuple[str, str] | None] | None:
    """``(table, {column: expr_sql}, where_sql | None, from_ | None)``
    or None; ``from_`` is ``(source_table, alias)`` for DuckDB's
    ``UPDATE t SET ... FROM s [AS a] WHERE ...`` join-update form.  The
    SET list splits on depth-0 commas outside literals, so expressions
    may contain function calls and quoted strings."""
    m = _UPDATE_RE.match(sql)
    if not m:
        return None
    table, tail = m.group(1), m.group(2)
    wi = _find_top_level_kw(tail, "WHERE")
    where = None
    if wi >= 0:
        where = tail[wi + 5 :].strip() or None
        tail = tail[:wi]
    from_ = None
    fi = _find_top_level_kw(tail, "FROM")
    if fi >= 0:
        fm = _FROM_CLAUSE_RE.match(tail[fi + 4 :])
        if not fm:
            raise ValueError(
                "Parser Error: UPDATE ... FROM supports a single "
                f"[aliased] table source, got: {tail[fi + 4:].strip()!r}"
            )
        from_ = (fm.group(1), fm.group(2) or fm.group(1))
        tail = tail[:fi]
    assignments: dict[str, str] = {}
    for part in _split_top_level(tail, ","):
        if "=" not in part:
            raise ValueError(f"Parser Error: malformed SET clause: {part!r}")
        col, expr = part.split("=", 1)
        assignments[col.strip().strip('"')] = expr.strip()
    return table, assignments, where, from_


def rewrite_qualified(text: str, table: str, alias: str) -> str:
    """Rewrite qualified column refs for the join-DML frames: the
    SOURCE alias's columns become their ``__src_``-prefixed names (the
    source frame is prefix-renamed before the join so no alias scoping
    is needed), and the TARGET table qualifier drops (target columns
    are unqualified in the joined frame).  Rewrites skip string
    literals/comments."""
    from data_chunk_compaction_in_duckdb_spark.settings import (
        sub_outside_literals,
    )

    text = sub_outside_literals(
        re.compile(rf"\b{re.escape(alias)}\.(\w+)"),
        lambda m: f"__src_{m.group(1)}",
        text,
    )
    return sub_outside_literals(
        re.compile(rf"\b{re.escape(table)}\.(\w+)"),
        lambda m: m.group(1),
        text,
    )

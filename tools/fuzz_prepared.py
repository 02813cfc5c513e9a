#!/usr/bin/env python
"""Differential fuzz for the PREPARE/EXECUTE path.

Takes the same dialect-common random SELECTs as
tools/fuzz_differential.py, LIFTS their integer literals into numbered
parameters, and runs ``PREPARE fz AS <sql'>; EXECUTE fz(v1, ..)`` on
BOTH engines — DuckDB's native prepared statements vs the engine's
prepared.py (marker rewrite + literal-Column binding through
Engine.sql, including the QUALIFY/star dialect rewrites).  A binding
bug (wrong marker order, type-lossy fold, literal-span miscount)
surfaces as a row/value divergence against the unparameterized
original.

Usage: python tools/fuzz_prepared.py [n_queries] [seed]
Exit 1 on any divergence.
"""

from __future__ import annotations

import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_FUZZ_SF_DIR", "/root/testdata/sf0.001")

# standalone integer literals: not part of an identifier, float, or
# string (string spans are masked before scanning)
_INT_RE = re.compile(r"(?<![\w.'])\d+(?![\w.'])")


_DATE_RE = re.compile(r"\bDATE\s+'[^']*'", re.I)
_TYPED_KEYWORD_RE = re.compile(
    r"\b(DATE|TIMESTAMP|TIME|INTERVAL)\s*$", re.I
)


def _protected_spans(sql: str) -> list[tuple[int, int]]:
    """Regions where a parameter marker would defeat the TEXTUAL
    dialect rewrites (documented engine limitation): bracket
    subscripts/slices/list literals, JSON-arrow right sides, and
    SIMILAR TO patterns all require literal text at rewrite time."""
    from data_chunk_compaction_in_duckdb_spark.dialect import (
        _literal_spans,
        _match_fwd,
        _operand_right,
    )

    lits = _literal_spans(sql)
    prot: list[tuple[int, int]] = []
    for m in re.finditer(r"\[", sql):
        if any(a <= m.start() < b for a, b in lits):
            continue
        try:
            prot.append((m.start(), _match_fwd(sql, m.start(), "[", "]")))
        except ValueError:
            prot.append((m.start(), len(sql)))
    for m in re.finditer(r"->>?|\bSIMILAR\s+TO\b", sql, re.I):
        if any(a <= m.start() < b for a, b in lits):
            continue
        try:
            prot.append((m.start(), _operand_right(sql, m.end())))
        except ValueError:
            prot.append((m.start(), len(sql)))
    return prot


def lift_parameters(
    sql: str, rng: random.Random, max_params: int = 6
) -> tuple[str, list[str]] | None:
    """Replace up to ``max_params`` randomly chosen literals — integer,
    string, or typed ``DATE '...'`` — with $1..$k markers (each
    occurrence its own parameter, DuckDB's numbered style).  Returns
    (parameterized_sql, values) or None when the query has no liftable
    literal."""
    from data_chunk_compaction_in_duckdb_spark.dialect import _literal_spans
    from data_chunk_compaction_in_duckdb_spark.prepared import _mask_literals

    masked = _mask_literals(sql)
    prot = _protected_spans(sql)

    def clear(a: int, b: int) -> bool:
        return not any(pa < b and a < pb for pa, pb in prot)

    spans = [
        (m.start(), m.end())
        for m in _INT_RE.finditer(masked)
        if clear(m.start(), m.end())
    ]
    # typed DATE literals lift whole (`DATE '...'` is one value)
    date_spans = set()
    for m in _DATE_RE.finditer(sql):
        if clear(m.start(), m.end()):
            spans.append((m.start(), m.end()))
            date_spans.add((m.start(), m.end()))
    # plain string literals (not the payload of a typed literal)
    for a, b in _literal_spans(sql):
        if sql[a] != "'" or not clear(a, b):
            continue
        if _TYPED_KEYWORD_RE.search(sql[:a].rstrip()):
            continue
        spans.append((a, b))
    spans = sorted(set(spans))
    # drop overlapping candidates (a DATE span contains its string)
    dedup: list[tuple[int, int]] = []
    for a, b in spans:
        if dedup and a < dedup[-1][1]:
            if (a, b) in date_spans:
                dedup[-1] = (a, b)
            continue
        dedup.append((a, b))
    spans = dedup
    if not spans:
        return None
    chosen = sorted(rng.sample(spans, min(len(spans), max_params)))
    out: list[str] = []
    values: list[str] = []
    last = 0
    for i, (a, b) in enumerate(chosen):
        out.append(sql[last:a])
        out.append(f"${i + 1}")
        values.append(sql[a:b])
        last = b
    out.append(sql[last:])
    return "".join(out), values


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import duckdb

    from tests.oracle_compare import _cells_equal, normalize
    from tools.fuzz_differential import TABLES, gen_query

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    from data_chunk_compaction_in_duckdb_spark.engine import Engine
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    spark = get_spark(app_name="fuzz-prepared", cpus=4, shuffle_partitions=4)
    eng = Engine(spark=spark, sf_dir=SF_DIR)

    rng = random.Random(seed)
    bad: list[tuple[str, str]] = []
    lifted = 0
    for i in range(n):
        sql = gen_query(rng)
        lift = lift_parameters(sql, rng)
        if lift is None:
            continue
        p_sql, values = lift
        lifted += 1
        args = ", ".join(values)
        try:
            duck.execute(f"PREPARE fz AS {p_sql}")
            ores = duck.execute(f"EXECUTE fz({args})")
            o_cols = [d[0] for d in ores.description]
            o_rows = [tuple(x) for x in ores.fetchall()]
            duck.execute("DEALLOCATE fz")
        except Exception as e:  # noqa: BLE001
            if "Parameter not supported" in str(e):
                # DuckDB's binder refuses parameters in GROUP BY/ORDER
                # BY positions (a DuckDB limitation — the engine's
                # binding through Spark accepts them, a documented
                # laxness); nothing to compare
                lifted -= 1
                continue
            bad.append((p_sql, f"duckdb error: {str(e)[:200]}"))
            continue
        try:
            eng.sql(f"PREPARE fz AS {p_sql}")
            sdf = eng.sql(f"EXECUTE fz({args})")
            s_cols = sdf.columns
            s_rows = [tuple(x) for x in sdf.collect()]
            eng.sql("DEALLOCATE fz")
        except Exception as e:  # noqa: BLE001
            bad.append((p_sql, f"engine error: {str(e)[:300]}"))
            continue
        sn = normalize(s_cols, s_rows)
        on = normalize(o_cols, o_rows)
        same = len(sn) == len(on) and all(
            _cells_equal(a, b) for a, b in zip(sn, on)
        )
        if not same:
            bad.append((p_sql, f"rows {len(sn)}/{len(on)} args=({args})"))
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{n}] lifted={lifted} divergences={len(bad)}")
    for sql, reason in bad:
        print(f"DIVERGENCE: {reason}\n  {sql}")
    print(
        f"done: {n} generated, {lifted} parameterized+executed, "
        f"{len(bad)} divergences"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

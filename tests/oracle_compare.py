"""Spark-vs-DuckDB result comparison, mirroring the driver's check:
sort columns by name, order-insensitive row compare, value normalization.

The driver hashes exact values, so named queries round floating-point
aggregates on BOTH sides; this harness additionally tolerates tiny float
drift (1e-9 relative) so a boundary-rounding flake shows up as a clear
assertion rather than a hash mismatch.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return out


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        # The driver value-hashes exactly, so floats must match exactly —
        # queries are responsible for making both engines produce
        # bit-identical doubles (integer arithmetic for money sums,
        # rounding elsewhere).  NaN counts as equal to NaN.
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        return fa == fb or (math.isnan(fa) and math.isnan(fb))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def assert_query_matches_oracle(spark, duck, sf_dir: str, name: str) -> None:
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        assert len(s_rows) >= 0  # rows-only check (driver's weaker gate)
        return

    ores = duck.execute(q.oracle)
    o_cols = [d[0] for d in ores.description]
    o_rows = [tuple(r) for r in ores.fetchall()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column names differ — spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count differs — spark={len(s_rows)} oracle={len(o_rows)}"
    )

    sn = normalize(s_cols, s_rows)
    on = normalize(o_cols, o_rows)
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(sn, on))
        if not _cells_equal(a, b)
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )

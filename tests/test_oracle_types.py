"""Guard against driver-canonicalization hash flakes from engine type
divergence: DuckDB widens integer SUMs to HUGEINT (int128) while Spark
stays LongType, and the round driver may render the two differently even
when values agree (round-2 `curriculum_quality_tiers` red row).  Every
oracle must therefore pin integer aggregates with CAST(... AS BIGINT).

This test compiles every registered oracle in DuckDB (no execution
beyond planning — LIMIT 0) and fails if any output column is HUGEINT.
"""

from __future__ import annotations

import pytest


def _oracle_types(duck, sql):
    rel = duck.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def test_no_oracle_returns_hugeint(duck):
    import __spark_entry__ as E

    offenders = {}
    for name, sql in E.oracle_sql().items():
        try:
            cols = _oracle_types(duck, sql)
        except Exception as exc:  # pragma: no cover - oracle must compile
            pytest.fail(f"oracle for {name} failed to compile: {exc}")
        hug = [c for c, t in cols if "HUGEINT" in t.upper()]
        if hug:
            offenders[name] = hug
    assert not offenders, (
        "oracles returning HUGEINT columns (wrap with CAST(... AS BIGINT) "
        f"on both engines): {offenders}"
    )

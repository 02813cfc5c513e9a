"""Registry-wide output-schema gate.

The round driver's correctness canon (pandas ``sort_values`` + value
hashing) is STRICTER than tools/driver_sim's value canon: it crashes on
Array/Map/Struct cells (unhashable lists) and hash-mismatches Spark
DecimalType against DuckDB DOUBLE even when the values agree — the two
round-6 red rows (``fn_list_extended`` ERR, ``h2o_group_q05`` hash-fail)
were exactly this class, and they sailed through three scale factors of
sim sweeps because the sim's ``_cell`` silently coerces.

This test pins the WHOLE registry driver-canon-safe: every registered
query must build (lazy — no execution, no oracle) to a schema with only
scalar, non-decimal output columns.  New queries that ship a raw list
or a ``BIGINT / 100.0`` decimal fail here, in CI time, instead of in
the next round's CORRECTNESS file.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import risky_fields  # noqa: E402


# slow profile (full-registry lazy schema sweep, 83 s single test) — deep-verification layer, excluded from the
# default CI selection (pytest.ini); run with -m "" / -m slow
import pytest as _pytest

pytestmark = _pytest.mark.slow

def _entry():
    import __spark_entry__ as E

    return E


def test_every_registered_query_is_driver_canon_safe(spark, sf_dir):
    E = _entry()
    qs = E.queries()
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report all, fail once
            errs[name] = f"{type(exc).__name__}: {exc}"
            continue
        fields = risky_fields(df.schema)
        if fields:
            bad[name] = fields
    assert not errs, f"queries failed to BUILD: {errs}"
    assert not bad, (
        "driver-canon-risky output schemas (Decimal/Array/Map/Struct) — "
        f"serialize or cast these columns on both sides: {bad}"
    )

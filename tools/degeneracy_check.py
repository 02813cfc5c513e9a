#!/usr/bin/env python
"""Degenerate-query detector: flags registry oracles whose result is
empty or a single all-NULL/zero row on the fixture data.

A query that passes the driver's hash gate with an empty result verifies
nothing — historically this hid constants that don't exist in the
synthetic fixture (nation names like FRANCE, part types like BRASS,
year 1994 predicates before the data starts).  Run after adding queries;
the only expected hits are the intentional empty-input edge queries.

Usage: python tools/degeneracy_check.py [sf_dir]   (DuckDB only, fast)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED = {"edge_empty_input_aggregates", "edge_grouped_empty_is_empty"}
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    import duckdb

    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        try:
            rows = con.execute(q.oracle).fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {str(exc)[:100]}")
            bad.append(name)
            continue
        degen = len(rows) == 0 or (
            len(rows) == 1 and all(v in (None, 0, 0.0) for v in rows[0])
        )
        if degen and name not in EXPECTED:
            print(f"DEGEN {name}: {rows[:1]}")
            bad.append(name)
    print(f"\n{len(bad)} unexpected degenerate/erroring queries: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

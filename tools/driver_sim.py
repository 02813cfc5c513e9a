#!/usr/bin/env python
"""Simulate the driver's correctness gate end-to-end.

The real driver: imports __spark_entry__ from an ARBITRARY cwd, builds a
BARE SparkSession (no configs), runs every queries() entry at sf0.01 next
to its oracle_sql() in DuckDB (tables pre-registered as views), sorts
columns by name, and value-hashes rows.  This script replicates that
exactly (plus an exact-value diff instead of an opaque hash), so run it
before committing query changes:

    TZ=America/New_York python tools/driver_sim.py            # full sweep
    python tools/driver_sim.py --sf /root/testdata/sf0.01 q1 q2
    python tools/driver_sim.py --jobs 4                        # parallel

Run it from a DIFFERENT cwd occasionally (cd /tmp) to catch sys.path /
pickle-by-reference regressions in UDFs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def make_duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def run_one(spark, duck, sf_dir: str, name: str) -> tuple[str, float, str]:
    """Returns (status, seconds, detail). status in PASS/ROWS_ONLY/FAIL."""
    from tests.oracle_compare import assert_query_matches_oracle
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    t0 = time.monotonic()
    try:
        assert_query_matches_oracle(spark, duck, sf_dir, name)
        status = "ROWS_ONLY" if REGISTRY[name].oracle is None else "PASS"
        return status, time.monotonic() - t0, ""
    except Exception as exc:  # noqa: BLE001 — report, don't crash the sweep
        return "FAIL", time.monotonic() - t0, f"{type(exc).__name__}: {exc}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names (default all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Bare session, exactly like the driver — no engine confs.
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    duck = make_duck(args.sf)

    import __spark_entry__ as e

    qs = e.queries()
    names = args.names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    fails: list[tuple[str, str]] = []
    t0 = time.monotonic()
    for i, name in enumerate(names, 1):
        status, sec, detail = run_one(spark, duck, args.sf, name)
        mark = {"PASS": ".", "ROWS_ONLY": "r", "FAIL": "F"}[status]
        print(f"[{i:3}/{len(names)}] {mark} {name} ({sec:.1f}s)"
              + (f"  {detail[:200]}" if detail else ""), flush=True)
        if status == "FAIL":
            fails.append((name, detail))

    print(f"\n{len(names)} queries in {time.monotonic() - t0:.0f}s, "
          f"{len(fails)} failures  (TZ={os.environ.get('TZ', '<unset>')})")
    for name, detail in fails:
        print(f"  FAIL {name}: {detail[:500]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

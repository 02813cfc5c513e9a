#!/usr/bin/env python
"""A/B the FULL headline suite with Engine-style auto-compaction on.

VERDICT r3 asked for this before auto_compact can be recommended as a
default: the strategy-matrix bench covers the compaction operators in
isolation; this runs every bench.py headline query twice — plain, and
with every ``load_table`` handle wrapped in AutoCompactFrame (the
``Engine(auto_compact=True)`` behavior applied to the whole registry
surface) — and reports per-query and total deltas.

Monkeypatching note: query modules import ``load_table`` by name, so
the wrap swaps each queries.* module's global, not the catalog
function.  Results are unwrapped (settling any pending mark) before the
noop write so the wrapper's compaction actually executes.

Usage: python tools/auto_compact_suite_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import importlib
    import pkgutil

    from bench import HEADLINE
    from data_chunk_compaction_in_duckdb_spark import queries as qpkg
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.compaction.auto import (
        AutoCompactFrame,
        unwrap,
    )
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    def wrapped_load_table(spark, sf, name):
        return AutoCompactFrame(load_table(spark, sf, name))

    qmods = [
        importlib.import_module(f"{qpkg.__name__}.{m.name}")
        for m in pkgutil.iter_modules(qpkg.__path__)
    ]

    def set_loader(fn) -> None:
        for mod in qmods:
            if hasattr(mod, "load_table"):
                mod.load_table = fn

    spark = get_spark(app_name="auto-compact-suite")
    try:
        out: dict[str, dict[str, float]] = {}
        for mode, loader in (("plain", load_table), ("auto", wrapped_load_table)):
            set_loader(loader)
            for name in HEADLINE:
                builder = REGISTRY[name].builder

                def run() -> float:
                    t0 = time.monotonic()
                    df = unwrap(builder(spark, sf_dir))
                    df.write.format("noop").mode("overwrite").save()
                    return time.monotonic() - t0

                run()  # warm-up
                med = statistics.median(run() for _ in range(reps))
                out.setdefault(name, {})[mode] = round(med, 4)
        set_loader(load_table)
        tot_plain = round(sum(v["plain"] for v in out.values()), 4)
        tot_auto = round(sum(v["auto"] for v in out.values()), 4)
        worst = sorted(
            out.items(), key=lambda kv: kv[1]["auto"] - kv[1]["plain"]
        )[-5:]
        print(json.dumps({
            "sf_dir": sf_dir,
            "reps": reps,
            "total_plain_s": tot_plain,
            "total_auto_s": tot_auto,
            "ratio": round(tot_auto / tot_plain, 4),
            "worst_5_abs_delta": {
                k: round(v["auto"] - v["plain"], 4) for k, v in worst
            },
            "queries": out,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

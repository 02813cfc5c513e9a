#!/usr/bin/env python
"""Interleaved A/B of shared-subtree materialization strategies
(VERDICT r9 item 1): for each query, time the noop-sink action under

  ckpt    — the code as written (localCheckpoint(eager=True) sites)
  lazyck  — localCheckpoint(eager=False): no separate blocking job; the
            checkpoint materializes inside the first consuming job
  persist — persist() instead of checkpoint: lazy cache, keeps lineage
            (scale-safe), both consumers share one computation
  none    — localCheckpoint is an identity: Spark plans the duplicated
            subtree and AQE exchange reuse does what it can

Variants are interleaved rep-by-rep in ONE session (drift hits every
variant equally — the round-9 noise protocol).  The variant is applied
by monkeypatching DataFrame.localCheckpoint before the builder runs, so
the query code itself is untouched and every variant builds from the
same source.  After each persist-variant rep the cache is cleared so no
cross-rep reuse survives.

Usage: python tools/ab_materialize.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "tpch_q2_official",
    "tpch_q11_official",
    "ldbc_bi10",
    "tpcds_q70_rank_pruned_rollup",
]


def main() -> None:
    from pyspark.sql import DataFrame

    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 5
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    orig_ckpt = DataFrame.localCheckpoint

    all_variants = {
        "ckpt": lambda: setattr(DataFrame, "localCheckpoint", orig_ckpt),
        "lazyck": lambda: setattr(
            DataFrame,
            "localCheckpoint",
            lambda self, eager=True: orig_ckpt(self, eager=False),
        ),
        "persist": lambda: setattr(
            DataFrame,
            "localCheckpoint",
            lambda self, eager=True: self.persist(),
        ),
        "none": lambda: setattr(
            DataFrame, "localCheckpoint", lambda self, eager=True: self
        ),
    }
    sel = os.environ.get("SPARK_GRAFT_AB_VARIANTS")
    variants = (
        {k: all_variants[k] for k in sel.split(",")} if sel else all_variants
    )

    spark = get_spark(app_name="ab_materialize")
    times: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in variants} for n in names
    }
    try:
        for name in names:
            builder = REGISTRY[name].builder
            # one warm-up per variant (JIT, python workers, broadcast)
            for vtag, apply in variants.items():
                apply()
                df = builder(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()
            for rep in range(reps):
                for vtag, apply in variants.items():
                    apply()
                    t0 = time.monotonic()
                    df = builder(spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    times[name][vtag].append(time.monotonic() - t0)
                    spark.catalog.clearCache()
            DataFrame.localCheckpoint = orig_ckpt
            row = {
                v: {
                    "med": round(statistics.median(ts), 4),
                    "min": round(min(ts), 4),
                    "max": round(max(ts), 4),
                }
                for v, ts in times[name].items()
            }
            print(json.dumps({"query": name, "reps": reps, **row}), flush=True)
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        spark.stop()


if __name__ == "__main__":
    main()

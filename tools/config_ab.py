#!/usr/bin/env python
"""Config A/B harness (guide §1.2 step 3): times the headline queries
under candidate SparkSession configurations, one fresh session per
variant, same methodology as bench.py (1 warm-up + N reps via the noop
sink).  Variants are measured in one process sequence on the same box so
run-to-run drift hits every variant equally; the BASE variant runs first
and last to bound drift.

Usage: python tools/config_ab.py [variant ...]   (default: all)
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
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "shj": {
        # guide §3.1: allow shuffled-hash join instead of sort-merge when
        # the per-partition build side fits; AQE conversion threshold
        # matched to the advisory partition size.
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
    "udf_arrow": {
        # guide §4.3: Arrow serialization for scalar Python UDFs.
        "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    },
    "agg_pushdown": {
        # parquet footer statistics answer COUNT/MIN/MAX scans.
        "spark.sql.parquet.aggregatePushdown": "true",
    },
    "scan_split": {
        # finer parquet splits so a 10 MB single-file scan parallelizes
        # (openCost floors split size at 4 MB by default → 3 tasks).
        "spark.sql.files.openCostInBytes": str(512 * 1024),
        "spark.sql.files.minPartitionNum": os.environ.get(
            "SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)
        ),
    },
    "all": {},  # filled below
}
for _k, _v in list(VARIANTS.items()):
    if _k not in ("base", "all"):
        VARIANTS["all"].update(_v)


def run_variant(tag: str, conf: dict[str, str], names: list[str]) -> dict:
    from data_chunk_compaction_in_duckdb_spark import catalog
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    catalog._TABLE_MEMO.clear()
    catalog._REGISTERED.clear()
    spark = get_spark(app_name=f"config_ab_{tag}", extra_conf=conf)
    results = {}
    try:
        for name in names:
            builder = REGISTRY[name].builder

            def run() -> float:
                t0 = time.monotonic()
                df = builder(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                return time.monotonic() - t0

            run()
            times = [run() for _ in range(REPS)]
            results[name] = round(min(times), 4)
    finally:
        spark.stop()
    total = round(sum(results.values()), 3)
    print(json.dumps({"variant": tag, "total_min": total, "queries": results}), flush=True)
    return results


def main() -> None:
    import bench as bench_mod

    names = list(bench_mod.HEADLINE)
    which = sys.argv[1:] or list(VARIANTS)
    for tag in which:
        run_variant(tag, VARIANTS[tag], names)


if __name__ == "__main__":
    main()

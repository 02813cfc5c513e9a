#!/usr/bin/env python
"""Suite-level benchmark — the reference's full-suite runs (TPC-H 22,
TPC-DS 99, JOB 113 via run_bench.py) as one tool: times every registry
query whose name matches the chosen suite prefix and prints one JSON
line with per-query medians and the suite total.

Usage:
  python tools/suite_bench.py tpch          # tpch_q1..q22
  python tools/suite_bench.py tpcds         # all DS shapes
  python tools/suite_bench.py job           # all JOB shapes
  SPARK_GRAFT_SF_DIR=... overrides the data directory (default sf0.1).
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
REPS = 3
PREFIXES = {
    "tpch": ("tpch_",),
    "tpcds": ("tpcds_",),
    "job": ("job_like_",),
    "clickbench": ("clickbench_",),
    "h2oai": ("h2o_",),
    "trainbenchmark": ("tb_",),
    "ldbc": ("ldbc_",),
    # the LLM-data-pipeline pillar: dedup, similarity, text analysis,
    # multimodal, mixing/selection, packing, contamination, FTS
    "llm": (
        "dedup_",
        "sim_",
        "text_",
        "multimodal_",
        "mix_",
        "select_",
        "pipeline_",
        "embed_",
        "contamination_",
        "quality_",
        "curriculum_",
        "sample_stratified",
        "fts_",
    ),
}


def main() -> None:
    suite = sys.argv[1] if len(sys.argv) > 1 else "tpch"
    prefixes = PREFIXES[suite]

    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    names = [n for n in REGISTRY if n.startswith(prefixes)]
    spark = get_spark(app_name=f"suite-bench-{suite}")
    try:
        results: dict[str, float] = {}
        for name in names:
            builder = REGISTRY[name].builder

            def run() -> float:
                t0 = time.monotonic()
                builder(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.monotonic() - t0

            run()  # warm-up
            results[name] = round(
                statistics.median(run() for _ in range(REPS)), 4
            )
        print(
            json.dumps(
                {
                    "metric": f"{suite}_suite_total_wall_sec",
                    "value": round(sum(results.values()), 4),
                    "unit": "sec",
                    "n_queries": len(results),
                    "queries": results,
                    "sf_dir": SF_DIR,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

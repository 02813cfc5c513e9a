#!/usr/bin/env python
"""Plan-cost report over the JOB-shaped corpus — the analog of the
reference's `benchmark/imdb_plan_cost` harness (imdb_main.cpp:63-76),
which records per-operator cost for each JOB query so join-order quality
is observable.  For every query in the job_like / job_variants modules
this runs the query at $SPARK_GRAFT_SF_DIR (default sf0.01), and emits
one JSON line per query with:

- wall seconds (median of 3 after 1 warm-up, the reference's convention)
- static plan shape: exchange count, join strategies
- executed-plan join row factors (output/input — the row-level analog of
  the paper's chunk factor)
- the fragmentation report: joins whose row factor falls below the
  compaction threshold, i.e. where the reference would compact

Usage: python tools/job_plan_report.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from data_chunk_compaction_in_duckdb_spark.compaction.profiler import (
        fragmentation_report,
    )
    from data_chunk_compaction_in_duckdb_spark.plans import (
        count_exchanges,
        join_strategies,
    )
    from data_chunk_compaction_in_duckdb_spark.plans.metrics import (
        join_row_factors,
    )
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        job_like,
        job_variants,
    )
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    from data_chunk_compaction_in_duckdb_spark.queries import (
        job_variants2,
        job_variants3,
        job_variants4,
    )

    mods = {
        job_like.__name__,
        job_variants.__name__,
        job_variants2.__name__,
        job_variants3.__name__,
        job_variants4.__name__,
    }
    names = [n for n, q in REGISTRY.items() if q.builder.__module__ in mods]
    spark = get_spark(app_name="job-plan-report")

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sink = open(out_path, "w") if out_path else sys.stdout
    try:
        for name in names:
            builder = REGISTRY[name].builder

            def run() -> float:
                t0 = time.monotonic()
                builder(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.monotonic() - t0

            run()  # warm-up
            secs = round(statistics.median(run() for _ in range(3)), 4)
            df = builder(spark, SF_DIR)
            rec = {
                "query": name,
                "sec": secs,
                "exchanges": count_exchanges(df),
                "join_strategies": join_strategies(df),
                "join_row_factors": join_row_factors(df),
                "compact_here": fragmentation_report(df),
            }
            print(json.dumps(rec), file=sink, flush=True)
    finally:
        if out_path:
            sink.close()
        spark.stop()


if __name__ == "__main__":
    main()

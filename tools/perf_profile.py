#!/usr/bin/env python
"""Round-9 optimization profiler (guide §1): for each headline query,
capture `.explain("formatted")` to plans/r09/<name>_<tag>.txt and
measure, over the same noop-sink action bench.py times:

- wall seconds (1 warm-up + N timed reps, min + median)
- Spark jobs / stages / tasks launched per run (status tracker deltas)
- plan shape counters: Exchange count, join strategies, Python
  evaluation nodes (BatchEvalPython / ArrowEvalPython / MapInPandas /
  MapInArrow / FlatMapGroupsInArrow), scan count

Usage:
  python tools/perf_profile.py [tag] [names...]
  tag defaults to "before"; names default to bench.py's HEADLINE list.
Emits one JSON line per query to stdout and a summary at the end.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")
)
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "5"))

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInArrow",
    "FlatMapCoGroupsInPandas",
    "FlatMapCoGroupsInArrow",
)


def plan_shape(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct)\w*)", plan))
        ),
        "py_nodes": {n: plan.count(n) for n in PY_NODES if n in plan},
        "scans": len(re.findall(r"Scan parquet", plan)),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> None:
    args = sys.argv[1:]
    tag = args[0] if args else "before"
    names = args[1:]

    sys.path.insert(0, REPO)
    import bench as bench_mod

    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    if not names:
        names = list(bench_mod.HEADLINE)

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name=f"perf_profile_{tag}")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out_rows = []
    try:
        for name in names:
            builder = REGISTRY[name].builder
            sc.setJobDescription(f"profile:{name}")

            # -- plan capture (lazy; includes AQE initial plan)
            t0 = time.monotonic()
            df = builder(spark, SF_DIR)
            t_build = time.monotonic() - t0
            t0 = time.monotonic()
            df._jdf.queryExecution().executedPlan()
            t_plan = time.monotonic() - t0
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)

            def run() -> float:
                t0 = time.monotonic()
                d = builder(spark, SF_DIR)
                d.write.format("noop").mode("overwrite").save()
                return time.monotonic() - t0

            run()  # warm-up
            j0 = tracker.getJobIdsForGroup(None)
            n_jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t_warm2 = run()
            jobs_after = sc.statusTracker().getJobIdsForGroup(None) or []
            jobs_per_run = len(jobs_after) - n_jobs_before
            stages = 0
            tasks = 0
            for jid in jobs_after[n_jobs_before:] if n_jobs_before else jobs_after:
                ji = tracker.getJobInfo(jid)
                if ji:
                    stages += len(ji.stageIds)
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si:
                            tasks += si.numTasks

            times = [t_warm2] + [run() for _ in range(REPS - 1)]
            row = {
                "name": name,
                "min": round(min(times), 4),
                "median": round(statistics.median(times), 4),
                "build_s": round(t_build, 4),
                "plan_s": round(t_plan, 4),
                "jobs": jobs_per_run,
                "stages": stages,
                "tasks": tasks,
                **plan_shape(plan),
            }
            out_rows.append(row)
            print(json.dumps(row), flush=True)
            sc.setJobDescription(None)
        total_min = round(sum(r["min"] for r in out_rows), 3)
        total_med = round(sum(r["median"] for r in out_rows), 3)
        print(
            json.dumps(
                {
                    "summary": True,
                    "tag": tag,
                    "n": len(out_rows),
                    "total_min": total_min,
                    "total_median": total_med,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

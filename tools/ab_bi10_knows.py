#!/usr/bin/env python
"""Interleaved A/B for ldbc_bi10 (r10, second pass): per-hop frontier
broadcast (current) vs ONE knows broadcast reused by all four hop joins.

The current form pays one sequential BroadcastExchange build job per hop
(the hop-k frontier subtree chains through hops 1..k-1), four jobs on
the critical path.  Broadcasting the (checkpointed) knows edge table
once lets the four BroadcastHashJoins share a single build via
ReusedExchange — one job — and the whole BFS becomes map-side work until
the group-min shuffle.  Only sound when knows is broadcast-sized, so the
real builder must gate it on the plan-estimated size.

Usage: python tools/ab_bi10_knows.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def new_builder(spark, sf_dir):
    """knows broadcast once, reused across hops."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.queries.ldbc_like import (
        _BI10_HOPS,
        _BI10_TAIL,
        _SNB_SPARK,
        register_views,
    )

    register_views(spark, sf_dir)
    knows = spark.sql(
        f"WITH {_SNB_SPARK} SELECT k_person1id, k_person2id FROM snb_knows"
    ).localCheckpoint(eager=False)
    kb = F.broadcast(knows)
    frontier = spark.sql(
        f"WITH {_SNB_SPARK} SELECT p_personid AS friend FROM snb_person "
        "WHERE p_personid = 42"
    )
    levels = [frontier.select(F.lit(0).alias("hopCount"), "friend")]
    for hop in range(1, _BI10_HOPS + 1):
        frontier = frontier.join(
            kb, frontier["friend"] == kb["k_person1id"]
        ).select(F.col("k_person2id").alias("friend"))
        levels.append(
            frontier.select(F.lit(hop).alias("hopCount"), "friend")
        )
    u = levels[0]
    for lv in levels[1:]:
        u = u.unionByName(lv)
    shortest = u.groupBy("friend").agg(F.min("hopCount").alias("hopCount"))
    shortest.createOrReplaceTempView("__ldbc_bi10_friends_shortest")
    return spark.sql(f"WITH {_SNB_SPARK},\n{_BI10_TAIL}")


def old_builder(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        REGISTRY,
    )

    return REGISTRY["ldbc_bi10"].builder(spark, sf_dir)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    spark = get_spark(app_name="ab_bi10_knows")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(builder):
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        df = builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        return dt

    # warm-ups, both variants
    run(old_builder)
    run(new_builder)
    olds, news = [], []
    for i in range(reps):
        olds.append(run(old_builder))
        news.append(run(new_builder))
        print(
            f"rep {i}: old {olds[-1]:.3f}  new {news[-1]:.3f}", flush=True
        )
    print(
        f"old med {statistics.median(olds):.3f} min {min(olds):.3f} | "
        f"new med {statistics.median(news):.3f} min {min(news):.3f}"
    )
    # sanity: same result multiset
    a = old_builder(spark, SF_DIR)
    b = new_builder(spark, SF_DIR)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        "variant results differ"
    )
    print("results identical (multiset)")
    spark.stop()


if __name__ == "__main__":
    main()

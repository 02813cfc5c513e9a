#!/usr/bin/env python
"""Interleaved old-vs-new A/B for ldbc_bi10 (r10): the r9 form (per-level
DISTINCT frontier + eager knows checkpoint) against the r10 form (walk
enumeration, one group-min, lazy checkpoint).  Both variants run in ONE
session, reps alternating, so host drift hits both sides equally.

Usage: python tools/ab_bi10.py [reps]
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


def old_builder(spark, sf_dir):
    """r9 bi10 builder, verbatim (git db4b762)."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.queries.ldbc_like import (
        _BI10_TAIL,
        _SNB,
        register_views,
    )

    register_views(spark, sf_dir)
    knows = spark.sql(
        f"WITH {_SNB} SELECT k_person1id, k_person2id FROM snb_knows"
    ).localCheckpoint(eager=True)
    frontier = spark.sql(
        f"WITH {_SNB} SELECT p_personid AS friend FROM snb_person "
        "WHERE p_personid = 42"
    )
    levels = [frontier.select(F.lit(0).alias("hopCount"), "friend")]
    for hop in range(1, 5):
        frontier = (
            F.broadcast(frontier)
            .join(knows, frontier["friend"] == knows["k_person1id"])
            .select(F.col("k_person2id").alias("friend"))
            .distinct()
        )
        levels.append(
            frontier.select(F.lit(hop).alias("hopCount"), "friend")
        )
    u = levels[0]
    for lv in levels[1:]:
        u = u.unionByName(lv)
    shortest = u.groupBy("friend").agg(F.min("hopCount").alias("hopCount"))
    shortest.createOrReplaceTempView("__ldbc_bi10_friends_shortest")
    return spark.sql(f"WITH {_SNB},\n{_BI10_TAIL}")


def main() -> None:
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    new_builder = REGISTRY["ldbc_bi10"].builder
    variants = {"old": old_builder, "new": new_builder}

    spark = get_spark(app_name="ab_bi10")
    times = {v: [] for v in variants}
    try:
        for v, b in variants.items():  # warm-up each
            b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for v, b in variants.items():
                t0 = time.monotonic()
                b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times[v].append(time.monotonic() - t0)
        print(
            json.dumps(
                {
                    v: {
                        "med": round(statistics.median(ts), 4),
                        "min": round(min(ts), 4),
                        "max": round(max(ts), 4),
                    }
                    for v, ts in times.items()
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

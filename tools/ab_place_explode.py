#!/usr/bin/env python
"""Interleaved A/B for the snb_place derivation (r10 second pass):
`nation CROSS JOIN (10-row UNION ALL) d` (a BroadcastNestedLoopJoin
with its own broadcast-build job per reference) vs
`nation LATERAL VIEW explode(sequence(0, 9))` (a Generate node — no
join, no broadcast build).  Value-identical by construction (the same
ten digits).  Measured on ldbc_bi10 (two snb_place references) and
ldbc_bi14 (four).

Usage: python tools/ab_place_explode.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CROSS = """FROM nation CROSS JOIN (
    SELECT 0 AS d UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL
    SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL
    SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL SELECT 9) d)"""
_EXPLODE = "FROM nation LATERAL VIEW explode(sequence(0, 9)) d AS d)"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import data_chunk_compaction_in_duckdb_spark.queries.ldbc_like as L
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        REGISTRY,
    )
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    old_snb = L._SNB_SPARK
    assert _CROSS in old_snb
    new_snb = old_snb.replace(_CROSS, _EXPLODE, 1)

    spark = get_spark(app_name="ab_place_explode")

    bi14_body = L._QUERIES["ldbc_bi14"][2]

    def build(name, snb):
        # bi10's builder reads the module global at call time; bi14's
        # generic builder bound its SQL at registration, so rebuild it
        # from the recorded body.
        if name == "ldbc_bi10":
            L._SNB_SPARK = snb
            return REGISTRY[name].builder(spark, SF_DIR)
        L.register_views(spark, SF_DIR)
        return spark.sql(f"WITH {snb},\n{bi14_body}")

    def run(name, snb):
        t0 = time.monotonic()
        df = build(name, snb)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name in ("ldbc_bi10", "ldbc_bi14"):
        run(name, old_snb)
        run(name, new_snb)
        olds, news = [], []
        for i in range(reps):
            olds.append(run(name, old_snb))
            news.append(run(name, new_snb))
        print(
            f"{name}: old med {statistics.median(olds):.3f} "
            f"min {min(olds):.3f} | new med {statistics.median(news):.3f} "
            f"min {min(news):.3f}",
            flush=True,
        )
        # result equality (multiset)
        a = build(name, old_snb)
        b = build(name, new_snb)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        print(f"{name}: results identical (multiset)", flush=True)
    L._SNB_SPARK = old_snb
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bucketed-layout join benchmark — evidence for the co-located-join
path (reference radix co-partitioning, physical_hash_join.cpp:399-418;
Spark analog: hash-bucketed storage via sources.write_bucketed).

Builds bucketed+sorted copies of lineitem and orders on the join key,
then times the fact-fact join + aggregate both ways and counts
join-side exchanges.  At sf0.1 the absolute win is modest (one shuffle
of ~600k rows); the point is the PLAN: the bucketed join must show zero
join-side exchanges, which is what converts every recurring fact-fact
join at 100 TB from a full network shuffle into a per-bucket local zip.

Prints one JSON line.  Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bucketed_join_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.plans import count_exchanges
    from data_chunk_compaction_in_duckdb_spark.session import get_spark
    from data_chunk_compaction_in_duckdb_spark.sources import write_bucketed

    spark = get_spark(app_name="bucketed-join-bench")
    tmp = tempfile.mkdtemp(prefix="bucketed_bench_")

    def agg(j):
        return j.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )

    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        write_bucketed(
            li, "li_b", os.path.join(tmp, "li"), "l_orderkey", n_buckets=16
        )
        write_bucketed(
            o, "o_b", os.path.join(tmp, "o"), "o_orderkey", n_buckets=16
        )
        li_b = spark.table("li_b")
        o_b = spark.table("o_b")

        plain_join = agg(li.join(o, li.l_orderkey == o.o_orderkey))
        bucketed_join = agg(li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey))

        def run(df) -> float:
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        results = {}
        for name, df in [("plain", plain_join), ("bucketed", bucketed_join)]:
            run(df)
            results[name] = {
                "sec": round(statistics.median(run(df) for _ in range(REPS)), 4),
                "exchanges": count_exchanges(df),
            }

        a = sorted(tuple(r) for r in plain_join.collect())
        b = sorted(tuple(r) for r in bucketed_join.collect())
        assert a == b, "bucketed layout changed results"

        print(
            json.dumps(
                {
                    "metric": "bucketed_vs_plain_fact_join",
                    "sf_dir": SF_DIR,
                    "n_buckets": 16,
                    **results,
                    "rows_identical": True,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

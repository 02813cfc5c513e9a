#!/usr/bin/env python
"""Interleaved A/B: Arrow gram-assembly kernel vs the interpreted
HOF-expression path on the n-gram query paths (r10, guide §4.2).
Variants alternate in ONE session; the expr variant is produced by
monkeypatching pipeline.text.exploded_word_ngrams back to
explode(word_ngrams(...)).

Usage: python tools/ab_ngrams.py [reps] [query ...]
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

DEFAULT = [
    "contamination_ngram_overlap",
    "dedup_repeated_ngram_spans",
    "text_duplicate_gram_fraction",
]


def main() -> None:
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.pipeline import text as text_mod
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 7
    names = [a for a in sys.argv[1:] if not a.isdigit()] or DEFAULT

    import functools

    from data_chunk_compaction_in_duckdb_spark import pipeline as pipe_mod
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        dedup as dedup_mod,
    )

    _ = F  # tokenization stays in the wrapped pipeline functions
    orig = {
        "contam": text_mod.ngram_contamination,
        "spans": dedup_mod.repeated_ngram_spans,
    }

    def apply(kernel: str) -> None:
        text_mod.ngram_contamination = functools.partial(
            orig["contam"], kernel=kernel
        )
        spans = functools.partial(orig["spans"], kernel=kernel)
        dedup_mod.repeated_ngram_spans = spans
        pipe_mod.repeated_ngram_spans = spans

    variants = ("expr", "arrow")
    spark = get_spark(app_name="ab_ngrams")
    try:
        for name in names:
            builder = REGISTRY[name].builder
            times = {v: [] for v in variants}
            for v in variants:  # warm-up
                apply(v)
                builder(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            for _ in range(reps):
                for v in variants:
                    apply(v)
                    t0 = time.monotonic()
                    builder(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times[v].append(time.monotonic() - t0)
            print(
                json.dumps(
                    {
                        "query": name,
                        "reps": reps,
                        **{
                            v: {
                                "med": round(statistics.median(ts), 4),
                                "min": round(min(ts), 4),
                                "max": round(max(ts), 4),
                            }
                            for v, ts in times.items()
                        },
                    }
                ),
                flush=True,
            )
    finally:
        text_mod.ngram_contamination = orig["contam"]
        dedup_mod.repeated_ngram_spans = orig["spans"]
        pipe_mod.repeated_ngram_spans = orig["spans"]
        spark.stop()


if __name__ == "__main__":
    main()

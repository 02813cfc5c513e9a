"""Closed-loop learned compaction: measure → reward → adapt.

The reference wires CompactTuner into operator execution (GetChunk calls
SelectCompactThreshold, then feedback with observed time —
negative_feedback.hpp:166-261).  Spark's unit of adaptivity is a stage,
so the loop here wraps a named pipeline stage: pick a target partition
size from the bandit, compact to it, run the stage's action, feed
rows/second back.

This is the experimental layer (SURVEY.md §0.1: "not needed for
correctness"): AQE's advisory size covers the static case; the tuner
earns its keep on recurring pipelines (the same ETL run hourly) where a
learned per-stage target beats one global advisory setting.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from data_chunk_compaction_in_duckdb_spark.compaction.compact import compact
from data_chunk_compaction_in_duckdb_spark.compaction.tuner import CompactTuner


def run_stage_tuned(
    df: DataFrame,
    stage: str,
    tuner: CompactTuner,
    action: Callable[[DataFrame], int] | None = None,
) -> tuple[int, float]:
    """Run one tuned iteration of a recurring stage.

    Picks the compaction target from the stage's bandit, compacts, runs
    ``action`` (default: noop-sink write returning the row count via
    count), and feeds back throughput (rows/sec).  Returns (rows,
    elapsed_sec)."""
    target = tuner.suggest(stage)
    compacted = compact(df, target_rows=target)
    t0 = time.monotonic()
    if action is not None:
        rows = action(compacted)
    else:
        rows = compacted.count()
    elapsed = max(time.monotonic() - t0, 1e-6)
    tuner.observe(stage, rows / elapsed)
    return rows, elapsed

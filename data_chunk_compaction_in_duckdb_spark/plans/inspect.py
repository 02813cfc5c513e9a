"""Physical-plan inspection helpers.

The reference exposes its execution shape through EXPLAIN ANALYZE +
profilers (imdb_main.cpp:70-76 harvests chunk factors from it); Spark's
equivalent is the executed-plan string.  These helpers parse it so tests
can assert the *plan*, not just the result: filters pushed to the scan,
dimensions broadcast, no stray shuffles, wide whole-stage-codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (each is a full
    network + disk round of the data — the scale-limiting operator)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in plan order (BroadcastHashJoin / SortMergeJoin /
    ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct)."""
    plan = explain_str(df, "simple")
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )


def has_filter_pushdown(df: DataFrame, column: str) -> bool:
    """True if `column` appears in the scan's PushedFilters — the
    reference's table_filters / zone-map pruning analog
    (logical_get.cpp:31)."""
    plan = explain_str(df, "formatted")
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if column in m.group(1):
            return True
    return False


def count_codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — fewer/wider spans mean more
    of the query runs as fused JVM loops (the analog of the reference's
    vectorized operator chains staying in-register).  Uses explain's
    codegen mode.  Caveat: under AQE the unexecuted plan often reports 0
    — treat a positive count as meaningful, 0 as unknown."""
    plan = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0

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


def bnlj_build_scans(df: DataFrame) -> list[list[str]]:
    """For each BroadcastNestedLoopJoin in the physical plan, the leaf
    scan descriptions under its BROADCAST (build) side.

    The iterative/graph queries (recursive BFS frontiers, transitive-
    closure rounds) legitimately plan BNLJ — but only while the build
    side is the bounded frontier/model relation.  A regression that
    flips the build side onto a fact scan turns an O(frontier) probe
    into an O(data²) disaster at scale; tests assert no fixture fact
    file appears in any build subtree.
    """

    def leaves(node, out: list[str]) -> None:
        try:
            ch = node.children()
            n = ch.size()
        except Exception:  # noqa: BLE001 - py4j node without children()
            n = 0
        if n == 0:
            out.append(node.simpleString(200))
            return
        for i in range(n):
            leaves(ch.apply(i), out)

    found: list[list[str]] = []

    def walk(node) -> None:
        name = node.nodeName()
        if "BroadcastNestedLoopJoin" in name:
            side = str(node.buildSide())
            ch = node.children()
            build = ch.apply(0) if "BuildLeft" in side else ch.apply(1)
            acc: list[str] = []
            leaves(build, acc)
            found.append(acc)
        try:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
        except Exception:  # noqa: BLE001
            pass

    walk(df._jdf.queryExecution().sparkPlan())
    return found

"""Executed-plan runtime metrics — the EXPLAIN ANALYZE analog.

The reference instruments operators with chunk-count/chunk-size profilers
and a per-join **chunk factor** (input-chunks ÷ output-chunks,
`src/include/duckdb/common/profiler.hpp:335-432`, HashJoinProfiler at
`:366-369`).  Spark already meters every physical operator with SQL
metrics; this module executes a DataFrame and walks the final adaptive
plan to surface them: per-operator `numOutputRows`, and a per-join **row
factor** (output rows ÷ input rows — the row-level analog of chunk
factor, since Spark's codegen streams don't fragment into chunks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class OpMetric:
    depth: int
    name: str
    rows: int | None  # numOutputRows, None if the node has no row metric


def _walk(node, depth: int, out: list[OpMetric]) -> None:
    rows = None
    try:
        mm = node.metrics()
        it = mm.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                rows = kv._2().value()
    except Exception:  # noqa: BLE001 - py4j: node exposes no metrics map
        pass
    out.append(OpMetric(depth, node.nodeName(), rows))
    # AQE wrapper nodes (AdaptiveSparkPlan / query stages / codegen)
    # expose their payload through single-plan accessors, not children().
    for accessor in ("executedPlan", "plan", "child"):
        try:
            sub = getattr(node, accessor)()
            if sub is not None and hasattr(sub, "nodeName"):
                _walk(sub, depth + 1, out)
                return
        except Exception:  # noqa: BLE001
            continue
    try:
        ch = node.children()
        for i in range(ch.size()):
            _walk(ch.apply(i), depth + 1, out)
    except Exception:  # noqa: BLE001
        pass


def explain_analyze(df: DataFrame, execute: bool = True) -> list[OpMetric]:
    """Run `df` (collect, discarding rows) and return per-operator
    runtime metrics from the final AQE plan, root first.

    Metrics only exist after an action; pass execute=False if the
    DataFrame was already executed through its own queryExecution.
    """
    if execute:
        df._jdf.queryExecution().executedPlan()  # force planning
        df.collect()
    out: list[OpMetric] = []
    _walk(df._jdf.queryExecution().executedPlan(), 0, out)
    return out


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def join_row_factors(df: DataFrame, execute: bool = True) -> list[dict]:
    """Per-join row factor: output rows ÷ total input rows.

    The reference's chunk factor measures probe-output fragmentation
    (values ≪ 1 mean the join emits scattered partial chunks —
    `HashJoinProfiler`, profiler.hpp:366-369).  Row counts are Spark's
    observable equivalent: a very selective join (factor ≪ 1) is exactly
    where the reference compacts and where AQE's coalescing pays off
    downstream.
    """
    ops = explain_analyze(df, execute=execute)
    factors = []
    for i, op in enumerate(ops):
        if not any(op.name.startswith(j) for j in _JOIN_NODES):
            continue
        # The pre-order walk puts each child subtree at depth op.depth+1;
        # the join's inputs are the first metric-bearing node inside each
        # child subtree.
        inputs: list[int] = []
        pending = False  # inside a child subtree, input not yet found
        for child in ops[i + 1 :]:
            if child.depth <= op.depth:
                break
            if child.depth == op.depth + 1:
                pending = True
            if pending and child.rows is not None:
                inputs.append(child.rows)
                pending = False
        in_rows = sum(inputs)
        factors.append(
            {
                "join": op.name,
                "output_rows": op.rows,
                "input_rows": in_rows,
                "row_factor": (op.rows / in_rows) if (op.rows is not None and in_rows) else None,
            }
        )
    return factors

"""RECURSIVE_CTE (reference src/execution/operator/set/physical_recursive_cte.cpp,
207 LoC): fixed-point iteration with a working table.

Spark has no native recursive CTE; the standard pattern is a driver-side
loop that unions each step's new rows until the working set is empty.
``localCheckpoint`` truncates the lineage every iteration so the plan
doesn't grow exponentially — the Spark analog of the reference's
materialized working table.

The driver loop only orchestrates; each step is a distributed DataFrame
transformation, so per-iteration work scales with the cluster.  Iteration
count is the scaling limit (as with every BFS-on-Spark), not data size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    initial: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = True,
    max_iterations: int = 100,
) -> DataFrame:
    """Evaluate ``WITH RECURSIVE t AS (initial UNION ALL step(t)) SELECT *
    FROM t``.

    ``step`` receives the previous iteration's *new* rows (the working
    table, matching SQL recursive-CTE semantics) and returns the next
    batch; iteration stops when a step yields no rows.  With
    ``union_all=False`` rows already in the accumulator are dropped each
    round (UNION DISTINCT semantics), which also guarantees termination on
    cyclic graphs.
    """
    acc = initial.localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iterations):
        nxt = step(frontier)
        if not union_all:
            nxt = nxt.subtract(acc)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")

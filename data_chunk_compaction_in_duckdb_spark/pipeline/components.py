"""Connected components over duplicate-pair edges — the transitive-
closure stage of dedup (keep_representatives handles only direct pairs;
a→b, b→c must collapse a,b,c into one cluster).

Spark-first: iterative min-label propagation.  Each round is one join +
one map-side-combinable min aggregation; lineage is cut per round with
localCheckpoint so plans stay flat.  Rounds needed = graph diameter —
near-duplicate clusters are dense and shallow (diameter ≲ 3), so this
converges in a handful of rounds even at 100 TB where a recursive-CTE
reach-set (the oracle's approach, quadratic in cluster size) would
explode.  Analog of the reference's RECURSIVE_CTE fixed-point machinery
(src/execution/operator/set/physical_recursive_cte.cpp:1-207) applied
to the dedup use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    smallest vertex id reachable from it.  Returns ``(id, component)``.

    Each round takes the min of (a) the neighbors' labels and (b) the
    label OF the current label (pointer-doubling jump — the same
    shortcutting the SQL oracle's unrolled stages use): on a worst-case
    path graph the jump doubles the propagation horizon per round, so
    convergence is O(log n) rounds instead of O(diameter).  A
    1000-hop near-dup chain at corpus scale converges in ~10 rounds
    where plain neighbor-min propagation needs 1000.  The jump join is
    V-sized (labels against labels) — cheap next to the E-sized
    neighbor join.

    Deterministic fixed point: stops when a round changes no label; if
    ``max_iter`` rounds pass without convergence the result would be
    WRONG (components split), so it raises rather than silently
    returning partial labels — pre-doubling this path returned
    unconverged labels for any component with diameter > max_iter.
    All shuffles hash on the vertex id; the edge relation is reused
    every round, so it is persisted once."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = (
        e.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.d == labels.id)
            .groupBy("s")
            .agg(F.min("component").alias("nbr_c"))
        )
        jump = (
            labels.alias("l1")
            .join(
                labels.alias("l2"),
                F.col("l1.component") == F.col("l2.id"),
            )
            .select(
                F.col("l1.id").alias("jid"),
                F.col("l2.component").alias("jump_c"),
            )
        )
        best = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_c"), F.col("component")),
            F.coalesce(F.col("jump_c"), F.col("component")),
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.s, "left")
            .join(jump, labels.id == jump.jid, "left")
            .select(
                "id",
                best.alias("component"),
                (best < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    e.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "doubling rounds (component diameter beyond 2^max_iter?) — "
            "raising instead of returning split components"
        )
    return labels


def dedup_survivors_transitive(
    df: DataFrame, dup_pairs: DataFrame, id_col: str
) -> DataFrame:
    """Full-closure variant of keep_representatives: one survivor (the
    minimum id) per connected component of the duplicate graph."""
    comp = connected_components(dup_pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")

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

    Deterministic fixed point: stops when a round changes no label (or
    at ``max_iter``).  All shuffles hash on the vertex id; the edge
    relation is reused every round, so it is persisted once."""
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
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.d == labels.id)
            .groupBy("s")
            .agg(F.min("component").alias("nbr_c"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.s, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_c"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_c") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    e.unpersist()
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

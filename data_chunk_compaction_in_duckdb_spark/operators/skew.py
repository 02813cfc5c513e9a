"""Skew-aware join: salting for hot keys.

At 100 TB a single hot join key (null-heavy foreign keys, power-law user
ids) turns one shuffle partition into the straggler that defines job
latency.  AQE's skew-join handles sort-merge cases
(spark.sql.adaptive.skewJoin.enabled, on in session.py); salted_join is
the explicit fallback for shuffled-hash joins and for pinning behavior in
tests:

left side:  key → (key, salt = pmod(hash(row), n_salts))
right side: each row replicated n_salts times (explode), so every
            (key, salt) bucket finds its match.

Replication multiplies the right side by n_salts — use for dimension-ish
right sides or after pre-filtering hot keys only (``hot_keys`` arg salts
just those, the standard two-path plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join on ``on`` with the left side's hot keys spread over
    ``n_salts`` shuffle buckets.

    With ``hot_keys`` given, only those keys are salted (two-path plan:
    salted join for hot keys ∪ plain join for the rest); otherwise every
    key is salted and the whole right side replicates n_salts times.
    """
    if hot_keys is not None:
        hot = F.col(on).isin(*hot_keys)
        plain = left.filter(~hot | F.col(on).isNull()).join(
            right, on, how
        )
        salted = salted_join(
            left.filter(hot), right.join(
                F.broadcast(
                    left.filter(hot).select(on).distinct()
                ), on, "left_semi"
            ),
            on, n_salts, how,
        )
        return plain.unionByName(salted)

    lsalt = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rsalt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lsalt.join(rsalt, [on, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-stage skew-resistant aggregation: partial-aggregate on
    (key, salt) so a hot key spreads across ``n_salts`` reducers, then
    merge the ≤ n_salts partials per key.

    ``aggs`` maps output column → (op, input column) with op in
    sum/count/min/max — the ops whose partials merge losslessly
    (count merges by sum).  Spark's own map-side partial aggregation
    covers the combiner role; explicit salting additionally bounds the
    FINAL shuffle's per-reducer load, which matters when one key holds
    a double-digit share of all rows."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial_exprs = []
    merge_exprs = []
    for out, (op, col) in aggs.items():
        if op == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            merge_exprs.append(F.min(f"_p_{out}").alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            merge_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted agg op: {op}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_exprs)
        .groupBy(*key_cols)
        .agg(*merge_exprs)
    )

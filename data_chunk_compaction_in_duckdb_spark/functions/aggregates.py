"""Aggregate gap functions as DataFrame combinators.

The reference's holistic aggregates Spark lacks natively (registry
src/core_functions/aggregate/holistic/): mad, entropy, deterministic
mode, exact discrete quantile.  Each is built from groupBy/window
shuffles Spark plans well — two-pass where the definition requires it
(mad), single shuffle otherwise.  All scale: no collect(), no
driver-side state, group cardinality bounded by the grouping keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mad_agg(df: DataFrame, col: str, group_cols: Sequence[str]) -> DataFrame:
    """Median absolute deviation (reference mad(), function_list.cpp:223):
    median(|x - median(x)|).  Two exact-percentile passes; the per-group
    median is broadcast back via an equi-join on the grouping keys."""
    gc = list(group_cols)
    med = df.groupBy(*gc).agg(F.percentile(col, 0.5).alias("_med"))
    return (
        df.join(F.broadcast(med), gc)
        .withColumn("_absdev", F.abs(F.col(col) - F.col("_med")))
        .groupBy(*gc)
        .agg(F.percentile("_absdev", 0.5).alias("mad"))
    )


def entropy_agg(df: DataFrame, col: str, group_cols: Sequence[str]) -> DataFrame:
    """Shannon entropy in bits (reference entropy(), function_list.cpp:137):
    -Σ p·log2(p) over the value distribution of `col` per group.  One
    two-level aggregation — partial counts combine map-side first."""
    gc = list(group_cols)
    counts = df.groupBy(*gc, col).agg(F.count("*").alias("_c"))
    return (
        counts.groupBy(*gc)
        .agg(
            (
                F.log2(F.sum("_c"))
                - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
            ).alias("entropy")
        )
    )


def mode_deterministic(
    df: DataFrame, col: str, group_cols: Sequence[str]
) -> DataFrame:
    """Mode with a deterministic tie-break (smallest value wins) — the
    reference's mode() (function_list.cpp:249) leaves ties unspecified,
    which would break oracle hashing."""
    gc = list(group_cols)
    counts = df.groupBy(*gc, col).agg(F.count("*").alias("_c"))
    w = Window.partitionBy(*gc).orderBy(F.col("_c").desc(), F.col(col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*gc, F.col(col).alias("mode"))
    )


def quantile_disc(
    df: DataFrame, col: str, group_cols: Sequence[str], q: float
) -> DataFrame:
    """Exact discrete quantile (reference quantile_disc,
    function_list.cpp:263): the element at rank ceil(q*n) of the sorted
    group — always a value present in the data, no interpolation."""
    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy(F.col(col))
    wn = Window.partitionBy(*gc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rn") == F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n"))))
        .select(*gc, F.col(col).alias("quantile_disc"))
    )


def bitstring_agg(
    df: DataFrame, col: str, group_cols: Sequence[str], lo: int, hi: int
) -> DataFrame:
    """Reference bitstring_agg(x, min, max) (function_list.cpp registry;
    BIT type rendered as a '0'/'1' string): a string of length
    ``hi-lo+1`` whose i-th character (from the left, position ``lo+i``)
    is '1' iff that value occurs in the group.  Built entirely JVM-side:
    collect_set (map-side combinable) then one sequence/transform pass —
    no UDF, bounded by the domain width, independent of group size."""
    gc = list(group_cols)
    vals = df.groupBy(*gc).agg(F.collect_set(F.col(col)).alias("_vals"))
    bits = F.array_join(
        F.transform(
            F.sequence(F.lit(lo), F.lit(hi)),
            lambda b: F.when(F.array_contains("_vals", b), "1").otherwise("0"),
        ),
        "",
    )
    return vals.select(*gc, bits.alias("bitstring"))

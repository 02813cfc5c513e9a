"""Corpus mixing & budgeted selection — the data-weighting stage of a
training-data pipeline (domain reweighting, token budgets).  Both ops
are pure narrow/window transformations: mixing is a per-row hash
threshold (no shuffle at all), budgeting is one window per source.

Determinism: sampling decisions derive from the portable md5 32-bit
hash (functions/portable_hash.py), so the same row set is selected on
every engine and every run — reproducible corpus builds, and the DuckDB
oracle replays the identical selection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.functions.portable_hash import (
    hash32_expr,
)

_DENOM = 10_000


def mix_weighted_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: Mapping[str, float] | Column,
    default_rate: float = 0.0,
    key: str = "mix",
) -> DataFrame:
    """Keep each row with probability ``rates[source]`` (0..1), decided
    by a deterministic per-id hash — stratified domain reweighting.
    Rows of unlisted sources keep ``default_rate``.  Scale: a narrow
    filter, no shuffle, no state.  ``rates`` is either a literal map
    (bounded source list → broadcast map lookup) or a Column expression
    yielding the 0..1 rate per row — use the Column form when the source
    set is unbounded, so no driver-side distinct/collect is ever needed."""
    if isinstance(rates, Column):
        thresh = F.round(rates * _DENOM).cast("int")
    else:
        pairs: list[Column] = []
        for s, r in rates.items():
            pairs += [F.lit(s), F.lit(int(round(r * _DENOM)))]
        rate_map = F.create_map(*pairs)
        thresh = F.coalesce(
            rate_map[F.col(source_col)],
            F.lit(int(round(default_rate * _DENOM))),
        )
    h = hash32_expr(f"CAST({id_col} AS STRING)", key=key)
    return df.filter(h % _DENOM < thresh)


def select_within_token_budget(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    order_by: list[Column],
    budget_per_source: int,
) -> DataFrame:
    """Per-source greedy selection under a token budget: rows are taken
    in ``order_by`` order (best first) while the running token total
    stays within ``budget_per_source``.  One window per source — the
    canonical 'fill each domain's budget with its best documents' step."""
    w = Window.partitionBy(source_col).orderBy(*order_by)
    return (
        df.withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= budget_per_source)
        .drop("_cum")
    )


def assign_splits(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float] | None = None,
    key: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in a
    split by its portable per-id hash against cumulative ratio bands
    (insertion order of ``splits``).  A narrow projection — no shuffle,
    no state, reproducible across engines and runs, and stable under
    corpus growth (adding documents never moves an existing document's
    split — the property random split columns lack).

    Rows with a NULL ``id_col`` have no stable hash; assigning them to
    the catch-all final band would silently skew it, so they are
    rejected up front.  Ratios must sum to 1 (within rounding) — a
    short-summing mapping would silently overfill the final split."""
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split ratios must sum to 1, got {total}")
    h = hash32_expr(f"CAST({id_col} AS STRING)", key=key) % _DENOM
    # NULL ids: md5(NULL) is NULL, every band comparison is NULL, and the
    # otherwise() branch would fire — fail loudly instead.
    h = F.when(F.col(id_col).isNull(), F.raise_error(
        F.lit(f"assign_splits: NULL {id_col} has no deterministic split")
    ).cast("int")).otherwise(h)
    expr: Column | None = None
    cum = 0
    names = list(splits.items())
    for name, ratio in names[:-1]:
        cum += int(round(ratio * _DENOM))
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1][0]
    assigned = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, assigned)


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
) -> DataFrame:
    """Cross-split contamination audit: exact-duplicate groups (by
    normalized-text digest) whose members straddle more than one split —
    the eval-set leakage a dedup-then-split pipeline must drive to zero.
    One hash groupBy on the digest; output is bounded by the number of
    leaking duplicate groups."""
    from data_chunk_compaction_in_duckdb_spark.pipeline.dedup import (
        normalize_text,
    )

    return (
        df.withColumn("_key", F.md5(normalize_text(text_col)))
        .groupBy("_key")
        .agg(
            F.countDistinct(split_col).alias("n_splits"),
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_splits") > 1)
        .drop("_key")
    )

"""Automatic compaction — the CompactingPhysicalOperator wrapper at the
DataFrame API level.

The reference wraps every streaming operator (filter, joins, cross
product — physical_operator.hpp:221-245) so undersized outputs are
accumulated and re-emitted full without the query author placing
anything.  The Spark analog wraps the *DataFrame handle*: operators that
fragment partition occupancy (filter / join / crossJoin) mark the frame
as a pending compaction point, and the mark is settled with ONE
``compact(strategy='dynamic')`` call immediately before the next
consumer that feels fragmentation (join build/probe, aggregation, sort,
or an action).  Chains of narrow operators collapse into a single mark —
mirroring the reference's cache that only emits once it crosses the
threshold — so the histogram probe runs at most once per
fragmentation→consumer boundary, exactly where a hand-placed ``compact``
would go.

Where a shuffle boundary already exists, AQE's partition coalescing
subsumes this (SURVEY.md §0.1); the wrapper earns its keep on the
shuffle-free chains (selective filter feeding broadcast joins) where no
AQE stage boundary is available.

Enabled per-Engine: ``Engine(auto_compact=True)`` wraps ``table()`` and
``sql()`` results.  SQL text itself is planned by Catalyst (mid-plan
injection would need a JVM rule); the auto layer applies to everything
composed on the returned handle.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from data_chunk_compaction_in_duckdb_spark.compaction.compact import compact

# Operators whose output is a compaction point.  Only the selective
# narrow family marks: their output keeps the input partitioning with
# shrunken occupancy and no shuffle boundary follows to fix it.  Join
# outputs deliberately do NOT mark — a shuffle join's output is AQE's
# coalescing domain, a broadcast join preserves the (already settled)
# probe-side partitioning, and each settle costs a histogram probe that
# re-executes the upstream pipeline, so per-join settling would turn one
# compaction into N full re-runs (measured 2.3x slower than hand-placed).
_MARKING = {"filter", "where", "sample", "dropna"}

# Consumers that feel fragmentation: settle any pending mark first.
_SETTLING = {
    "join",
    "crossJoin",
    "groupBy",
    "groupby",
    "rollup",
    "cube",
    "groupingSets",
    "orderBy",
    "sort",
    "sortWithinPartitions",
    "distinct",
    "dropDuplicates",
    "drop_duplicates",
    "union",
    "unionAll",
    "unionByName",
    "intersect",
    "intersectAll",
    "exceptAll",
    "subtract",
    "write",
    "writeTo",
    "collect",
    "count",
    "toPandas",
    "toLocalIterator",
    "foreach",
    "foreachPartition",
    "persist",
    "cache",
    "checkpoint",
    "localCheckpoint",
}


class AutoCompactFrame:
    """Transparent DataFrame proxy carrying the pending-compaction mark.

    Not a DataFrame subclass (Spark constructs DataFrames internally);
    every attribute delegates to the wrapped frame, DataFrame-returning
    methods re-wrap, and ``df`` unwraps explicitly."""

    __slots__ = ("_df", "_pending", "_target_rows")

    def __init__(
        self,
        df: DataFrame,
        pending: bool = False,
        target_rows: int | None = None,
    ) -> None:
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_pending", pending)
        object.__setattr__(self, "_target_rows", target_rows)

    @property
    def df(self) -> DataFrame:
        """The wrapped DataFrame, compacting a pending mark first."""
        self._settle()
        return self._df

    def _settle(self) -> None:
        if self._pending:
            kwargs = {"strategy": "dynamic"}
            if self._target_rows is not None:
                kwargs["target_rows"] = self._target_rows
            object.__setattr__(self, "_df", compact(self._df, **kwargs))
            object.__setattr__(self, "_pending", False)

    def __getattr__(self, name: str) -> Any:
        if name in _SETTLING:
            self._settle()
        attr = getattr(self._df, name)
        if not callable(attr):
            return attr

        def call(*args: Any, **kwargs: Any) -> Any:
            # unwrap proxy arguments (e.g. other side of a join),
            # settling their pending marks too
            args = tuple(
                a.df if isinstance(a, AutoCompactFrame) else a for a in args
            )
            kwargs = {
                k: (v.df if isinstance(v, AutoCompactFrame) else v)
                for k, v in kwargs.items()
            }
            out = attr(*args, **kwargs)
            if isinstance(out, DataFrame):
                return AutoCompactFrame(
                    out,
                    pending=self._pending or name in _MARKING,
                    target_rows=self._target_rows,
                )
            return out

        return call

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        tag = " pending-compact" if self._pending else ""
        return f"AutoCompactFrame({self._df!r}{tag})"


def unwrap(df: Any) -> DataFrame:
    """The plain DataFrame behind ``df`` (settling any pending mark);
    pass-through for already-plain frames.  Chains through GroupedData
    lose the proxy (``groupBy(...).agg(...)`` returns a plain frame —
    correct, since the aggregation shuffle is AQE's compaction point),
    so sinks accept either."""
    return df.df if isinstance(df, AutoCompactFrame) else df

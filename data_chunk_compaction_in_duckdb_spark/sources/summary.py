"""SUMMARIZE / EXPORT DATABASE analogs.

The reference ships a ``summary`` table function and an ``EXPORT
DATABASE`` operator (src/function/table/summary.cpp,
src/execution/operator/persistent/physical_export.cpp:1-215).  Both are
re-expressed Spark-first: ``summarize`` is ONE aggregate job over the
input (per-column min/max/count/nulls/distinct computed in native type,
cast to string only for display) reshaped to one-row-per-column with
``stack`` — no collect, no per-column scan; ``export_database`` is a
loop of parquet writes plus a DDL dump, the same computation as the
reference's per-table COPY + schema.sql.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def summarize(df: DataFrame, approx: bool = False) -> DataFrame:
    """Per-column statistics, one output row per column: ``column_name,
    min, max, count, n_nulls, n_distinct``.  min/max are computed in the
    column's native type (numeric ordering, not lexicographic) and cast
    to string afterwards so heterogeneous columns can share one schema.

    ``approx=True`` is the 100 TB path and mirrors the reference's
    ``approx_unique`` in SUMMARIZE: HLL distinct counts keep the whole
    job ONE map-side-combinable aggregate (a single exchange).  The
    default exact ``countDistinct`` matches the DuckDB oracle
    bit-for-bit but Spark plans it with Expand — several exchanges —
    which is the correct trade only at test scale."""
    cols = df.columns
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.count(c).alias(f"__cnt_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            nd(c).alias(f"__nd_{c}"),
        ]
    flat = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"`__min_{c}`",
            f"`__max_{c}`",
            f"`__cnt_{c}`",
            f"`__null_{c}`",
            f"`__nd_{c}`",
        ]
    expr = (
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "as (column_name, min, max, count, n_nulls, n_distinct)"
    )
    return flat.selectExpr(expr)


def export_database(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    out_dir: str,
    fmt: str = "parquet",
) -> None:
    """EXPORT DATABASE (physical_export.cpp): write every table plus a
    ``schema.sql`` DDL dump; re-importable with ``import_database``."""
    os.makedirs(out_dir, exist_ok=True)
    ddl = []
    for name, df in tables.items():
        w = df.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", True)
        w.save(os.path.join(out_dir, name))
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        ddl.append(f"CREATE TABLE {name} ({cols});")
    with open(os.path.join(out_dir, "schema.sql"), "w") as fh:
        fh.write("\n".join(ddl) + "\n")


def import_database(
    spark: SparkSession, out_dir: str, fmt: str = "parquet"
) -> dict[str, DataFrame]:
    """Inverse of :func:`export_database`: re-register every exported
    table (schema carried by the data files; schema.sql is a DDL
    record, as in the reference's EXPORT)."""
    import glob as _glob

    out: dict[str, DataFrame] = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if name == "schema.sql" or not os.path.isdir(path):
            continue
        # sniff the export format from the data files (an EXPORT may
        # have used FORMAT csv)
        actual = fmt
        if _glob.glob(os.path.join(path, "*.csv")):
            actual = "csv"
        elif _glob.glob(os.path.join(path, "*.parquet")):
            actual = "parquet"
        r = spark.read.format(actual)
        if actual == "csv":
            r = r.option("header", True).option("inferSchema", True)
        out[name] = r.load(path)
    return out

"""Fixture-table catalog.

The reference loads benchmark parquet into temp tables and queries them
(`vector_compaction.cpp:63-67`, `benchmark/tpch/sf1/load.sql`).  Here the
same tables come from the driver-generated parquet under a scale-factor
directory and are registered as temp views so both the DataFrame and SQL
entry points (SURVEY.md §3) see one catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (applicationId, sf_dir, name) -> base DataFrame.  A DataFrame here is a
# LAZY plan over the parquet files — memoizing it avoids re-reading the
# footer (driver-side schema inference) and re-listing the path on every
# builder invocation (the bench re-invokes each builder per rep, and a
# query touching 4 tables paid 4 footer reads per rep).  No data is
# cached: every action still scans the parquet.  Keyed per application so
# a new session (or a different sf_dir) never sees a stale plan.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
        # Dynamic conf so the table also loads under sessions not built by
        # session.get_spark (e.g. the driver's bare smoke-check session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts arrives as int64 nanoseconds (spark.sql.legacy.parquet.nanosAsLong);
        # normalize to microsecond TIMESTAMP_NTZ to match DuckDB's naive
        # timestamps (SURVEY.md §1.2: other resolutions normalized on ingest).
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer div, not float /: DuckDB truncates ns→µs, and float
            # division rounds the microsecond up for some values.
            # Build the NTZ value arithmetically (epoch + exact-decimal
            # interval): timestamp_micros().cast(ntz) would render the
            # instant in the SESSION timezone — correct only under UTC,
            # shifted wall-clock under any other driver TZ.
            df = df.withColumn(
                "ts",
                F.expr(
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                    "0, 0, 0, CAST(ts div 1000 AS DECIMAL(26,6)) / 1000000)"
                ),
            )
    _TABLE_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# applicationId -> (sf_dir, dfs) currently registered.  Every SQL-corpus
# query builder calls register_views, and re-reading 10 parquet footers
# + replacing 10 views per invocation is a measurable fixed cost per
# query run — memoize per session until sf_dir changes.  Any code path
# that replaces a fixture-named temp view through another route
# (Engine.create_index, Engine.create_table_function) must call
# invalidate_views so the next register_views rebinds the originals.
_REGISTERED: dict[str, tuple[str, dict[str, DataFrame]]] = {}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (idempotent per
    session + sf_dir); returns a fresh dict of the DataFrames (callers
    mutate their copy — e.g. Engine.tables — without poisoning the
    memo)."""
    app = spark.sparkContext.applicationId
    cached = _REGISTERED.get(app)
    if cached is not None and cached[0] == sf_dir:
        return dict(cached[1])
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _REGISTERED[app] = (sf_dir, dfs)
    return dict(dfs)


def invalidate_views(spark: SparkSession) -> None:
    """Drop the register_views memo for this session: the next call will
    re-register every fixture view.  Called by every code path that
    binds a different DataFrame under a fixture table's name."""
    _REGISTERED.pop(spark.sparkContext.applicationId, None)

"""Catalog introspection — SHOW TABLES / DESCRIBE / duckdb_columns().

Reference surface: DuckDB's SHOW/DESCRIBE statements
(test/sql/show_select/) and the duckdb_columns()/duckdb_tables()
catalog functions plus information_schema/pg_catalog views
(test/sql/pg_catalog/, src/function/table/system/).

Spark-first shape: all of it is metadata-scale — schemas come from the
session catalog (temp views) or from a VersionedTable manifest, never
from scanning data, so every function returns a tiny driver-built
DataFrame that composes with the rest of the engine (joinable,
filterable), exactly like the reference's table-function form of
``duckdb_columns()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------- types


def duckdb_type_name(dt: T.DataType) -> str:
    """Spark type → the name DuckDB's information_schema prints, so
    metadata readback is oracle-comparable (both engines read the same
    parquet)."""
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{duckdb_type_name(dt.elementType)}[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({duckdb_type_name(dt.keyType)}, "
            f"{duckdb_type_name(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {duckdb_type_name(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    return dt.simpleString().upper()


# ----------------------------------------------------------- statements

_DESCRIBE_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType()),
        T.StructField("column_type", T.StringType()),
        T.StructField("null", T.StringType()),
        T.StructField("key", T.StringType(), True),
        T.StructField("default", T.StringType(), True),
        T.StructField("extra", T.StringType(), True),
    ]
)


def show_tables(spark: SparkSession) -> DataFrame:
    """SHOW TABLES: one ``name`` row per table/view visible to the
    session, sorted (the reference's output shape)."""
    names = sorted(t.name for t in spark.catalog.listTables())
    return spark.createDataFrame(
        [(n,) for n in names],
        T.StructType([T.StructField("name", T.StringType())]),
    )


def _describe_rows(schema: T.StructType) -> list[tuple]:
    return [
        (
            f.name,
            duckdb_type_name(f.dataType),
            "YES" if f.nullable else "NO",
            None,
            None,
            None,
        )
        for f in schema.fields
    ]


def describe_table(spark: SparkSession, name: str) -> DataFrame:
    """DESCRIBE <table>: the reference's six-column shape
    (column_name, column_type, null, key, default, extra)."""
    schema = spark.table(name).schema
    return spark.createDataFrame(_describe_rows(schema), _DESCRIBE_SCHEMA)


def duckdb_columns(
    spark: SparkSession, tables: list[str] | None = None
) -> DataFrame:
    """duckdb_columns() analog: one row per column of every listed
    table (default: all session tables/views), with DuckDB-named types
    and information_schema-style YES/NO nullability."""
    names = (
        sorted(tables)
        if tables is not None
        else sorted(t.name for t in spark.catalog.listTables())
    )
    rows = []
    for tname in names:
        for i, f in enumerate(spark.table(tname).schema.fields):
            rows.append(
                (
                    tname,
                    i + 1,
                    f.name,
                    duckdb_type_name(f.dataType),
                    "YES" if f.nullable else "NO",
                )
            )
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("table_name", T.StringType()),
                T.StructField("column_index", T.IntegerType()),
                T.StructField("column_name", T.StringType()),
                T.StructField("data_type", T.StringType()),
                T.StructField("is_nullable", T.StringType()),
            ]
        ),
    )


# ------------------------------------------------- versioned manifests


def describe_versioned(vt, version: int | None = None) -> DataFrame:
    """DESCRIBE over a VersionedTable manifest (no data read): logical
    columns at ``version`` (default latest) in the reference's DESCRIBE
    shape — primary-key columns marked ``PRI`` in ``key``, NOT NULL
    constraints folded into ``null``, generated columns carrying their
    expression in ``extra`` (the reference's VIRTUAL kind)."""
    v = vt.latest_version() if version is None else version
    m = vt._manifest(v)
    schema = T.StructType.fromJson(__import__("json").loads(m["schema"]))
    pk: set[str] = set()
    notnull: set[str] = set()
    for c in m.get("constraints", []):
        if c.get("type") == "primary_key":
            pk.update(c.get("columns", []))
        elif c.get("type") == "not_null":
            notnull.add(c.get("column"))
    rows = []
    for f in schema.fields:
        rows.append(
            (
                f.name,
                duckdb_type_name(f.dataType),
                "NO" if (f.name in notnull or f.name in pk) else "YES",
                "PRI" if f.name in pk else None,
                None,
                None,
            )
        )
    for name, expr in m.get("generated", {}).items():
        rows.append((name, None, "YES", None, None, f"VIRTUAL generated: {expr}"))
    return vt.spark.createDataFrame(rows, _DESCRIBE_SCHEMA)


def versioned_table_info(vt) -> DataFrame:
    """duckdb_tables()-style one-row summary of a VersionedTable from
    its manifests: latest version, op, file/column counts."""
    v = vt.latest_version()
    m = vt._manifest(v)
    schema = T.StructType.fromJson(__import__("json").loads(m["schema"]))
    row = (
        vt.path,
        v,
        m.get("op"),
        len(m.get("files", [])),
        len(schema.fields),
        len(m.get("generated", {})),
        len(m.get("constraints", [])),
    )
    return vt.spark.createDataFrame(
        [row],
        T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("version", T.IntegerType()),
                T.StructField("last_op", T.StringType()),
                T.StructField("n_files", T.IntegerType()),
                T.StructField("n_columns", T.IntegerType()),
                T.StructField("n_generated", T.IntegerType()),
                T.StructField("n_constraints", T.IntegerType()),
            ]
        ),
    )

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


def describe_query(spark: SparkSession, sql: str) -> DataFrame:
    """DESCRIBE SELECT ... (the reference describes arbitrary queries,
    test/sql/show_select/describe_qualified_columns.test): analyze the
    query (no execution — Catalyst resolves the schema) and report the
    result columns in the DESCRIBE shape with DuckDB-named types.
    ``null`` is always YES — query results carry no NOT NULL contract
    (the reference prints YES for every described-query column even
    when Catalyst can prove a literal non-null)."""
    rows = [
        (name, tname, "YES", key, default, extra)
        for name, tname, _null, key, default, extra in _describe_rows(
            spark.sql(sql).schema
        )
    ]
    return spark.createDataFrame(rows, _DESCRIBE_SCHEMA)


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


# ------------------------------------------------------------ sequences

_SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("sequence_name", T.StringType()),
        T.StructField("start_value", T.LongType()),
        T.StructField("min_value", T.LongType()),
        T.StructField("max_value", T.LongType()),
        T.StructField("increment_by", T.LongType()),
        T.StructField("cycle", T.BooleanType()),
        T.StructField("last_value", T.LongType(), True),
    ]
)


def _seq_items(sequences) -> list[tuple[str, object]]:
    """Accept a list of Sequences (named by path basename) or a
    {catalog_name: Sequence} mapping (the Engine registry form)."""
    if isinstance(sequences, dict):
        return list(sequences.items())
    return [(s.info()["sequence_name"], s) for s in sequences]


def duckdb_sequences(spark: SparkSession, sequences) -> DataFrame:
    """duckdb_sequences() analog (reference src/function/table/system/
    duckdb_sequences.cpp; the r5 gap was that sequences created by
    storage/sequence.py were invisible to the catalog surface): one row
    per ``storage.Sequence``, DuckDB's column names and semantics —
    ``last_value`` is the most recently allocated value across ALL
    sessions, NULL before the first nextval.  Metadata-scale like the
    rest of this module: each row is ONE O(1) head-manifest read (the
    ``_last`` pointer), never a log replay, so listing 10^4 sequences
    costs 10^4 tiny reads regardless of how many values each has ever
    allocated."""
    rows = []
    for name, s in _seq_items(sequences):
        info = dict(s.info(), sequence_name=name)
        rows.append(tuple(info[f.name] for f in _SEQUENCES_SCHEMA.fields))
    rows.sort(key=lambda r: r[0])
    return spark.createDataFrame(rows, _SEQUENCES_SCHEMA)


def show_sequences(spark: SparkSession, sequences) -> DataFrame:
    """SHOW SEQUENCES-style one-column listing (name order), the
    sequence sibling of ``show_tables``."""
    names = sorted(n for n, _ in _seq_items(sequences))
    return spark.createDataFrame(
        [(n,) for n in names],
        T.StructType([T.StructField("name", T.StringType())]),
    )


_INDEXES_SCHEMA = T.StructType(
    [
        T.StructField("schema_name", T.StringType()),
        T.StructField("index_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("is_unique", T.BooleanType()),
        T.StructField("is_primary", T.BooleanType()),
        T.StructField("sql", T.StringType()),
    ]
)


def duckdb_indexes(spark: SparkSession, indexes: dict) -> DataFrame:
    """duckdb_indexes() analog (reference src/function/table/system/
    duckdb_indexes.cpp): one row per index registered by
    ``Engine.create_index``, with DuckDB's column names and its
    canonical ``sql`` rendering (``CREATE [UNIQUE ]INDEX i ON t(a, b);``
    — probed against DuckDB's own catalog output).  ``is_primary`` is
    always false here: like the reference, only CREATE INDEX entries
    appear under their given name (PK constraints live on the table).
    Pure metadata — no data is scanned."""
    rows = []
    for name, info in indexes.items():
        cols = ", ".join(info["columns"])
        uq = "UNIQUE " if info["unique"] else ""
        rows.append(
            (
                "main",
                name,
                info["table"],
                bool(info["unique"]),
                False,
                f"CREATE {uq}INDEX {name} ON {info['table']}({cols});",
            )
        )
    rows.sort(key=lambda r: r[1])
    return spark.createDataFrame(rows, _INDEXES_SCHEMA)


_CONSTRAINTS_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("constraint_type", T.StringType()),
        T.StructField("constraint_text", T.StringType()),
        T.StructField(
            "constraint_column_names", T.ArrayType(T.StringType())
        ),
    ]
)


def duckdb_constraints(spark: SparkSession, tables: dict) -> DataFrame:
    """duckdb_constraints() analog (reference src/function/table/system/
    duckdb_constraints.cpp) over ``{name: VersionedTable}``: one row per
    declared constraint with DuckDB's canonical text rendering
    (``PRIMARY KEY(a, b)``, ``NOT NULL``, ``CHECK((expr))`` — probed),
    plus the implied per-column NOT NULL row DuckDB emits for every
    PRIMARY KEY column.  CHECK column attribution matches the schema
    tokens appearing in the expression (exact for the single-column
    checks the store's validation grid uses).  One head-manifest read
    per table — no data scanned."""
    import re as _re

    rows = []
    for tname, vt in tables.items():
        fields = [f.name for f in vt.read().schema.fields]
        pk_cols: list[str] = []
        for c in vt.constraints():
            kind = c["type"]
            if kind == "primary_key":
                cols = list(c["columns"])
                pk_cols.extend(cols)
                rows.append(
                    (
                        tname,
                        "PRIMARY KEY",
                        f"PRIMARY KEY({', '.join(cols)})",
                        cols,
                    )
                )
            elif kind == "not_null":
                rows.append((tname, "NOT NULL", "NOT NULL", [c["column"]]))
            elif kind == "check":
                expr = c["expr"]
                cols = [
                    f
                    for f in fields
                    if _re.search(rf"\b{_re.escape(f)}\b", expr)
                ]
                cols.sort(key=expr.find)
                rows.append((tname, "CHECK", f"CHECK(({expr}))", cols))
        for col in pk_cols:
            rows.append((tname, "NOT NULL", "NOT NULL", [col]))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    return spark.createDataFrame(rows, _CONSTRAINTS_SCHEMA)


def describe_sequence(seq) -> DataFrame:
    """DESCRIBE over a sequence: its metadata in the same six-column
    DESCRIBE shape the table surface uses (the reference reports
    sequences through duckdb_sequences(); the engine additionally
    accepts them on the DESCRIBE path so SHOW/DESCRIBE covers every
    catalog object kind).  One O(1) head read."""
    i = seq.info()
    rows = [
        ("sequence_name", "VARCHAR", "NO", None, str(i["sequence_name"]), None),
        ("start_value", "BIGINT", "NO", None, str(i["start_value"]), None),
        ("min_value", "BIGINT", "NO", None, str(i["min_value"]), None),
        ("max_value", "BIGINT", "NO", None, str(i["max_value"]), None),
        ("increment_by", "BIGINT", "NO", None, str(i["increment_by"]), None),
        ("cycle", "BOOLEAN", "NO", None, str(i["cycle"]).lower(), None),
        (
            "last_value",
            "BIGINT",
            "YES",
            None,
            None if i["last_value"] is None else str(i["last_value"]),
            None,
        ),
    ]
    return seq.spark.createDataFrame(rows, _DESCRIBE_SCHEMA)


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


# ------------------------------------------------------------- settings

_SETTINGS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("input_type", T.StringType()),
        T.StructField("scope", T.StringType()),
    ]
)


def duckdb_settings(spark: SparkSession, store) -> DataFrame:
    """duckdb_settings() analog (reference src/function/table/system/
    duckdb_settings.cpp) over an engine ``SettingsStore``: one row per
    supported setting with DuckDB 1.0's exact value rendering,
    description text, input_type and scope — so the readback is
    oracle-comparable row-for-row against the real catalog function.
    Pure metadata, driver-built."""
    return spark.createDataFrame(store.rows(), _SETTINGS_SCHEMA)


_TABLE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("notnull", T.BooleanType()),
        T.StructField("dflt_value", T.StringType()),
        T.StructField("pk", T.BooleanType()),
    ]
)


def pragma_table_info(spark: SparkSession, vt) -> DataFrame:
    """See the VersionedTable docstring below; ``vt`` may also be a
    session view/table NAME, which has no declared constraints — every
    column reads notnull=false, pk=false, exactly like DuckDB's
    pragma_table_info over a constraint-free CTAS table."""
    if isinstance(vt, str):
        rows = [
            (i, f.name, duckdb_type_name(f.dataType), False, None, False)
            for i, f in enumerate(spark.table(vt).schema.fields)
        ]
        return spark.createDataFrame(rows, _TABLE_INFO_SCHEMA)
    return _pragma_table_info_versioned(spark, vt)


def _pragma_table_info_versioned(spark: SparkSession, vt) -> DataFrame:
    """``pragma_table_info('t')`` analog (reference
    src/function/table/sqlite/pragma_table_info.cpp — DuckDB keeps the
    SQLite-compatible shape: cid/name/type/notnull/dflt_value/pk) over
    a VersionedTable: ordinal + DuckDB-named type from the schema,
    ``notnull``/``pk`` from the declared constraints (a PRIMARY KEY
    column is notnull, matching DuckDB's implied-NOT-NULL rendering in
    duckdb_constraints()).  ``dflt_value`` is always NULL — the store
    has no column defaults, and DuckDB prints NULL for defaultless
    columns.  One head-manifest read, no data scanned."""
    pk_cols: set[str] = set()
    nn_cols: set[str] = set()
    for c in vt.constraints():
        if c["type"] == "primary_key":
            pk_cols.update(c["columns"])
        elif c["type"] == "not_null":
            nn_cols.add(c["column"])
    rows = [
        (
            i,
            f.name,
            duckdb_type_name(f.dataType),
            f.name in pk_cols or f.name in nn_cols,
            None,
            f.name in pk_cols,
        )
        for i, f in enumerate(vt.read().schema.fields)
    ]
    return spark.createDataFrame(rows, _TABLE_INFO_SCHEMA)

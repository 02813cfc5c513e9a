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


# ------------------------------------------ catalog table functions
# (reference src/function/table/system/duckdb_tables.cpp,
#  duckdb_views.cpp, duckdb_schemas.cpp, duckdb_types.cpp,
#  duckdb_keywords.cpp, duckdb_functions.cpp; test/sql/pg_catalog/)
#
# All metadata-scale, driver-built — the one exception is
# duckdb_tables()'s estimated_size, which reads parquet FOOTERS only
# (O(files) local reads, never data pages).


def duckdb_keywords(spark: SparkSession) -> DataFrame:
    """duckdb_keywords(): the full keyword/category table (golden data
    from the oracle engine's catalog, catalog_data.py — DuckDB's
    parser keyword classes are the engine's SQL-surface contract)."""
    from data_chunk_compaction_in_duckdb_spark.catalog_data import KEYWORDS

    return spark.createDataFrame(
        list(KEYWORDS),
        T.StructType(
            [
                T.StructField("keyword_name", T.StringType()),
                T.StructField("keyword_category", T.StringType()),
            ]
        ),
    )


def duckdb_types(spark: SparkSession) -> DataFrame:
    """duckdb_types(): one row per built-in type of the main catalog
    (DISTINCT over the per-database copies; deterministic columns —
    oids vary per connection and are omitted)."""
    from data_chunk_compaction_in_duckdb_spark.catalog_data import TYPES

    return spark.createDataFrame(
        list(TYPES),
        T.StructType(
            [
                T.StructField("type_name", T.StringType()),
                T.StructField("type_size", T.LongType(), True),
                T.StructField("logical_type", T.StringType()),
                T.StructField("type_category", T.StringType(), True),
            ]
        ),
    )


_SCHEMAS_SCHEMA = T.StructType(
    [
        T.StructField("database_name", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("internal", T.BooleanType()),
        T.StructField("sql", T.StringType(), True),
    ]
)


def duckdb_schemas(
    spark: SparkSession, custom: list[str] | None = None
) -> DataFrame:
    """duckdb_schemas(): the fresh-connection schema layout (three
    databases × information_schema/main/pg_catalog, all internal) plus
    any user-created schemas in the session catalog (internal=false,
    sql NULL — probed: DuckDB stores no sql for CREATE SCHEMA)."""
    from data_chunk_compaction_in_duckdb_spark.catalog_data import SCHEMAS

    rows = [(d, s, i, None) for d, s, i in SCHEMAS]
    for name in sorted(custom or []):
        rows.append(("memory", name, False, None))
    rows.sort(key=lambda r: (r[0], r[1]))
    return spark.createDataFrame(rows, _SCHEMAS_SCHEMA)


def quote_ident(name: str) -> str:
    """DuckDB's optionally-quoted identifier rendering (probed: ANY
    keyword — reserved, unreserved, column_name, type_function — is
    quoted; so is anything with characters outside [A-Za-z0-9_] or a
    leading digit; bare CamelCase stays unquoted)."""
    import re as _re

    from data_chunk_compaction_in_duckdb_spark.catalog_data import (
        KEYWORD_SET,
    )

    if name.lower() in KEYWORD_SET or not _re.match(
        r"^[A-Za-z_][A-Za-z0-9_]*$", name
    ):
        return '"' + name.replace('"', '""') + '"'
    return name


def render_create_table(
    name: str,
    schema: T.StructType,
    constraints: list[dict],
    generated: dict[str, str] | None = None,
    generated_types: dict[str, T.DataType] | None = None,
) -> str:
    """DuckDB's canonical ``sql`` rendering of a table (probed):
    single-column PRIMARY KEY and NOT NULL inline on the column,
    multi-column PRIMARY KEY and every CHECK as table-level clauses in
    declaration order, types in DuckDB names, identifiers optionally
    quoted.  Generated columns render with their RESOLVED type —
    DuckDB prints ``g BIGINT GENERATED ALWAYS AS((k + 1))`` (probed,
    VIRTUAL kind implied)."""
    pk_inline: set[str] = set()
    notnull: set[str] = set()
    tail: list[str] = []
    for c in constraints:
        kind = c["type"]
        if kind == "primary_key":
            cols = list(c["columns"])
            if len(cols) == 1:
                pk_inline.add(cols[0])
            else:
                tail.append(f"PRIMARY KEY({', '.join(quote_ident(k) for k in cols)})")
        elif kind == "not_null":
            notnull.add(c["column"])
        elif kind == "check":
            tail.append(f"CHECK(({c['expr']}))")
    cols = []
    for f in schema.fields:
        part = f"{quote_ident(f.name)} {duckdb_type_name(f.dataType)}"
        if f.name in pk_inline:
            part += " PRIMARY KEY"
        elif f.name in notnull:
            part += " NOT NULL"
        cols.append(part)
    for gname, expr in (generated or {}).items():
        gtype = (generated_types or {}).get(gname)
        tname = duckdb_type_name(gtype) if gtype is not None else "BIGINT"
        cols.append(
            f"{quote_ident(gname)} {tname} GENERATED ALWAYS AS(({expr}))"
        )
    return f"CREATE TABLE {quote_ident(name)}({', '.join(cols + tail)});"


_TABLES_SCHEMA = T.StructType(
    [
        T.StructField("database_name", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("internal", T.BooleanType()),
        T.StructField("temporary", T.BooleanType()),
        T.StructField("has_primary_key", T.BooleanType()),
        T.StructField("estimated_size", T.LongType()),
        T.StructField("column_count", T.LongType()),
        T.StructField("index_count", T.LongType()),
        T.StructField("check_constraint_count", T.LongType()),
        T.StructField("sql", T.StringType()),
    ]
)


def _manifest_row_count(vt) -> int:
    """Exact row count from parquet footers — O(files) local metadata
    reads, no data pages (DuckDB's estimated_size is the exact count
    after loads, probed)."""
    import os as _os

    import pyarrow.parquet as pq

    m = vt._manifest(vt.latest_version())
    return sum(
        pq.ParquetFile(_os.path.join(vt.path, f)).metadata.num_rows
        for f in m["files"]
    )


def duckdb_tables(
    spark: SparkSession, tables: dict, indexes: dict | None = None
) -> DataFrame:
    """duckdb_tables() over ``{name: VersionedTable}`` (+ the engine's
    ART-analog index registry for index_count): DuckDB's deterministic
    columns and its canonical CREATE TABLE rendering — oids omitted
    (connection-specific).  A PRIMARY KEY counts as one index, like
    the reference's implicit PK ART."""
    rows = []
    for tname, vt in tables.items():
        m = vt._manifest(vt.latest_version())
        schema = vt._logical_schema(m)
        cons = m.get("constraints", [])
        gen = m.get("generated", {})
        # generated columns COUNT and RENDER (probed: DuckDB includes
        # them in column_count and prints GENERATED ALWAYS AS((expr)));
        # their resolved types come from the read schema — analysis
        # only, no scan
        gen_types = (
            {
                f.name: f.dataType
                for f in vt.read().schema.fields
                if f.name in gen
            }
            if gen
            else {}
        )
        pk = [c for c in cons if c["type"] == "primary_key"]
        checks = [c for c in cons if c["type"] == "check"]
        n_art = sum(
            1
            for info in (indexes or {}).values()
            if info["table"] == tname
        )
        rows.append(
            (
                "memory",
                "main",
                tname,
                False,
                False,
                bool(pk),
                _manifest_row_count(vt),
                len(schema.fields) + len(gen),
                len(pk) + n_art,
                len(checks),
                render_create_table(tname, schema, cons, gen, gen_types),
            )
        )
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(rows, _TABLES_SCHEMA)


_VIEWS_SCHEMA = T.StructType(
    [
        T.StructField("database_name", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("view_name", T.StringType()),
        T.StructField("internal", T.BooleanType()),
        T.StructField("temporary", T.BooleanType()),
        T.StructField("column_count", T.LongType()),
        T.StructField("sql", T.StringType()),
    ]
)


def duckdb_views(spark: SparkSession, views: dict[str, str]) -> DataFrame:
    """duckdb_views() over the engine's CREATE VIEW registry
    ``{name: body_sql}``: column_count resolved from the session view's
    schema, sql rendered as DuckDB stores it (``CREATE VIEW n AS
    body;`` — the body is DuckDB's deparse of the parsed query, so
    callers keep bodies in round-trip form: explicit parens on
    arithmetic/comparisons, no count(*) shorthand)."""
    rows = []
    for vname, body in views.items():
        rows.append(
            (
                "memory",
                "main",
                vname,
                False,
                False,
                len(spark.table(vname).columns),
                f"CREATE VIEW {quote_ident(vname)} AS {body};",
            )
        )
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(rows, _VIEWS_SCHEMA)


# The engine's SQL-function surface, classified with DuckDB's
# function_type taxonomy (duckdb_functions.cpp; classifications probed
# against DuckDB 1.0's catalog — 'range'/'generate_series'/'repeat'
# are both scalar and table there, nullif is a macro).  One row per
# (name, type) pair, like SELECT DISTINCT function_name, function_type
# FROM duckdb_functions().
FUNCTION_CATALOG: list[tuple[str, str]] = sorted(
    [(n, t) for n, types in {
        "abs": ["scalar"], "upper": ["scalar"], "lower": ["scalar"],
        "trim": ["scalar"], "replace": ["scalar"], "reverse": ["scalar"],
        "concat": ["scalar"], "substr": ["scalar"], "length": ["scalar"],
        "round": ["scalar"], "floor": ["scalar"], "ceil": ["scalar"],
        "sqrt": ["scalar"], "ln": ["scalar"], "exp": ["scalar"],
        "sign": ["scalar"], "mod": ["scalar"], "pow": ["scalar"],
        "greatest": ["scalar"], "least": ["scalar"], "nullif": ["macro"],
        "date_trunc": ["scalar"], "date_part": ["scalar"],
        "year": ["scalar"], "month": ["scalar"], "day": ["scalar"],
        "last_day": ["scalar"], "strftime": ["scalar"],
        "regexp_matches": ["scalar"], "regexp_replace": ["scalar"],
        "regexp_extract": ["scalar"], "list_extract": ["scalar"],
        "list_contains": ["scalar"], "unnest": ["table"],
        "contains": ["scalar"], "starts_with": ["scalar"],
        "string_split": ["scalar"], "md5": ["scalar"], "hash": ["scalar"],
        "levenshtein": ["scalar"], "jaccard": ["scalar"],
        "hamming": ["scalar"], "jaro_winkler_similarity": ["scalar"],
        "damerau_levenshtein": ["scalar"],
        "sum": ["aggregate"], "avg": ["aggregate"], "count": ["aggregate"],
        "min": ["aggregate"], "max": ["aggregate"],
        "median": ["aggregate"], "mode": ["aggregate"],
        "entropy": ["aggregate"], "histogram": ["aggregate"],
        "corr": ["aggregate"], "covar_pop": ["aggregate"],
        "stddev": ["aggregate"], "variance": ["aggregate"],
        "arg_min": ["aggregate"], "arg_max": ["aggregate"],
        "string_agg": ["aggregate"], "bool_and": ["aggregate"],
        "bool_or": ["aggregate"], "bit_and": ["aggregate"],
        "bit_or": ["aggregate"], "product": ["aggregate"],
        "quantile_cont": ["aggregate"], "quantile_disc": ["aggregate"],
        "mad": ["aggregate"], "approx_count_distinct": ["aggregate"],
        "approx_quantile": ["aggregate"],
        "reservoir_quantile": ["aggregate"],
        "nextval": ["scalar"], "currval": ["scalar"],
        "range": ["scalar", "table"],
        "generate_series": ["scalar", "table"],
        "repeat": ["scalar", "table"],
        "read_parquet": ["table"], "read_csv": ["table"],
        "glob": ["table"],
    }.items() for t in types]
)


def duckdb_functions(spark: SparkSession) -> DataFrame:
    """duckdb_functions() readback, reduced to the deterministic
    (function_name, function_type) grain: the functions the engine
    implements (queries/functions_*.py, functions/, sources/) with the
    classification DuckDB's own catalog gives them — the oracle
    DISTINCT-filters the real catalog to the same names."""
    return spark.createDataFrame(
        FUNCTION_CATALOG,
        T.StructType(
            [
                T.StructField("function_name", T.StringType()),
                T.StructField("function_type", T.StringType()),
            ]
        ),
    )


def information_schema_tables(
    spark: SparkSession, tables: dict, views: dict[str, str]
) -> DataFrame:
    """information_schema.tables readback (reference test/sql/
    pg_catalog/, src/function/table/system/ information_schema views):
    one row per engine table ('BASE TABLE') and registered view
    ('VIEW') with DuckDB's catalog/schema naming."""
    rows = [
        ("memory", "main", n, "BASE TABLE") for n in tables
    ] + [("memory", "main", n, "VIEW") for n in views]
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("table_catalog", T.StringType()),
                T.StructField("table_schema", T.StringType()),
                T.StructField("table_name", T.StringType()),
                T.StructField("table_type", T.StringType()),
            ]
        ),
    )

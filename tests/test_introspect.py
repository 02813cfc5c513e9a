"""SHOW TABLES / DESCRIBE / duckdb_columns analog (introspect.py;
reference test/sql/show_select/, test/sql/pg_catalog/)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_chunk_compaction_in_duckdb_spark import introspect
from data_chunk_compaction_in_duckdb_spark.storage import VersionedTable


def test_duckdb_type_names():
    f = introspect.duckdb_type_name
    assert f(T.LongType()) == "BIGINT"
    assert f(T.StringType()) == "VARCHAR"
    assert f(T.TimestampNTZType()) == "TIMESTAMP"
    assert f(T.ArrayType(T.FloatType())) == "FLOAT[]"
    assert f(T.DecimalType(12, 2)) == "DECIMAL(12,2)"
    assert f(T.MapType(T.StringType(), T.LongType())) == "MAP(VARCHAR, BIGINT)"
    assert (
        f(T.StructType([T.StructField("a", T.IntegerType())]))
        == "STRUCT(a INTEGER)"
    )
    assert f(T.BinaryType()) == "BLOB"


def test_show_tables_lists_fixture_views(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    names = [r["name"] for r in introspect.show_tables(spark).collect()]
    for t in ("lineitem", "orders", "embeddings"):
        assert t in names
    assert names == sorted(names)


def test_describe_table_shape(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    rows = introspect.describe_table(spark, "nation").collect()
    assert [r["column_name"] for r in rows] == [
        "n_nationkey", "n_name", "n_regionkey",
    ]
    assert rows[0]["column_type"] == "INTEGER"
    assert rows[1]["column_type"] == "VARCHAR"
    assert all(r["null"] == "YES" for r in rows)


def test_duckdb_columns_scoped(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    df = introspect.duckdb_columns(spark, tables=["region", "nation"])
    rows = df.collect()
    assert {r["table_name"] for r in rows} == {"region", "nation"}
    nat = [r for r in rows if r["table_name"] == "nation"]
    assert [r["column_index"] for r in nat] == [1, 2, 3]


def test_describe_versioned_manifest_only(spark, sf_dir):
    """DESCRIBE over a VersionedTable reads manifests, not data: PK
    columns marked PRI/NO, NOT NULL folded into null, generated columns
    carrying their expression."""
    nat = spark.read.parquet(sf_dir + "/nation.parquet")
    root = tempfile.mkdtemp(prefix="introspect_")
    vt = VersionedTable.create(
        spark,
        root + "/t",
        nat,
        constraints=[
            {"type": "primary_key", "columns": ["n_nationkey"]},
            {"type": "not_null", "column": "n_name"},
        ],
        generated={"key2": "n_nationkey * 2"},
    )
    rows = {r["column_name"]: r for r in introspect.describe_versioned(vt).collect()}
    assert rows["n_nationkey"]["key"] == "PRI"
    assert rows["n_nationkey"]["null"] == "NO"
    assert rows["n_name"]["null"] == "NO"
    assert rows["n_regionkey"]["null"] == "YES"
    assert "n_nationkey * 2" in rows["key2"]["extra"]

    info = introspect.versioned_table_info(vt).collect()[0]
    assert info["version"] == 0
    assert info["n_columns"] == 3
    assert info["n_generated"] == 1
    assert info["n_constraints"] == 2


def test_describe_versioned_tracks_schema_evolution(spark, sf_dir):
    nat = spark.read.parquet(sf_dir + "/nation.parquet")
    root = tempfile.mkdtemp(prefix="introspect_")
    vt = VersionedTable.create(spark, root + "/t", nat)
    vt.add_column("note", "string", F.lit("x"))
    vt.rename_column("n_name", "name")
    cols_now = [
        r["column_name"] for r in introspect.describe_versioned(vt).collect()
    ]
    assert cols_now == ["n_nationkey", "name", "n_regionkey", "note"]
    cols_v0 = [
        r["column_name"]
        for r in introspect.describe_versioned(vt, version=0).collect()
    ]
    assert cols_v0 == ["n_nationkey", "n_name", "n_regionkey"]


def test_engine_facade(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    assert "orders" in [r["name"] for r in eng.show_tables().collect()]
    d = eng.describe("region").collect()
    assert d[0]["column_name"] == "r_regionkey"
    cols = eng.duckdb_columns(tables=["part"]).collect()
    assert all(r["table_name"] == "part" for r in cols)


def test_sql_statement_surface(spark, sf_dir):
    """The reference's SHOW/DESCRIBE STATEMENTS also work as SQL text
    through the engine — since round 8 Engine.sql dispatches them to
    the introspect surface, so the statement form and the function
    form return the SAME DuckDB-shaped rows (pre-r8 the statement form
    fell through to Catalyst's native shapes)."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    shown = {r["name"] for r in eng.sql("SHOW TABLES").collect()}
    listed = {r["name"] for r in eng.show_tables().collect()}
    assert listed == shown
    desc_sql = {
        r["column_name"]: r["column_type"]
        for r in eng.sql("DESCRIBE nation").collect()
    }
    for r in eng.describe("nation").collect():
        assert desc_sql[r["column_name"]] == r["column_type"]


def test_engine_sequence_facade(spark, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, register=False)
    eng.create_sequence("ids", str(tmp_path / "ids"), start=5, increment=5)
    assert eng.nextval("ids") == 5
    assert eng.nextval("ids") == 10
    assert eng.currval("ids") == 10
    assert eng.sequence("ids").peek() == 15


# ------------------------------------------------------------ sequences


def test_duckdb_sequences_vs_real_duckdb(spark, tmp_path):
    """Metadata readback vs DuckDB's own duckdb_sequences() after an
    equivalent allocation replay (reference src/function/table/system/
    duckdb_sequences.cpp): same DDL, same claims, same columns."""
    import duckdb

    from data_chunk_compaction_in_duckdb_spark.storage import Sequence

    con = duckdb.connect()
    con.execute(
        "CREATE SEQUENCE a START 3 INCREMENT 2 MAXVALUE 11;"
        "CREATE SEQUENCE b INCREMENT -5;"
        "CREATE SEQUENCE c START 1 MINVALUE 1 MAXVALUE 4 CYCLE;"
        "CREATE SEQUENCE untouched;"
    )
    con.execute("SELECT nextval('a') FROM range(5)")  # exhausts a at 11
    con.execute("SELECT nextval('b') FROM range(2)")
    con.execute("SELECT nextval('c') FROM range(6)")  # wraps: ...4,1,2
    a = Sequence.create(
        spark, str(tmp_path / "a"), start=3, increment=2, maxvalue=11
    )
    a.claim(5)
    b = Sequence.create(spark, str(tmp_path / "b"), increment=-5)
    b.claim(2)
    c = Sequence.create(
        spark, str(tmp_path / "c"), start=1, minvalue=1, maxvalue=4,
        cycle=True,
    )
    c.claim(6)
    u = Sequence.create(spark, str(tmp_path / "untouched"))

    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_sequences,
    )

    got = [tuple(r) for r in duckdb_sequences(spark, [a, b, c, u]).collect()]
    want = con.execute(
        "SELECT sequence_name, start_value, min_value, max_value,"
        "       increment_by, cycle, last_value "
        "FROM duckdb_sequences() ORDER BY sequence_name"
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_describe_sequence_shape(spark, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        describe_sequence,
    )
    from data_chunk_compaction_in_duckdb_spark.storage import Sequence

    s = Sequence.create(spark, str(tmp_path / "s"), start=9, increment=4)
    d = describe_sequence(s)
    assert d.columns == [
        "column_name", "column_type", "null", "key", "default", "extra",
    ]
    rows = {r["column_name"]: r for r in d.collect()}
    assert rows["start_value"]["default"] == "9"
    assert rows["increment_by"]["default"] == "4"
    assert rows["last_value"]["default"] is None  # nothing allocated yet
    s.nextval()
    rows = {
        r["column_name"]: r for r in describe_sequence(s).collect()
    }
    assert rows["last_value"]["default"] == "9"


def test_engine_sequence_introspection(spark, tmp_path):
    """SHOW/DESCRIBE/duckdb_sequences() through the Engine facade —
    the r5 gap: sequences created via create_sequence were invisible
    to the catalog surface; the registered name (not the path
    basename) is the catalog name."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, register=False)
    eng.create_sequence("order_ids", str(tmp_path / "p1"), start=100)
    eng.create_sequence(
        "rowids", str(tmp_path / "p2"), increment=3, maxvalue=30
    )
    eng.nextval("order_ids")
    assert [r["name"] for r in eng.show_sequences().collect()] == [
        "order_ids", "rowids",
    ]
    meta = {
        r["sequence_name"]: r for r in eng.duckdb_sequences().collect()
    }
    assert meta["order_ids"]["last_value"] == 100
    assert meta["rowids"]["last_value"] is None
    assert meta["rowids"]["max_value"] == 30
    desc = {
        r["column_name"]: r["default"]
        for r in eng.describe("order_ids").collect()
    }
    assert desc["sequence_name"] == "p1"  # path basename at the storage grain
    assert desc["last_value"] == "100"

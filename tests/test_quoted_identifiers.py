"""Quoted / exotic identifier handling (reference
test/sql/catalog/test_quoted_column_name.test, test/sql/keywords/):
each dialect quotes differently (Spark backticks, DuckDB double
quotes), so this is an engine-vs-engine differential — same exotic
names, same data, same extracted values."""

from __future__ import annotations

import pytest

EXOTIC = [
    "column with spaces",
    "select",          # reserved keyword as a name
    "ORDER",           # reserved, mixed case
    "weird.dot",
    "emoji_✓",
    "tab\tname",
]


def _spark_quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _duck_quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


@pytest.mark.parametrize("name", EXOTIC, ids=[repr(n) for n in EXOTIC])
def test_exotic_identifier_roundtrip(spark, duck, sf_dir, name):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    sq, dq = _spark_quote(name), _duck_quote(name)
    s_rows = spark.sql(
        f"SELECT r_regionkey AS k, r_name AS {sq} FROM region "
        f"ORDER BY k"
    )
    assert s_rows.columns[1] == name
    s_vals = [(r[0], r[1]) for r in s_rows.collect()]
    d = duck.execute(
        f"SELECT r_regionkey AS k, r_name AS {dq} FROM region ORDER BY k"
    )
    assert d.description[1][0] == name
    d_vals = d.fetchall()
    assert s_vals == d_vals


def test_quoted_identifier_in_where_and_group(spark, duck, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    name = "group by column"
    sq, dq = _spark_quote(name), _duck_quote(name)
    s = spark.sql(
        f"SELECT t.{sq}, count(*) AS c FROM "
        f"(SELECT n_regionkey AS {sq} FROM nation) t "
        f"WHERE t.{sq} < 4 GROUP BY t.{sq} ORDER BY t.{sq}"
    ).collect()
    d = duck.execute(
        f'SELECT t.{dq}, count(*) AS c FROM '
        f"(SELECT n_regionkey AS {dq} FROM nation) t "
        f"WHERE t.{dq} < 4 GROUP BY t.{dq} ORDER BY t.{dq}"
    ).fetchall()
    assert [(r[0], r[1]) for r in s] == d


def test_create_view_statement_lifecycle(spark, sf_dir):
    """CREATE VIEW through SQL text (reference test/sql/catalog/view):
    create, query, replace, drop — all via Catalyst's native
    statements on the engine session."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("CREATE OR REPLACE TEMP VIEW v_r5 AS SELECT r_regionkey * 2 AS k FROM region")
    assert eng.sql("SELECT max(k) AS m FROM v_r5").collect()[0].m == 8
    eng.sql("CREATE OR REPLACE TEMP VIEW v_r5 AS SELECT r_regionkey * 3 AS k FROM region")
    assert eng.sql("SELECT max(k) AS m FROM v_r5").collect()[0].m == 12
    assert "v_r5" in [r["name"] for r in eng.show_tables().collect()]
    eng.sql("DROP VIEW v_r5")
    assert "v_r5" not in [r["name"] for r in eng.show_tables().collect()]

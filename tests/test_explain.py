"""EXPLAIN [ANALYZE] statement (reference test/sql/explain/, the
EXPLAIN ANALYZE harvest in vector_compaction.cpp:83-92): DuckDB's
probed (explain_key, explain_value) one-row shape through Engine.sql,
with the ANALYZE tree carrying per-operator runtime row counts from
the final AQE plan (plans/metrics.explain_analyze)."""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_explain_shape_matches_duckdb(eng, sf_dir):
    import duckdb

    df = eng.sql("EXPLAIN SELECT r_name FROM region WHERE r_regionkey < 2")
    assert df.columns == ["explain_key", "explain_value"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["explain_key"] == "physical_plan"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW region AS FROM '{sf_dir}/region.parquet'"
    )
    res = con.execute("EXPLAIN SELECT r_name FROM region WHERE r_regionkey < 2")
    assert [d[0] for d in res.description] == df.columns
    drows = res.fetchall()
    assert len(drows) == 1 and drows[0][0] == rows[0]["explain_key"]


def test_explain_value_is_the_physical_plan(eng):
    val = eng.sql(
        "EXPLAIN SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey"
    ).collect()[0]["explain_value"]
    assert "Physical Plan" in val
    assert "HashAggregate" in val and "Scan parquet" in val


def test_explain_analyze_metrics_tree(eng):
    rows = eng.sql(
        "EXPLAIN ANALYZE SELECT l_returnflag, count(*) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert len(rows) == 1 and rows[0]["explain_key"] == "analyzed_plan"
    val = rows[0]["explain_value"]
    assert "Query Profiling Information" in val
    assert "total wall time:" in val
    # executed metrics: the aggregate's output rows are in the tree
    assert "rows=" in val and "HashAggregate" in val


def test_explain_of_dml_rejected_loudly(eng):
    with pytest.raises(ValueError, match="EXPLAIN of a non-SELECT"):
        eng.sql("EXPLAIN UPDATE region SET r_name = 'x'")


def test_explain_composes_with_dialect_rewrites(eng):
    # the inner statement re-enters Engine.sql, so DuckDB dialect forms
    # (QUALIFY, expression grammar) explain cleanly
    val = eng.sql(
        "EXPLAIN SELECT 'abcdef'[2:4] AS s, 7 // 2 AS d"
    ).collect()[0]["explain_value"]
    assert "Physical Plan" in val

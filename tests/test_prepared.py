"""PREPARE/EXECUTE/DEALLOCATE through Engine.sql (prepared.py;
reference src/main/prepared_statement.cpp, test/sql/prepared/) —
binding styles, probed DuckDB error shapes, prepared DML onto the
versioned store, and the literal-marker/masking edge cases."""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_numbered_params_and_reuse(eng):
    eng.sql("PREPARE tp_a AS SELECT $1 + $2 AS s, $1 * 2 AS d")
    row = eng.sql("EXECUTE tp_a(3, 4)").collect()[0]
    assert (row["s"], row["d"]) == (7, 6)


def test_qmark_and_named_params(eng):
    eng.sql("PREPARE tp_q AS SELECT ? * ? AS p")
    assert eng.sql("EXECUTE tp_q(6, 7)").collect()[0]["p"] == 42
    eng.sql("PREPARE tp_n AS SELECT $a - $b AS d")
    assert eng.sql("EXECUTE tp_n(b := 2, a := 10)").collect()[0]["d"] == 8


def test_error_shapes_match_duckdb(eng):
    eng.sql("PREPARE tp_e AS SELECT $1 + $2 AS s")
    with pytest.raises(
        ValueError,
        match="Values were not provided for the following prepared "
        "statement parameters: 2",
    ):
        eng.sql("EXECUTE tp_e(1)")
    with pytest.raises(
        ValueError, match="identifiers of the excess parameters: 3, 4"
    ):
        eng.sql("EXECUTE tp_e(1, 2, 3, 4)")
    with pytest.raises(ValueError, match=r'syntax error at or near "\)"'):
        eng.sql("EXECUTE tp_e()")
    with pytest.raises(
        ValueError, match='Prepared statement "tp_nosuch" does not exist'
    ):
        eng.sql("EXECUTE tp_nosuch(1)")
    eng.sql("PREPARE tp_nm AS SELECT $a + $b AS s")
    with pytest.raises(ValueError, match="parameters: a, b"):
        eng.sql("EXECUTE tp_nm(1, 2)")  # positional vs named: all missing
    with pytest.raises(ValueError, match="parameters: b"):
        eng.sql("EXECUTE tp_nm(a := 1)")


def test_deallocate_lifecycle(eng):
    eng.sql("PREPARE tp_d AS SELECT 1 AS one")
    assert eng.sql("EXECUTE tp_d").collect()[0]["one"] == 1
    eng.sql("DEALLOCATE tp_d")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("EXECUTE tp_d")
    eng.sql("DEALLOCATE tp_d")  # silent on missing (probed)
    eng.sql("DEALLOCATE PREPARE tp_d")


def test_catalog_error_at_prepare_time(eng):
    with pytest.raises(Exception, match="nosuch_table"):
        eng.sql("PREPARE tp_bad AS SELECT count(*) FROM nosuch_table WHERE x = $1")
    # the failed PREPARE left nothing registered
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("EXECUTE tp_bad(1)")


def test_marker_inside_literal_is_data(eng):
    eng.sql("PREPARE tp_lit AS SELECT '$1' AS t, $1 AS v")
    row = eng.sql("EXECUTE tp_lit(9)").collect()[0]
    assert (row["t"], row["v"]) == ("$1", 9)


def test_constant_expression_args_fold(eng):
    eng.sql("PREPARE tp_s AS SELECT upper($1) AS u, length($1) AS l")
    row = eng.sql("EXECUTE tp_s('x' || 'y')").collect()[0]
    assert (row["u"], row["l"]) == ("XY", 2)
    with pytest.raises(ValueError, match="Only scalar parameters"):
        eng.sql("EXECUTE tp_s((SELECT 'z'))")


def test_prepared_over_fixture_table(eng):
    eng.sql(
        "PREPARE tp_t AS SELECT count(*) AS c FROM orders "
        "WHERE o_orderkey % 10 < $1"
    )
    none = eng.sql("EXECUTE tp_t(0)").collect()[0]["c"]
    some = eng.sql("EXECUTE tp_t(3)").collect()[0]["c"]
    assert none == 0 and some > 0


def test_prepared_dml_on_versioned_table(eng, spark, tmp_path):
    df = spark.range(10).selectExpr("id AS k", "id * 10 AS v")
    eng.create_versioned_table("tp_vt", df, str(tmp_path / "tp_vt"))
    eng.sql("PREPARE tp_ins AS INSERT INTO tp_vt VALUES ($1, $2)")
    eng.sql("EXECUTE tp_ins(100, 1000)")
    eng.sql("PREPARE tp_del AS DELETE FROM tp_vt WHERE k < $1")
    eng.sql("EXECUTE tp_del(3)")
    eng.sql("PREPARE tp_upd AS UPDATE tp_vt SET v = v + $1 WHERE k = $2")
    eng.sql("EXECUTE tp_upd(5, 100)")
    rows = {r["k"]: r["v"] for r in eng.sql("SELECT k, v FROM tp_vt").collect()}
    assert 0 not in rows and 1 not in rows and 2 not in rows
    assert rows[100] == 1005 and rows[9] == 90
    # prepared DML also participates in transactions
    eng.sql("BEGIN")
    eng.sql("EXECUTE tp_del(100)")  # deletes everything but k=100
    eng.sql("ROLLBACK")
    assert eng.sql("SELECT count(*) AS c FROM tp_vt").collect()[0]["c"] == 8


def test_re_prepare_replaces(eng):
    eng.sql("PREPARE tp_r AS SELECT $1 + 1 AS a")
    assert eng.sql("EXECUTE tp_r(1)").collect()[0]["a"] == 2
    eng.sql("PREPARE tp_r AS SELECT $1 * 100 AS a")
    assert eng.sql("EXECUTE tp_r(1)").collect()[0]["a"] == 100


def test_marker_in_comment_not_counted(eng):
    eng.sql("PREPARE tp_cm AS SELECT $1 + 1 AS a -- not $2 here")
    assert eng.sql("EXECUTE tp_cm(41)").collect()[0]["a"] == 42


def test_excess_named_and_mixing_errors(eng):
    eng.sql("PREPARE tp_xn AS SELECT $a * 2 AS p")
    with pytest.raises(
        ValueError, match="identifiers of the excess parameters: zz"
    ):
        eng.sql("EXECUTE tp_xn(a := 1, zz := 3)")
    eng.sql("PREPARE tp_mx AS SELECT $1 + $2 AS s")
    with pytest.raises(ValueError, match="Mixing named parameters"):
        eng.sql("EXECUTE tp_mx(1, x := 2)")
    # named args against a numbered statement are ignored by the binder
    with pytest.raises(ValueError, match="parameters: 1, 2"):
        eng.sql("EXECUTE tp_mx(p1 := 1, p2 := 2)")


def test_failed_re_prepare_keeps_old(eng):
    eng.sql("PREPARE tp_keep AS SELECT 7 AS k")
    with pytest.raises(Exception, match="nosuch"):
        eng.sql("PREPARE tp_keep AS SELECT z FROM nosuch_t WHERE z = $1")
    assert eng.sql("EXECUTE tp_keep").collect()[0]["k"] == 7

"""RETURNING-clause analogs (reference test/sql/returning/) pinned
against REAL DuckDB DML: each test creates a materialized DuckDB table
from the fixture, runs the actual `... RETURNING` statement, and
compares both the returned rows and the post-mutation table state with
the Spark rewrite's (post, returned) pair."""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
    delete_returning,
    insert_returning,
    update_returning,
    upsert_returning,
)
from data_chunk_compaction_in_duckdb_spark.sources import read_parquet


@pytest.fixture()
def ducktab(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE o AS SELECT o_orderkey, o_custkey, o_orderstatus, "
        f"o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    yield con
    con.close()


def _orders(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def test_delete_returning_matches_duckdb(spark, sf_dir, ducktab):
    from pyspark.sql import functions as F

    post, ret = delete_returning(
        _orders(spark, sf_dir), F.col("o_totalprice") > 400000
    )
    d_ret = {
        r[0]
        for r in ducktab.execute(
            "DELETE FROM o WHERE o_totalprice > 400000 RETURNING o_orderkey"
        ).fetchall()
    }
    s_ret = {r["o_orderkey"] for r in ret.collect()}
    assert s_ret == d_ret and s_ret
    assert post.count() == ducktab.execute("SELECT count(*) FROM o").fetchone()[0]


def test_update_returning_matches_duckdb(spark, sf_dir, ducktab):
    from pyspark.sql import functions as F

    post, ret = update_returning(
        _orders(spark, sf_dir),
        F.col("o_orderstatus") == "P",
        {"o_orderstatus": F.lit("X"), "o_totalprice": F.col("o_totalprice") + 1.0},
    )
    d_ret = set(
        ducktab.execute(
            "UPDATE o SET o_orderstatus = 'X', o_totalprice = o_totalprice + 1.0 "
            "WHERE o_orderstatus = 'P' RETURNING o_orderkey, o_orderstatus, "
            "round(o_totalprice, 2)"
        ).fetchall()
    )
    s_ret = {
        (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in ret.collect()
    }
    assert s_ret == d_ret and s_ret, "post-update image must be returned"
    d_x = ducktab.execute(
        "SELECT count(*) FROM o WHERE o_orderstatus = 'X'"
    ).fetchone()[0]
    assert post.filter(F.col("o_orderstatus") == "X").count() == d_x


def test_insert_returning_matches_duckdb(spark, sf_dir, ducktab):
    rows = spark.createDataFrame(
        [(900001, 1, "N", 123.45), (900002, 2, "N", 67.89)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    post, ret = insert_returning(_orders(spark, sf_dir), rows)
    d_ret = set(
        ducktab.execute(
            "INSERT INTO o VALUES (900001, 1, 'N', 123.45), "
            "(900002, 2, 'N', 67.89) RETURNING o_orderkey, o_totalprice"
        ).fetchall()
    )
    s_ret = {(r["o_orderkey"], r["o_totalprice"]) for r in ret.collect()}
    assert s_ret == d_ret
    assert post.count() == ducktab.execute("SELECT count(*) FROM o").fetchone()[0]


def test_upsert_returning_matches_duckdb(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE)"
    )
    con.execute(
        "INSERT INTO o SELECT o_orderkey, o_custkey, o_orderstatus, "
        f"o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    updates = spark.createDataFrame(
        [(0, 99, "U", 1.0), (900001, 1, "N", 2.0)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    post, ret = upsert_returning(
        _orders(spark, sf_dir), updates, "o_orderkey"
    )
    d_ret = set(
        con.execute(
            "INSERT INTO o VALUES (0, 99, 'U', 1.0), (900001, 1, 'N', 2.0) "
            "ON CONFLICT (o_orderkey) DO UPDATE SET o_custkey = excluded.o_custkey, "
            "o_orderstatus = excluded.o_orderstatus, o_totalprice = excluded.o_totalprice "
            "RETURNING o_orderkey, o_custkey, o_orderstatus, o_totalprice"
        ).fetchall()
    )
    s_ret = {tuple(r) for r in ret.collect()}
    assert s_ret == d_ret
    assert post.count() == con.execute("SELECT count(*) FROM o").fetchone()[0]
    s_row = post.filter("o_orderkey = 0").collect()[0]
    d_row = con.execute("SELECT * FROM o WHERE o_orderkey = 0").fetchone()
    assert tuple(s_row) == d_row, "conflict row must carry the update's image"
    con.close()

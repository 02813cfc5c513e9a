"""Edge-semantics oracle parity + salted-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, edge_q

    return [n for n, q in REGISTRY.items() if q.builder.__module__ == edge_q.__name__]


@pytest.mark.parametrize("name", _names())
def test_edge_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_salted_join_equals_plain_join(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = salted_join(li, orders, "l_orderkey", n_salts=4).groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert (plain.n, plain.q) == (salted.n, salted.q)


def test_salted_join_hot_keys_two_path(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    hot = [r.l_orderkey for r in li.groupBy("l_orderkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]
    plain = li.join(orders, "l_orderkey").count()
    two_path = salted_join(li, orders, "l_orderkey", n_salts=4, hot_keys=hot).count()
    assert plain == two_path

"""Oracle-parity and shape tests for the official-text partsupp queries
(tpch_partsupp.py: derived partsupp + official q2/q11/q16/q20)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        tpch_partsupp,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == tpch_partsupp.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_tpch_partsupp_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_partsupp_shape(spark, sf_dir):
    """Derived partsupp has dbgen's shape: exactly 4 rows per part, all
    4 suppliers distinct, availqty/supplycost in dbgen's domains."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.queries.tpch_partsupp import (
        partsupp_df,
    )
    from pyspark.sql import functions as F

    ps = partsupp_df(spark, sf_dir)
    n_parts = load_table(spark, sf_dir, "part").count()
    per_part = ps.groupBy("ps_partkey").agg(
        F.count("*").alias("n"),
        F.countDistinct("ps_suppkey").alias("nd"),
    )
    bad = per_part.filter((F.col("n") != 4) | (F.col("nd") != 4)).count()
    assert bad == 0
    assert ps.count() == 4 * n_parts
    stats = ps.agg(
        F.min("ps_availqty").alias("qmin"),
        F.max("ps_availqty").alias("qmax"),
        F.min("ps_supplycost").alias("cmin"),
        F.max("ps_supplycost").alias("cmax"),
    ).first()
    assert 1 <= stats.qmin and stats.qmax <= 9999
    assert 0.01 <= stats.cmin and stats.cmax <= 1000.0

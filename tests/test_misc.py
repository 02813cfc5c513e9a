"""Tests: mutation rewrites, type-system tail, approx aggregates,
reservoir sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, misc_q

    return [n for n, q in REGISTRY.items() if q.builder.__module__ == misc_q.__name__]


@pytest.mark.parametrize("name", _names())
def test_misc_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_approx_quantile_close_to_exact(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["agg_approx_quantile"].builder(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.exact_med > 0
        assert r.within_5pct == "true"


def test_reservoir_and_bernoulli_sampling(spark, sf_dir):
    """RESERVOIR_SAMPLE / STREAMING_SAMPLE (physical_reservoir_sample.cpp,
    physical_streaming_sample.cpp): nondeterministic operators — assert
    statistical behavior, not values."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    frac = li.sample(withReplacement=False, fraction=0.1, seed=42)
    got = frac.count()
    assert 0.05 * n < got < 0.15 * n
    exact = li.rdd.takeSample(False, 100, seed=7)
    assert len(exact) == 100


def test_insert_into_appends(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
        insert_into,
    )

    region = load_table(spark, sf_dir, "region")
    extra = spark.createDataFrame([(50, "REGION_APPENDED")], "r_regionkey INT, r_name STRING")
    out = insert_into(region, extra)
    assert out.count() == region.count() + 1
    assert out.filter(F.col("r_name") == "REGION_APPENDED").count() == 1


def test_python_datasource_parallel_partitions(spark):
    """The Python DataSource must plan real input partitions (parallel
    generator scan), not a single-task collect."""
    from data_chunk_compaction_in_duckdb_spark.sources import (
        register_python_sources,
    )

    register_python_sources(spark)
    df = (
        spark.read.format("repeat_rows")
        .option("n", 100)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100

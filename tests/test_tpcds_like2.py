"""Oracle-parity tests for the second TPC-DS-shaped tranche."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, tpcds_like2

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == tpcds_like2.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_tpcds2_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_q70_reuses_aggregate_exchange(spark, sf_dir):
    """natrev feeds both the rank prefilter and the final rollup; the
    physical plan must reuse the aggregation exchange (ReuseExchange),
    not scan the fact twice."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["tpcds_q70_rank_pruned_rollup"].builder(spark, sf_dir)
    df.collect()  # AQE finalizes exchange reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan

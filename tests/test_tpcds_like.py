"""Oracle-parity tests for the TPC-DS-shaped corpus."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, tpcds_like

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == tpcds_like.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_tpcds_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_q47_single_exchange(spark, sf_dir):
    """The lag window must reuse the group-by's hash partitioning on
    event_type — one exchange total."""
    from data_chunk_compaction_in_duckdb_spark.plans import count_exchanges
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["tpcds_q47_period_ratio"].builder(spark, sf_dir)
    assert count_exchanges(df) <= 2

"""Oracle-parity tests for the extended TPC-H-shaped corpus."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, tpch_more

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == tpch_more.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_tpch_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

"""Oracle-parity tests for the third TPC-DS-shaped tranche (the 24
numbers that complete the 99-query inventory)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, tpcds_like3

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == tpcds_like3.__name__
    ]


def test_all_99_ds_numbers_implemented():
    """Every TPC-DS query number 1..99 has a named implementation."""
    import re

    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    nums = {
        int(m.group(1))
        for n in REGISTRY
        for m in [re.match(r"tpcds_q(\d+)_", n)]
        if m
    }
    missing = set(range(1, 100)) - nums
    assert not missing, f"unimplemented DS numbers: {sorted(missing)}"


@pytest.mark.parametrize("name", _names())
def test_tpcds3_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

"""Oracle-parity + inventory tests for the ClickBench corpus
(clickbench_like.py — all 43 reference benchmark/clickbench queries)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        clickbench_like,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == clickbench_like.__name__
    ]


def test_clickbench_inventory_is_complete():
    names = set(_names())
    assert names == {f"clickbench_q{i:02d}" for i in range(1, 44)}


@pytest.mark.parametrize("name", _names())
def test_clickbench_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

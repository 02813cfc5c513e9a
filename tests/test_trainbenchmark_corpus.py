"""Oracle-parity + inventory tests for the Train Benchmark corpus
(trainbenchmark_like.py — all 6 reference graph-pattern queries)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle

_EXPECTED = {
    "tb_poslength",
    "tb_switchmonitored",
    "tb_routesensor",
    "tb_switchset",
    "tb_semaphoreneighbor",
    "tb_connectedsegments",
}


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        trainbenchmark_like,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == trainbenchmark_like.__name__
    ]


def test_trainbenchmark_inventory_is_complete():
    assert set(_names()) == _EXPECTED


@pytest.mark.parametrize("name", _names())
def test_trainbenchmark_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

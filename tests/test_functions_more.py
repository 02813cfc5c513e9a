"""Oracle parity for the scalar-function coverage tail."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        functions_more,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == functions_more.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_functions_more_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

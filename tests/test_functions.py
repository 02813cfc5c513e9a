"""Oracle-parity tests for scalar + aggregate function families
(SURVEY.md §2.4 function list, §2.8 scalar registry)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _function_names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        functions_agg,
        functions_scalar,
    )

    mods = {functions_scalar.__name__, functions_agg.__name__}
    return [n for n, q in REGISTRY.items() if q.builder.__module__ in mods]


@pytest.mark.parametrize("name", _function_names())
def test_function_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_approx_count_distinct_plausible(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["agg_approx_count_distinct"].builder(spark, sf_dir)
    rows = df.collect()
    assert rows
    for row in rows:
        assert row.exact_parts > 0
        # the in-query self-check: Spark's own HLL within the reference's
        # documented 5% bound (the driver hash-compares this boolean
        # against DuckDB's own-sketch check)
        assert row.within_5pct == "true"

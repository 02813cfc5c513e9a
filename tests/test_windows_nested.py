"""Oracle-parity tests for window functions and nested-type queries
(SURVEY.md §2.5, §2.2 unnest/pivot, §2.8 list/struct/map)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names(*modules):
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    mods = {m.__name__ for m in modules}
    return [n for n, q in REGISTRY.items() if q.builder.__module__ in mods]


def _window_nested_names():
    from data_chunk_compaction_in_duckdb_spark.queries import nested, windows

    return _names(windows, nested)


@pytest.mark.parametrize("name", _window_nested_names())
def test_window_nested_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

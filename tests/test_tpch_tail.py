"""Oracle-parity tests for the TPC-H tail (q9/q11/q13/q15/q17/q20)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, tpch_tail

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == tpch_tail.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_tpch_tail_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_q20_nonempty(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    assert REGISTRY["tpch_q20_official"].builder(spark, sf_dir).count() > 0


def test_q9_fact_side_single_shuffle(spark, sf_dir):
    """All dimensions broadcast: the only exchange is the final group-by."""
    from data_chunk_compaction_in_duckdb_spark.plans import (
        count_exchanges,
        join_strategies,
    )
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["tpch_q9_product_type_profit"].builder(spark, sf_dir)
    assert set(join_strategies(df)) == {"BroadcastHashJoin"}
    assert count_exchanges(df) <= 1

"""Oracle-parity + inventory tests for the H2O.ai db-benchmark corpus
(h2oai_like.py — all 10 groupby + 5 join reference queries)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        h2oai_like,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == h2oai_like.__name__
    ]


def test_h2oai_inventory_is_complete():
    names = set(_names())
    expect = {f"h2o_group_q{i:02d}" for i in range(1, 11)} | {
        f"h2o_join_q{i:02d}" for i in range(1, 6)
    }
    assert names == expect


def test_dispersion_sums_fit_bigint(duck, sf_dir):
    # The exact-sum stddev/corr formulas ride BIGINT partial sums; prove
    # the headroom assumption the module docstring states (at cluster
    # scale these upgrade to DECIMAL(38)).
    lim = duck.execute(
        f"""
        SELECT MAX(s) FROM (
          SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          GROUP BY l_suppkey % 10, l_partkey % 10)
        """
    ).fetchone()[0]
    assert lim < 2**62


@pytest.mark.parametrize("name", _names())
def test_h2oai_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

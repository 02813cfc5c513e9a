"""Oracle-parity tests for the relational core (SURVEY.md §2.1-2.4, 2.6, 2.7).

Replicates the driver's correctness gate at sf0.001: every named query's
Spark result must match its DuckDB oracle (columns sorted by name,
order-insensitive rows).
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _relational_names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, relational

    mod_fns = {
        q.builder.__module__: True for q in REGISTRY.values()
    }
    assert relational.__name__ in mod_fns
    return [
        name
        for name, q in REGISTRY.items()
        if q.builder.__module__ == relational.__name__
    ]


@pytest.mark.parametrize("name", _relational_names())
def test_relational_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate"]


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 5

"""Oracle-parity tests for the full JOB-shaped corpus (job_like +
job_variants modules), complementing the targeted plan tests in
test_job_tuner.py."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        job_like,
        job_variants,
        job_variants2,
        job_variants3,
        job_variants4,
    )

    mods = {
        job_like.__name__,
        job_variants.__name__,
        job_variants2.__name__,
        job_variants3.__name__,
        job_variants4.__name__,
    }
    return [n for n, q in REGISTRY.items() if q.builder.__module__ in mods]


@pytest.mark.parametrize("name", _names())
def test_job_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

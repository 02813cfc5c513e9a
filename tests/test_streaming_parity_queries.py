"""Oracle-parity tests for the driver-checkable streaming queries
(streaming_q.py): tumbling, sliding, session windows, interval joins,
and dedup, each drained to a memory sink and compared to the static-SQL
oracle — Structured Streaming's stream==batch guarantee under the same
gate every batch query faces."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        streaming_q,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == streaming_q.__name__
    ]


def test_streaming_parity_inventory():
    assert set(_names()) == {
        "stream_tumbling_window_parity",
        "stream_interval_join_parity",
        "stream_left_outer_join_parity",
        "stream_dedup_parity",
        "stream_sliding_window_parity",
        "stream_session_window_parity",
    }


@pytest.mark.parametrize("name", _names())
def test_streaming_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)

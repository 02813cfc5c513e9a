"""Oracle-parity and semantics tests for the ICU locale collation family
(collation_q.py — reference extension/icu collations, test/sql/collate)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        collation_q,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == collation_q.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_collation_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_collation_queries_registered():
    assert len(_names()) == 7


def test_de_umlaut_actually_reorders(spark, sf_dir):
    """The locale rank must genuinely disagree with binary rank on
    accented names — otherwise the query exercises nothing."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["collate_de_umlaut_rank"].builder(spark, sf_dir).collect()
    accented = [r for r in rows if any(ch in r["name"] for ch in "äéöü")]
    assert accented, "fixture produced no accented names"
    assert any(r["rank_de"] != r["rank_binary"] for r in accented)


def test_sv_and_de_disagree_on_accents(spark, sf_dir):
    """Swedish keeps å/ö as distinct post-z letters while German folds
    them into a/o, so accented names must rank differently per locale."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["collate_sv_after_z"].builder(spark, sf_dir).collect()
    accented = [r for r in rows if any(c in r["name"] for c in "åö")]
    assert accented, "fixture produced no accented names"
    assert any(r["rank_sv"] != r["rank_de"] for r in accented)


def test_cs_digraph_ch_after_h(spark, sf_dir):
    """Czech: every 'ch…' name outranks every 'h…' name under cs."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    rows = REGISTRY["collate_cs_digraph_ch"].builder(spark, sf_dir).collect()
    ch = [r["rank_cs"] for r in rows if r["name"].startswith("ch")]
    h = [r["rank_cs"] for r in rows if r["name"].startswith("h")]
    assert ch and h and min(ch) > max(h)

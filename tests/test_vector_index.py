"""Materialized PQ vector index (pipeline/vector_index.py; reference
CREATE INDEX + storage layer applied to the ANN surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.pipeline import (
    PQIndex,
    pq_adc_topk,
    pq_codes,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(sf_dir + "/embeddings.parquet")


def _rows(df):
    return sorted(
        (r.query_id, r.match_id, round(r.cosine, 9)) for r in df.collect()
    )


def test_build_and_codes_match_direct_encode(spark, tmp_path, emb):
    idx = PQIndex.build(
        spark, str(tmp_path / "ix"), emb, "vec_id", "embedding", dim=64,
        m=16, codes=16,
    )
    stored = {
        r["vec_id"]: tuple(r[f"c{s}"] for s in range(16))
        for r in idx.codes().collect()
    }
    direct = {
        r["vec_id"]: tuple(r[f"c{s}"] for s in range(16))
        for r in pq_codes(emb, "vec_id", "embedding", 64, m=16, k=16).collect()
    }
    assert stored == direct


def test_indexed_topk_equals_direct(spark, tmp_path, emb):
    """The whole point: query-over-stored-codes must return rows
    BIT-IDENTICAL to the direct fused path."""
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    idx = PQIndex.build(
        spark, str(tmp_path / "ix"), emb, "vec_id", "embedding", dim=64,
        m=16, codes=16,
    )
    via_index = idx.topk(emb, queries, k=5, rerank=50)
    direct = pq_adc_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=5, m=16, codes=16,
        rerank=50,
    )
    assert _rows(via_index) == _rows(direct)


def test_open_existing_index(spark, tmp_path, emb):
    path = str(tmp_path / "ix")
    PQIndex.build(spark, path, emb, "vec_id", "embedding", dim=64)
    reopened = PQIndex(spark, path)
    assert reopened.meta["dim"] == 64
    assert reopened.codes().count() == emb.count()


def test_rebuild_is_versioned(spark, tmp_path, emb):
    """Re-encoding after corpus changes is one copy-on-write commit;
    the previous index stays time-travel readable."""
    path = str(tmp_path / "ix")
    idx = PQIndex.build(
        spark, path, emb, "vec_id", "embedding", dim=64, m=16, codes=16
    )
    n0 = idx.codes().count()
    smaller = emb.filter(F.col("vec_id") % 2 == 0)
    v = idx.rebuild(smaller)
    assert v == 1
    assert idx.codes().count() == smaller.count()
    assert idx.codes(version=0).count() == n0  # time travel
    # queries against the rebuilt index only see the remaining corpus
    queries = emb.filter(F.col("vec_id") % 97 == 0).limit(2)
    out = idx.topk(smaller, queries, k=3, rerank=10).collect()
    assert all(r.match_id % 2 == 0 for r in out)


def test_indexed_topk_empty_queries(spark, tmp_path, emb):
    idx = PQIndex.build(spark, str(tmp_path / "ix"), emb, "vec_id",
                        "embedding", dim=64)
    out = idx.topk(emb, emb.filter(F.lit(False)), k=3, rerank=10)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "match_id", "cosine"}


def test_ivf_index_topk_equals_direct(spark, tmp_path, emb):
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        IVFIndex,
        ivf_ann_topk,
    )

    queries = emb.filter(F.col("vec_id") % 97 == 0)
    idx = IVFIndex.build(
        spark, str(tmp_path / "ivf"), emb, "vec_id", "embedding", dim=64,
        n_clusters=16,
    )
    via_index = idx.topk(emb, queries, k=5, n_probe=8)
    direct = ivf_ann_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=5, n_clusters=16,
        n_probe=8,
    )
    assert _rows(via_index) == _rows(direct)


def test_ivf_index_rebuild_versioned(spark, tmp_path, emb):
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex

    idx = IVFIndex.build(
        spark, str(tmp_path / "ivf"), emb, "vec_id", "embedding", dim=64,
        n_clusters=8,
    )
    n0 = idx.cells().count()
    v = idx.rebuild(emb.filter(F.col("vec_id") % 3 == 0))
    assert v == 1
    assert idx.cells().count() < n0
    assert idx.cells(version=0).count() == n0

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


# --------------------------------------------------- incremental append


def test_pq_append_equals_full_build_and_keeps_files(spark, tmp_path, emb):
    """append() must encode ONLY the delta (every base code file moves
    by manifest reference — the reference maintains its ART index
    per-INSERT instead of rebuilding, art.cpp ART::Insert) and the
    resulting index must be content-identical to one built over the
    whole corpus."""
    path = str(tmp_path / "ix")
    base_part = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0)
    idx = PQIndex.build(
        spark, path, base_part, "vec_id", "embedding", dim=64, m=16,
        codes=16,
    )
    files_v0 = set(idx.codes_table._manifest(0)["files"])
    v = idx.append(delta)
    assert v == 1
    m1 = idx.codes_table._manifest(1)
    assert m1["op"] == "insert"
    # manifest assertion: ONLY new files were written — the whole base
    # file set survives by reference
    assert files_v0 <= set(m1["files"])
    assert len(m1["files"]) > len(files_v0)

    full = PQIndex.build(
        spark, str(tmp_path / "full"), emb, "vec_id", "embedding",
        dim=64, m=16, codes=16,
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(idx.codes()) == key(full.codes())
    # ... and queries over the appended index equal the full build's
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    assert _rows(idx.topk(emb, queries, k=5, rerank=50)) == _rows(
        full.topk(emb, queries, k=5, rerank=50)
    )


def test_ivf_append_equals_full_build_and_keeps_files(spark, tmp_path, emb):
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex

    path = str(tmp_path / "ivf")
    idx = IVFIndex.build(
        spark, path, emb.filter(F.col("vec_id") % 3 != 0), "vec_id",
        "embedding", dim=64, n_clusters=16,
    )
    files_v0 = set(idx.cells_table._manifest(0)["files"])
    assert idx.append(emb.filter(F.col("vec_id") % 3 == 0)) == 1
    m1 = idx.cells_table._manifest(1)
    assert m1["op"] == "insert" and files_v0 <= set(m1["files"])
    full = IVFIndex.build(
        spark, str(tmp_path / "full"), emb, "vec_id", "embedding",
        dim=64, n_clusters=16,
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(idx.cells()) == key(full.cells())
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    assert _rows(idx.topk(emb, queries, k=5, n_probe=8)) == _rows(
        full.topk(emb, queries, k=5, n_probe=8)
    )


def test_missing_and_check_coverage(spark, tmp_path, emb):
    """Staleness is surfaced, not hidden (r5 ADVICE): missing() names
    the uncovered rows, check_coverage raises until the delta is
    appended."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex

    covered = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    idx = IVFIndex.build(
        spark, str(tmp_path / "ivf"), covered, "vec_id", "embedding",
        dim=64, n_clusters=8,
    )
    assert idx.missing(emb).count() == delta.count()
    with pytest.raises(ValueError, match="stale"):
        idx.topk(emb, queries, k=3, check_coverage=True)
    idx.append(delta)
    assert idx.missing(emb).count() == 0
    assert idx.topk(emb, queries, k=3, check_coverage=True).count() > 0

    pq = PQIndex.build(
        spark, str(tmp_path / "pq"), covered, "vec_id", "embedding",
        dim=64, m=16, codes=16,
    )
    assert pq.missing(emb).count() == delta.count()
    with pytest.raises(ValueError, match="stale"):
        pq.topk(emb, queries, k=3, rerank=10, check_coverage=True)
    pq.append(delta)
    assert pq.missing(emb).count() == 0


def test_null_id_corpus_rows_are_masked(spark, tmp_path, emb):
    """r5 ADVICE: a NULL corpus id turned the int id batch into
    float64+NaN inside the fused kernels and the typed output array
    raised.  NULL-id rows can never survive the rerank join (the
    Catalyst path dropped them too), so masking them pre-scoring is
    semantics-preserving — results must equal the NULL-free corpus."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import pq_adc_topk

    with_null = emb.unionByName(
        emb.limit(3).select(
            F.lit(None).cast("long").alias("vec_id"), "embedding", "label"
        )
    )
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    direct_clean = pq_adc_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=5, m=16, codes=16,
        rerank=50,
    )
    direct_null = pq_adc_topk(
        with_null, queries, "vec_id", "embedding", dim=64, k=5, m=16,
        codes=16, rerank=50,
    )
    assert _rows(direct_null) == _rows(direct_clean)

    idx = PQIndex.build(
        spark, str(tmp_path / "ix"), with_null, "vec_id", "embedding",
        dim=64, m=16, codes=16,
    )
    via_index = idx.topk(with_null, queries, k=5, rerank=50)
    assert _rows(via_index) == _rows(direct_clean)


def test_pq_delete_equals_subset_build_and_stale(spark, tmp_path, emb):
    """delete() is the erase twin of append() (reference ART::Delete):
    the surviving code table must be content-identical to one built
    over the survivors alone, and stale() must name exactly the
    deleted entries beforehand and nothing afterwards."""
    path = str(tmp_path / "ix")
    survivors = emb.filter(F.col("vec_id") % 3 != 0)
    doomed = emb.filter(F.col("vec_id") % 3 == 0)
    idx = PQIndex.build(
        spark, path, emb, "vec_id", "embedding", dim=64, m=16, codes=16,
    )
    assert idx.stale(survivors).count() == doomed.count()
    v = idx.delete(doomed.select("vec_id"))
    assert v == 1
    assert idx.codes_table._manifest(1)["op"] == "delete"
    assert idx.stale(survivors).count() == 0

    sub = PQIndex.build(
        spark, str(tmp_path / "sub"), survivors, "vec_id", "embedding",
        dim=64, m=16, codes=16,
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(idx.codes()) == key(sub.codes())
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    assert _rows(idx.topk(survivors, queries, k=5, rerank=50)) == _rows(
        sub.topk(survivors, queries, k=5, rerank=50)
    )
    # time travel still reads the pre-delete index
    assert idx.codes(0).count() == emb.count()


def test_ivf_delete_equals_subset_build_and_stale(spark, tmp_path, emb):
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex

    survivors = emb.filter(F.col("vec_id") % 3 != 0)
    doomed = emb.filter(F.col("vec_id") % 3 == 0)
    idx = IVFIndex.build(
        spark, str(tmp_path / "ivf"), emb, "vec_id", "embedding",
        dim=64, n_clusters=16,
    )
    assert idx.stale(survivors).count() == doomed.count()
    idx.delete(doomed.select("vec_id"))
    assert idx.stale(survivors).count() == 0
    sub = IVFIndex.build(
        spark, str(tmp_path / "sub"), survivors, "vec_id", "embedding",
        dim=64, n_clusters=16,
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(idx.cells()) == key(sub.cells())
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    # coverage check passes against the survivor corpus after delete
    assert _rows(
        idx.topk(survivors, queries, k=5, n_probe=8, check_coverage=True)
    ) == _rows(sub.topk(survivors, queries, k=5, n_probe=8))


def test_pq_upsert_roundtrip_restores_content(spark, tmp_path, emb):
    """delete + append of the same keys (the reference's ART UPDATE
    composition) must land the code table back at full-corpus content
    exactly, through two more CoW versions (time travel sees all
    three states)."""
    idx = PQIndex.build(
        spark, str(tmp_path / "ix"), emb, "vec_id", "embedding", dim=64,
        m=16, codes=16,
    )
    third = emb.filter(F.col("vec_id") % 3 == 0)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    before = key(idx.codes())
    idx.delete(third.select("vec_id"))
    assert idx.codes_table.latest_version() == 1
    n_third = third.count()
    assert len(key(idx.codes(1))) == len(before) - n_third
    idx.append(third)
    assert idx.codes_table.latest_version() == 2
    assert key(idx.codes()) == before

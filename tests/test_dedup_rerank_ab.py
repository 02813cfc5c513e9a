"""A/B pin: semantic_ivf_neardup_pairs(rerank='cell') must return the
identical (id_a, id_b, cosine) set as rerank='pair' — including on
degenerate inputs (zero-norm and NaN-containing vectors), where the
NaN-cosine pair is KEPT by both paths (Spark/DuckDB order NaN greater
than any double, so `cosine >= threshold` passes)."""

from __future__ import annotations

import math

import pytest

from data_chunk_compaction_in_duckdb_spark.pipeline.dedup import (
    semantic_ivf_neardup_pairs,
)

DIM = 8


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, emb array<double>")


def _pairs(df):
    out = set()
    for r in df.collect():
        c = r["cosine"]
        # NULL and NaN are distinct: both engines emit true NaN for a
        # NaN-element pair (the applyInArrow kernel preserves it; a
        # pandas kernel would silently turn NaN into NULL)
        if c is None:
            key = "null"
        elif math.isnan(c):
            key = "nan"
        else:
            key = round(c, 9)
        out.add((r["id_a"], r["id_b"], key))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    base = [float(i % 3 + 1) for i in range(DIM)]
    rows = []
    for i in range(24):
        v = [x + 0.001 * (i % 5) for x in base]
        rows.append((i, v))
    # near-identical pair
    rows.append((100, list(base)))
    rows.append((101, [x + 1e-9 for x in base]))
    # orthogonal-ish outlier
    rows.append((200, [1.0] + [0.0] * (DIM - 1)))
    return _mk(spark, rows)


def test_cell_equals_pair(spark, emb):
    a = semantic_ivf_neardup_pairs(
        emb, "id", "emb", DIM, n_clusters=4, threshold=0.9, rerank="cell"
    )
    b = semantic_ivf_neardup_pairs(
        emb, "id", "emb", DIM, n_clusters=4, threshold=0.9, rerank="pair"
    )
    pa, pb = _pairs(a), _pairs(b)
    assert pa == pb
    assert pa, "fixture must produce at least one near-dup pair"


def test_arrow_assign_equals_expr_assign(spark, emb):
    """The Arrow cell-assignment kernel must pick the identical cells as
    the sort_array/transform expression form — pinned through the final
    pair sets of both rerank kernels, on the clean fixture and with a
    NaN-element vector (exercising argsort's NaN-last == Spark's
    NaN-greatest struct sort) and a zero vector (all dots 0, ties broken
    by centroid index in both paths)."""
    bad = _mk(
        spark,
        [
            (300, [0.0] * DIM),
            (301, [float("nan")] + [1.0] * (DIM - 1)),
        ],
    )
    full = emb.unionAll(bad)
    for rerank in ("cell", "pair"):
        a = semantic_ivf_neardup_pairs(
            full, "id", "emb", DIM, n_clusters=4, threshold=0.9,
            rerank=rerank, assign="arrow",
        )
        b = semantic_ivf_neardup_pairs(
            full, "id", "emb", DIM, n_clusters=4, threshold=0.9,
            rerank=rerank, assign="expr",
        )
        assert _pairs(a) == _pairs(b), f"assign kernels diverge ({rerank})"


def test_cell_equals_pair_degenerate(spark, emb):
    """Degenerate vectors, aligned with DuckDB's oracle semantics:

    - zero-norm vector -> denominator 0 -> DuckDB ``x/0.0`` is NULL and
      Spark uses ``try_divide`` -> pair DROPPED by the ``>=`` filter;
    - NaN element (nonzero norm) -> NaN cosine -> both engines order NaN
      greater than any double -> pair KEPT.

    Both rerank kernels must agree with each other on both cases."""
    bad = _mk(
        spark,
        [
            (300, [0.0] * DIM),  # zero norm -> NULL cosine -> dropped
            (301, [float("nan")] + [1.0] * (DIM - 1)),  # NaN -> kept
        ],
    )
    full = emb.unionAll(bad)
    a = semantic_ivf_neardup_pairs(
        full, "id", "emb", DIM, n_clusters=4, threshold=0.9, rerank="cell"
    )
    b = semantic_ivf_neardup_pairs(
        full, "id", "emb", DIM, n_clusters=4, threshold=0.9, rerank="pair"
    )
    pa, pb = _pairs(a), _pairs(b)
    assert pa == pb
    assert any(k == "nan" for (_, _, k) in pa), (
        "the NaN-element vector must surface at least one NaN-cosine "
        "pair kept by both kernels"
    )
    zero_norm_pairs = {
        p for p in pa if (300 in (p[0], p[1])) and 301 not in (p[0], p[1])
    }
    assert not zero_norm_pairs, (
        "zero-norm pairs have a 0 denominator -> NULL cosine -> dropped"
    )

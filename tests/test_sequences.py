"""CREATE SEQUENCE / nextval analog (storage/sequence.py; reference
test/sql/catalog/sequence/test_sequence.test)."""

from __future__ import annotations

import multiprocessing
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.storage import (
    Sequence,
    SequenceExhausted,
    with_sequence,
)


@pytest.fixture
def tmp_path_str(tmp_path):
    return str(tmp_path)


def test_defaults_ascending(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s")
    assert s.nextval() == 1
    assert s.nextval() == 2
    assert s.currval() == 2
    assert s.peek() == 3


def test_defaults_descending(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s", increment=-1)
    assert s.nextval() == -1
    assert s.nextval() == -2


def test_start_increment(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s", start=100, increment=7)
    assert [s.nextval() for _ in range(3)] == [100, 107, 114]


def test_currval_before_nextval_errors(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s")
    with pytest.raises(ValueError, match="currval"):
        s.currval()
    # a second handle on the same log has its own session-local currval
    s.nextval()
    other = Sequence(spark, tmp_path_str + "/s")
    with pytest.raises(ValueError, match="currval"):
        other.currval()


def test_maxvalue_exhaustion_no_cycle(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s", start=1, maxvalue=3)
    assert [s.nextval() for _ in range(3)] == [1, 2, 3]
    with pytest.raises(SequenceExhausted):
        s.nextval()


def test_cycle_wraps_to_minvalue(spark, tmp_path_str):
    s = Sequence.create(
        spark, tmp_path_str + "/s", start=2, minvalue=1, maxvalue=3,
        cycle=True,
    )
    assert [s.nextval() for _ in range(5)] == [2, 3, 1, 2, 3]


def test_descending_cycle_wraps_to_maxvalue(spark, tmp_path_str):
    s = Sequence.create(
        spark, tmp_path_str + "/s", increment=-1, minvalue=1, maxvalue=3,
        cycle=True,
    )
    assert [s.nextval() for _ in range(4)] == [3, 2, 1, 3]


def test_claim_batch_is_consecutive(spark, tmp_path_str):
    s = Sequence.create(spark, tmp_path_str + "/s", start=10, increment=5)
    assert s.claim(4) == [10, 15, 20, 25]
    assert s.nextval() == 30


def test_invalid_params(spark, tmp_path_str):
    with pytest.raises(ValueError, match="increment"):
        Sequence.create(spark, tmp_path_str + "/a", increment=0)
    with pytest.raises(ValueError, match="outside"):
        Sequence.create(spark, tmp_path_str + "/b", start=0, minvalue=1)


def test_with_sequence_assigns_progression(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="seqtest_")
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    s = Sequence.create(spark, root + "/s", start=1000, increment=3)
    s.nextval()  # advance head so the claim starts at 1003
    out = with_sequence(nat, s, "sid", order=["n_nationkey"]).collect()
    got = {r["n_nationkey"]: r["sid"] for r in out}
    keys = sorted(got)
    assert [got[k] for k in keys] == [1003 + 3 * i for i in range(len(keys))]
    # the claim advanced the shared counter past the whole range
    assert s.peek() == 1003 + 3 * len(keys)


def test_with_sequence_empty_df(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="seqtest_")
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).filter(
        F.lit(False)
    )
    s = Sequence.create(spark, root + "/s")
    out = with_sequence(nat, s, "sid", order=["n_nationkey"])
    assert out.count() == 0
    assert "sid" in out.columns
    assert s.peek() == 1  # nothing claimed


def test_with_sequence_rejects_wrapping_cycle(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="seqtest_")
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    s = Sequence.create(
        spark, root + "/s", minvalue=1, maxvalue=5, cycle=True
    )
    with pytest.raises(ValueError, match="CYCLE"):
        with_sequence(nat, s, "sid", order=["n_nationkey"])


def _claim_worker(args):
    """Claim batches against the shared log from a separate process —
    no Spark needed; the allocator is pure commit-log arithmetic."""
    path, n_claims, batch = args
    seq = Sequence(None, path)
    got = []
    for _ in range(n_claims):
        got.extend(seq.claim(batch))
    return got


def test_concurrent_claims_never_overlap(spark, tmp_path_str):
    """Reference test/sql/catalog/sequence concurrency contract: racing
    allocators (real processes, shared on-disk log) must partition the
    value space — every value exactly once, no gaps."""
    path = tmp_path_str + "/s"
    Sequence.create(spark, path, start=0, minvalue=0)
    workers, n_claims, batch = 4, 10, 3
    with multiprocessing.Pool(workers) as pool:
        results = pool.map(
            _claim_worker, [(path, n_claims, batch)] * workers
        )
    allvals = [v for r in results for v in r]
    total = workers * n_claims * batch
    assert sorted(allvals) == list(range(total))
    # each worker's individual claims are internally consecutive
    for r in results:
        for i in range(0, len(r), batch):
            chunk = r[i : i + batch]
            assert chunk == list(range(chunk[0], chunk[0] + batch))

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


# ------------------------------------------------- O(1) claim_range


def test_claim_range_ten_million_is_o1(spark, tmp_path_str, monkeypatch):
    """The 100 TB allocation pin: a 10^7-value claim must run the
    closed-form path ONLY — no per-value loop, no value list (the
    round-5 scale-killer: claim(n) built an n-element Python list and
    with_sequence called it with count(df))."""
    s = Sequence.create(spark, tmp_path_str + "/s", start=5, increment=3)

    def boom(self, m, n):
        raise AssertionError("per-value _advance loop ran on a bulk claim")

    monkeypatch.setattr(Sequence, "_advance", boom)
    first, last = s.claim_range(10_000_000)
    assert first == 5
    assert last == 5 + 3 * (10_000_000 - 1)
    assert s.peek() == last + 3
    assert s.currval() == last
    # a follow-up single claim continues exactly after the bulk range
    monkeypatch.undo()
    assert s.nextval() == last + 3


def test_claim_range_matches_loop_replay(spark, tmp_path_str):
    """Closed-form ≡ loop equivalence sweep: for a grid of
    (start, increment, bounds, cycle, n) the O(1) _advance_range must
    produce the same (first, last, successor-state) as n successive
    nextval steps — including wrap re-anchoring and the
    exhausted-keeps-last 'next' of the reference
    (test/sql/catalog/sequence/sequence_overflow.test)."""
    cases = [
        dict(start=1, increment=1, minvalue=1, maxvalue=50, cycle=False),
        dict(start=7, increment=3, minvalue=1, maxvalue=40, cycle=False),
        dict(start=2, increment=1, minvalue=1, maxvalue=5, cycle=True),
        dict(start=9, increment=-2, minvalue=-6, maxvalue=9, cycle=True),
        dict(start=-1, increment=-1, minvalue=-9, maxvalue=-1, cycle=False),
        dict(start=3, increment=4, minvalue=2, maxvalue=18, cycle=True),
    ]
    for i, kw in enumerate(cases):
        for n in (1, 2, 3, 7, 12):
            a = Sequence.create(
                spark, f"{tmp_path_str}/a{i}_{n}", **kw
            )
            b = Sequence.create(
                spark, f"{tmp_path_str}/b{i}_{n}", **kw
            )
            try:
                first, last = a.claim_range(n)
                ok = True
            except SequenceExhausted:
                ok = False
            if ok:
                vals = [b.nextval() for _ in range(n)]
                assert (first, last) == (vals[0], vals[-1]), (kw, n)
                ma, mb = a._latest(), b._latest()
                for k in ("next", "exhausted", "last_value"):
                    assert ma[k] == mb[k], (kw, n, k)
            else:
                with pytest.raises(SequenceExhausted):
                    for _ in range(n):
                        b.nextval()


def test_with_sequence_never_builds_value_list(spark, sf_dir, monkeypatch):
    """with_sequence must ride claim_range, never the list-form claim."""
    root = tempfile.mkdtemp(prefix="seqtest_")
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    s = Sequence.create(spark, root + "/s", start=100, increment=2)

    def boom(self, n, max_retries=64):
        raise AssertionError("with_sequence used the list-form claim")

    monkeypatch.setattr(Sequence, "claim", boom)
    out = with_sequence(nat, s, "sid", order=["n_nationkey"]).collect()
    got = {r["n_nationkey"]: r["sid"] for r in out}
    keys = sorted(got)
    assert [got[k] for k in keys] == [100 + 2 * i for i in range(len(keys))]


def test_cycle_wrap_toctou_fails_atomically(spark, tmp_path_str):
    """ADVICE r5 TOCTOU: with_sequence's wrap pre-check reads one head,
    but a concurrent claimer can advance it before the claim commits.
    The no_wrap flag re-checks on the SAME state the commit lands on,
    so the race surfaces as the CYCLE ValueError — never a silent wrap
    assigning duplicate values."""
    path = tmp_path_str + "/s"
    seq = Sequence.create(
        spark, path, minvalue=1, maxvalue=10, cycle=True
    )
    df = spark.range(4).select(F.col("id").cast("long").alias("k"))
    stale = seq._latest()  # span 10: pre-check would pass for n=4
    Sequence(spark, path).claim(8)  # concurrent claimer: 3 values left
    real_latest = seq._latest
    calls = {"n": 0}

    def first_stale():
        calls["n"] += 1
        return stale if calls["n"] == 1 else real_latest()

    seq._latest = first_stale
    with pytest.raises(ValueError, match="CYCLE"):
        with_sequence(df, seq, "sid", order=["k"])
    # nothing was committed by the failed attempt
    assert real_latest()["version"] == 1


def test_claim_range_no_wrap_ok_when_it_fits(spark, tmp_path_str):
    s = Sequence.create(
        spark, tmp_path_str + "/s", minvalue=1, maxvalue=10, cycle=True
    )
    assert s.claim_range(10, no_wrap=True) == (1, 10)
    # next claim starts on the wrapped anchor — still no wrap inside it
    assert s.claim_range(3, no_wrap=True) == (1, 3)
    with pytest.raises(ValueError, match="wrap"):
        s.claim_range(9, no_wrap=True)


def test_claim_range_overflow_bounds(spark, tmp_path_str):
    """I64-edge arithmetic: closed-form bounds math near maxvalue must
    match the reference's overflow error semantics — DuckDB never hands
    out a value whose SUCCESSOR overflows int64 (probed: START 2^63-2
    yields ONE value then 'reached maximum value'), so with the default
    MAXVALUE the last returnable value is 2^63-1-increment
    (sequence_overflow.test; pinned dual-engine by
    tests/sqllogic/sequence_overflow.test)."""
    hi = (1 << 63) - 1
    s = Sequence.create(spark, tmp_path_str + "/s", start=hi - 1)
    with pytest.raises(SequenceExhausted):
        s.claim_range(2)  # hi itself is not returnable: successor overflows
    assert s.claim_range(1) == (hi - 1, hi - 1)
    with pytest.raises(SequenceExhausted):
        s.nextval()
    d = Sequence.create(
        spark, tmp_path_str + "/d", start=hi - 6, increment=3
    )
    # values hi-6 and hi-3 fit (successors hi-3, hi representable);
    # hi itself would need successor hi+3 — excluded, like DuckDB
    with pytest.raises(SequenceExhausted):
        d.claim_range(3)
    assert d.claim_range(2) == (hi - 6, hi - 3)
    # an EXPLICIT maxvalue away from the type edge is itself returnable
    e = Sequence.create(spark, tmp_path_str + "/e", start=1, maxvalue=3)
    assert e.claim_range(3) == (1, 3)
    with pytest.raises(SequenceExhausted):
        e.nextval()


# -------------------------------------------- head lookup + retention


def test_thousand_claims_read_one_manifest(spark, tmp_path_str):
    """O(1) head pin (mirror of the versioned store's
    test_thousand_version_read_opens_one_manifest): after 1,000 claims
    a cold handle's peek() must parse exactly ONE manifest — the _last
    pointer + forward probe, no directory glob replay."""
    path = tmp_path_str + "/s"
    s = Sequence.create(spark, path, start=0, minvalue=0)
    for _ in range(1000):
        s.nextval()
    assert s.latest_version() == 1000
    assert s._read_last_pointer() == 1000

    opens = []
    real = Sequence._manifest

    def counting(self, version):
        opens.append(version)
        return real(self, version)

    Sequence._manifest = counting
    try:
        fresh = Sequence(spark, path)
        assert fresh.peek() == 1000
    finally:
        Sequence._manifest = real
    assert opens == [1000], opens


def test_seq_stale_pointer_self_heals(spark, tmp_path_str):
    path = tmp_path_str + "/s"
    s = Sequence.create(spark, path)
    s.nextval()
    s.nextval()
    assert s.latest_version() == 2
    with open(os.path.join(s.log_dir, "_last"), "w") as f:
        f.write("0")
    assert s.latest_version() == 2
    os.unlink(os.path.join(s.log_dir, "_last"))
    assert s.latest_version() == 2
    with open(os.path.join(s.log_dir, "_last"), "w") as f:
        f.write("junk")
    assert s.latest_version() == 2


def test_vacuum_folds_old_claims(spark, tmp_path_str):
    """Retention: every manifest is a complete allocator state, so
    folding history keeps allocation exact while the log dir stays
    O(retain_last) — sequences commit once per nextval, far hotter
    than table manifests."""
    path = tmp_path_str + "/s"
    s = Sequence.create(spark, path, start=10, increment=5)
    for _ in range(50):
        s.nextval()
    removed = s.vacuum(retain_last=2)
    assert len(removed) == 49  # versions 0..48 folded; 49+50 retained
    kept = sorted(p for p in os.listdir(s.log_dir) if p.endswith(".json"))
    assert kept == ["00000049.json", "00000050.json"]
    assert s.nextval() == 10 + 5 * 50
    # cold handle with NO pointer file still resolves via glob fallback
    os.unlink(os.path.join(s.log_dir, "_last"))
    fresh = Sequence(spark, path)
    assert fresh.nextval() == 10 + 5 * 51


def test_info_matches_duckdb_sequences(spark, tmp_path_str):
    """duckdb_sequences() parity at the single-sequence grain: replay
    the same DDL + allocations in real DuckDB and compare the metadata
    columns the engine reports (introspect.duckdb_sequences rides
    this .info())."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE SEQUENCE s1 START 5 INCREMENT 3 MAXVALUE 100;"
        "CREATE SEQUENCE s2 INCREMENT -2 MINVALUE -50 MAXVALUE 10 CYCLE;"
        "CREATE SEQUENCE fresh START 42;"
    )
    con.execute("SELECT nextval('s1') FROM range(4)")
    con.execute("SELECT nextval('s2')")
    s1 = Sequence.create(
        spark, tmp_path_str + "/s1", start=5, increment=3, maxvalue=100
    )
    s1.claim(4)
    s2 = Sequence.create(
        spark, tmp_path_str + "/s2", increment=-2, minvalue=-50,
        maxvalue=10, cycle=True,
    )
    s2.nextval()
    Sequence.create(spark, tmp_path_str + "/fresh", start=42)
    rows = con.execute(
        "SELECT sequence_name, start_value, min_value, max_value,"
        "       increment_by, cycle, last_value "
        "FROM duckdb_sequences() ORDER BY sequence_name"
    ).fetchall()
    got = sorted(
        (
            tuple(
                Sequence(spark, tmp_path_str + "/" + n).info()[k]
                for k in (
                    "sequence_name", "start_value", "min_value",
                    "max_value", "increment_by", "cycle", "last_value",
                )
            )
            for n in ("s1", "s2", "fresh")
        )
    )
    assert got == sorted(tuple(r) for r in rows)


def _range_worker(args):
    """claim_range batches from a separate process (closed-form path)."""
    path, n_claims, batch = args
    seq = Sequence(None, path)
    got = []
    for _ in range(n_claims):
        first, last = seq.claim_range(batch)
        got.extend(range(first, last + 1))
    return got


def test_concurrent_mixed_claim_forms_never_overlap(spark, tmp_path_str):
    """The closed-form claim_range and the list-form claim commit the
    SAME manifest shape, so racing processes mixing both forms must
    still partition the value space exactly — every value exactly once,
    no gaps (the round-6 allocator rewrite cannot have weakened the
    round-5 linearizability contract)."""
    path = tmp_path_str + "/s"
    Sequence.create(spark, path, start=0, minvalue=0)
    n_claims, batch = 8, 3
    with multiprocessing.Pool(4) as pool:
        r1 = pool.map_async(
            _claim_worker, [(path, n_claims, batch)] * 2
        )
        r2 = pool.map_async(
            _range_worker, [(path, n_claims, batch)] * 2
        )
        results = r1.get() + r2.get()
    allvals = [v for r in results for v in r]
    total = 4 * n_claims * batch
    assert sorted(allvals) == list(range(total))
    for r in results:
        for i in range(0, len(r), batch):
            chunk = r[i : i + batch]
            assert chunk == list(range(chunk[0], chunk[0] + batch))

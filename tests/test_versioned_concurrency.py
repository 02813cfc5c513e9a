"""Concurrent-writer stress + manifest-scalability pins for the
versioned store (reference test/sql/transactions/ optimistic-conflict
semantics; storage/versioned.py O_EXCL commit log)."""

from __future__ import annotations

import json
import multiprocessing
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_chunk_compaction_in_duckdb_spark.storage import (
    CommitConflictError,
    VersionedTable,
)

# slow profile (multiprocess commit-race stress, 52 s) — deep-verification layer, excluded from the
# default CI selection (pytest.ini); run with -m "" / -m slow
import pytest as _pytest

pytestmark = _pytest.mark.slow

_SCHEMA = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _worker(args) -> dict:
    """One real session racing the shared log: 40 inserts, 8 self-scoped
    deletes, 2 checkpoints — every commit retried through
    CommitConflictError until it lands.  Returns what this worker got
    committed so the parent can assert exact content."""
    path, wid = args
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"vt_stress_{wid}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        vt = VersionedTable(spark, path)
        inserted: list[int] = []
        deleted: list[int] = []
        conflicts = 0

        def retry(fn, what):
            nonlocal conflicts
            for _ in range(200):
                try:
                    return fn()
                except CommitConflictError:
                    conflicts += 1
            raise AssertionError(f"{what} lost 200 straight races")

        for i in range(50):
            if i % 25 == 24:
                retry(lambda: vt.checkpoint(2), "checkpoint")
            elif i % 6 == 5:
                victim = inserted[len(deleted)]
                retry(
                    lambda v=victim: vt.delete_where(
                        (F.col("tag") == f"w{wid}") & (F.col("seq") == v)
                    ),
                    "delete",
                )
                deleted.append(victim)
            else:
                seq = wid * 1000 + i
                batch = spark.createDataFrame(
                    [(f"w{wid}", seq), (f"w{wid}", seq)], _SCHEMA
                )
                retry(lambda b=batch: vt.insert(b), "insert")
                inserted.append(seq)
        return {
            "wid": wid,
            "inserted": inserted,
            "deleted": deleted,
            "conflicts": conflicts,
        }
    finally:
        spark.stop()


def test_concurrent_writers_linearizable(spark, tmp_path):
    """Two real sessions (separate processes, separate JVMs) drive 100
    racing commits through the one on-disk log.  Afterwards: the
    version sequence is gapless and single-writer per version, every
    file the surviving manifests reference exists, and the table
    content is EXACTLY v0 + all acknowledged inserts - all acknowledged
    deletes — no lost update, no resurrected row."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame([("base", 0)], _SCHEMA)
    VersionedTable.create(spark, path, base)

    ctx = multiprocessing.get_context("spawn")
    with ctx.Pool(2) as pool:
        reports = pool.map(_worker, [(path, 1), (path, 2)])

    vt = VersionedTable(spark, path)
    latest = vt.latest_version()
    # 1 create + 2 workers x 50 commits, each version exactly once
    assert latest == 100, latest
    for v in range(latest + 1):
        assert os.path.exists(
            os.path.join(vt.log_dir, f"{v:08d}.json")
        ), f"gap at version {v}"
    # no lost files: everything any manifest references is on disk
    for v in range(latest + 1):
        for f in vt._manifest(v)["files"]:
            assert os.path.exists(os.path.join(path, f)), (v, f)
    # exact content (each insert wrote its seq twice)
    expect: dict[tuple, int] = {("base", 0): 1}
    for r in reports:
        for s in r["inserted"]:
            expect[(f"w{r['wid']}", s)] = 2
        for s in r["deleted"]:
            del expect[(f"w{r['wid']}", s)]
    got: dict[tuple, int] = {}
    for row in vt.read().collect():
        got[(row["tag"], row["seq"])] = got.get((row["tag"], row["seq"]), 0) + 1
    assert got == expect
    # the race was real: at least one conflict was retried
    assert sum(r["conflicts"] for r in reports) > 0


def test_thousand_version_read_opens_one_manifest(spark, tmp_path):
    """Manifest-history scalability pin: after 1,000 commits, read()
    must parse exactly ONE manifest (the head), and latest_version()
    must resolve through the _last pointer without a directory glob of
    growing cost.  Commits here reuse v0's file list through the real
    _commit path so the loop is metadata-only."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame([("base", 0)], _SCHEMA)
    vt = VersionedTable.create(spark, path, base)
    m0 = vt._manifest(0)
    for v in range(1, 1001):
        vt._commit(
            v,
            "noop",
            m0["files"],
            schema=vt._logical_schema(m0),
            mapping=m0["mapping"],
            used_physical=m0["used_physical"],
            constraints=m0.get("constraints", []),
            generated=m0.get("generated", {}),
        )
    assert vt.latest_version() == 1000
    assert vt._read_last_pointer() == 1000

    opens = []
    real = VersionedTable._manifest

    def counting(self, version):
        opens.append(version)
        return real(self, version)

    VersionedTable._manifest = counting
    try:
        fresh = VersionedTable(spark, path)  # cold handle, no cache
        df = fresh.read()
        n = df.count()
    finally:
        VersionedTable._manifest = real
    assert n == 1
    assert opens == [1000], opens


def test_stale_pointer_self_heals(spark, tmp_path):
    """A stale-behind _last pointer (crash between manifest link and
    pointer write, or a lost pointer race) must still resolve to the
    true head via the forward probe; a deleted pointer falls back to
    the glob."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame([("base", 0)], _SCHEMA)
    vt = VersionedTable.create(spark, path, base)
    vt.insert(base)
    vt.insert(base)
    assert vt.latest_version() == 2
    with open(os.path.join(vt.log_dir, "_last"), "w") as f:
        f.write("0")
    assert vt.latest_version() == 2
    os.unlink(os.path.join(vt.log_dir, "_last"))
    assert vt.latest_version() == 2
    # corrupt pointer is ignored, not fatal
    with open(os.path.join(vt.log_dir, "_last"), "w") as f:
        f.write("not-a-number")
    assert vt.latest_version() == 2


def test_torn_manifest_never_visible(spark, tmp_path):
    """The write-then-link publish contract: no reader can ever observe
    a manifest file that json.load fails on.  Simulate the old failure
    (an empty file globbed mid-write) is impossible now — every *.json
    under _log parses at any moment during a commit burst."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame([("base", 0)], _SCHEMA)
    vt = VersionedTable.create(spark, path, base)
    for _ in range(5):
        vt.insert(base)
    import glob as _g

    for p in _g.glob(os.path.join(vt.log_dir, "*.json")):
        with open(p) as f:
            json.load(f)  # must never raise
    # and no tmp droppings remain
    assert not _g.glob(os.path.join(vt.log_dir, "*.tmp.*"))

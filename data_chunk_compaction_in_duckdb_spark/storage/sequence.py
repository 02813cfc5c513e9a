"""CREATE SEQUENCE / nextval analog over the versioned-store commit log.

Reference surface: DuckDB sequences (src/catalog/catalog_entry/
sequence_catalog_entry.cpp; test/sql/catalog/sequence/test_sequence.test)
— START WITH / INCREMENT BY / MINVALUE / MAXVALUE / CYCLE, ``nextval``
and ``currval``.

Spark-first shape: a single-row counter cannot be advanced per row of a
distributed plan without serializing every task through one lock, so the
engine exposes sequence values at two grains:

* ``nextval()`` / ``claim(n)`` — driver-side, one O_EXCL manifest commit
  per allocation (the same linearizable commit primitive as
  ``VersionedTable._commit``; writer-writer races surface as
  ``CommitConflictError`` and allocation retries, so concurrently claimed
  ranges never overlap).
* ``with_sequence(df, seq, out_col, order)`` — the distributed path: ONE
  range claim for the whole DataFrame (count rows, claim once), then the
  broadcast prefix-count numbering from ``operators.joins`` assigns
  ``first + rn*increment`` per row.  100 TB shape: one tiny commit +
  one range-partitioned numbering pass; the counter never becomes a
  per-row bottleneck.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, functions as F

from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
    CommitConflictError,
)

_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


class SequenceExhausted(RuntimeError):
    """Non-CYCLE sequence ran past its bound (DuckDB: 'nextval: reached
    maximum value of sequence')."""


class Sequence:
    """A named monotonic allocator rooted at ``path`` with one
    ``_seqlog/<version>.json`` per allocation batch."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_seqlog")
        self._currval: int | None = None  # per-instance, like per-connection

    # ------------------------------------------------------------ setup

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        start: int | None = None,
        increment: int = 1,
        minvalue: int | None = None,
        maxvalue: int | None = None,
        cycle: bool = False,
    ) -> "Sequence":
        """CREATE SEQUENCE: defaults mirror the reference — ascending
        sequences start at MINVALUE (default 1), descending at MAXVALUE
        (default -1)."""
        if increment == 0:
            raise ValueError("increment must be non-zero")
        if increment > 0:
            minvalue = 1 if minvalue is None else minvalue
            maxvalue = _I64_MAX if maxvalue is None else maxvalue
            start = minvalue if start is None else start
        else:
            maxvalue = -1 if maxvalue is None else maxvalue
            minvalue = _I64_MIN if minvalue is None else minvalue
            start = maxvalue if start is None else start
        if not (minvalue <= start <= maxvalue):
            raise ValueError(
                f"start {start} outside [{minvalue}, {maxvalue}]"
            )
        s = cls(spark, path)
        os.makedirs(s.log_dir, exist_ok=True)
        s._commit_version(
            0,
            {
                "version": 0,
                "op": "create",
                "next": start,  # the NEXT value nextval will return
                "exhausted": False,
                "start": start,
                "increment": increment,
                "minvalue": minvalue,
                "maxvalue": maxvalue,
                "cycle": cycle,
            },
        )
        return s

    def _commit_version(self, version: int, manifest: dict) -> None:
        # write-then-link publish: the manifest becomes visible under its
        # final name fully written AND exclusively (os.link fails with
        # FileExistsError on a racing commit) — a bare O_EXCL+write lets
        # concurrent readers glob a created-but-not-yet-written file
        p = os.path.join(self.log_dir, f"{version:08d}.json")
        tmp = p + f".tmp.{os.getpid()}.{id(manifest)}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, p)
        except FileExistsError:
            raise CommitConflictError(
                f"sequence version {version} already committed"
            ) from None
        finally:
            os.unlink(tmp)

    def _latest(self) -> dict:
        versions = [
            int(os.path.basename(p)[:-5])
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
        ]
        if not versions:
            raise FileNotFoundError(f"no sequence log under {self.log_dir}")
        with open(
            os.path.join(self.log_dir, f"{max(versions):08d}.json")
        ) as f:
            return json.load(f)

    # ------------------------------------------------------- allocation

    def _advance(self, m: dict, n: int) -> tuple[list[int] | None, dict]:
        """Values for an n-claim from state ``m`` plus the successor
        state.  Returns (None, m) only when already exhausted."""
        inc, lo, hi = m["increment"], m["minvalue"], m["maxvalue"]
        vals: list[int] = []
        nxt, exhausted = m["next"], m["exhausted"]
        for _ in range(n):
            if exhausted:
                raise SequenceExhausted(
                    f"sequence at {self.path} reached its "
                    f"{'maximum' if inc > 0 else 'minimum'} value"
                )
            vals.append(nxt)
            stepped = nxt + inc
            if lo <= stepped <= hi:
                nxt = stepped
            elif m["cycle"]:
                nxt = lo if inc > 0 else hi
            else:
                exhausted = True  # current claim stands; NEXT one errors
        out = dict(m)
        out["next"] = nxt
        out["exhausted"] = exhausted
        return vals, out

    def claim(self, n: int, max_retries: int = 64) -> list[int]:
        """Atomically allocate ``n`` consecutive sequence values (one
        commit).  Linearizable across concurrent claimers: a racing
        commit surfaces as CommitConflictError and the claim retries on
        the new head, so no two claimers ever receive the same value."""
        if n <= 0:
            return []
        for _ in range(max_retries):
            m = self._latest()
            vals, out = self._advance(m, n)
            out["version"] = m["version"] + 1
            out["op"] = f"claim:{n}"
            try:
                self._commit_version(out["version"], out)
            except CommitConflictError:
                continue
            self._currval = vals[-1]
            return vals
        raise CommitConflictError(
            f"sequence claim lost {max_retries} straight races"
        )

    def nextval(self) -> int:
        """DuckDB nextval('seq')."""
        return self.claim(1)[0]

    def currval(self) -> int:
        """DuckDB currval('seq'): the last value THIS instance obtained;
        error when nextval has not been called yet (matching the
        reference's 'sequence is not yet defined in this session')."""
        if self._currval is None:
            raise ValueError(
                "currval: nextval has not yet been called in this session"
            )
        return self._currval

    def peek(self) -> int:
        """The value the next nextval() would return (introspection)."""
        return self._latest()["next"]


def with_sequence(
    df: DataFrame,
    seq: Sequence,
    out_col: str,
    order: list[str],
) -> DataFrame:
    """Assign one sequence value per row of ``df`` in ``order``: ONE
    atomic range claim sized by count(df), then distributed prefix-count
    numbering maps row i to ``first + i*increment``.

    CYCLE sequences are rejected here (a wrapped range is not an
    arithmetic progression, so per-row values would need a driver-side
    list — exactly the non-distributed shape this operator exists to
    avoid); claim rows one batch at a time instead."""
    n = df.count()
    m = seq._latest()
    if m["cycle"]:
        lo, hi, inc = m["minvalue"], m["maxvalue"], m["increment"]
        span = (hi - m["next"]) // inc if inc > 0 else (m["next"] - lo) // -inc
        if n > span + 1:
            raise ValueError(
                "with_sequence on a CYCLE sequence would wrap inside one "
                "claim; allocate in bounded batches instead"
            )
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    vals = seq.claim(n)
    first, inc = vals[0], m["increment"]
    from data_chunk_compaction_in_duckdb_spark.operators.joins import (
        _global_row_number,
    )

    numbered = _global_row_number(df, order, "_seq_rn")
    return numbered.withColumn(
        out_col,
        (F.lit(first) + (F.col("_seq_rn") - 1) * F.lit(inc)).cast("long"),
    ).drop("_seq_rn")

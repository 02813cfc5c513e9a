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
  ranges never overlap).  ``claim`` materializes the value list and is
  the SMALL-explicit-claim form; ``claim_range`` is the O(1) closed-form
  allocation (no per-value loop, no list) that scales to any n.
* ``with_sequence(df, seq, out_col, order)`` — the distributed path: ONE
  closed-form range claim for the whole DataFrame (count rows, commit
  once — O(1) driver CPU and memory regardless of row count), then the
  broadcast prefix-count numbering from ``operators.joins`` assigns
  ``first + rn*increment`` per row.  100 TB shape: one tiny commit +
  one range-partitioned numbering pass; neither the counter nor the
  claimed range ever becomes per-row driver state.

Head lookup is O(1) via the same ``_last`` pointer + forward-probe
discipline as ``VersionedTable.latest_version`` (sequences allocate far
more versions than tables — every nextval is a commit), and
``vacuum(retain_last=...)`` folds old claim manifests away (each
manifest carries the complete allocator state, so history before the
horizon is purely archival).
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
        if minvalue >= maxvalue:
            # reference parity: DuckDB's 'MINVALUE (x) must be less than
            # MAXVALUE (y)' parser error
            raise ValueError(
                f"MINVALUE ({minvalue}) must be less than "
                f"MAXVALUE ({maxvalue})"
            )
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
                "last_value": None,  # no value allocated yet
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
        self._write_last_pointer(version)

    # ------------------------------------------------------ head lookup

    def _read_last_pointer(self) -> int | None:
        try:
            with open(os.path.join(self.log_dir, "_last")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def _write_last_pointer(self, version: int) -> None:
        """Best-effort monotonic hint, published atomically (torn reads
        impossible; a lost race just leaves a slightly stale hint that
        the forward probe corrects)."""
        p = os.path.join(self.log_dir, "_last")
        tmp = f"{p}.tmp.{os.getpid()}.{version}"
        try:
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, p)
        except OSError:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def latest_version(self) -> int:
        """O(1) head lookup (mirrors VersionedTable.latest_version,
        versioned.py): ``_last`` pointer hint + forward existence-probe;
        a missing/stale pointer falls back to ONE directory glob — the
        previous O(versions)-per-claim path, now the cold path only."""
        hint = self._read_last_pointer()
        if hint is not None and os.path.exists(
            os.path.join(self.log_dir, f"{hint:08d}.json")
        ):
            v = hint
            while os.path.exists(
                os.path.join(self.log_dir, f"{v + 1:08d}.json")
            ):
                v += 1
            return v
        versions = [
            int(os.path.basename(p)[:-5])
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
        ]
        if not versions:
            raise FileNotFoundError(f"no sequence log under {self.log_dir}")
        return max(versions)

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def _latest(self) -> dict:
        return self._manifest(self.latest_version())

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Fold pre-horizon claim manifests away (every manifest carries
        the complete allocator state, so old ones are purely archival).
        Same contract as ``VersionedTable.vacuum``: history before the
        horizon is gone; the head — the only state ``claim`` reads — is
        always retained.  Sequences accumulate versions far faster than
        tables (one per nextval), so periodic folding keeps the log
        directory O(retain_last)."""
        latest = self.latest_version()
        horizon = max(0, latest - retain_last + 1)
        removed = []
        for v in range(horizon):
            mp = os.path.join(self.log_dir, f"{v:08d}.json")
            if os.path.exists(mp):
                os.remove(mp)
                removed.append(os.path.basename(mp))
        return removed

    # ------------------------------------------------------- allocation

    @staticmethod
    def _eff_bounds(m: dict) -> tuple[int, int]:
        """Effective bounds with the reference's int64 overflow guard:
        a value is returnable only if its SUCCESSOR is representable —
        DuckDB's nextval errors computing the successor past int64, so
        e.g. with the default MAXVALUE (2^63-1) and INCREMENT 1 the
        last returnable value is 2^63-2 (verified against DuckDB,
        reference test/sql/catalog/sequence/sequence_overflow.test).
        For any bound not within one increment of the type edge these
        equal the declared bounds."""
        inc, lo, hi = m["increment"], m["minvalue"], m["maxvalue"]
        if inc > 0:
            return lo, min(hi, _I64_MAX - inc)
        return max(lo, _I64_MIN - inc), hi

    def _remaining_before_bound(self, m: dict) -> int:
        """How many values an allocation can hand out from state ``m``
        before hitting the (effective) bound — closed form: for
        ascending, values next, next+inc, ... <= maxvalue."""
        inc = m["increment"]
        lo, hi = self._eff_bounds(m)
        if inc > 0:
            if m["next"] > hi:
                return 0
            return (hi - m["next"]) // inc + 1
        if m["next"] < lo:
            return 0
        return (m["next"] - lo) // (-inc) + 1

    def _advance_range(
        self, m: dict, n: int, no_wrap: bool = False
    ) -> tuple[int, int, dict]:
        """O(1) closed-form n-claim from state ``m``: returns
        ``(first, last, successor_state)`` with NO per-value loop or
        list — pure arithmetic-progression math with explicit bound /
        wrap handling, state-identical to n successive nextval steps
        (pinned against the reference wrap/exhaustion semantics by
        tests/test_sequences.py property replay).

        ``no_wrap=True`` raises ValueError if a CYCLE sequence would
        wrap inside this claim — checked against the SAME state the
        commit is attempted on, so the with_sequence path cannot be
        raced into a silent wrap by a concurrent claimer (the TOCTOU
        a pre-claim peek had)."""
        inc = m["increment"]
        lo, hi = self._eff_bounds(m)
        if m["exhausted"]:
            raise SequenceExhausted(
                f"sequence at {self.path} reached its "
                f"{'maximum' if inc > 0 else 'minimum'} value"
            )
        first = m["next"]
        span = self._remaining_before_bound(m)  # values left before bound
        out = dict(m)
        if n <= span:
            last = first + (n - 1) * inc
            if n < span:
                out["next"], out["exhausted"] = first + n * inc, False
            elif m["cycle"]:
                # consumed exactly to the bound: next wraps
                out["next"], out["exhausted"] = (lo if inc > 0 else hi), False
            else:
                # DuckDB keeps next at the last handed-out value and
                # errors on the NEXT call (sequence_overflow.test)
                out["next"], out["exhausted"] = last, True
        elif not m["cycle"]:
            raise SequenceExhausted(
                f"sequence at {self.path} reached its "
                f"{'maximum' if inc > 0 else 'minimum'} value"
            )
        else:
            if no_wrap:
                raise ValueError(
                    "allocation would wrap inside one claim on a CYCLE "
                    "sequence; allocate in bounded batches instead"
                )
            # wrapped: after the first wrap the progression re-anchors at
            # the bound, period = full lo..hi span
            period = ((hi - lo) // inc + 1) if inc > 0 else ((lo - hi) // inc + 1)
            anchor = lo if inc > 0 else hi
            idx = (n - span - 1) % period
            last = anchor + idx * inc
            stepped = last + inc
            out["next"] = stepped if lo <= stepped <= hi else anchor
            out["exhausted"] = False
        out["last_value"] = last
        return first, last, out

    def _advance(self, m: dict, n: int) -> tuple[list[int], dict]:
        """Value LIST for an n-claim (per-value loop — the small
        explicit-claim form; CYCLE claims need it since a wrapped range
        is not one arithmetic progression).  Successor state comes from
        the closed form so both paths commit identical manifests."""
        inc = m["increment"]
        lo, hi = self._eff_bounds(m)
        first, _last, out = self._advance_range(m, n)
        vals: list[int] = []
        nxt = first
        for _ in range(n):
            vals.append(nxt)
            stepped = nxt + inc
            if lo <= stepped <= hi:
                nxt = stepped
            elif m["cycle"]:
                nxt = lo if inc > 0 else hi
        return vals, out

    def claim_range(
        self, n: int, no_wrap: bool = False, max_retries: int = 64
    ) -> tuple[int, int]:
        """Atomically allocate ``n`` sequence values in O(1) driver time
        and memory: ONE closed-form state step + ONE manifest commit,
        returning ``(first, last)`` — never a per-value list.  This is
        the 100 TB allocation form (a 10^11-row claim costs the same as
        a 1-row claim).  Linearizable across concurrent claimers exactly
        like ``claim``; with ``no_wrap=True`` a CYCLE wrap fails
        atomically inside the retry loop (checked on the same head the
        commit lands on — no peek/claim TOCTOU window)."""
        if n <= 0:
            raise ValueError("claim_range needs n >= 1")
        for _ in range(max_retries):
            m = self._latest()
            first, last, out = self._advance_range(m, n, no_wrap=no_wrap)
            out["version"] = m["version"] + 1
            out["op"] = f"claim:{n}"
            try:
                self._commit_version(out["version"], out)
            except CommitConflictError:
                continue
            self._currval = last
            return first, last
        raise CommitConflictError(
            f"sequence claim lost {max_retries} straight races"
        )

    def claim(self, n: int, max_retries: int = 64) -> list[int]:
        """Atomically allocate ``n`` consecutive sequence values (one
        commit) and return them as a list — the SMALL explicit-claim
        form (the list is O(n) driver memory by construction; bulk/
        distributed callers use ``claim_range``/``with_sequence``).
        Linearizable across concurrent claimers: a racing commit
        surfaces as CommitConflictError and the claim retries on the
        new head, so no two claimers ever receive the same value."""
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

    def info(self) -> dict:
        """duckdb_sequences()-shaped metadata from the head manifest
        (one O(1) read, no history replay): start/min/max/increment/
        cycle plus ``last_value`` — the most recently allocated value
        across ALL sessions, NULL before the first nextval (exactly
        DuckDB's duckdb_sequences().last_value semantics,
        src/function/table/system/duckdb_sequences.cpp)."""
        m = self._latest()
        # pre-r6 manifests lack last_value: derive it — any claim moved
        # next off start unless nothing was ever claimed
        last = m.get("last_value")
        if last is None and m["version"] > 0:
            last = (
                m["next"] if m["exhausted"] else m["next"] - m["increment"]
            )
        return {
            "sequence_name": os.path.basename(self.path.rstrip("/")),
            "start_value": m["start"],
            "min_value": m["minvalue"],
            "max_value": m["maxvalue"],
            "increment_by": m["increment"],
            "cycle": m["cycle"],
            "last_value": last,
        }


def with_sequence(
    df: DataFrame,
    seq: Sequence,
    out_col: str,
    order: list[str],
) -> DataFrame:
    """Assign one sequence value per row of ``df`` in ``order``: ONE
    atomic O(1) range claim sized by count(df) (``claim_range`` — no
    per-value list ever exists on the driver), then distributed
    prefix-count numbering maps row i to ``first + i*increment``.

    Wrapping CYCLE claims are rejected ATOMICALLY inside the claim's
    retry loop (a wrapped range is not an arithmetic progression, so
    per-row values would need driver-side state — exactly the
    non-distributed shape this operator exists to avoid); the check
    rides the same head the commit lands on, so a concurrent claimer
    advancing the sequence between count and claim cannot force a
    silent wrap."""
    n = df.count()
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    m = seq._latest()
    if m["cycle"]:
        # fast-fail with the operator-level message; claim_range's
        # no_wrap re-checks atomically on the commit head
        span = seq._remaining_before_bound(m)
        if n > span:
            raise ValueError(
                "with_sequence on a CYCLE sequence would wrap inside one "
                "claim; allocate in bounded batches instead"
            )
    try:
        first, _last = seq.claim_range(n, no_wrap=True)
    except ValueError as e:
        raise ValueError(
            "with_sequence on a CYCLE sequence would wrap inside one "
            "claim; allocate in bounded batches instead"
        ) from e
    inc = m["increment"]
    from data_chunk_compaction_in_duckdb_spark.operators.joins import (
        _global_row_number,
    )

    numbered = _global_row_number(df, order, "_seq_rn")
    return numbered.withColumn(
        out_col,
        (F.lit(first) + (F.col("_seq_rn") - 1) * F.lit(inc)).cast("long"),
    ).drop("_seq_rn")

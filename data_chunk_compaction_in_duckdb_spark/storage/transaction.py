"""Multi-statement transactions over the versioned store.

Reference parity (src/transaction/transaction_context.cpp,
transaction_manager.cpp, test/sql/transactions/):

  - BEGIN pins a snapshot: the first touch of each table records its
    latest version; every staged read/mutation runs against that base —
    a racing writer never leaks into the transaction (MVCC snapshot).
  - Statements stage; COMMIT publishes each table's net effect as ONE
    manifest commit at base+1.  A writer that slipped in between makes
    base+1 collide and the O_EXCL manifest link raises
    CommitConflictError — DuckDB's optimistic write-write conflict.
  - ROLLBACK discards the staging; nothing was ever visible to other
    readers (no data files are referenced by any manifest until
    COMMIT; orphans are vacuum-cleaned like any crashed write).
  - A failed statement (constraint violation) ABORTS the transaction:
    every later statement raises DuckDB's exact error
    ("TransactionContext Error: Current transaction is aborted (please
    ROLLBACK)"), COMMIT of an aborted transaction silently rolls back
    — both probed on DuckDB 1.0.  Binder-stage errors (bad column,
    missing table) do NOT abort, also probed.

Scale shape (100 TB): staging is file-granular copy-on-write, same as
the non-transactional mutations — DELETE/UPDATE locate affected files
among the not-yet-rewritten base files (a distributed distinct-file
scan, never a row collect), carry untouched files by reference, and
compose rewrites LAZILY on the staged frames.  COMMIT writes each
table's pending rows once (one union, one write job) and publishes one
manifest; a 50-statement transaction costs one data-write pass, not 50.

Cross-table atomicity: with a root transaction log (storage/txnlog.py,
``Engine.enable_atomic_commit``) COMMIT prepares every table's data
files and manifest first, then publishes ONE O_EXCL root record — the
single commit point of the reference's transaction_manager.cpp — so a
conflict publishes nothing and a root-log reader can never observe a
partial commit.  Without one (single-table transactions, legacy
callers), tables commit in name order with best-effort ``restore()``
compensation on a mid-sequence conflict.
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
    CommitConflictError,
    ConstraintViolation,
    VersionedTable,
)


class TransactionAborted(RuntimeError):
    """DuckDB's exact aborted-transaction error (probed)."""

    def __init__(self) -> None:
        super().__init__(
            "TransactionContext Error: Current transaction is aborted "
            "(please ROLLBACK)"
        )


class _StagedTable:
    """Per-table staging: ``carry`` (base files not yet rewritten, moved
    by reference at commit) + ``pending`` (lazy DataFrames of rewritten/
    inserted rows, written once at commit)."""

    def __init__(self, vt: VersionedTable):
        self.vt = vt
        self.base = vt.latest_version()
        self.m = vt._manifest(self.base)
        self.carry: set[str] = set(self.m["files"])
        self.pending: list[DataFrame] = []

    # -- reads -----------------------------------------------------------

    def _stored_cols(self) -> list[str]:
        return list(self.m["mapping"])

    def _with_generated(self, df: DataFrame) -> DataFrame:
        return VersionedTable._apply_generated(
            df.select(*self._stored_cols()), self.m
        )

    def read(self) -> DataFrame:
        """The transaction's view of the table: carried base files plus
        every staged frame (read-your-own-writes)."""
        frames: list[DataFrame] = []
        if self.carry:
            frames.append(self.vt._read_files_logical(self.m, self.carry))
        frames += [self._with_generated(p) for p in self.pending]
        if not frames:
            schema = VersionedTable._logical_schema(self.m)
            empty = self.vt.spark.createDataFrame([], schema)
            return VersionedTable._apply_generated(empty, self.m)
        return reduce(DataFrame.unionByName, frames)

    # -- mutations (all validate at statement time, like the reference:
    #    a ConstraintViolation here aborts the enclosing transaction) ----

    def insert(self, rows: DataFrame) -> None:
        aligned = rows.select(*self._stored_cols())
        self.vt._validate(
            aligned, self.m.get("constraints", []), current=self.read()
        )
        self.pending.append(aligned)

    def _affected_carry(self, cond: Column) -> set[str]:
        """Files among ``carry`` containing rows matching cond — the
        same metadata-sized distinct-file collect the non-transactional
        mutations use (versioned.py _affected_files), restricted to the
        not-yet-rewritten base files."""
        if not self.carry:
            return set()
        from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
            _strip_uri,
        )
        import os

        cur = self.vt._read_files_logical(self.m, self.carry).withColumn(
            "_vt_file", F.input_file_name()
        )
        hits = cur.filter(cond).select("_vt_file").distinct().collect()
        return {
            os.path.relpath(_strip_uri(r["_vt_file"]), self.vt.path)
            for r in hits
        }

    def delete_where(self, cond: Column) -> None:
        keep = ~cond | cond.isNull()
        affected = self._affected_carry(cond)
        new_pending = [
            self._with_generated(p).filter(keep) for p in self.pending
        ]
        if affected:
            new_pending.append(
                self.vt._read_files_logical(self.m, affected).filter(keep)
            )
            self.carry -= affected
        self.pending = new_pending

    def update_where(
        self, cond: Column, assignments: Mapping[str, Column]
    ) -> None:
        stored = set(self._stored_cols())
        bad = [c for c in assignments if c not in stored]
        if bad:
            raise ValueError(
                f"Binder Error: cannot UPDATE column(s) {bad} — not a "
                "stored column (generated columns are computed at read)"
            )

        from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
            apply_assignments,
        )

        def proj(df: DataFrame) -> DataFrame:
            out = apply_assignments(df, cond, assignments)
            # generated columns are recomputed from the post-update
            # stored values by _with_generated at the next read
            return out.select(*self._stored_cols())

        affected = self._affected_carry(cond)
        new_pending = [proj(self._with_generated(p)) for p in self.pending]
        if affected:
            new_pending.append(
                proj(self.vt._read_files_logical(self.m, affected))
            )
            self.carry -= affected
        self.pending = new_pending
        cons = self.m.get("constraints", [])
        row_checks = [
            c for c in cons if c["type"] in ("not_null", "check")
        ]
        if row_checks and new_pending:
            self.vt._validate(
                reduce(DataFrame.unionByName, new_pending),
                row_checks,
                current=None,
            )
        pk_touched = [
            c
            for c in cons
            if c["type"] == "primary_key"
            and set(c["columns"]) & set(assignments)
        ]
        if pk_touched:
            # key-touching UPDATE: the staged POST-state must stay unique
            self.vt._validate(self.read(), pk_touched, current=None)

    def _affected_carry_join(self, src_pref: DataFrame, cond: Column) -> set[str]:
        """Files among ``carry`` whose rows have ANY source match under
        the join predicate — the join-DML sibling of _affected_carry."""
        if not self.carry:
            return set()
        import os

        from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
            _strip_uri,
        )

        cur = self.vt._read_files_logical(self.m, self.carry).withColumn(
            "_vt_file", F.input_file_name()
        )
        hits = (
            cur.join(src_pref, cond, "semi")
            .select("_vt_file")
            .distinct()
            .collect()
        )
        return {
            os.path.relpath(_strip_uri(r["_vt_file"]), self.vt.path)
            for r in hits
        }

    def delete_using(self, src_pref: DataFrame, cond: Column) -> None:
        """DELETE ... USING (join-delete): anti-join survivors, file-
        granular like delete_where."""
        from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
            delete_using,
        )

        affected = self._affected_carry_join(src_pref, cond)
        new_pending = [
            delete_using(self._with_generated(p), src_pref, cond).select(
                *self._stored_cols()
            )
            for p in self.pending
        ]
        if affected:
            new_pending.append(
                delete_using(
                    self.vt._read_files_logical(self.m, affected),
                    src_pref,
                    cond,
                ).select(*self._stored_cols())
            )
            self.carry -= affected
        self.pending = new_pending

    def update_from(
        self,
        src_pref: DataFrame,
        cond: Column,
        assignments: Mapping[str, Column],
    ) -> None:
        """UPDATE ... FROM (join-update): matched rows take the source
        expressions; DuckDB's arbitrary pick under multi-match."""
        from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
            update_from,
        )

        stored = set(self._stored_cols())
        bad = [c for c in assignments if c not in stored]
        if bad:
            raise ValueError(
                f"Binder Error: cannot UPDATE column(s) {bad} — not a "
                "stored column"
            )
        affected = self._affected_carry_join(src_pref, cond)
        new_pending = [
            update_from(
                self._with_generated(p), src_pref, cond, assignments
            ).select(*self._stored_cols())
            for p in self.pending
        ]
        if affected:
            new_pending.append(
                update_from(
                    self.vt._read_files_logical(self.m, affected),
                    src_pref,
                    cond,
                    assignments,
                ).select(*self._stored_cols())
            )
            self.carry -= affected
        self.pending = new_pending
        cons = self.m.get("constraints", [])
        row_checks = [c for c in cons if c["type"] in ("not_null", "check")]
        if row_checks and new_pending:
            self.vt._validate(
                reduce(DataFrame.unionByName, new_pending),
                row_checks,
                current=None,
            )

    def merge(self, rows: DataFrame, key_cols: list[str]) -> None:
        """INSERT OR REPLACE (upsert): same-key rows across carry and
        pending are replaced by the incoming batch — multi-column keys
        supported (the non-transactional vt.merge is single-key).
        Affected carry files come from a distributed semi-join on the
        keys, collecting file NAMES only."""
        import os

        from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
            _strip_uri,
        )

        aligned = rows.select(*self._stored_cols())
        cons = self.m.get("constraints", [])
        self.vt._validate(
            aligned,
            [c for c in cons if c["type"] in ("not_null", "check")],
            current=None,
        )
        # replacing table keys is the point of MERGE; uniqueness must
        # still hold WITHIN the incoming batch
        self.vt._validate(
            aligned,
            [c for c in cons if c["type"] == "primary_key"],
            current=None,
        )
        keys = aligned.select(*key_cols).distinct()
        new_pending = [
            self._with_generated(p)
            .join(keys, key_cols, "left_anti")
            .select(*self._stored_cols())
            for p in self.pending
        ]
        if self.carry:
            cur = self.vt._read_files_logical(self.m, self.carry).withColumn(
                "_vt_file", F.input_file_name()
            )
            hits = (
                cur.join(keys, key_cols, "semi")
                .select("_vt_file")
                .distinct()
                .collect()
            )
            affected = {
                os.path.relpath(_strip_uri(r["_vt_file"]), self.vt.path)
                for r in hits
            }
            if affected:
                new_pending.append(
                    self.vt._read_files_logical(self.m, affected)
                    .join(keys, key_cols, "left_anti")
                    .select(*self._stored_cols())
                )
                self.carry -= affected
        new_pending.append(aligned)
        self.pending = new_pending

    def is_noop(self) -> bool:
        """True when the staged state is byte-identical to the base
        manifest — the table was only read (or touched by DML that
        matched no rows).  MVCC read-only participants must NOT publish
        a version or conflict with concurrent writers (reference:
        read-only transactions never enter the commit lock,
        transaction_manager.cpp)."""
        return not self.pending and self.carry == set(self.m["files"])

    def prepare(self, op: str = "txn") -> dict:
        """Write this table's data files and build (but NOT publish)
        the base+1 manifest: carried files by reference, all pending
        frames folded into a single write pass.  A crash after prepare
        leaves only orphan data files (vacuum-cleaned); nothing is
        visible until the manifest links."""
        new_files: list[str] = []
        if self.pending:
            rows = reduce(
                DataFrame.unionByName,
                [p.select(*self._stored_cols()) for p in self.pending],
            )
            new_files = self.vt._write_data(rows, self.m["mapping"])
        return self.vt._build_manifest(
            self.base + 1,
            op,
            sorted(self.carry) + new_files,
            schema=VersionedTable._logical_schema(self.m),
            mapping=self.m["mapping"],
            used_physical=self.m["used_physical"],
            constraints=self.m.get("constraints", []),
            generated=self.m.get("generated", {}),
        )

    def commit(self, op: str = "txn") -> int:
        """One manifest commit at base+1 (prepare + atomic link).  A
        no-op staged table (read-only within the transaction) commits
        to its base version without publishing anything."""
        if self.is_noop():
            return self.base
        self.vt._link_manifest(self.prepare(op))
        return self.base + 1


class Transaction:
    """One BEGIN..COMMIT/ROLLBACK scope over any number of versioned
    tables.  Mutations raise through, marking the transaction aborted
    on constraint violations (the reference's abort-on-failed-statement
    semantics, probed on DuckDB 1.0)."""

    def __init__(self) -> None:
        self._staged: dict[str, _StagedTable] = {}
        self.aborted = False

    def check_active(self) -> None:
        if self.aborted:
            raise TransactionAborted()

    def table(self, name: str, vt: VersionedTable) -> _StagedTable:
        if name not in self._staged:
            self._staged[name] = _StagedTable(vt)
        return self._staged[name]

    def read(self, name: str, vt: VersionedTable) -> DataFrame:
        self.check_active()
        return self.table(name, vt).read()

    def _guard(self, fn, *args, **kwargs):
        self.check_active()
        try:
            return fn(*args, **kwargs)
        except ConstraintViolation:
            self.aborted = True
            raise

    def insert(self, name: str, vt: VersionedTable, rows: DataFrame) -> None:
        self._guard(self.table(name, vt).insert, rows)

    def delete_where(
        self, name: str, vt: VersionedTable, cond: Column
    ) -> None:
        self._guard(self.table(name, vt).delete_where, cond)

    def update_where(
        self,
        name: str,
        vt: VersionedTable,
        cond: Column,
        assignments: Mapping[str, Column],
    ) -> None:
        self._guard(self.table(name, vt).update_where, cond, assignments)

    def merge(
        self,
        name: str,
        vt: VersionedTable,
        rows: DataFrame,
        key_cols: list[str],
    ) -> None:
        self._guard(self.table(name, vt).merge, rows, key_cols)

    def delete_using(
        self, name: str, vt: VersionedTable, src_pref: DataFrame, cond: Column
    ) -> None:
        self._guard(self.table(name, vt).delete_using, src_pref, cond)

    def update_from(
        self,
        name: str,
        vt: VersionedTable,
        src_pref: DataFrame,
        cond: Column,
        assignments: Mapping[str, Column],
    ) -> None:
        self._guard(
            self.table(name, vt).update_from, src_pref, cond, assignments
        )

    def commit(self, root_log=None) -> dict[str, int]:
        """Publish every staged table.

        With ``root_log`` (a storage.txnlog.RootLog): EVERY table's
        data files and manifest are prepared first, then ONE O_EXCL
        root-record link commits the whole transaction atomically —
        no reader resolving through the root log ever observes a
        partial commit, and a conflict publishes NOTHING (reference
        transaction_manager.cpp's single commit point).

        Without one (single-table transactions, legacy callers):
        per-table commits in name order; on a mid-sequence
        CommitConflictError, already-committed tables are compensated
        with restore() commits back to their pre-transaction versions,
        then the conflict re-raises for the caller to retry."""
        if self.aborted:
            return {}
        committed: dict[str, int] = {}
        if root_log is not None:
            updates: dict[str, tuple] = {}
            for name in sorted(self._staged):
                st = self._staged[name]
                if st.is_noop():
                    committed[name] = st.base
                    continue
                updates[name] = (st.vt, st.base, st.prepare())
            if updates:
                root_log.append(updates)  # THE commit point
                for name, (vt, _b, m) in updates.items():
                    try:
                        vt._link_manifest(m)
                    except CommitConflictError:
                        # a concurrent recover() already replayed this
                        # root record's manifest — identical content,
                        # the commit stands
                        pass
                    committed[name] = m["version"]
            return committed
        try:
            for name in sorted(self._staged):
                committed[name] = self._staged[name].commit()
        except CommitConflictError:
            for name, ver in committed.items():
                st = self._staged[name]
                if ver == st.base:  # read-only participant: nothing published
                    continue
                try:
                    st.vt.restore(st.base)
                except Exception:  # noqa: BLE001 — compensation is best-effort
                    pass
            raise
        return committed

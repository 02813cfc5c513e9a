"""Root transaction log — ONE atomic commit point for multi-table
transactions.

Reference parity (src/transaction/transaction_manager.cpp: DuckDB
serializes every transaction through a single commit lock and writes
one WAL commit record, so a reader either sees ALL of a transaction's
table changes or none).  The multi-file analog here:

  - ``root-<seq>.json`` records, published with the same
    write-then-link O_EXCL discipline as table manifests, each carrying
    the FULL post-commit {table: version} mapping plus the staged
    manifests themselves.
  - COMMIT = (1) write every table's data files, (2) link ONE root
    record, (3) link each table's manifest.  Visibility through
    ``snapshot()`` flips atomically at step 2: a reader resolving table
    versions from the root log can never observe table A's new version
    with table B's old one.  A crash between (2) and (3) is healed by
    ``recover()`` (the root record embeds the manifests), which runs
    automatically on open and before every append.
  - Write-write conflicts: ``append`` validates each table's base
    against BOTH the root mapping and the table's own manifest head,
    then takes the next root seq.  Losing the seq race to a DISJOINT
    transaction is not a conflict — append revalidates and retries on
    the next seq (DuckDB's commit lock, minus the blocking).

Scale shape (100 TB): a root record is O(tables touched) small JSON —
data files never rewrite at commit, and the one-link commit point is
exactly the pattern Iceberg/Delta use for their catalog pointer swap.

Mixing root-log transactions with DIRECT VersionedTable mutations on
the same tables narrows but does not close the atomicity window (the
direct writer bypasses the root lock — same rule as the reference:
one database, one transaction manager).  Route all writers through the
engine's transaction surface for the full guarantee.
"""

from __future__ import annotations

import glob
import json
import os

from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
    CommitConflictError,
)


class RootLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.recover()

    # ----------------------------------------------------------- reads

    def _seqs(self) -> list[int]:
        return sorted(
            int(os.path.basename(p)[5:-5])
            for p in glob.glob(os.path.join(self.path, "root-*.json"))
        )

    def latest(self) -> tuple[int, dict]:
        """(seq, record); seq 0 / empty record when no commit yet."""
        seqs = self._seqs()
        if not seqs:
            return 0, {"seq": 0, "tables": {}, "paths": {}, "manifests": {}}
        seq = seqs[-1]
        with open(os.path.join(self.path, f"root-{seq:08d}.json")) as f:
            return seq, json.load(f)

    def snapshot(self) -> dict[str, int]:
        """Atomic {table: version} view — ONE file read, so no reader
        interleaving can observe a partial multi-table commit."""
        return dict(self.latest()[1]["tables"])

    # --------------------------------------------------------- commits

    def recover(self) -> list[str]:
        """Re-link any manifest the latest root record committed but a
        crash left unpublished (phase-3 replay).  Idempotent; returns
        the healed table names."""
        _, rec = self.latest()
        healed = []
        for name, manifest in rec.get("manifests", {}).items():
            tpath = rec["paths"][name]
            target = os.path.join(
                tpath, "_log", f"{manifest['version']:08d}.json"
            )
            if os.path.exists(target):
                continue
            tmp = f"{target}.tmp.{os.getpid()}.recover"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            try:
                os.link(tmp, target)
                healed.append(name)
            except FileExistsError:
                pass
            finally:
                os.unlink(tmp)
        return healed

    def append(
        self, updates: dict[str, tuple[object, int, dict]]
    ) -> int:
        """Atomically commit ``{name: (vt, base, manifest)}``.

        Validates every table's base against the root mapping and the
        table's own manifest head, then links ``root-<seq+1>.json``
        with O_EXCL.  A seq race with a DISJOINT transaction retries on
        the next seq; an overlapping writer raises
        CommitConflictError with NOTHING published."""
        for _ in range(64):
            self.recover()
            seq, rec = self.latest()
            tables = dict(rec["tables"])
            paths = dict(rec.get("paths", {}))
            for name, (vt, base, _m) in updates.items():
                # the MANIFEST head is the authoritative conflict check;
                # the root mapping is a visibility snapshot that may lag
                # when autocommit writers advanced a table between root
                # records (they re-sync it through note())
                if vt.latest_version() != base:
                    raise CommitConflictError(
                        f"table {name}: manifest head moved past base {base}"
                    )
                root_head = tables.get(name)
                if root_head is not None and root_head > base:
                    raise CommitConflictError(
                        f"table {name}: root log at version {root_head}, "
                        f"transaction based on {base}"
                    )
            for name, (vt, _base, m) in updates.items():
                tables[name] = m["version"]
                paths[name] = vt.path
            new = {
                "seq": seq + 1,
                "tables": tables,
                "paths": paths,
                "manifests": {
                    name: m for name, (_vt, _b, m) in updates.items()
                },
            }
            p = os.path.join(self.path, f"root-{seq + 1:08d}.json")
            tmp = f"{p}.tmp.{os.getpid()}.{id(new)}"
            with open(tmp, "w") as f:
                json.dump(new, f)
            try:
                os.link(tmp, p)
                return seq + 1
            except FileExistsError:
                continue  # disjoint seq race — revalidate on fresh state
            finally:
                os.unlink(tmp)
        raise CommitConflictError(
            "root log livelock: 64 consecutive seq races"
        )

    def note(self, updates: dict[str, tuple[object, int]]) -> int:
        """Record already-committed single-table versions
        ``{name: (vt, version)}`` so the snapshot stays current when
        AUTOCOMMIT statements write outside a transaction.  No conflict
        checks (the manifest link already won) and no recovery payload
        (nothing is pending); versions only move forward."""
        for _ in range(64):
            seq, rec = self.latest()
            tables = dict(rec["tables"])
            paths = dict(rec.get("paths", {}))
            changed = False
            for name, (vt, version) in updates.items():
                if tables.get(name, -1) < version:
                    tables[name] = version
                    paths[name] = vt.path
                    changed = True
            if not changed:
                return seq
            new = {
                "seq": seq + 1,
                "tables": tables,
                "paths": paths,
                "manifests": {},
            }
            p = os.path.join(self.path, f"root-{seq + 1:08d}.json")
            tmp = f"{p}.tmp.{os.getpid()}.{id(new)}"
            with open(tmp, "w") as f:
                json.dump(new, f)
            try:
                os.link(tmp, p)
                return seq + 1
            except FileExistsError:
                continue
            finally:
                os.unlink(tmp)
        raise CommitConflictError(
            "root log livelock: 64 consecutive seq races"
        )

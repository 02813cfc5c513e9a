"""Copy-on-write versioned parquet tables with time travel.

Reference parity (SURVEY.md §2.1 storage rows):
  - durable table data + per-commit metadata  → data files + JSON
    manifests (reference single_file_block_manager.cpp keeps blocks +
    a metadata chain in one file; here both are separate immutable
    files so a 1000-executor cluster can write data in parallel and
    commit with one metadata rename)
  - WAL / commit protocol (write_ahead_log.cpp) → the manifest IS the
    commit record: data files land first, then the manifest is created
    with O_EXCL.  A crash before the manifest leaves orphan data files
    (cleaned by vacuum) and NO visible half-commit — readers only ever
    see manifested versions.
  - MVCC snapshots (data_table.cpp) → immutability: a reader holding
    version N's file list is isolated from any later commit.
  - time travel / storage_version tests → ``read(version=N)`` resolves
    the old manifest.
  - CHECKPOINT (checkpoint_manager.cpp) → ``checkpoint()`` rewrites the
    live file set into few compacted files as a new version.
  - optimistic concurrency (transaction conflicts,
    test/sql/transactions/) → two writers racing to the same next
    version: exactly one O_EXCL manifest create wins, the loser gets
    CommitConflictError and must rebase (retry on the new latest).

Scale shape (100 TB): mutations never rewrite the table — DELETE /
UPDATE / MERGE first find the AFFECTED files (a distributed
semi-search collecting only distinct file NAMES, bounded by file
count, never rows), carry every untouched file forward by reference,
and rewrite only the touched ones.  The driver-side state is manifest
metadata: O(files), not O(rows).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency, reference transaction conflict errors)."""


def _strip_uri(name: str) -> str:
    return name[7:] if name.startswith("file://") else name


class VersionedTable:
    """A table rooted at ``path`` with ``data/`` (immutable parquet)
    and ``_log/`` (one ``<version>.json`` manifest per commit)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "data")

    # ---------------------------------------------------------- commits

    @classmethod
    def create(
        cls, spark: SparkSession, path: str, df: DataFrame
    ) -> "VersionedTable":
        """CREATE TABLE AS: version 0 holds df's rows."""
        t = cls(spark, path)
        os.makedirs(t.log_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        files = t._write_data(df)
        t._commit(0, "create", files, df.schema)
        return t

    def latest_version(self) -> int:
        versions = [
            int(os.path.basename(p)[:-5])
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
        ]
        if not versions:
            raise FileNotFoundError(f"no manifests under {self.log_dir}")
        return max(versions)

    def _manifest(self, version: int) -> dict:
        p = os.path.join(self.log_dir, f"{version:08d}.json")
        with open(p) as f:
            return json.load(f)

    def _commit(
        self, version: int, op: str, files: list[str], schema: StructType
    ) -> None:
        manifest = {
            "version": version,
            "op": op,
            "files": sorted(files),
            "schema": schema.json(),
        }
        p = os.path.join(self.log_dir, f"{version:08d}.json")
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} already committed under {self.log_dir}"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write df as fresh immutable parquet; return file names
        relative to the table root."""
        sub = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.parquet(sub)
        return [
            os.path.relpath(p, self.path)
            for p in glob.glob(os.path.join(sub, "*.parquet"))
        ]

    # ---------------------------------------------------------- reads

    def read(self, version: int | None = None) -> DataFrame:
        """SELECT * FROM t [AS OF version]."""
        v = self.latest_version() if version is None else version
        m = self._manifest(v)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f) for f in m["files"]]
        return self.spark.read.schema(schema).parquet(*paths)

    def history(self) -> list[dict]:
        """Commit log, oldest first: version / op / file count."""
        out = []
        for v in range(self.latest_version() + 1):
            m = self._manifest(v)
            out.append(
                {"version": v, "op": m["op"], "n_files": len(m["files"])}
            )
        return out

    # ---------------------------------------------------------- mutations

    def _affected_files(self, cond: Column) -> set[str]:
        """Distinct files containing rows matching cond — collects file
        NAMES only (metadata-sized), never rows."""
        cur = self.read().withColumn("_vt_file", F.input_file_name())
        rows = cur.filter(cond).select("_vt_file").distinct().collect()
        return {
            os.path.relpath(_strip_uri(r["_vt_file"]), self.path)
            for r in rows
        }

    def _cow_commit(
        self,
        op: str,
        affected: set[str],
        rewrite: DataFrame | None,
        extra_files: list[str] | None = None,
    ) -> int:
        """Commit = (current files − affected) + rewrite(affected) +
        extras.  Untouched files move by reference."""
        v = self.latest_version()
        m = self._manifest(v)
        schema = (
            rewrite.schema
            if rewrite is not None
            else StructType.fromJson(json.loads(m["schema"]))
        )
        keep = [f for f in m["files"] if f not in affected]
        new_files = list(extra_files or [])
        if rewrite is not None:
            new_files += self._write_data(rewrite)
        self._commit(v + 1, op, keep + new_files, schema)
        return v + 1

    def insert(self, rows: DataFrame) -> int:
        """INSERT INTO: append-only — zero rewrites, one manifest."""
        return self._cow_commit(
            "insert", set(), None, self._write_data(rows)
        )

    def delete_where(self, cond: Column) -> int:
        """DELETE WHERE: rewrite only files containing matches, keeping
        their non-matching rows (reference physical_delete.cpp row-id
        deletes; file granularity here)."""
        affected = self._affected_files(cond)
        if not affected:
            return self._cow_commit("delete", set(), None)
        paths = [os.path.join(self.path, f) for f in affected]
        survivors = self.spark.read.parquet(*paths).filter(
            ~cond | cond.isNull()
        )
        return self._cow_commit("delete", affected, survivors)

    def update_where(
        self, cond: Column, assignments: Mapping[str, Column]
    ) -> int:
        """UPDATE SET ... WHERE: rewrite only affected files with the
        conditional projection (physical_update.cpp analog)."""
        affected = self._affected_files(cond)
        if not affected:
            return self._cow_commit("update", set(), None)
        paths = [os.path.join(self.path, f) for f in affected]
        updated = self.spark.read.parquet(*paths)
        for col, expr in assignments.items():
            updated = updated.withColumn(
                col, F.when(cond, expr).otherwise(F.col(col))
            )
        return self._cow_commit("update", affected, updated)

    def merge(self, updates: DataFrame, key_col: str) -> int:
        """MERGE / upsert: rows in ``updates`` replace same-key rows and
        append otherwise (physical_insert.cpp ON CONFLICT DO UPDATE).
        Only files containing a matched key are rewritten.  Affected
        files come from a distributed semi-join (collects file names,
        not keys — the updates side never reaches the driver)."""
        cur = self.read().withColumn("_vt_file", F.input_file_name())
        hits = (
            cur.join(updates.select(key_col).distinct(), key_col, "semi")
            .select("_vt_file")
            .distinct()
            .collect()
        )
        affected = {
            os.path.relpath(_strip_uri(r["_vt_file"]), self.path)
            for r in hits
        }
        extra = self._write_data(updates)
        if not affected:
            return self._cow_commit("merge", set(), None, extra)
        paths = [os.path.join(self.path, f) for f in affected]
        survivors = self.spark.read.parquet(*paths).join(
            updates.select(key_col), key_col, "left_anti"
        )
        return self._cow_commit("merge", affected, survivors, extra)

    # ------------------------------------------------------ maintenance

    def checkpoint(self, n_files: int = 4) -> int:
        """Fold the live file set into n_files compacted files (the
        reference CHECKPOINT folds the WAL into the block file)."""
        m = self._manifest(self.latest_version())
        compacted = self.read().repartition(n_files)
        return self._cow_commit("checkpoint", set(m["files"]), compacted)

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Drop data files referenced by NO retained manifest (and the
        pre-retention manifests themselves).  Time travel before the
        horizon is gone afterwards — same contract as the reference's
        checkpoint truncating the WAL."""
        latest = self.latest_version()
        horizon = max(0, latest - retain_last + 1)
        live: set[str] = set()
        for v in range(horizon, latest + 1):
            live.update(self._manifest(v)["files"])
        removed = []
        for p in glob.glob(os.path.join(self.data_dir, "*", "*.parquet")):
            rel = os.path.relpath(p, self.path)
            if rel not in live:
                os.remove(p)
                removed.append(rel)
        for d in glob.glob(os.path.join(self.data_dir, "*")):
            if os.path.isdir(d) and not os.listdir(d):
                shutil.rmtree(d)
        for v in range(horizon):
            mp = os.path.join(self.log_dir, f"{v:08d}.json")
            if os.path.exists(mp):
                os.remove(mp)
        return removed

#!/usr/bin/env python
"""Driver-gate simulation: run every registered query against its DuckDB
oracle at sf0.01 with a bare session, mirroring the round driver's
CORRECTNESS check (sorted-column row-count + schema + value-hash).

Usage: python tools/driver_sim.py [names...]   (default: all)
Prints one line per query and a failure summary; exit 1 on any failure.

Every query also passes a hard output-schema gate (no Decimal/Array/
Map/Struct output columns — the round driver's canon breaks on those
even when values are right).  SPARK_GRAFT_SIM_SCHEMA_ONLY=1 runs JUST
the gate (lazy build, no execution, no oracle — whole registry in
minutes).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
    if isinstance(v, (bytes, bytearray)):
        v = bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def risky_fields(schema) -> list[str]:
    """Output-type contract gate: the ROUND driver's pandas canon is
    stricter than this sim's `_cell` (which coerces Decimal->float and
    stringifies lists) — it crashes on Array/Map/Struct cells
    (`sort_values` on unhashable lists) and hash-mismatches DecimalType
    against DuckDB DOUBLE.  Any registry query emitting these types is
    therefore a driver-gate failure even when its VALUES are right
    (round-6: fn_list_extended ERR, h2o_group_q05 hash-fail).  Returns
    the offending `name:type` list; empty == driver-canon-safe."""
    from pyspark.sql import types as T

    bad = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(
            dt, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
        ):
            bad.append(f"{f.name}:{dt.simpleString()}")
    return bad


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # sf1+ sweeps need driver heap beyond the 1g default (local-mode
    # executors share it); unset = the driver's own bare-session defaults
    mem = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    # sf1 sweeps: DuckDB's default memory_limit is 80% of RAM, which on a
    # box also hosting the Spark JVM invites the OOM killer (observed: a
    # pair-explosion oracle at 120 GB RSS).  Cap it and give it a spill
    # directory so big oracles go out-of-core instead of down in flames.
    cap_stmts: list[str] = []
    mem_d = os.environ.get("SPARK_GRAFT_SIM_DUCKDB_MEM")
    if mem_d:
        import tempfile

        spill = tempfile.mkdtemp(prefix="ducksim_spill_")
        cap_stmts.append(f"SET memory_limit='{mem_d}'")
        cap_stmts.append(f"SET temp_directory='{spill}'")
        # bound the spill too: a pair-explosion oracle plan should fail
        # fast with a clean error, not fill the device under everything
        cap_stmts.append(
            "SET max_temp_directory_size='"
            + os.environ.get("SPARK_GRAFT_SIM_DUCKDB_SPILL", "40GB")
            + "'"
        )
    thr = os.environ.get("SPARK_GRAFT_SIM_DUCKDB_THREADS")
    if thr:
        cap_stmts.append(f"SET threads={int(thr)}")
    for s in cap_stmts:
        con.execute(s)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(qs)
    # optional per-query watchdog: one runaway oracle plan must not eat
    # the whole batch (a Spark collect blocks in py4j and a DuckDB call
    # blocks Python signals, so cancellation comes from a timer thread —
    # sc.cancelAllJobs + con.interrupt both leave their sessions usable)
    per_q = float(os.environ.get("SPARK_GRAFT_SIM_QUERY_TIMEOUT", "0"))

    def _watchdog():
        import threading

        stop = threading.Event()

        def run():
            if stop.wait(per_q):
                return
            # repeat until the query window closes: a driver-side
            # iterative query (recursive CTE loop) launches MANY short
            # jobs, so a one-shot cancel between jobs would miss
            while not stop.is_set():
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:  # noqa: BLE001
                    pass
                try:
                    con.interrupt()
                except Exception:  # noqa: BLE001
                    pass
                stop.wait(1.0)

        th = threading.Thread(target=run, daemon=True)
        th.start()

        class _Handle:
            def cancel(self):
                stop.set()
                # join before the next query starts: a fired canceller
                # loops on 1-second waits, and an unjoined loop iteration
                # could cancelAllJobs/interrupt the NEXT query's work for
                # up to ~1s, producing a spurious ERR on an unrelated name
                th.join(timeout=2.0)

        return _Handle()

    schema_only = os.environ.get("SPARK_GRAFT_SIM_SCHEMA_ONLY") == "1"
    fails: list[str] = []
    for name in names:
        timer = _watchdog() if per_q else None
        try:
            sdf = qs[name](spark, SF_DIR)
            bad = risky_fields(sdf.schema)
            if bad:
                # hard gate: driver-canon-unsafe output types fail even
                # if the values would hash green under this sim's canon
                print(f"FAIL {name}: schema-gate {bad}", flush=True)
                fails.append(name)
                continue
            if schema_only:
                print(f"ok   {name}: schema-clean", flush=True)
                continue
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"ok   {name}: rows-only ({len(srows)})", flush=True)
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_cols = sorted(sdf.columns) == sorted(ocols)
            ok_hash = _hash(sdf.columns, srows) == _hash(ocols, orows)
            ok = ok_rows and ok_cols and ok_hash
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"ERR  {name}: {type(exc).__name__}: {exc}", flush=True)
            fails.append(name)
            continue
        finally:
            if timer is not None:
                timer.cancel()
            # a settings-surface oracle may SET/RESET DuckDB knobs;
            # re-apply the sweep caps so one query can't uncap the batch
            for s in cap_stmts:
                try:
                    con.execute(s)
                except Exception:  # noqa: BLE001
                    pass
        if not ok:
            fails.append(name)
        print(
            f"{'ok  ' if ok else 'FAIL'} {name}: rows {len(srows)}/{len(orows)}"
            f" cols={ok_cols} hash={ok_hash}",
            flush=True,
        )
    print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

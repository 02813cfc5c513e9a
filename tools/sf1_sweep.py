#!/usr/bin/env python
"""Full-registry sf1 sweep: run every registered query through
tools/driver_sim.py at the sf1 fixture, BATCHED with the resource caps
the sf1-oracle discipline requires (one uncapped DuckDB at sf1 got the
box OOM-killed in round 6), and write SF1_SWEEP_r{N}.json.

Usage: python tools/sf1_sweep.py <round_tag> [batch_size]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", f"{REPO}/.localdata/sf1")

ENV = {
    **os.environ,
    "SPARK_GRAFT_SIM_SF_DIR": SF1_DIR,
    "SPARK_GRAFT_SIM_DRIVER_MEMORY": "24g",
    "SPARK_GRAFT_SIM_DUCKDB_MEM": "20GB",
    "SPARK_GRAFT_SIM_DUCKDB_SPILL": "40GB",
    "SPARK_GRAFT_SIM_DUCKDB_THREADS": "16",
    "SPARK_GRAFT_SIM_QUERY_TIMEOUT": "900",
}

OK_RE = re.compile(r"^ok\s+(\S+): rows (\d+)/(\d+)")
FAIL_RE = re.compile(r"^FAIL\s+(\S+):")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import __spark_entry__ as E

    names = list(E.queries())
    green: dict[str, int] = {}
    fails: list[str] = []
    batches_meta: list[dict] = []
    for i in range(0, len(names), batch_size):
        batch = names[i : i + batch_size]
        # log + record the EXACT batch membership: registry order depends
        # on on-disk CORRECTNESS_r*.json state and shifts between rounds,
        # so coverage claims must never be re-derived from a later
        # registry — they are read back from these lines / this JSON
        # (tools/sf1_partial_json.py).
        print(f"[sf1 sweep] batch {i // batch_size + 1}: {len(batch)} queries")
        print(f"[sf1 sweep] batch {i // batch_size + 1} names: " + ",".join(batch))
        batches_meta.append(
            {"batch": i // batch_size + 1, "names": list(batch)}
        )
        proc = subprocess.run(
            [sys.executable, "tools/driver_sim.py", *batch],
            cwd=REPO,
            env=ENV,
            capture_output=True,
            text=True,
            timeout=7200,
        )
        seen = set()
        for line in proc.stdout.splitlines():
            m = OK_RE.match(line)
            if m:
                green[m.group(1)] = int(m.group(2))
                seen.add(m.group(1))
                continue
            m = FAIL_RE.match(line)
            if m:
                fails.append(m.group(1))
                seen.add(m.group(1))
                print("  " + line)
        for n in batch:
            if n not in seen:
                fails.append(n)
                print(f"  MISSING (crashed batch?): {n}")
    out = {
        "note": (
            f"Round-{tag} FULL-registry sf1 sweep: driver_sim batched, "
            "caps DRIVER_MEMORY=24g DUCKDB_MEM=20GB SPILL=40GB "
            "THREADS=16 QUERY_TIMEOUT=900; schema gate active."
        ),
        "green": len(green),
        "total": len(names),
        "fails": sorted(set(fails)),
        "rows_per_query": green,
        "batches": batches_meta,
    }
    path = os.path.join(REPO, f"SF1_SWEEP_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(green)}/{len(names)} green, fails={sorted(set(fails))[:10]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

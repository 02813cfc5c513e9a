"""Static audit: forced ``F.broadcast()`` on an UNFILTERED SF-growing
base-table scan.

Policy (SCALE.md "Join strategy policy"): a forced broadcast hint
overrides AQE's size check, so it is only allowed on relations that are
*bounded* independent of scale factor — ``region``/``nation`` (fixed
cardinality), filtered or aggregated slices, literal frames, and
model-sized artifacts.  ``part``, ``supplier``, ``customer``, ``orders``,
``lineitem``, ``events``, ``documents``, ``embeddings`` all grow linearly
with SF: a forced broadcast of the whole table is an executor/driver OOM
at the 100 TB design point, and — unlike an AQE-chosen BHJ — cannot
degrade gracefully.  (Reference analog: the size-aware build-side choice
in plan_comparison_join.cpp:309-314.)

The audit walks every function in the queries package with Python's
``ast`` module and traces each ``F.broadcast(X)`` argument back through
simple local assignments.  A site is flagged when the traced expression
is a bare scan of an SF-growing table — ``_t(spark, sf_dir, "part")`` —
optionally chained/wrapped only through non-reducing ops
(``select``/``withColumn``/``withColumnRenamed``/``alias``/``drop``/
``hint``/``cache``/``persist``/``fan_out``).  Any ``filter``/``where``/
``limit``/``join``/``groupBy``/``agg``/``distinct``/``dropDuplicates``/
``sample`` (or anything unrecognized) in the chain marks the relation
bounded/unknown and the site passes.  Conservative by construction: it
can miss a disguised unbounded broadcast, but everything it flags is a
genuine scale hazard.

Used by tests/test_plan_budgets.py as a zero-findings budget.
"""

from __future__ import annotations

import ast
import os
import sys

GROWING = {
    "part",
    "supplier",
    "customer",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
    "partsupp",
}
NON_REDUCING = {
    "select",
    "withColumn",
    "withColumnRenamed",
    "withColumnsRenamed",
    "alias",
    "drop",
    "hint",
    "cache",
    "persist",
    "repartition",
    "coalesce",
    "sortWithinPartitions",
    "orderBy",
    "sort",
}
NON_REDUCING_WRAPPERS = {"fan_out"}
LOADER_NAMES = {"_t", "load_table", "read_table"}


def _loaded_table(node: ast.AST) -> str | None:
    """If ``node`` is a loader call like ``_t(spark, sf_dir, "part")``,
    return the table name, else None."""
    if not isinstance(node, ast.Call):
        return None
    fn = node.func
    name = fn.id if isinstance(fn, ast.Name) else (
        fn.attr if isinstance(fn, ast.Attribute) else None
    )
    if name not in LOADER_NAMES:
        return None
    for arg in node.args:
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            return arg.value
    return None


def _trace(node: ast.AST, env: dict[str, ast.AST], depth: int = 0) -> str | None:
    """Return the SF-growing table name if ``node`` provably denotes an
    unfiltered scan of one, else None (bounded or unknown)."""
    if depth > 20:
        return None
    t = _loaded_table(node)
    if t is not None:
        return t if t in GROWING else None
    if isinstance(node, ast.Name):
        src = env.get(node.id)
        return _trace(src, env, depth + 1) if src is not None else None
    if isinstance(node, ast.Call):
        fn = node.func
        if isinstance(fn, ast.Attribute):
            if fn.attr in NON_REDUCING:
                return _trace(fn.value, env, depth + 1)
            return None
        if isinstance(fn, ast.Name) and fn.id in NON_REDUCING_WRAPPERS:
            return _trace(node.args[0], env, depth + 1) if node.args else None
        return None
    return None


def _is_broadcast_call(node: ast.Call) -> bool:
    fn = node.func
    if isinstance(fn, ast.Attribute) and fn.attr == "broadcast":
        return True
    return isinstance(fn, ast.Name) and fn.id == "broadcast"


def audit_file(path: str) -> list[tuple[str, int, str, str]]:
    """-> [(path, lineno, function, table)] flagged sites."""
    tree = ast.parse(open(path).read(), filename=path)
    out: list[tuple[str, int, str, str]] = []
    for fndef in ast.walk(tree):
        if not isinstance(fndef, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        env: dict[str, ast.AST] = {}
        # one linear pass: assignments seen so far form the environment
        # for broadcast calls that appear later in the function body
        for stmt in ast.walk(fndef):
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1:
                tgt = stmt.targets[0]
                if isinstance(tgt, ast.Name):
                    env[tgt.id] = stmt.value
        for call in ast.walk(fndef):
            if isinstance(call, ast.Call) and _is_broadcast_call(call) and call.args:
                table = _trace(call.args[0], env)
                if table is not None:
                    out.append((path, call.lineno, fndef.name, table))
    # nested functions are walked both standalone and inside their
    # enclosing def — keep one finding per site
    seen: set[tuple[str, int]] = set()
    uniq = []
    for f in out:
        if (f[0], f[1]) not in seen:
            seen.add((f[0], f[1]))
            uniq.append(f)
    return uniq


def audit_tree(root: str) -> list[tuple[str, int, str, str]]:
    findings = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".py"):
                findings.extend(audit_file(os.path.join(dirpath, f)))
    return findings


def main() -> int:
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_chunk_compaction_in_duckdb_spark",
    )
    roots = sys.argv[1:] or [pkg]
    findings = []
    for r in roots:
        findings.extend(audit_tree(r) if os.path.isdir(r) else audit_file(r))
    for path, line, fn, table in findings:
        print(f"{path}:{line}: {fn}: forced broadcast of unfiltered '{table}'")
    print(f"{len(findings)} forced-broadcast-of-unfiltered-growing-table sites")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""nextval/currval pandas UDF factories for the sqllogic runner.

Separate module WITHOUT ``from __future__ import annotations``:
pandas_udf resolves the type hints via the function's module globals,
so ``pd`` must be importable there as a real (non-stringified) name.

The UDFs are the sqllogic TEST surface for per-row sequence semantics
(the reference evaluates nextval per row, test/sql/catalog/sequence/);
engine pipelines use ``storage.with_sequence`` — one O(1) range claim,
no per-row UDF.  Each batch claims one linearizable range per sequence
name (the O_EXCL manifest commit is multi-process safe), so values are
globally unique under any Spark batching; value->row binding is
batching-specific in BOTH engines, which is why specs compare sets or
aggregates.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_seq_udfs(paths: dict):
    def _seq(name: str):
        from data_chunk_compaction_in_duckdb_spark.storage import Sequence

        if name not in paths:
            raise RuntimeError(
                f"Catalog Error: sequence {name} does not exist"
            )
        return Sequence(None, paths[name])

    @pandas_udf("long")
    def _nextval(names: pd.Series) -> pd.Series:
        out = pd.Series([0] * len(names), dtype="int64")
        for name in names.unique():
            idx = names[names == name].index
            out[idx] = _seq(str(name)).claim(len(idx))
        return out

    @pandas_udf("long")
    def _currval(names: pd.Series) -> pd.Series:
        vals = {}
        for name in names.unique():
            last = _seq(str(name))._latest().get("last_value")
            if last is None:
                raise RuntimeError(
                    "currval: sequence is not yet defined in this session"
                )
            vals[name] = last
        return names.map(vals).astype("int64")

    # nextval is genuinely nondeterministic (each evaluation advances
    # the counter) — without this, Catalyst's common-subexpression
    # elimination merges two nextval('s') calls in one projection into
    # ONE evaluation, halving the advancement vs the reference
    return _nextval.asNondeterministic(), _currval

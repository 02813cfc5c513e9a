"""Sequence SQL surface — parsing + per-row UDF forms.

The reference drives sequences through SQL (CREATE SEQUENCE / DROP
SEQUENCE statements, nextval()/currval() scalar calls — src/catalog/
catalog_entry/sequence_catalog_entry.cpp, test/sql/catalog/sequence/).
Spark SQL has none of those, so `Engine.sql` and the sqllogic runner
share this module: statement parsers for the DDL and Arrow-batched
pandas UDFs for the per-row functions.

NOTE no ``from __future__ import annotations`` here: pandas_udf
resolves its type hints through the function's module globals, so
``pd`` must be a real (non-stringified) name in this module.

The UDFs are the SQL-surface form of per-row allocation; engine
pipelines use ``storage.with_sequence`` — ONE O(1) range claim + the
distributed prefix-count numbering, never a per-row UDF.  Each UDF
batch claims one linearizable range per sequence name (the O_EXCL
manifest commit is multi-process safe), so values stay globally unique
under any Spark batching; value->row binding is batching-specific in
both engines (which is why dual-engine tests compare sets/aggregates).
"""

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf

CREATE_SEQ_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?SEQUENCE\s+(\w+)\s*(.*?);?\s*$",
    re.I | re.S,
)
DROP_SEQ_RE = re.compile(
    r"^\s*DROP\s+SEQUENCE\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
)
SEQFN_RE = re.compile(r"\b(nextval|currval)\s*\(", re.I)
_SEQ_OPT_RES = {
    "start": re.compile(r"\bSTART\s+(?:WITH\s+)?(-?\d+)", re.I),
    "increment": re.compile(r"\bINCREMENT\s+(?:BY\s+)?(-?\d+)", re.I),
    "minvalue": re.compile(r"\bMINVALUE\s+(-?\d+)", re.I),
    "maxvalue": re.compile(r"\bMAXVALUE\s+(-?\d+)", re.I),
}


def parse_create_sequence(sql: str):
    """``(name, or_replace, kwargs)`` for a CREATE SEQUENCE statement,
    or None if ``sql`` is not one.  kwargs feed ``Sequence.create``
    (START [WITH] / INCREMENT [BY] / MINVALUE / MAXVALUE /
    [NO] CYCLE — the reference's option grammar)."""
    m = CREATE_SEQ_RE.match(sql)
    if not m:
        return None
    or_replace, name, opts = bool(m.group(1)), m.group(2), m.group(3)
    kwargs = {}
    for key, rx in _SEQ_OPT_RES.items():
        om = rx.search(opts)
        if om:
            kwargs[key] = int(om.group(1))
    if re.search(r"\bNO\s+CYCLE\b", opts, re.I):
        kwargs["cycle"] = False
    elif re.search(r"\bCYCLE\b", opts, re.I):
        kwargs["cycle"] = True
    return name, or_replace, kwargs


def parse_drop_sequence(sql: str):
    """``(name, if_exists)`` for a DROP SEQUENCE statement, else None."""
    m = DROP_SEQ_RE.match(sql)
    if not m:
        return None
    return m.group(2), bool(m.group(1))


def make_seq_udfs(paths: dict):
    """nextval/currval pandas UDFs bound to a {name: log_path} snapshot."""

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

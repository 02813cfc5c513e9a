"""sqllogictest-subset runner for the Spark SQL surface.

The reference's primary test corpus is 2,387 sqllogictest-derived `.test`
files run by `test/sqlite/sqllogic_parser.cpp` / `sqllogic_command.cpp`
(SURVEY.md §5).  This module re-implements the directive subset those
files actually use against `spark.sql(...)`:

    # comment
    statement ok
    <sql>                      -- must execute without error

    statement error
    <sql>                      -- must raise

    query <types> [rowsort|nosort]
    <sql>
    ----
    <tab-separated expected row per line>

Type string: one char per column — I (integer), R (real, rendered %.3f),
T (text).  NULL renders as the literal string `NULL`, booleans as
`true`/`false` (the sqllogictest conventions).  `rowsort` sorts rendered
rows before comparing; the default is `nosort` (query must ORDER BY).

Engine-surface statements the reference's catalog families use but
Spark SQL lacks are dispatched by ``EngineSqlContext`` (round 6):
CREATE/DROP SEQUENCE, nextval()/currval(), DESCRIBE <table>,
DESCRIBE SELECT, duckdb_sequences() readback, and the index-DDL family
(CREATE TABLE AS to a file-local temp view, CREATE [UNIQUE] INDEX /
DROP INDEX through Engine.create_index's bucketed ART analog,
duckdb_indexes() readback) — the SAME .test text DuckDB executes
natively during generation (tools/gen_sqllogic.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from decimal import Decimal

_QUERY_RE = re.compile(r"^query\s+([IRT]+)\s*(rowsort|nosort)?\s*$")

_CATALOG_TF_RE = re.compile(
    r"\bduckdb_(tables|views|schemas|types|keywords|functions)\s*\(\s*\)",
    re.I,
)


class SqlLogicError(AssertionError):
    """A .test directive failed (wrong rows, unexpected error, ...)."""


@dataclass
class Record:
    kind: str                      # "statement_ok" | "statement_error" | "query"
    sql: str
    line: int                      # 1-based line of the directive
    types: str = ""
    sortmode: str = "nosort"
    expected: list[str] = field(default_factory=list)


def parse_file(path: str) -> list[Record]:
    lines = open(path).read().splitlines()
    records: list[Record] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        start = i + 1
        if line in ("statement ok", "statement error"):
            i += 1
            sql: list[str] = []
            while i < n and lines[i].strip() and not lines[i].startswith("#"):
                sql.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="statement_ok" if line.endswith("ok") else "statement_error",
                    sql="\n".join(sql),
                    line=start,
                )
            )
            continue
        m = _QUERY_RE.match(line)
        if m:
            types, sortmode = m.group(1), m.group(2) or "nosort"
            i += 1
            sql = []
            while i < n and lines[i].strip() != "----":
                sql.append(lines[i])
                i += 1
            if i >= n:
                raise SqlLogicError(f"{path}:{start}: query without ---- separator")
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip():
                expected.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="query",
                    sql="\n".join(sql),
                    line=start,
                    types=types,
                    sortmode=sortmode,
                    expected=expected,
                )
            )
            continue
        raise SqlLogicError(f"{path}:{i + 1}: unrecognized directive {line!r}")
    return records


def render_value(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "I":
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(int(v))
    if t == "R":
        return f"{float(v):.3f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    # sqllogictest convention: empty strings render as "(empty)" so golden
    # rows never contain blank lines (which terminate the record).
    if isinstance(v, str) and v == "":
        return "(empty)"
    return str(v)


def render_row(row, types: str) -> str:
    if len(row) != len(types):
        raise SqlLogicError(
            f"result arity {len(row)} != type string {types!r}"
        )
    return "\t".join(render_value(v, t) for v, t in zip(row, types))


# --------------------------------------------------- engine statements
#
# The reference's sequence/catalog sqllogic families (test/sql/catalog/
# sequence/, test/sql/show_select/) mix DDL statements with queries over
# nextval()/currval()/DESCRIBE.  Spark SQL has none of those, so the
# runner routes them through the engine surface (storage.Sequence,
# introspect) and everything else through spark.sql — the SAME .test
# text DuckDB executes natively in the generator's validation pass.

_DESCRIBE_RE = re.compile(r"^\s*DESCRIBE\s+(\w+)\s*;?\s*$", re.I)
_DESCRIBE_SELECT_RE = re.compile(
    r"^\s*DESCRIBE\s+(SELECT\b.*)$", re.I | re.S
)
# index-DDL family (reference test/sql/index/ + duckdb_indexes();
# CREATE TABLE AS is routed here too so the indexed tables are
# file-local temp views on the Spark side and real tables in DuckDB)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(\w+)\s+AS\s+(.*)$",
    re.I | re.S,
)
_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(\w+)\s+ON\s+(\w+)\s*"
    r"\(([^)]*)\)\s*;?\s*$",
    re.I,
)
_DROP_INDEX_RE = re.compile(
    r"^\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
)
class EngineSqlContext:
    """Per-file execution context: owns a throwaway sequence root and
    dispatches engine-surface SQL; plain SQL falls through to
    spark.sql.  ``close()`` removes every sequence log it created."""

    def __init__(self, spark):
        import tempfile

        self.spark = spark
        self.root = tempfile.mkdtemp(prefix="sqllogic_seq_")
        self.sequences: dict[str, object] = {}
        self._generation = 0  # bumped per DDL so replaced paths are fresh
        self.ctas: dict[str, object] = {}  # file-local CREATE TABLE AS
        self._engine = None  # lazy: only index-DDL files pay for it
        # transaction state (reference test/sql/transactions/): BEGIN
        # snapshots the catalog dicts — DataFrames are immutable, so a
        # dict copy IS the MVCC snapshot; ROLLBACK re-registers it
        self._txn_snap: dict | None = None
        self._txn_seq_snap: dict | None = None
        self._txn_art_snap: dict | None = None
        self._txn_aborted = False

    def _eng(self):
        if self._engine is None:
            from data_chunk_compaction_in_duckdb_spark.engine import Engine

            self._engine = Engine(spark=self.spark, register=False)
        return self._engine

    def close(self) -> None:
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)

    # -- sequence DDL (shared grammar/UDFs: storage/seqsql.py)

    def _create_sequence(self, name: str, or_replace: bool, kwargs: dict) -> None:
        import os

        from data_chunk_compaction_in_duckdb_spark.storage import Sequence

        if name in self.sequences and not or_replace:
            raise SqlLogicError(
                f"Catalog Error: sequence {name} already exists"
            )
        self._generation += 1
        path = os.path.join(self.root, f"{name}_{self._generation}")
        self.sequences[name] = Sequence.create(self.spark, path, **kwargs)

    def _register_seq_udfs(self) -> None:
        """(Re)bind nextval/currval to the CURRENT name->path snapshot.
        Arrow-batched pandas_udfs: one linearizable range claim per
        (batch, name) — the claim itself is multi-process safe (O_EXCL
        manifest commit), so values stay globally unique no matter how
        Spark batches the rows; per-row ORDER is engine-specific in
        both systems, so specs compare value SETS (rowsort) or
        aggregates."""
        from data_chunk_compaction_in_duckdb_spark.storage.seqsql import (
            make_seq_udfs,
        )

        paths = {n: s.path for n, s in self.sequences.items()}
        nextval_udf, currval_udf = make_seq_udfs(paths)
        self.spark.udf.register("nextval", nextval_udf)
        self.spark.udf.register("currval", currval_udf)

    # -- dispatch

    # -- transactions (reference transaction_context.cpp semantics,
    #    probed on DuckDB 1.0: aborted txn refuses everything but
    #    COMMIT/ROLLBACK; COMMIT of an aborted txn silently rolls back;
    #    binder errors do NOT abort, constraint violations do)

    def _txn_restore(self) -> None:
        eng = self._eng()
        for name in set(self.ctas) - set(self._txn_snap):
            self.spark.catalog.dropTempView(name)
            eng.tables.pop(name, None)
        for name, df in self._txn_snap.items():
            if self.ctas.get(name) is not df:
                df.createOrReplaceTempView(name)
                eng.tables[name] = df
        self.ctas = dict(self._txn_snap)
        # catalog DDL (sequences, indexes) rolls back; sequence VALUE
        # state does not (probed: nextval survives ROLLBACK)
        self.sequences = dict(self._txn_seq_snap)
        if self._engine is not None:
            self._engine._art_indexes = dict(self._txn_art_snap)
            cur_views = getattr(self._engine, "_views", {})
            for name in set(cur_views) - set(self._txn_view_snap):
                self.spark.catalog.dropTempView(name)
            for name, body in self._txn_view_snap.items():
                if cur_views.get(name) != body:
                    # route through the engine's catalog-TF rewrite so a
                    # rolled-back view whose body calls duckdb_tables()
                    # etc. restores instead of failing to parse
                    self.spark.sql(
                        self._engine._rewrite_catalog_tfs(body)
                    ).createOrReplaceTempView(name)
            self._engine._views = dict(self._txn_view_snap)
            self._engine._schemas = set(self._txn_schema_snap)

    def _dispatch_txn(self, sql: str):
        from data_chunk_compaction_in_duckdb_spark.storage import dmlsql

        verb = dmlsql.parse_txn_verb(sql)
        if verb == "begin":
            if self._txn_snap is not None:
                # probed: a nested BEGIN also ABORTS the open transaction
                self._txn_aborted = True
                raise SqlLogicError(
                    "TransactionContext Error: cannot start a "
                    "transaction within a transaction"
                )
            self._txn_snap = dict(self.ctas)
            self._txn_seq_snap = dict(self.sequences)
            self._txn_art_snap = dict(
                getattr(self._engine, "_art_indexes", {}) or {}
            )
            # engine-side catalog DDL (CREATE VIEW/SCHEMA) is
            # transactional too — same snapshot discipline
            self._txn_view_snap = dict(
                getattr(self._engine, "_views", {}) or {}
            )
            self._txn_schema_snap = set(
                getattr(self._engine, "_schemas", set()) or set()
            )
            self._txn_aborted = False
            return True
        if verb == "commit":
            if self._txn_snap is None:
                raise SqlLogicError(
                    "TransactionContext Error: cannot commit - no "
                    "transaction is active"
                )
            if self._txn_aborted:
                self._txn_restore()
            self._txn_snap = None
            return True
        if verb == "rollback":
            if self._txn_snap is None:
                raise SqlLogicError(
                    "TransactionContext Error: cannot rollback - no "
                    "transaction is active"
                )
            self._txn_restore()
            self._txn_snap = None
            return True
        if self._txn_snap is not None and self._txn_aborted:
            raise SqlLogicError(
                "TransactionContext Error: Current transaction is "
                "aborted (please ROLLBACK)"
            )
        return False

    def execute(self, sql: str):
        """Returns a DataFrame (queries) or None (statements)."""
        from data_chunk_compaction_in_duckdb_spark import settings as _st
        from data_chunk_compaction_in_duckdb_spark import dialect as _dialect
        from data_chunk_compaction_in_duckdb_spark.storage import (
            dmlsql,
            seqsql,
        )

        # DuckDB expression grammar first, same as Engine.sql — DML
        # fragments and CTAS bodies accept the same surface as SELECTs
        expr = _dialect.rewrite_expressions(sql)
        if expr is not None:
            sql = expr

        if self._dispatch_txn(sql):
            return None

        # PREPARE/EXECUTE/DEALLOCATE (reference test/sql/prepared/):
        # same shared dispatch as Engine.sql; prepared DML re-enters
        # this context's own statement dispatch
        from data_chunk_compaction_in_duckdb_spark import prepared as _prep

        if getattr(self, "_prepared", None) is None:
            self._prepared = _prep.PreparedStore()

        def _run_prepared_sql(bound: str, binds: dict):
            if binds:
                return self.spark.sql(
                    bound, args=_prep.fold_args(self.spark, binds)
                )
            return self.spark.sql(bound)

        handled, result = _prep.dispatch(
            self._prepared, sql, _run_prepared_sql, self.execute
        )
        if handled:
            return result

        # settings surface (SET/RESET/PRAGMA <setting>, current_setting,
        # duckdb_settings) routes through the engine facade so the SAME
        # .test text runs natively in DuckDB
        if (
            _st.parse_set(sql) is not None
            or _st.parse_reset(sql) is not None
            or _st.CURRENT_SETTING_RE.search(sql)
            or _st.SETTINGS_TF_RE.search(sql)
        ):
            return self._eng().sql(sql)

        # view/schema DDL + catalog table functions (duckdb_tables/
        # views/schemas/types/keywords/functions) route through the
        # engine facade — same round-trippable text DuckDB runs natively
        from data_chunk_compaction_in_duckdb_spark import engine as _eng_mod

        if (
            _eng_mod._CREATE_VIEW_RE.match(sql)
            or _eng_mod._DROP_VIEW_RE.match(sql)
            or _eng_mod._CREATE_SCHEMA_RE.match(sql)
            or _eng_mod._DROP_SCHEMA_RE.match(sql)
            or _eng_mod.Engine._EXPLAIN_RE.match(sql)
            or _CATALOG_TF_RE.search(sql)
        ):
            return self._eng().sql(sql)

        created = seqsql.parse_create_sequence(sql)
        if created:
            self._create_sequence(*created)
            return None
        dropped = seqsql.parse_drop_sequence(sql)
        if dropped:
            name, if_exists = dropped
            if name not in self.sequences:
                if if_exists:
                    return None
                raise SqlLogicError(
                    f"Catalog Error: sequence {name} does not exist"
                )
            del self.sequences[name]
            return None
        m = _CREATE_INDEX_RE.match(sql)
        if m:
            import os

            unique, name, table = bool(m.group(1)), m.group(2), m.group(3)
            cols = [c.strip() for c in m.group(4).split(",") if c.strip()]
            eng = self._eng()
            if name in getattr(eng, "_art_indexes", {}):
                raise SqlLogicError(
                    f'Catalog Error: Index with name "{name}" already exists'
                )
            if table not in self.ctas:
                raise SqlLogicError(
                    f"Catalog Error: Table with name {table} does not exist"
                )
            missing = set(cols) - set(self.ctas[table].columns)
            if missing:
                raise SqlLogicError(
                    f'Binder Error: Table "{table}" does not have columns '
                    f"{sorted(missing)}"
                )
            self._generation += 1
            eng.create_index(
                table,
                cols,
                os.path.join(self.root, f"ix_{name}_{self._generation}"),
                n_buckets=2,
                name=name,
                unique=unique,
            )
            return None
        m = _DROP_INDEX_RE.match(sql)
        if m:
            if_exists, name = bool(m.group(1)), m.group(2)
            eng = self._eng()
            if name not in getattr(eng, "_art_indexes", {}):
                if if_exists:
                    return None
                raise SqlLogicError(
                    f"Catalog Error: Index with name {name} does not exist"
                )
            eng.drop_index(name)
            return None
        tr = dmlsql.parse_truncate(sql)
        if tr is not None:
            if tr not in self.ctas:
                raise SqlLogicError(
                    f"Catalog Error: Table with name {tr} does not exist"
                )
            new = self.ctas[tr].limit(0).localCheckpoint(eager=True)
            new.createOrReplaceTempView(tr)
            self.ctas[tr] = new
            self._eng().tables[tr] = new
            return None
        ins = dmlsql.parse_insert(sql)
        if ins is not None:
            name, collist, body, mode = ins
            if name not in self.ctas:
                raise SqlLogicError(
                    f"Catalog Error: Table with name {name} does not exist"
                )
            cur = self.ctas[name]
            if seqsql.SEQFN_RE.search(body):
                self._register_seq_udfs()
            if body.upper().startswith("VALUES"):
                new = self.spark.sql(f"SELECT * FROM ({body})")
            else:
                new = self.spark.sql(body)
            # positional insert: align names/types to the target schema;
            # a column list binds listed columns and NULLs the rest
            if collist is not None:
                from pyspark.sql import functions as F

                missing = set(collist) - set(cur.columns)
                if missing:
                    raise SqlLogicError(
                        f'Binder Error: Column "{sorted(missing)[0]}" '
                        f"does not exist in table {name}"
                    )
                new = new.toDF(*collist)
                new = new.select(
                    *[
                        new[c] if c in collist else F.lit(None).alias(c)
                        for c in cur.columns
                    ]
                )
            else:
                new = new.toDF(*cur.columns)
            for f in cur.schema.fields:
                new = new.withColumn(
                    f.name, new[f.name].cast(f.dataType)
                )
            eng = self._eng()
            if mode is not None:
                # OR REPLACE / OR IGNORE need a UNIQUE index on the
                # target (probed DuckDB error text on an unindexed one)
                ukeys = [
                    list(info["columns"])
                    for info in getattr(eng, "_art_indexes", {}).values()
                    if info["table"] == name and info["unique"]
                ]
                if not ukeys:
                    raise SqlLogicError(
                        "Binder Error: There are no UNIQUE/PRIMARY KEY "
                        "Indexes that refer to this table, ON CONFLICT "
                        "is a no-op"
                    )
                keys = ukeys[0]
                if mode == "ignore":
                    new = new.join(
                        cur.select(*keys), keys, "left_anti"
                    )
                else:  # replace
                    cur = cur.join(
                        new.select(*keys).distinct(), keys, "left_anti"
                    )
            merged = cur.unionByName(new)
            # ART UNIQUE enforcement on append (reference test/sql/index
            # unique-violation grid; duckdb updates the index per insert)
            for iname, info in getattr(eng, "_art_indexes", {}).items():
                if info["table"] != name or not info["unique"]:
                    continue
                cols = list(info["columns"])
                # DuckDB's ART UNIQUE index admits any number of NULL
                # keys (probed: two NULL-key inserts under a unique
                # index succeed) — NULLs compare unequal, so only
                # fully-non-NULL keys participate in the dup check
                dup = (
                    merged.na.drop(subset=cols)
                    .groupBy(*cols)
                    .count()
                    .filter("count > 1")
                    .limit(1)
                    .count()
                )
                if dup:
                    # a constraint violation ABORTS an open transaction
                    # (probed DuckDB behavior)
                    if self._txn_snap is not None:
                        self._txn_aborted = True
                    raise SqlLogicError(
                        "Constraint Error: Duplicate key violates unique "
                        f'index "{iname}" on {name}({", ".join(cols)})'
                    )
            merged = merged.localCheckpoint(eager=True)
            merged.createOrReplaceTempView(name)
            self.ctas[name] = merged
            eng.tables[name] = merged
            return None
        d = dmlsql.parse_delete(sql)
        if d is not None:
            from pyspark.sql import functions as F

            name, where, using = d
            if name not in self.ctas:
                raise SqlLogicError(
                    f"Catalog Error: Table with name {name} does not exist"
                )
            if using is not None:
                from data_chunk_compaction_in_duckdb_spark.operators.mutations import (  # noqa: E501
                    delete_using,
                    prefix_source,
                )

                srcname, alias = using
                src_pref = prefix_source(self.spark.table(srcname))
                cond = F.expr(
                    dmlsql.rewrite_qualified(where or "TRUE", name, alias)
                )
                new = delete_using(self.ctas[name], src_pref, cond)
            else:
                cond = F.expr(where) if where else F.lit(True)
                new = self.ctas[name].filter(~cond | cond.isNull())
            new = new.localCheckpoint(eager=True)
            new.createOrReplaceTempView(name)
            self.ctas[name] = new
            self._eng().tables[name] = new
            return None
        u = dmlsql.parse_update(sql)
        if u is not None:
            from pyspark.sql import functions as F

            name, assigns, where, from_ = u
            if name not in self.ctas:
                raise SqlLogicError(
                    f"Catalog Error: Table with name {name} does not exist"
                )
            if from_ is not None:
                from data_chunk_compaction_in_duckdb_spark.operators.mutations import (  # noqa: E501
                    prefix_source,
                    update_from,
                )

                srcname, alias = from_
                src_pref = prefix_source(self.spark.table(srcname))
                cond = F.expr(
                    dmlsql.rewrite_qualified(where or "TRUE", name, alias)
                )
                exprs = {
                    c: F.expr(dmlsql.rewrite_qualified(e, name, alias))
                    for c, e in assigns.items()
                }
                missing = set(exprs) - set(self.ctas[name].columns)
                if missing:
                    raise SqlLogicError(
                        f'Binder Error: Referenced column '
                        f'"{sorted(missing)[0]}" not found'
                    )
                new = update_from(self.ctas[name], src_pref, cond, exprs)
                new = new.localCheckpoint(eager=True)
                new.createOrReplaceTempView(name)
                self.ctas[name] = new
                self._eng().tables[name] = new
                return None
            from data_chunk_compaction_in_duckdb_spark.operators.mutations import (  # noqa: E501
                apply_assignments,
            )

            cond = F.expr(where) if where else F.lit(True)
            new = self.ctas[name]
            for col in assigns:
                if col not in new.columns:
                    raise SqlLogicError(
                        f'Binder Error: Referenced column "{col}" not found'
                    )
            new = apply_assignments(
                new, cond, {c: F.expr(e) for c, e in assigns.items()}
            )
            # an UPDATE re-inserts into unique ART indexes (reference:
            # delete+insert per updated row) — enforce like INSERT does
            for iname, info in getattr(
                self._eng(), "_art_indexes", {}
            ).items():
                if info["table"] != name or not info["unique"]:
                    continue
                cols = list(info["columns"])
                dup = (
                    new.na.drop(subset=cols)
                    .groupBy(*cols)
                    .count()
                    .filter("count > 1")
                    .limit(1)
                    .count()
                )
                if dup:
                    if self._txn_snap is not None:
                        self._txn_aborted = True
                    raise SqlLogicError(
                        "Constraint Error: Duplicate key violates unique "
                        f'index "{iname}" on {name}({", ".join(cols)})'
                    )
            new = new.localCheckpoint(eager=True)
            new.createOrReplaceTempView(name)
            self.ctas[name] = new
            self._eng().tables[name] = new
            return None
        m = _CTAS_RE.match(sql)
        if m:
            or_replace, name, select = bool(m.group(1)), m.group(2), m.group(3)
            if name in self.ctas and not or_replace:
                raise SqlLogicError(
                    f'Catalog Error: Table with name "{name}" already exists'
                )
            df = self.spark.sql(select.rstrip().rstrip(";"))
            df.createOrReplaceTempView(name)
            self.ctas[name] = df
            eng = self._eng()
            eng.tables[name] = df
            # DuckDB's CREATE OR REPLACE TABLE silently drops dependent
            # indexes (probed) — mirror it
            arts = getattr(eng, "_art_indexes", {})
            for iname in [
                i for i, info in arts.items() if info["table"] == name
            ]:
                del arts[iname]
            return None
        pti = re.compile(r"\bpragma_table_info\s*\(\s*'(\w+)'\s*\)", re.I)
        if pti.search(sql):
            from data_chunk_compaction_in_duckdb_spark import introspect

            # one view PER referenced table: a spec may join
            # pragma_table_info('t1') with pragma_table_info('t2')
            for tname in dict.fromkeys(m.group(1) for m in pti.finditer(sql)):
                introspect.pragma_table_info(
                    self.spark, tname
                ).createOrReplaceTempView(f"__pti_{tname}")
            from data_chunk_compaction_in_duckdb_spark.settings import (
                sub_outside_literals,
            )

            sql = sub_outside_literals(
                pti, lambda m: f"__pti_{m.group(1)}", sql
            )
            return self.spark.sql(sql)
        if re.search(r"\bduckdb_indexes\s*\(\s*\)", sql, re.I):
            from data_chunk_compaction_in_duckdb_spark import introspect

            introspect.duckdb_indexes(
                self.spark, getattr(self._eng(), "_art_indexes", {})
            ).createOrReplaceTempView("__duckdb_indexes")
            from data_chunk_compaction_in_duckdb_spark.settings import (
                sub_outside_literals,
            )

            sql = sub_outside_literals(
                re.compile(r"\bduckdb_indexes\s*\(\s*\)", re.I),
                "__duckdb_indexes",
                sql,
            )
            return self.spark.sql(sql)
        m = _DESCRIBE_SELECT_RE.match(sql)
        if m:
            from data_chunk_compaction_in_duckdb_spark import introspect

            return introspect.describe_query(self.spark, m.group(1))
        m = _DESCRIBE_RE.match(sql)
        if m:
            from data_chunk_compaction_in_duckdb_spark import introspect

            name = m.group(1)
            if name in self.sequences:
                return introspect.describe_sequence(self.sequences[name])
            return introspect.describe_table(self.spark, name)
        if re.search(r"\bduckdb_sequences\s*\(\s*\)", sql, re.I):
            # table-function readback: materialize the catalog function
            # into a temp view and rewrite the call site — the SAME
            # .test text runs natively in DuckDB (which requires the
            # parenthesized table-function form)
            from data_chunk_compaction_in_duckdb_spark import introspect

            introspect.duckdb_sequences(
                self.spark, self.sequences
            ).createOrReplaceTempView("__duckdb_sequences")
            from data_chunk_compaction_in_duckdb_spark.settings import (
                sub_outside_literals,
            )

            sql = sub_outside_literals(
                re.compile(r"\bduckdb_sequences\s*\(\s*\)", re.I),
                "__duckdb_sequences",
                sql,
            )
        if seqsql.SEQFN_RE.search(sql):
            self._register_seq_udfs()
        from data_chunk_compaction_in_duckdb_spark import dialect

        star = dialect.rewrite_star_modifiers(sql)
        if star is not None:
            sql = star

        def _resolve_cols(name: str):
            # DuckDB's QUALIFY source-column-over-alias precedence
            # (see dialect.rewrite_qualify) — session views cover both
            # the fixture tables and this context's CTAS views
            try:
                return self.spark.table(name).columns
            except Exception:  # noqa: BLE001 — not a resolvable table
                return None

        q = dialect.rewrite_qualify(sql, column_resolver=_resolve_cols)
        if q is not None:
            rewritten, drop_col, _reorder = q
            return self.spark.sql(rewritten).drop(drop_col)
        return self.spark.sql(sql)


def run_file(spark, path: str) -> int:
    """Execute every directive in `path` (engine-surface statements via
    EngineSqlContext, the rest via spark.sql); returns the number of
    directives run.  Raises SqlLogicError on first failure."""
    count = 0
    ctx = EngineSqlContext(spark)
    try:
        for rec in parse_file(path):
            where = f"{path}:{rec.line}"
            if rec.kind == "statement_ok":
                try:
                    df = ctx.execute(rec.sql)
                    # DDL/DML execute eagerly; SELECTs need an action.
                    if df is not None and df.columns:
                        df.collect()
                except Exception as e:  # noqa: BLE001
                    raise SqlLogicError(
                        f"{where}: statement ok failed: {e}"
                    ) from e
            elif rec.kind == "statement_error":
                try:
                    df = ctx.execute(rec.sql)
                    if df is not None and df.columns:
                        df.collect()
                except Exception:  # noqa: BLE001
                    pass
                else:
                    raise SqlLogicError(
                        f"{where}: statement error did not raise"
                    )
            else:
                try:
                    rows = ctx.execute(rec.sql).collect()
                except Exception as e:  # noqa: BLE001
                    raise SqlLogicError(f"{where}: query failed: {e}") from e
                got = [render_row(tuple(r), rec.types) for r in rows]
                exp = list(rec.expected)
                if rec.sortmode == "rowsort":
                    got.sort()
                    exp.sort()
                if got != exp:
                    diff = "\n".join(
                        f"  got: {g!r}\n  exp: {e!r}"
                        for g, e in list(zip(got + ["<none>"] * len(exp),
                                             exp + ["<none>"] * len(got)))[:5]
                    )
                    raise SqlLogicError(
                        f"{where}: {len(got)} rows vs {len(exp)} expected\n{diff}"
                    )
            count += 1
    finally:
        ctx.close()
    return count

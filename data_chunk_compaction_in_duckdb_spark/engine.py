"""User-facing facade — the analog of the reference's embedded API
(``DuckDB db; Connection con; con.Query(sql)``, SURVEY.md §3 entry
points 1-3).

A user of the reference switches like this::

    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").show()
    eng.sql("SELECT * FROM orders WHERE o_totalprice > :p", p=400000)  # prepared
    eng.table("lineitem").filter(...)                                  # DataFrame API
    eng.explain(df)                                                    # EXPLAIN
    eng.compact(df)                                                    # compaction layer
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark import catalog as _catalog
from data_chunk_compaction_in_duckdb_spark.session import get_spark


_UNHANDLED = object()  # sentinel: statement not a txn/DML form

import re as _re  # noqa: E402 — view/schema DDL grammar below

_CREATE_VIEW_RE = _re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*?);?\s*$",
    _re.I | _re.S,
)
_DROP_VIEW_RE = _re.compile(
    r"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", _re.I
)
_CREATE_SCHEMA_RE = _re.compile(
    r"^\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*;?\s*$", _re.I
)
_DROP_SCHEMA_RE = _re.compile(
    r"^\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", _re.I
)


class Engine:
    """One engine instance ≈ one reference Connection: a SparkSession with
    the fixture catalog registered as temp views."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = _catalog.DEFAULT_SF_DIR,
        register: bool = True,
        auto_compact: bool = False,
        compact_target_rows: int | None = None,
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self.auto_compact = auto_compact
        self.compact_target_rows = compact_target_rows
        self.tables: dict[str, DataFrame] = {}
        if register:
            self.tables = _catalog.register_views(self.spark, sf_dir)

    def _wrap(self, df: DataFrame):
        """With ``auto_compact`` on, hand out CompactingPhysicalOperator-
        style handles (compaction/auto.py): filters/joins composed on the
        result mark compaction points, settled by one dynamic compact()
        before the next fragmentation-sensitive consumer.  Off (default):
        the plain DataFrame, compaction left to the caller/AQE."""
        if not self.auto_compact:
            return df
        from data_chunk_compaction_in_duckdb_spark.compaction.auto import (
            AutoCompactFrame,
        )

        return AutoCompactFrame(df, target_rows=self.compact_target_rows)

    # -- entry point 1: SQL string (Connection::Query)
    def sql(self, query: str, *args: Any, **params: Any) -> DataFrame | None:
        """Run SQL against the registered catalog (returns None for the
        dispatched sequence DDL statements, a DataFrame for everything
        else).  Named ``:param``
        placeholders make this the prepared-statement path (reference
        entry point 2, client_context.cpp:534-560); positional ``?``
        markers with ``*args`` cover the reference's ``$1``/``?``
        prepared form (test/sql/prepared/) — both bound by Spark's
        parameterized SQL, never string interpolation.

        Sequence SQL rides the same entry point (reference
        test/sql/catalog/sequence/): ``CREATE [OR REPLACE] SEQUENCE`` /
        ``DROP SEQUENCE [IF EXISTS]`` statements manage engine-registered
        sequences (backed by commit logs under a per-engine root), and
        queries calling ``nextval('name')``/``currval('name')`` bind
        those names through Arrow-batched UDFs — one linearizable range
        claim per batch.  Pipelines should prefer
        ``storage.with_sequence`` (one O(1) claim per DataFrame); the
        SQL form exists for reference-parity per-row semantics.

        Inside the SQL text Catalyst+AQE own compaction (shuffle-read
        coalescing); with ``auto_compact`` on, the returned handle also
        auto-compacts anything composed on it at the DataFrame level."""
        from data_chunk_compaction_in_duckdb_spark import settings as _settings
        from data_chunk_compaction_in_duckdb_spark.storage import seqsql

        # DuckDB expression grammar FIRST (dialect.rewrite_expressions:
        # list/struct literals, JSON arrows, slicing, SIMILAR TO, //,
        # function aliases) so DML fragments, prepared bodies and view
        # definitions all accept the same surface as plain SELECTs
        from data_chunk_compaction_in_duckdb_spark import dialect

        expr = dialect.rewrite_expressions(query)
        if expr is not None:
            query = expr

        # transaction statements + versioned-table DML first (reference
        # src/transaction/transaction_context.cpp, test/sql/transactions/
        # and the INSERT/DELETE/UPDATE statement surface): Spark SQL
        # can't parse DML against temp views, so both are engine-level
        handled = self._dispatch_txn_dml(query)
        if handled is not _UNHANDLED:
            return handled

        # PREPARE/EXECUTE/DEALLOCATE (reference test/sql/prepared/,
        # src/main/prepared_statement.cpp): EXECUTE of a SELECT-ish
        # body binds the arguments as literal Columns through Spark's
        # parameterized SQL (never interpolation); prepared DML
        # re-enters this dispatch with the markers substituted
        handled = self._dispatch_prepared(query)
        if handled is not _UNHANDLED:
            return handled

        # CREATE/DROP VIEW + CREATE/DROP SCHEMA DDL and the catalog
        # table-function readbacks (duckdb_tables/views/schemas/types/
        # keywords/functions — reference src/function/table/system/)
        handled = self._dispatch_view_schema(query)
        if handled is not _UNHANDLED:
            return handled
        # EXPLAIN [ANALYZE] <select> (reference test/sql/explain/, the
        # EXPLAIN ANALYZE harvest in vector_compaction.cpp:83-92) —
        # DuckDB's (explain_key, explain_value) output shape
        handled = self._dispatch_explain(query)
        if handled is not _UNHANDLED:
            return handled

        # VACUUM / EXPORT DATABASE / IMPORT DATABASE maintenance
        # statements (reference test/sql/vacuum/, physical_export.cpp)
        handled = self._dispatch_maintenance(query)
        if handled is not _UNHANDLED:
            return handled

        # DESCRIBE / SHOW TABLES / SUMMARIZE statements (reference
        # test/sql/show_select/, summarize TF) — DuckDB's output shapes,
        # not Spark's native DESCRIBE
        handled = self._dispatch_show_describe(query)
        if handled is not _UNHANDLED:
            return handled
        query = self._rewrite_catalog_tfs(query)

        # settings statements (reference src/main/settings/,
        # test/sql/settings/): SET/PRAGMA <known setting>, RESET <name>.
        # Dotted Spark conf keys never match the name grammar, so
        # `SET spark.sql.x = v` still falls through to spark.sql below.
        st = _settings.parse_set(query)
        if st is not None:
            name, value, scope = st
            if self._is_setting(name):
                _settings.check_scope(name, scope, "set")
                self._settings_store().set(name, value)
            elif name in self._PRAGMAS:
                # engine pragmas keep working through the SQL form too
                self.pragma(name, value)
            else:
                raise ValueError(
                    "Catalog Error: unrecognized configuration "
                    f'parameter "{name}"'
                )
            return None
        rst = _settings.parse_reset(query)
        if rst is not None:
            name, scope = rst
            if self._is_setting(name):
                _settings.check_scope(name, scope, "reset")
                self._settings_store().reset(name)
            elif name in self._PRAGMAS:
                # symmetric with the SET path: unset restores the
                # Spark conf default for pragma-mapped names
                self.spark.conf.unset(self._PRAGMAS[name])
            else:
                raise ValueError(
                    "Catalog Error: unrecognized configuration "
                    f'parameter "{name}"'
                )
            return None
        if _settings.SETTINGS_TF_RE.search(query):
            self.duckdb_settings().createOrReplaceTempView(
                "__duckdb_settings"
            )
            query = _settings.sub_outside_literals(
                _settings.SETTINGS_TF_RE, "__duckdb_settings", query
            )
        if _settings.CURRENT_SETTING_RE.search(query):
            self._register_current_setting_udf()

        created = seqsql.parse_create_sequence(query)
        if created is not None:
            name, or_replace, kwargs = created
            seqs = getattr(self, "_sequences", {})
            if name in seqs and not or_replace:
                raise ValueError(
                    f"Catalog Error: sequence {name} already exists"
                )
            self.create_sequence(name, self._next_seq_path(name), **kwargs)
            return None
        dropped = seqsql.parse_drop_sequence(query)
        if dropped is not None:
            name, if_exists = dropped
            seqs = getattr(self, "_sequences", {})
            if name not in seqs:
                if if_exists:
                    return None
                raise ValueError(
                    f"Catalog Error: sequence {name} does not exist"
                )
            del seqs[name]
            return None
        if seqsql.SEQFN_RE.search(query):
            paths = {
                n: s.path
                for n, s in getattr(self, "_sequences", {}).items()
            }
            nextval_udf, currval_udf = seqsql.make_seq_udfs(paths)
            self.spark.udf.register("nextval", nextval_udf)
            self.spark.udf.register("currval", currval_udf)
        if args and params:
            raise ValueError("use positional ? args or named :params, not both")
        # DuckDB dialect forms Spark's parser lacks (dialect.py):
        # expression grammar already ran at the top of sql(); star
        # modifiers next (local rewrite), then QUALIFY (binder rewrite
        # + helper-column drop)
        star = dialect.rewrite_star_modifiers(query)
        if star is not None:
            query = star

        def _resolve_cols(name: str):
            # analysis-only lookup of a session view/table's columns —
            # lets the QUALIFY rewriter apply DuckDB's source-column-
            # over-select-alias precedence for shadowed names
            try:
                return self.spark.table(name).columns
            except Exception:  # noqa: BLE001 — not a resolvable table
                return None

        q = dialect.rewrite_qualify(query, column_resolver=_resolve_cols)
        drop_col = None
        if q is not None:
            query, drop_col, reorder = q
            if args:
                args = tuple(reorder(list(args)))
        if args:
            df = self.spark.sql(query, args=list(args))
        elif params:
            df = self.spark.sql(query, args=params)
        else:
            df = self.spark.sql(query)
        if drop_col:
            df = df.drop(drop_col)
        return self._wrap(df)

    # -- transactions (reference src/transaction/transaction_context.cpp,
    #    test/sql/transactions/) — staged multi-statement atomicity onto
    #    the versioned store (storage/transaction.py)

    def _dispatch_txn_dml(self, query: str):
        """BEGIN/COMMIT/ROLLBACK/ABORT + INSERT/DELETE/UPDATE dispatch.
        Returns the sentinel ``_UNHANDLED`` for every other statement
        (after enforcing DuckDB's aborted-transaction guard, probed:
        an aborted transaction refuses ALL statements except
        COMMIT/ROLLBACK with the same error text)."""
        from data_chunk_compaction_in_duckdb_spark.storage import dmlsql
        from data_chunk_compaction_in_duckdb_spark.storage.transaction import (
            TransactionAborted,
        )

        verb = dmlsql.parse_txn_verb(query)
        if verb == "begin":
            self.begin()
            return None
        if verb == "commit":
            self.commit_txn()
            return None
        if verb == "rollback":
            self.rollback()
            return None
        txn = getattr(self, "_txn", None)
        trunc = dmlsql.parse_truncate(query)
        if trunc is not None:
            if txn is not None:
                txn.check_active()
            vt = self._require_versioned(trunc)
            from pyspark.sql import functions as F

            if txn is not None:
                txn.delete_where(trunc, vt, F.lit(True))
                self._rebind_staged(trunc, vt)
            else:
                vt.delete_where(F.lit(True))
                vt.read().createOrReplaceTempView(trunc)
            return None
        ins = dmlsql.parse_insert(query)
        if ins is not None:
            if txn is not None:
                txn.check_active()
            name, collist, body, mode = ins
            vt = self._require_versioned(name)
            if body.upper().startswith("VALUES"):
                rows = self.spark.sql(f"SELECT * FROM ({body})")
            else:
                rows = self.spark.sql(body)
            # positional insert: align names and types to the target's
            # STORED columns (the staged manifest inside a transaction,
            # the latest manifest outside — generated columns are
            # computed at read and never inserted).  With a column
            # list, listed columns bind positionally and unlisted ones
            # take NULL (the store has no column defaults, matching
            # DuckDB's defaultless-column NULL).
            from pyspark.sql import functions as F

            from data_chunk_compaction_in_duckdb_spark.storage import (
                VersionedTable as _VT,
            )

            m = (
                txn.table(name, vt).m
                if txn is not None
                else vt._manifest(vt.latest_version())
            )
            stored = _VT._logical_schema(m).fields
            if collist is not None:
                known = {f.name for f in stored}
                bad = [c for c in collist if c not in known]
                if bad:
                    raise ValueError(
                        f'Binder Error: Column "{bad[0]}" does not exist '
                        f"in table {name}"
                    )
                if len(rows.columns) != len(collist):
                    raise ValueError(
                        "Binder Error: Column list has "
                        f"{len(collist)} entries but {len(rows.columns)} "
                        "values were supplied"
                    )
                rows = rows.toDF(*collist)
                rows = rows.select(
                    *[
                        rows[f.name]
                        if f.name in collist
                        else F.lit(None).alias(f.name)
                        for f in stored
                    ]
                )
            else:
                rows = rows.toDF(*[f.name for f in stored])
            for f in stored:
                rows = rows.withColumn(f.name, rows[f.name].cast(f.dataType))
            if mode is not None:
                # INSERT OR REPLACE / OR IGNORE / ON CONFLICT DO NOTHING
                # (reference physical_insert.cpp on-conflict path;
                # error text probed on a PK-less target)
                pk = [
                    c
                    for c in m.get("constraints", [])
                    if c["type"] == "primary_key"
                ]
                if not pk:
                    raise ValueError(
                        "Binder Error: There are no UNIQUE/PRIMARY KEY "
                        "Indexes that refer to this table, ON CONFLICT "
                        "is a no-op"
                    )
                key_cols = list(pk[0]["columns"])
                if mode == "ignore":
                    current = (
                        txn.read(name, vt) if txn is not None else vt.read()
                    )
                    rows = rows.join(
                        current.select(*key_cols), key_cols, "left_anti"
                    )
                    # falls through to the plain insert below
                else:  # replace: upsert through the staged merge
                    if txn is not None:
                        txn.merge(name, vt, rows, key_cols)
                        self._rebind_staged(name, vt)
                    else:
                        from data_chunk_compaction_in_duckdb_spark.storage.transaction import (  # noqa: E501
                            _StagedTable,
                        )

                        st = _StagedTable(vt)
                        st.merge(rows, key_cols)
                        st.commit(op="merge")
                        self._publish_autocommit(name, vt)
                    return None
            if txn is not None:
                txn.insert(name, vt, rows)
                self._rebind_staged(name, vt)
            else:
                vt.insert(rows)
                self._publish_autocommit(name, vt)
            return None
        dele = dmlsql.parse_delete(query)
        if dele is not None:
            if txn is not None:
                txn.check_active()
            name, where, using = dele
            vt = self._require_versioned(name)
            from pyspark.sql import functions as F

            if using is not None:
                # DELETE ... USING (join-delete, reference
                # physical_delete over a join plan)
                from data_chunk_compaction_in_duckdb_spark.operators.mutations import (  # noqa: E501
                    prefix_source,
                )

                srcname, alias = using
                src_pref = prefix_source(self.spark.table(srcname))
                cond = F.expr(
                    dmlsql.rewrite_qualified(where or "TRUE", name, alias)
                )
                if txn is not None:
                    txn.delete_using(name, vt, src_pref, cond)
                    self._rebind_staged(name, vt)
                else:
                    from data_chunk_compaction_in_duckdb_spark.storage.transaction import (  # noqa: E501
                        _StagedTable,
                    )

                    st = _StagedTable(vt)
                    st.delete_using(src_pref, cond)
                    st.commit(op="delete")
                    self._publish_autocommit(name, vt)
                return None
            cond = F.expr(where) if where else F.lit(True)
            if txn is not None:
                txn.delete_where(name, vt, cond)
                self._rebind_staged(name, vt)
            else:
                vt.delete_where(cond)
                self._publish_autocommit(name, vt)
            return None
        upd = dmlsql.parse_update(query)
        if upd is not None:
            if txn is not None:
                txn.check_active()
            name, assigns, where, from_ = upd
            vt = self._require_versioned(name)
            from pyspark.sql import functions as F

            if from_ is not None:
                # UPDATE ... FROM (join-update)
                from data_chunk_compaction_in_duckdb_spark.operators.mutations import (  # noqa: E501
                    prefix_source,
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
                if txn is not None:
                    txn.update_from(name, vt, src_pref, cond, exprs)
                    self._rebind_staged(name, vt)
                else:
                    from data_chunk_compaction_in_duckdb_spark.storage.transaction import (  # noqa: E501
                        _StagedTable,
                    )

                    st = _StagedTable(vt)
                    st.update_from(src_pref, cond, exprs)
                    st.commit(op="update")
                    self._publish_autocommit(name, vt)
                return None
            cond = F.expr(where) if where else F.lit(True)
            exprs = {c: F.expr(e) for c, e in assigns.items()}
            if txn is not None:
                txn.update_where(name, vt, cond, exprs)
                self._rebind_staged(name, vt)
            else:
                vt.update_where(cond, exprs)
                self._publish_autocommit(name, vt)
            return None
        if txn is not None and txn.aborted:
            raise TransactionAborted()
        return _UNHANDLED

    # -- view / schema DDL + catalog readback (reference
    #    src/function/table/system/duckdb_tables.cpp, duckdb_views.cpp,
    #    duckdb_schemas.cpp, duckdb_types.cpp, duckdb_keywords.cpp,
    #    duckdb_functions.cpp; test/sql/pg_catalog/)

    def _dispatch_view_schema(self, query: str):
        """CREATE/DROP VIEW and CREATE/DROP SCHEMA — Spark temp views
        plus an engine-side DDL registry so duckdb_views()/
        duckdb_schemas() can read back DuckDB's catalog shape."""
        m = _CREATE_VIEW_RE.match(query)
        if m:
            or_replace, name, body = bool(m.group(1)), m.group(2), m.group(3)
            views = getattr(self, "_views", {})
            if name in views and not or_replace:
                raise ValueError(
                    f'Catalog Error: View with name "{name}" already exists'
                )
            body = body.strip()
            # a view body may call a catalog TF (DuckDB accepts it);
            # the registry keeps the ORIGINAL body for duckdb_views()
            self.spark.sql(self._rewrite_catalog_tfs(body)).createOrReplaceTempView(
                name
            )
            self._views = {**views, name: body}
            return None
        m = _DROP_VIEW_RE.match(query)
        if m:
            if_exists, name = bool(m.group(1)), m.group(2)
            views = getattr(self, "_views", {})
            if name in views:
                del views[name]
                self.spark.catalog.dropTempView(name)
                return None
            # not in the engine registry: a Spark-native temp view
            # (CREATE TEMP VIEW passes through to Catalyst) still drops
            if self.spark.catalog.dropTempView(name):
                return None
            if if_exists:
                return None
            raise ValueError(
                f"Catalog Error: View with name {name} does not exist"
            )
        m = _CREATE_SCHEMA_RE.match(query)
        if m:
            if_not_exists, name = bool(m.group(1)), m.group(2)
            schemas = getattr(self, "_schemas", set())
            if name in schemas and not if_not_exists:
                raise ValueError(
                    f'Catalog Error: Schema with name "{name}" already exists'
                )
            self._schemas = schemas | {name}
            return None
        m = _DROP_SCHEMA_RE.match(query)
        if m:
            if_exists, name = bool(m.group(1)), m.group(2)
            schemas = getattr(self, "_schemas", set())
            if name not in schemas:
                if if_exists:
                    return None
                raise ValueError(
                    f"Catalog Error: Schema with name {name} does not exist"
                )
            self._schemas = schemas - {name}
            return None
        return _UNHANDLED

    def _rewrite_catalog_tfs(self, query: str) -> str:
        """Materialize any catalog-TF call site (``duckdb_tables()``
        etc.) into a temp view and rewrite the call (outside literals)
        — the same round-trippable pattern duckdb_settings() uses, so
        the SAME SQL text runs natively in DuckDB."""
        from data_chunk_compaction_in_duckdb_spark.settings import (
            sub_outside_literals,
        )

        from data_chunk_compaction_in_duckdb_spark.dialect import (
            _literal_spans,
        )

        for fname, builder in (
            ("duckdb_tables", self.duckdb_tables),
            ("duckdb_views", self.duckdb_views),
            ("duckdb_schemas", self.duckdb_schemas),
            ("duckdb_types", self.duckdb_types),
            ("duckdb_keywords", self.duckdb_keywords),
            ("duckdb_functions", self.duckdb_functions),
        ):
            pat = _re.compile(rf"\b{fname}\s*\(\s*\)", _re.I)
            # literal-aware probe: a TF name appearing only as DATA
            # must not materialize the catalog view.  Spans recompute
            # per TF — earlier substitutions shift the offsets.
            lits = _literal_spans(query)
            if any(
                not any(a <= m.start() < b for a, b in lits)
                for m in pat.finditer(query)
            ):
                builder().createOrReplaceTempView(f"__{fname}")
                query = sub_outside_literals(pat, f"__{fname}", query)
        return query

    _VACUUM_RE = _re.compile(r"^\s*VACUUM(\s+ANALYZE)?\s*;?\s*$", _re.I)
    _EXPORT_DB_RE = _re.compile(
        r"^\s*EXPORT\s+DATABASE\s+'([^']+)'"
        r"(?:\s*\(\s*FORMAT\s+'?(\w+)'?\s*\))?\s*;?\s*$",
        _re.I,
    )
    _IMPORT_DB_RE = _re.compile(
        r"^\s*IMPORT\s+DATABASE\s+'([^']+)'\s*;?\s*$", _re.I
    )

    def _dispatch_maintenance(self, query: str):
        """VACUUM [ANALYZE] / EXPORT DATABASE / IMPORT DATABASE
        statements (reference test/sql/vacuum/, physical_export.cpp:215,
        test/sql/copy/ export roundtrips) onto the existing APIs:

        - VACUUM sweeps every versioned table's unreferenced data files
          (versioned.vacuum — the reference's checkpoint truncation);
          VACUUM ANALYZE additionally recomputes nothing here because
          zone maps refresh at every commit (stats ride the manifest).
        - EXPORT DATABASE '<dir>' [(FORMAT csv|parquet)] writes every
          engine-created table (versioned + CTAS) plus a schema.sql DDL
          record (sources/summary.export_database).
        - IMPORT DATABASE '<dir>' re-registers every exported table.
        """
        if self._VACUUM_RE.match(query):
            # probed: DuckDB accepts VACUUM inside an open transaction
            # (no-op there — sweeping under a pinned base would race
            # the staged snapshot, same rule as CHECKPOINT).  DuckDB's
            # VACUUM never destroys history, so the statement sweeps
            # ORPHAN files only; retention truncation is the explicit
            # Python vacuum(retain_last=...) API.
            if getattr(self, "_txn", None) is None:
                for name, vt in getattr(self, "_versioned", {}).items():
                    vt.vacuum_orphans()
            return None
        m = self._EXPORT_DB_RE.match(query)
        if m:
            from data_chunk_compaction_in_duckdb_spark.sources.summary import (
                export_database,
            )

            out_dir, fmt = m.group(1), (m.group(2) or "parquet").lower()
            tables: dict[str, DataFrame] = {}
            for name, vt in getattr(self, "_versioned", {}).items():
                tables[name] = vt.read()
            for name, df in self.tables.items():
                if name not in tables and name not in _catalog.TABLES:
                    tables[name] = df
            export_database(self.spark, tables, out_dir, fmt=fmt)
            return None
        m = self._IMPORT_DB_RE.match(query)
        if m:
            from data_chunk_compaction_in_duckdb_spark.sources.summary import (
                import_database,
            )

            fmt = "parquet"
            for name, df in import_database(
                self.spark, m.group(1), fmt=fmt
            ).items():
                df.createOrReplaceTempView(name)
                self.tables[name] = df
            return None
        return _UNHANDLED

    _EXPLAIN_RE = _re.compile(
        r"^\s*EXPLAIN\s+(ANALYZE\s+)?(.*)$", _re.I | _re.S
    )

    def _dispatch_explain(self, query: str):
        """EXPLAIN [ANALYZE] <query> in DuckDB's two-column shape
        (probed: one row, explain_key = 'physical_plan' /
        'analyzed_plan', explain_value = the rendered tree).  EXPLAIN
        renders Spark's formatted physical plan; EXPLAIN ANALYZE
        executes the query and renders the final AQE plan with each
        operator's numOutputRows (plans/metrics.explain_analyze — the
        same instrumentation the reference harvests from its
        profilers, vector_compaction.cpp:83-92)."""
        m = self._EXPLAIN_RE.match(query)
        if m is None:
            return _UNHANDLED
        analyze, inner = bool(m.group(1)), m.group(2).strip().rstrip(";")
        if not _re.match(r"^\s*(SELECT|WITH|VALUES|TABLE)\b", inner, _re.I):
            raise ValueError(
                "Not implemented Error: EXPLAIN of a non-SELECT "
                "statement is not supported"
            )
        df = self.sql(inner)
        if analyze:
            import time

            from data_chunk_compaction_in_duckdb_spark.plans.metrics import (
                explain_analyze,
            )

            t0 = time.perf_counter()
            ops = explain_analyze(df, execute=True)
            wall = time.perf_counter() - t0
            lines = [
                "Query Profiling Information",
                f"total wall time: {wall:.3f}s",
                "",
            ]
            for op in ops:
                rows = "" if op.rows is None else f"  rows={op.rows}"
                lines.append(f"{'  ' * op.depth}{op.name}{rows}")
            key, value = "analyzed_plan", "\n".join(lines)
        else:
            from data_chunk_compaction_in_duckdb_spark.plans.inspect import (
                explain_str,
            )

            key, value = "physical_plan", explain_str(df, "formatted")
        return self.spark.createDataFrame(
            [(key, value)], "explain_key string, explain_value string"
        )

    _DESCRIBE_SEL_RE = _re.compile(r"^\s*DESCRIBE\s+(SELECT\b.*)$", _re.I | _re.S)
    _DESCRIBE_TBL_RE = _re.compile(r"^\s*DESCRIBE\s+(\w+)\s*;?\s*$", _re.I)
    _SHOW_TABLES_RE = _re.compile(r"^\s*SHOW\s+(?:ALL\s+)?TABLES\s*;?\s*$", _re.I)
    _SUMMARIZE_RE = _re.compile(r"^\s*SUMMARIZE\s+(\w+)\s*;?\s*$", _re.I)
    _CHECKPOINT_RE = _re.compile(r"^\s*CHECKPOINT(\s+\w+)?\s*;?\s*$", _re.I)

    def _dispatch_show_describe(self, query: str):
        """DESCRIBE <table|SELECT ...> / SHOW [ALL] TABLES / SUMMARIZE
        <table> in DuckDB's output shapes (the sqllogic runner has had
        this dispatch since round 6; Engine.sql mirrors it so the same
        statement text works on the user-facing entry point).  Spark's
        native DESCRIBE has a different shape, so these must intercept
        before spark.sql."""
        from data_chunk_compaction_in_duckdb_spark import introspect

        m = self._DESCRIBE_SEL_RE.match(query)
        if m:
            return introspect.describe_query(self.spark, m.group(1))
        m = self._DESCRIBE_TBL_RE.match(query)
        if m:
            name = m.group(1)
            if name in getattr(self, "_sequences", {}):
                return introspect.describe_sequence(self._sequences[name])
            if name in getattr(self, "_versioned", {}):
                return introspect.describe_versioned(self._versioned[name])
            return introspect.describe_table(self.spark, name)
        if self._SHOW_TABLES_RE.match(query):
            return introspect.show_tables(self.spark)
        if self._CHECKPOINT_RE.match(query):
            # reference CHECKPOINT: fold the live set into few files
            # (checkpoint_manager.cpp).  Probed: DuckDB accepts it
            # inside an open transaction without touching the staged
            # state — here that is a no-op (checkpointing under a
            # pinned base would only manufacture a commit conflict).
            if getattr(self, "_txn", None) is None:
                for name, vt in getattr(self, "_versioned", {}).items():
                    vt.checkpoint()
                    self._publish_autocommit(name, vt)
            return None
        m = self._SUMMARIZE_RE.match(query)
        if m:
            from data_chunk_compaction_in_duckdb_spark.sources.summary import (
                summarize,
            )

            return summarize(self.spark.table(m.group(1)))
        return _UNHANDLED

    def duckdb_tables(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_tables(
            self.spark,
            getattr(self, "_versioned", {}),
            getattr(self, "_art_indexes", {}),
        )

    def duckdb_views(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_views(self.spark, getattr(self, "_views", {}))

    def duckdb_schemas(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_schemas(
            self.spark, sorted(getattr(self, "_schemas", set()))
        )

    def duckdb_types(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_types(self.spark)

    def duckdb_keywords(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_keywords(self.spark)

    def duckdb_functions(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_functions(self.spark)

    # -- prepared statements (reference test/sql/prepared/)

    def _prepared_store(self):
        if getattr(self, "_prepared", None) is None:
            from data_chunk_compaction_in_duckdb_spark.prepared import (
                PreparedStore,
            )

            self._prepared = PreparedStore()
        return self._prepared

    def _dispatch_prepared(self, query: str):
        from pyspark.sql import functions as F

        from data_chunk_compaction_in_duckdb_spark import prepared as P

        def run_sql(bound: str, binds: dict[str, str]):
            return self.sql(bound, **P.fold_args(self.spark, binds))

        handled, result = P.dispatch(
            self._prepared_store(), query, run_sql, self.sql
        )
        return result if handled else _UNHANDLED

    def _require_versioned(self, name: str):
        vt = getattr(self, "_versioned", {}).get(name)
        if vt is None:
            raise ValueError(
                f"Catalog Error: Table with name {name} does not exist "
                "(DML targets versioned tables; see "
                "create_versioned_table)"
            )
        return vt

    def _rebind_staged(self, name: str, vt) -> None:
        """Read-your-own-writes: inside a transaction the session view
        shows the staged state; other engines reading the store still
        resolve the last COMMITTED manifest (MVCC snapshot)."""
        self._txn.table(name, vt).read().createOrReplaceTempView(name)

    def enable_atomic_commit(self, path: str) -> None:
        """Route multi-table COMMITs through a root transaction log at
        ``path`` (storage.txnlog.RootLog): one O_EXCL link commits every
        staged table atomically — a reader resolving versions through
        ``snapshot_versions()`` can never observe a partial commit.
        Engines sharing the same root path share the commit lock
        (reference transaction_manager.cpp's single commit point)."""
        from data_chunk_compaction_in_duckdb_spark.storage.txnlog import (
            RootLog,
        )

        self._root_log = RootLog(path)

    def snapshot_versions(self) -> dict[str, int]:
        """Atomic {table: version} mapping from the root log (empty
        when atomic commit is not enabled)."""
        log = getattr(self, "_root_log", None)
        return log.snapshot() if log is not None else {}

    def _publish_autocommit(self, name: str, vt) -> None:
        """Rebind the session view after an AUTOCOMMIT mutation and, when
        the root transaction log is enabled, record the new version so
        snapshot_versions() stays current (txnlog.RootLog.note — the
        manifest link already committed, this is visibility only)."""
        vt.read().createOrReplaceTempView(name)
        log = getattr(self, "_root_log", None)
        if log is not None:
            log.note({name: (vt, vt.latest_version())})

    def begin(self) -> None:
        """BEGIN [TRANSACTION] / START TRANSACTION."""
        from data_chunk_compaction_in_duckdb_spark.storage.transaction import (
            Transaction,
        )

        if getattr(self, "_txn", None) is not None:
            # probed: a nested BEGIN also ABORTS the open transaction
            self._txn.aborted = True
            raise ValueError(
                "TransactionContext Error: cannot start a transaction "
                "within a transaction"
            )
        self._txn = Transaction()
        # catalog DDL (CREATE/DROP VIEW/SCHEMA) is transactional in the
        # reference (probed: a rolled-back CTAS/VIEW vanishes) — pin the
        # registries so ROLLBACK can restore them
        self._txn._catalog_snap = (
            dict(getattr(self, "_views", {})),
            set(getattr(self, "_schemas", set())),
        )

    def _restore_catalog(self, txn) -> None:
        views_snap, schemas_snap = getattr(
            txn, "_catalog_snap", ({}, set())
        )
        cur_views = getattr(self, "_views", {})
        for name in set(cur_views) - set(views_snap):
            self.spark.catalog.dropTempView(name)
        for name, body in views_snap.items():
            if cur_views.get(name) != body:
                self.spark.sql(
                    self._rewrite_catalog_tfs(body)
                ).createOrReplaceTempView(name)
        self._views = dict(views_snap)
        self._schemas = set(schemas_snap)

    def commit_txn(self) -> dict[str, int]:
        """COMMIT: each staged table publishes ONE manifest commit.
        COMMIT of an aborted transaction silently rolls back (probed
        DuckDB behavior).  On CommitConflictError the transaction is
        closed (the reference also invalidates it) and the error
        re-raises for the caller to retry on fresh state."""
        txn = getattr(self, "_txn", None)
        if txn is None:
            raise ValueError(
                "TransactionContext Error: cannot commit - no "
                "transaction is active"
            )
        self._txn = None
        try:
            if txn.aborted:
                # probed: COMMIT of an aborted txn silently rolls back
                self._restore_catalog(txn)
                return {}
            try:
                return txn.commit(
                    root_log=getattr(self, "_root_log", None)
                )
            except Exception:
                # a conflict-invalidated transaction must not leak its
                # CREATE VIEW / CREATE SCHEMA effects (the reference
                # invalidates the whole transaction, catalog included)
                self._restore_catalog(txn)
                raise
        finally:
            self._restore_views(txn)

    def rollback(self) -> None:
        """ROLLBACK / ABORT: discard staging, restore committed views."""
        txn = getattr(self, "_txn", None)
        if txn is None:
            raise ValueError(
                "TransactionContext Error: cannot rollback - no "
                "transaction is active"
            )
        self._txn = None
        self._restore_catalog(txn)
        self._restore_views(txn)

    def _restore_views(self, txn) -> None:
        # plain rebind, no root-log note: ending a transaction mutates
        # nothing (a rolled-back/conflicted txn must not grow the log)
        for name in txn._staged:
            vt = getattr(self, "_versioned", {}).get(name)
            if vt is not None:
                vt.read().createOrReplaceTempView(name)

    def _next_seq_path(self, name: str) -> str:
        """Per-engine sequence root (created lazily, removed on
        close()); a generation counter keeps OR REPLACE paths fresh."""
        import os
        import tempfile

        if getattr(self, "_seq_root", None) is None:
            self._seq_root = tempfile.mkdtemp(prefix="engine_seq_")
        self._seq_gen = getattr(self, "_seq_gen", 0) + 1
        return os.path.join(self._seq_root, f"{name}_{self._seq_gen}")

    # -- entry point 3: programmatic DataFrame (embedded C++ driver)
    def table(self, name: str) -> DataFrame:
        if name not in self.tables:
            self.tables[name] = _catalog.load_table(self.spark, self.sf_dir, name)
        return self._wrap(self.tables[name])

    def explain(self, df: DataFrame, mode: str = "formatted") -> str:
        """EXPLAIN (the reference's EXPLAIN ANALYZE harvest point,
        imdb_main.cpp:70-76)."""
        from data_chunk_compaction_in_duckdb_spark.plans import explain_str

        return explain_str(df, mode)

    # -- compaction layer (the research delta)
    def compact(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark.compaction import compact

        return compact(df, **kwargs)

    def pipeline_break(self, df: DataFrame) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark.compaction import pipeline_break

        return pipeline_break(df)

    def profile(self, df: DataFrame):
        from data_chunk_compaction_in_duckdb_spark.compaction import (
            partition_histogram,
        )

        return partition_histogram(df)

    # -- UDF registration (Connection::CreateScalarFunction /
    # CreateAggregateFunction, connection.hpp:164-205): typed scalar
    # functions usable from both SQL and the DataFrame API.
    def create_function(
        self,
        name: str,
        fn: Any,
        return_type: str = "string",
        vectorized: bool = True,
    ) -> None:
        """Register a Python scalar function under ``name`` for SQL use.

        ``vectorized=True`` wraps ``fn`` as an Arrow-batched pandas UDF
        (``fn`` receives/returns pandas Series) — the honest analog of
        the reference's vector-at-a-time C++ UDFs and the only variant
        that belongs anywhere near a hot path.  ``vectorized=False``
        registers a row-at-a-time UDF for non-vectorizable logic."""
        from pyspark.sql.functions import pandas_udf, udf

        if vectorized:
            # pandas_udf infers its eval type from *resolvable* type
            # hints; user modules with `from __future__ import
            # annotations` carry string hints, so stamp real
            # Series->Series annotations matching fn's arity instead.
            import inspect

            import pandas as pd

            params = list(inspect.signature(fn).parameters)
            fn.__annotations__ = {p: pd.Series for p in params}
            fn.__annotations__["return"] = pd.Series
            self.spark.udf.register(name, pandas_udf(fn, return_type))
        else:
            self.spark.udf.register(name, udf(fn, return_type))

    def create_table_function(self, name: str, df: DataFrame) -> None:
        """Expose a DataFrame as a named relation (the table-function /
        CREATE VIEW surface, table_function.hpp)."""
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        if name in _catalog.TABLES:
            # a fixture view was rebound — drop the register_views memo so
            # other callers re-register the originals instead of silently
            # inheriting this engine's override
            _catalog.invalidate_views(self.spark)

    def create_macro(
        self, name: str, params: str, body: str, returns: str = "DOUBLE"
    ) -> None:
        """CREATE MACRO name(args) AS body (DuckDB SQL macros) — Spark's
        SQL-defined temporary function.  Unlike ``create_function`` this
        stays entirely JVM-side: the body is a SQL expression inlined by
        the analyzer, so macros are codegen-compatible and free at any
        scale.  ``params`` is typed ("x DOUBLE, y DOUBLE") because Spark
        SQL functions declare parameter types; DuckDB macros are untyped.
        """
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {returns} RETURN {body}"
        )

    # DuckDB pragma -> dynamic Spark conf.  The reference's benchmark
    # drivers configure the engine this way (SET threads / memory_limit /
    # allocator pragmas, vector_compaction.cpp:50-57); only runtime-
    # settable Spark confs are mapped — memory sizing is submit-time on a
    # cluster, so memory_limit intentionally has no entry.
    _PRAGMAS = {
        # SET threads: the reference's per-query parallelism knob; the
        # runtime-settable Spark equivalent is the shuffle fan-out.
        "threads": "spark.sql.shuffle.partitions",
        # PRAGMA enable_optimizer gates DuckDB's logical optimizer; the
        # Spark optimizer that can be toggled at runtime is AQE.
        "enable_optimizer": "spark.sql.adaptive.enabled",
        # The reference RAISES on integer overflow / bad casts
        # (test/sql/overflow/), and Spark 4's ANSI-on default already
        # matches that error-for-error.  Exposed as a pragma so a user
        # can opt a session into Spark's legacy wrap/NULL semantics (or
        # back); tests/test_overflow_ansi.py pins both modes against
        # DuckDB per expression.
        "ansi_errors": "spark.sql.ansi.enabled",
    }

    def pragma(self, name: str, value: Any) -> None:
        """SET pragma (PragmaStatement surface): translate the reference's
        engine pragmas to their dynamic Spark confs; reject unknown or
        non-runtime-settable pragmas loudly rather than ignoring them.
        DuckDB-catalog settings (threads, memory_limit, TimeZone,
        default_collation, enable_progress_bar) route to the settings
        store so ``pragma``/``SET``/``RESET``/readback stay coherent."""
        if self._is_setting(name):
            self._settings_store().set(name, value)
            return
        key = self._PRAGMAS.get(name)
        if key is None:
            raise ValueError(
                f"pragma {name!r} has no runtime-settable Spark mapping"
            )
        self.spark.conf.set(key, str(value))

    # -- DuckDB settings surface (reference src/main/settings/,
    #    src/main/config.cpp, test/sql/settings/)

    def _settings_store(self):
        if getattr(self, "_settings", None) is None:
            from data_chunk_compaction_in_duckdb_spark.settings import (
                SettingsStore,
            )

            self._settings = SettingsStore(self.spark)
        return self._settings

    @staticmethod
    def _is_setting(name: str) -> bool:
        from data_chunk_compaction_in_duckdb_spark import settings as S

        try:
            S.canonical_name(name)
            return True
        except ValueError:
            return False

    def set_setting(self, name: str, value: Any) -> None:
        self._settings_store().set(name, value)

    def reset_setting(self, name: str) -> None:
        self._settings_store().reset(name)

    def current_setting(self, name: str) -> Any:
        """Typed readback (DuckDB's ``current_setting()`` scalar)."""
        return self._settings_store().current(name)

    def duckdb_settings(self) -> DataFrame:
        """duckdb_settings() catalog readback (introspect module)."""
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_settings(
            self.spark, self._settings_store()
        )

    def _register_current_setting_udf(self) -> None:
        """SQL-callable ``current_setting(name)`` returning VARCHAR (the
        SQL surface can't be per-name typed through a Python UDF; specs
        CAST on both engines).  Snapshots the store's current rendering
        at registration — re-registered before every query that
        references it, so reads always see the latest SET."""
        store = self._settings_store()
        from data_chunk_compaction_in_duckdb_spark.settings import (
            SETTING_SPECS,
        )

        snap = {n: store.rendered(n) for n in SETTING_SPECS}
        aliases = {"max_memory": "memory_limit", "timezone": "TimeZone"}

        def _cs(name: str) -> str:
            low = (name or "").lower()
            for k in snap:
                if k.lower() == low:
                    return snap[k]
            if low in aliases:
                return snap[aliases[low]]
            raise ValueError(
                "Catalog Error: unrecognized configuration "
                f'parameter "{name}"'
            )

        self.spark.udf.register("current_setting", _cs, "string")

    def create_udtf(self, name: str, cls: type, return_type: str) -> None:
        """Register a Python UDTF (Spark's table-function analog of the
        reference's Connection::CreateTableFunction for row-generating
        functions): the class's ``eval`` yields output rows, and the
        function becomes SQL-callable both standalone
        (``SELECT * FROM f(x)``) and correlated via ``LATERAL f(t.col)``
        — the TABLE IN-OUT operator surface (§2.2) in the modern API.
        Rows stream Arrow-batched per partition; no driver round-trip."""
        from pyspark.sql.functions import udtf as _udtf

        self.spark.udtf.register(name, _udtf(cls, returnType=return_type))

    def create_index(
        self,
        table: str,
        columns: list[str] | str,
        path: str,
        n_buckets: int = 32,
        name: str | None = None,
        unique: bool = False,
    ) -> None:
        """CREATE INDEX analog (reference `CREATE INDEX ... ON t(cols)`,
        ART index, src/execution/index/art/).  Spark has no row-level
        index; the engine-native acceleration with the same effect on
        the reference's two index uses is a hash-bucketed, sorted
        persistent copy of the table keyed on the indexed columns:

        - INDEX_JOIN: joins between tables bucketed on the same key run
          with zero join-side exchanges (physical_hash_join.cpp's
          co-located build, made durable).
        - point/range lookup: bucket pruning + per-file min/max on the
          sort column skip irrelevant buckets at scan time.

        The registered view for ``table`` is replaced by the indexed
        copy, so subsequent `sql()`/`table()` calls use it transparently
        (the reference's planner picks the ART plan the same way).

        ``unique=True`` enforces key uniqueness on creation (reference:
        a UNIQUE ART index rejects duplicate keys, ART::Insert's
        constraint path) — rows with a NULL in any key column are
        exempt, per SQL semantics.  The index is recorded in the
        catalog and visible through ``duckdb_indexes()``.
        """
        from data_chunk_compaction_in_duckdb_spark.sources import (
            write_bucketed,
        )

        cols = [columns] if isinstance(columns, str) else list(columns)
        idx_name = name or f"idx_{table}_{'_'.join(cols)}"
        df = self.table(table)
        if unique:
            keyed = df.na.drop(subset=cols).select(*cols)
            if keyed.distinct().count() != keyed.count():
                raise ValueError(
                    f"UNIQUE index {idx_name}: duplicate keys in "
                    f"{table}({', '.join(cols)})"
                )
        # unique physical name per index: a table can carry several
        # indexes (reference: many ARTs per table); each lands in its
        # own bucketed copy and the view follows the LATEST layout
        self._art_gen = getattr(self, "_art_gen", 0) + 1
        phys = f"{table}_idx{self._art_gen}"
        write_bucketed(df, phys, path, cols, n_buckets=n_buckets)
        indexed = self.spark.table(phys)
        indexed.createOrReplaceTempView(table)
        self.tables[table] = indexed
        if table in _catalog.TABLES:
            _catalog.invalidate_views(self.spark)
        self._art_indexes = getattr(self, "_art_indexes", {})
        self._art_indexes[idx_name] = {
            "table": table,
            "columns": cols,
            "unique": unique,
        }

    def drop_index(self, name: str) -> None:
        """DROP INDEX: removes the catalog entry (the bucketed copy
        stays as plain storage — scanning it without the index is
        always correct, like the reference's heap after DROP INDEX)."""
        del getattr(self, "_art_indexes", {})[name]

    def duckdb_indexes(self) -> DataFrame:
        """duckdb_indexes() over every index registered on this engine
        (reference src/function/table/system/duckdb_indexes.cpp)."""
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_indexes(
            self.spark, getattr(self, "_art_indexes", {})
        )

    # -- durable tables (reference CREATE TABLE + storage layer)
    def create_versioned_table(
        self, name: str, df: DataFrame, path: str, **kwargs: Any
    ):
        """CREATE TABLE backed by the durable store (storage/versioned):
        creates the table at ``path`` and registers its latest state as
        temp view ``name`` so `sql()` sees it.  Re-register with
        ``refresh_versioned_view`` after mutations (view re-binding is
        the engine's commit-visibility rule, operators/mutations.py)."""
        from data_chunk_compaction_in_duckdb_spark.storage import (
            VersionedTable,
        )

        vt = VersionedTable.create(self.spark, path, df, **kwargs)
        self._publish_autocommit(name, vt)
        self._versioned = getattr(self, "_versioned", {})
        self._versioned[name] = vt
        return vt

    def duckdb_constraints(self) -> DataFrame:
        """duckdb_constraints() over every versioned table registered on
        this engine (reference src/function/table/system/
        duckdb_constraints.cpp)."""
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_constraints(
            self.spark, getattr(self, "_versioned", {})
        )

    def refresh_versioned_view(
        self, name: str, vt, version: int | None = None
    ) -> None:
        """Re-bind temp view ``name`` to the table's state AS OF
        ``version`` (default latest) — time travel at the SQL layer."""
        vt.read(version).createOrReplaceTempView(name)

    # -- sequences (reference CREATE SEQUENCE / nextval,
    # test/sql/catalog/sequence/)
    def create_sequence(self, name: str, path: str, **kwargs: Any):
        """CREATE SEQUENCE backed by the commit log at ``path``; handle
        cached on the engine so nextval('name')-style lookups resolve."""
        from data_chunk_compaction_in_duckdb_spark.storage import Sequence

        seq = Sequence.create(self.spark, path, **kwargs)
        self._sequences = getattr(self, "_sequences", {})
        self._sequences[name] = seq
        return seq

    def sequence(self, name: str):
        return getattr(self, "_sequences", {})[name]

    def nextval(self, name: str) -> int:
        """nextval('seq') — driver-side single allocation; for per-row
        assignment use storage.with_sequence (one range claim per
        DataFrame, never a per-row counter bottleneck)."""
        return self.sequence(name).nextval()

    def currval(self, name: str) -> int:
        return self.sequence(name).currval()

    # -- introspection (reference SHOW TABLES / DESCRIBE /
    # duckdb_columns(); test/sql/show_select/, test/sql/pg_catalog/)
    def show_tables(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.show_tables(self.spark)

    def describe(self, name_or_table) -> DataFrame:
        """DESCRIBE: accepts a view name, a VersionedTable (read
        manifest-only — no data scan), a Sequence, or the name of a
        sequence registered on this engine — every catalog object kind
        the engine creates is DESCRIBE-able."""
        from data_chunk_compaction_in_duckdb_spark import introspect
        from data_chunk_compaction_in_duckdb_spark.storage import (
            Sequence,
            VersionedTable,
        )

        if isinstance(name_or_table, VersionedTable):
            return introspect.describe_versioned(name_or_table)
        if isinstance(name_or_table, Sequence):
            return introspect.describe_sequence(name_or_table)
        seqs = getattr(self, "_sequences", {})
        if name_or_table in seqs:
            return introspect.describe_sequence(seqs[name_or_table])
        return introspect.describe_table(self.spark, name_or_table)

    def duckdb_columns(self, tables: list[str] | None = None) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_columns(self.spark, tables)

    def duckdb_sequences(self) -> DataFrame:
        """duckdb_sequences() over every sequence registered on this
        engine (reference src/function/table/system/
        duckdb_sequences.cpp) — one O(1) head read per sequence."""
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.duckdb_sequences(
            self.spark, getattr(self, "_sequences", {})
        )

    def show_sequences(self) -> DataFrame:
        from data_chunk_compaction_in_duckdb_spark import introspect

        return introspect.show_sequences(
            self.spark, getattr(self, "_sequences", {})
        )

    # -- materialized indexes (reference PRAGMA create_fts_index,
    # extension/fts; CREATE INDEX + storage, test/sql/index/)
    def create_fts_index(
        self, name: str, docs: DataFrame, id_col: str, text_col: str
    ):
        """PRAGMA create_fts_index analog: tokenize ``docs`` ONCE into
        versioned postings/doclen tables under the engine's index root;
        query with ``match_bm25``.  ``FTSIndex.append`` keeps it fresh
        delta-only."""
        from data_chunk_compaction_in_duckdb_spark.pipeline import FTSIndex

        idx = FTSIndex.build(
            self.spark, self._next_index_path("fts", name), docs,
            id_col, text_col,
        )
        self._indexes = getattr(self, "_indexes", {})
        self._indexes[name] = idx
        return idx

    def create_vector_index(
        self,
        name: str,
        corpus: DataFrame,
        id_col: str,
        vec_col: str,
        dim: int,
        kind: str = "pq",
        **kwargs: Any,
    ):
        """CREATE INDEX analog for the ANN surface: ``kind='pq'``
        (product-quantization codes) or ``'ivf'`` (Voronoi cells), both
        materialized into the versioned store with delta ``append``."""
        from data_chunk_compaction_in_duckdb_spark.pipeline import (
            IVFIndex,
            PQIndex,
        )

        cls_ = {"pq": PQIndex, "ivf": IVFIndex}[kind]
        idx = cls_.build(
            self.spark, self._next_index_path(kind, name), corpus,
            id_col, vec_col, dim, **kwargs,
        )
        self._indexes = getattr(self, "_indexes", {})
        self._indexes[name] = idx
        return idx

    def index(self, name: str):
        return getattr(self, "_indexes", {})[name]

    def match_bm25(self, name: str, query_terms: list[str], **kwargs: Any):
        """match_bm25 over a registered FTS index (reference
        extension/fts match_bm25 macro): (doc, score) from the STORED
        postings."""
        return self.index(name).search(query_terms, **kwargs)

    def _next_index_path(self, kind: str, name: str) -> str:
        import os
        import tempfile

        if getattr(self, "_index_root", None) is None:
            self._index_root = tempfile.mkdtemp(prefix="engine_idx_")
        self._idx_gen = getattr(self, "_idx_gen", 0) + 1
        return os.path.join(self._index_root, f"{kind}_{name}_{self._idx_gen}")

    def close(self) -> None:
        import shutil

        for attr in ("_seq_root", "_index_root"):
            root = getattr(self, attr, None)
            if root:
                shutil.rmtree(root, ignore_errors=True)
        self.spark.stop()

"""Full-text search — the reference's FTS extension surface
(extension/fts: PRAGMA create_fts_index + match_bm25 scoring,
test/sql/fts/*.test) re-expressed Spark-first.

The index is a relation, not a side structure: ``build_fts_index``
produces a term-partitioned postings DataFrame (term, doc, tf) plus
per-document lengths — exactly what an inverted index is, expressed in
the engine's own data model.  At 100 TB the postings table is written
bucketed by term so a query's term lookups are partition-pruned scans,
and document-length stats ride along as a narrow (doc, dl) relation.

Scoring is Okapi BM25 with the Lucene-style non-negative IDF
``ln(1 + (N - df + 0.5)/(df + 0.5))``.  Tokens are lowercased word
splits; ``stemmer='porter'`` (reference
extension/fts/fts_indexing.cpp's stemmer option) additionally maps
every token — and every query term — through the Porter algorithm
(pipeline/stem.py, an Arrow-batched per-partition pass), so
morphological variants share postings.

Everything is exact-integer until the final score expression, so the
only doubles are the idf/avgdl terms — DuckDB replays the identical
formula in SQL and the driver hash compares after ROUND(score, 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokenize(text_col) -> F.Column:
    """Lowercased whitespace tokens, empties removed."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def _stem_terms(terms: list[str], stemmer: str | None) -> list[str]:
    """Stem QUERY terms with the same function the index applied —
    driver-side, bounded by the query length."""
    if stemmer is None:
        return terms
    from data_chunk_compaction_in_duckdb_spark.pipeline.stem import STEMMERS

    fn = STEMMERS[stemmer]
    return sorted({fn(t) for t in terms})


def build_fts_index(
    docs: DataFrame, id_col: str, text_col: str, stemmer: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen): postings = (term, doc, tf) — one shuffle,
    grouped on (doc, term) with map-side partial counts; doclen =
    (doc, dl) from the same tokenization, no extra scan of the text.

    Persist/bucket postings by term for repeated querying; this function
    stays lazy so one-shot searches plan as a single DAG."""
    from data_chunk_compaction_in_duckdb_spark.compaction import fan_out

    # tokenize+explode is the CPU-bound pass: widen a single-file
    # one-task scan to session parallelism (no-op on parallel scans)
    toks = fan_out(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    if stemmer is not None:
        from data_chunk_compaction_in_duckdb_spark.pipeline.stem import (
            stem_pandas_udf,
        )

        toks = toks.select(
            "doc", stem_pandas_udf(stemmer)(F.col("term")).alias("term")
        )
    postings = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    # doclen derives from postings, NOT from a second pass over toks:
    # sum(tf) per doc IS the token count (identical value and type), and
    # every consumer of the pair now hangs off the ONE (doc, term)
    # aggregate exchange, which AQE reuses — the previous independent
    # groupBy re-tokenized the whole corpus a second time (plan audit:
    # 4 document scans per one-shot search, now 1; guide §2.4).
    doclen = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    return postings, doclen


def _bm25_over(
    postings: DataFrame,
    doclen: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over an (already-built) postings/doclen pair — the shared
    scoring kernel of the one-shot and index-backed paths, so both
    produce bit-identical doubles.  Plan: postings filtered to the
    (bounded) query-term list BEFORE any aggregation — df per term is
    computed over that sliver only; corpus stats (N, avgdl) are a
    1-row broadcast; the final score is one groupBy(doc)."""
    stats = doclen.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    matched = postings.filter(F.col("term").isin(*query_terms))
    dft = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        matched.join(F.broadcast(dft), "term")
        .join(doclen, "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return scored.groupBy("doc").agg(F.sum(idf * tf_part).alias("score"))


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    stemmer: str | None = None,
) -> DataFrame:
    """BM25 score per document matching ANY query term (the reference's
    match_bm25), tokenizing ``docs`` inline — the one-shot form; for
    repeated querying materialize an ``FTSIndex`` once instead.
    ``stemmer='porter'`` stems corpus tokens AND query terms with the
    same function (reference fts_indexing.cpp stemmer option).

    Returns (doc, score) with the raw double score — callers round for
    hashing/display."""
    postings, _ = build_fts_index(docs, id_col, text_col, stemmer)
    # Materialize the (doc, term, tf) aggregate ONCE per invocation
    # (localCheckpoint — per-instance, recomputed every run, never
    # shared across runs): the BM25 consumers (term sliver, df, doclen,
    # corpus stats) otherwise re-tokenize the corpus per consumer —
    # Catalyst pushes the term filter THROUGH the aggregate, so the
    # subtrees never canonicalize equal and exchange reuse cannot save
    # them.  Interleaved A/B at sf0.1: 1.28 s -> 0.80 s med (guide
    # §2.4/§3.3 "materialize an intermediate to truncate the plan").
    # eager=False: the checkpoint fills inside the first consuming job
    # instead of a separate blocking driver job (r10 A/B).
    postings = postings.localCheckpoint(eager=False)
    doclen = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    return _bm25_over(
        postings, doclen, _stem_terms(query_terms, stemmer), k1, b
    )


class FTSIndex:
    """Materialized inverted index — the FTS sibling of
    ``pipeline.vector_index.PQIndex`` (reference PRAGMA
    create_fts_index builds a persistent index table set,
    extension/fts/fts_indexing.cpp): postings (term, doc, tf) and
    doclen (doc, dl) live in VersionedTables, so the index inherits
    time travel, O_EXCL commit linearizability and vacuum retention,
    and queries tokenize NOTHING at search time — they scan the stored
    term sliver only.  At 100 TB postings are the term-partitioned
    layout; a search is a partition-pruned scan of |query terms| terms.

    Exactness: ``search`` rides the same ``_bm25_over`` kernel as the
    one-shot ``bm25_scores``, so results are bit-identical (the index
    queries share the direct query's DuckDB oracle verbatim)."""

    def __init__(self, spark, path: str):
        import json
        import os

        from data_chunk_compaction_in_duckdb_spark.storage import (
            VersionedTable,
        )

        self.spark = spark
        self.path = path
        self.postings_table = VersionedTable(
            spark, os.path.join(path, "postings")
        )
        self.doclen_table = VersionedTable(
            spark, os.path.join(path, "doclen")
        )
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    @classmethod
    def build(
        cls,
        spark,
        path: str,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        stemmer: str | None = None,
    ) -> "FTSIndex":
        """One tokenize pass -> both versioned relations (the postings
        shuffle and the doclen aggregation share the exploded-token
        subtree) + the tiny meta sidecar, published write-then-rename."""
        import json
        import os

        from data_chunk_compaction_in_duckdb_spark.storage import (
            VersionedTable,
        )

        postings, _ = build_fts_index(docs, id_col, text_col, stemmer)
        os.makedirs(path, exist_ok=True)
        pt = VersionedTable.create(
            spark, os.path.join(path, "postings"), postings
        )
        # doclen derives from the STORED postings (dl = sum of the
        # per-term counts — the identical value), so the corpus is
        # tokenized exactly once per build instead of once per relation
        doclen = pt.read().groupBy("doc").agg(F.sum("tf").alias("dl"))
        VersionedTable.create(spark, os.path.join(path, "doclen"), doclen)
        mp = os.path.join(path, "meta.json")
        tmp = mp + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"id_col": id_col, "text_col": text_col, "stemmer": stemmer},
                f,
            )
        os.replace(tmp, mp)
        return cls(spark, path)

    def rebuild(self, docs: DataFrame) -> int:
        """FULL re-tokenize after arbitrary corpus changes (deletes,
        edits) — one copy-on-write commit per relation; the previous
        index stays time-travel readable.  For append-only ingest use
        ``append``."""
        postings, doclen = build_fts_index(
            docs,
            self.meta["id_col"],
            self.meta["text_col"],
            self.meta.get("stemmer"),
        )
        for vt, df in (
            (self.postings_table, postings),
            (self.doclen_table, doclen),
        ):
            base = vt.latest_version()
            affected = set(vt._manifest(base)["files"])
            v = vt._cow_commit("reindex", affected, df, base=base)
        return v

    def append(self, new_docs: DataFrame) -> int:
        """Incremental maintenance (reference ART::Insert analog —
        r6's same treatment as PQIndex.append): tokenize ONLY the
        delta and commit append-only to BOTH relations; every existing
        postings/doclen file moves by manifest reference.  Postings and
        doclen are per-document local (tf and dl never cross documents)
        while the corpus-level BM25 stats (N, avgdl, df) are computed
        at QUERY time from the stored relations, so append ∘ build ≡
        build-on-union bit-exactly."""
        postings, doclen = build_fts_index(
            new_docs,
            self.meta["id_col"],
            self.meta["text_col"],
            self.meta.get("stemmer"),
        )
        v = self.postings_table.insert(postings)
        self.doclen_table.insert(doclen)
        return v

    def delete(self, keys: DataFrame) -> int:
        """Incremental DELETE maintenance — the erase twin of ``append``
        (reference: the FTS index is rebuilt or dropped on document
        deletes, extension/fts; the ART analog is ``ART::Delete``):
        CoW anti-join delete of the ids from BOTH stored relations.
        tf/dl are per-document local and the corpus stats (N, avgdl,
        df) are query-time derived from the stored relations, so
        delete ∘ build ≡ build-on-survivors bit-exactly (shared subset
        oracle of ``fts_bm25_index_delete_search``)."""
        id_col = self.meta["id_col"]
        k = keys.select(F.col(id_col).alias("doc"))
        v = self.postings_table.delete_keys(k, "doc")
        self.doclen_table.delete_keys(k, "doc")
        return v

    def stale(self, docs: DataFrame) -> DataFrame:
        """Indexed documents NO LONGER in the corpus — the DELETE-side
        twin of ``missing``: their postings keep scoring (and keep
        inflating N/df) after the document is gone.  ``delete`` these
        ids or ``rebuild``."""
        id_col = self.meta["id_col"]
        live = (
            docs.filter(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc"))
        )
        return self.doclen().join(live, "doc", "left_anti")

    def postings(self, version: int | None = None) -> DataFrame:
        return self.postings_table.read(version)

    def doclen(self, version: int | None = None) -> DataFrame:
        return self.doclen_table.read(version)

    def missing(self, docs: DataFrame) -> DataFrame:
        """Documents with no doclen row: stale coverage surfaced like
        the vector indexes — ``append`` the delta.  NULL-id documents
        and documents whose text tokenizes to NOTHING are excluded:
        explode() gives them no index footprint at all (no postings, no
        doclen), and they can never match a term query — so they are
        not "missing", they are unindexable by construction."""
        id_col = self.meta["id_col"]
        ids = self.doclen().select(F.col("doc").alias(id_col))
        return (
            docs.filter(F.col(id_col).isNotNull())
            .filter(F.size(tokenize(self.meta["text_col"])) > 0)
            .join(ids, id_col, "left_anti")
        )

    def search(
        self,
        query_terms: list[str],
        k1: float = 1.2,
        b: float = 0.75,
        version: int | None = None,
    ) -> DataFrame:
        """match_bm25 over the STORED index: no tokenization on the
        query path — the postings scan is filtered to the query terms
        (partition-pruned under a by-term layout).  Query terms pass
        through the stemmer the index was built with."""
        return _bm25_over(
            self.postings(version),
            self.doclen(version),
            _stem_terms(query_terms, self.meta.get("stemmer")),
            k1,
            b,
        )

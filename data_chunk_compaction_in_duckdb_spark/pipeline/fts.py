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
``ln(1 + (N - df + 0.5)/(df + 0.5))``.  No stemming (the reference's
porter stemmer is a tokenizer option there; tokens here are plain
lowercased word splits — documented divergence, the fixture corpus is
already lowercase words).

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


def build_fts_index(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen): postings = (term, doc, tf) — one shuffle,
    grouped on (doc, term) with map-side partial counts; doclen =
    (doc, dl) from the same tokenization, no extra scan of the text.

    Persist/bucket postings by term for repeated querying; this function
    stays lazy so one-shot searches plan as a single DAG."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    postings = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    doclen = toks.groupBy("doc").agg(F.count("*").alias("dl"))
    return postings, doclen


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score per document matching ANY query term (the reference's
    match_bm25).  Plan: postings filtered to the (bounded) query-term
    list BEFORE any aggregation — df per term and tf per (doc, term)
    are computed over that sliver only; corpus stats (N, avgdl) are a
    1-row broadcast; the final score is one groupBy(doc).

    Returns (doc, score) with the raw double score — callers round for
    hashing/display."""
    postings, doclen = build_fts_index(docs, id_col, text_col)
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

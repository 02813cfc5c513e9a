"""Training-data pipeline, round-6 additions: seeded-PII redaction and
the Gopher top-n-gram repetition signal.

`text_redact_patterns` (llm_q.py) pins the redaction no-op path on the
PII-free corpus; `text_pii_seeded_redaction` here closes that gap by
deterministically seeding typed PII (emails / dotted quads / SSN- and
phone-shaped spans, derived from doc_id) into the text ON BOTH ENGINES,
so the oracle exercises real replacements and real per-category counts.
`text_top_gram_fraction` adds the remaining Gopher repetition rule the
existing repetition_ratio / duplicate-gram queries don't cover: the
character share of the single most frequent word n-gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query

# Deterministic PII seeding, mirrored verbatim in the oracle: every
# fourth document gains two emails, a dotted quad, or an SSN+phone pair.
_SEED_SQL = """
    text || CASE doc_id % 4
      WHEN 0 THEN ' mail user' || CAST(doc_id AS VARCHAR)
                  || '@example.com and ops@test.org'
      WHEN 1 THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.42 up'
      WHEN 2 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' tel 555-867-5309'
      ELSE '' END
"""


def _seeded_col() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" mail user"),
                d.cast("string"),
                F.lit("@example.com and ops@test.org"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit(" host 10."),
                (d % 200).cast("string"),
                F.lit(".0.42 up"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit(" ssn 123-45-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" tel 555-867-5309"),
            ),
        )
        .otherwise(F.lit("")),
    )


def _pii_oracle_sql() -> str:
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import (
        PII_PATTERNS,
    )

    counts = ",\n           ".join(
        f"len(regexp_extract_all(seeded, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "seeded"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
    WITH s AS (SELECT doc_id, {_SEED_SQL} AS seeded FROM documents)
    SELECT doc_id,
           {counts},
           {red} AS redacted
    FROM s
    """


@query("text_pii_seeded_redaction", oracle=_pii_oracle_sql())
def text_pii_seeded_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII scrub with NON-degenerate semantics: deterministic PII
    spans are seeded from doc_id on both engines, then redacted
    (pipeline.redact_pii) and audited per category (pipeline.pii_counts,
    counted on the pre-redaction text).  All JVM regexp expressions in
    one narrow projection — the 100 TB shape is a map-only pass."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        pii_counts,
        redact_pii,
    )

    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select("doc_id", _seeded_col().alias("seeded"))
    counts = pii_counts("seeded")
    return seeded.select(
        "doc_id",
        *[v.alias(k) for k, v in counts.items()],
        redact_pii("seeded").alias("redacted"),
    )


@query(
    "text_top_gram_fraction",
    oracle="""
    WITH w AS (SELECT doc_id, trim(text) AS t,
                      string_split_regex(trim(text), '\\s+') AS words
               FROM documents),
    g AS (SELECT doc_id, t,
                 list_transform(
                   generate_series(1, GREATEST(len(words) - 1, 1)),
                   i -> array_to_string(list_slice(words, i, i + 1), ' '))
                 AS grams
          FROM w),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt
          FROM (SELECT doc_id, UNNEST(grams) AS gram FROM g)
          GROUP BY doc_id, gram),
    top AS (SELECT doc_id, gram, cnt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, gram ASC) AS rn
            FROM c)
    SELECT g.doc_id,
           top.gram AS top_gram,
           CAST(top.cnt AS INT) AS top_cnt,
           len(g.grams) AS n_grams,
           ROUND(CAST(length(top.gram) * top.cnt AS DOUBLE)
                 / GREATEST(length(g.t), 1), 6) AS top_gram_char_frac
    FROM g LEFT JOIN top ON g.doc_id = top.doc_id AND top.rn = 1
    """,
)
def text_top_gram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher top-bigram rule: the most frequent word 2-gram per
    document and the fraction of characters its occurrences cover.
    Spark side is a per-row sorted-run fold (pipeline.top_gram_fraction)
    — map-only, no shuffle; the oracle recomputes the same winner with
    a windowed GROUP BY (ties: highest count, then smallest gram)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        top_gram_fraction,
    )

    docs = load_table(spark, sf_dir, "documents")
    return top_gram_fraction(docs, "doc_id", "text", n=2)


# ---------------------------------------------------------------------------
# Index DELETE maintenance (the erase twin of the round-6 append queries;
# reference analog: ART::Delete, src/execution/index/art/art.cpp — the
# reference erases index entries per-DELETE rather than rebuilding).
# Each query builds the index over the FULL corpus, deletes one third of
# the keys, then queries — the result must be BIT-IDENTICAL to an index
# built over the surviving two-thirds, so each shares the direct path's
# oracle restricted to the survivor predicate.
# ---------------------------------------------------------------------------


def _pq_delete_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.queries.llm_q2 import (
        _pq_adc_oracle_sql,
    )

    return _pq_adc_oracle_sql(corpus_pred="vec_id % 3 <> 0")


@query("sim_ann_pq_index_delete_topk", oracle=_pq_delete_oracle())
def sim_ann_pq_index_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DELETE maintenance parity (PQIndex.delete; reference
    ART::Delete): build the code table over the WHOLE corpus, delete a
    third of the keys copy-on-write, then query — deleted vectors must
    vanish from ADC candidacy entirely, so the result equals an index
    built over the survivors and the oracle is the direct path's SQL
    with the survivor predicate on the corpus side.  A delete that
    left a phantom code (or dropped a survivor) diverges the hash."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import PQIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 97 == 0)
    survivors = emb.filter(F.col("vec_id") % 3 != 0)
    root = retained_tmpdir("pqixd_q_")
    idx = PQIndex.build(
        spark, root + "/ix", emb, "vec_id", "embedding", dim=64, m=16,
        codes=16,
    )
    idx.delete(emb.filter(F.col("vec_id") % 3 == 0).select("vec_id"))
    out = idx.topk(survivors, queries_df, k=5, rerank=50)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


def _ivf_delete_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.queries.llm_q import (
        _ivf_ann_oracle_sql,
    )

    return _ivf_ann_oracle_sql(corpus_pred="vec_id % 3 <> 0")


@query("sim_ann_ivf_index_delete_topk", oracle=_ivf_delete_oracle())
def sim_ann_ivf_index_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF sibling of sim_ann_pq_index_delete_topk (IVFIndex.delete):
    deleted ids lose their stored cell rows, so they stop being
    candidates in every probed cell; the exact re-rank runs over the
    surviving corpus only.  check_coverage stays on: after the delete,
    stored cells and the survivor corpus must agree exactly."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 97 == 0)
    survivors = emb.filter(F.col("vec_id") % 3 != 0)
    root = retained_tmpdir("ivfixd_q_")
    idx = IVFIndex.build(
        spark, root + "/ix", emb, "vec_id", "embedding", dim=64,
        n_clusters=16,
    )
    idx.delete(emb.filter(F.col("vec_id") % 3 == 0).select("vec_id"))
    out = idx.topk(survivors, queries_df, k=5, n_probe=8, check_coverage=True)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


def _fts_delete_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.queries.llm_q2 import (
        _FTS_BM25_ORACLE,
    )

    # restrict the tokenize CTE to the survivors: BM25's corpus stats
    # (N, avgdl, df) must shrink with the delete, exactly like the
    # stored relations do
    return _FTS_BM25_ORACLE.replace(
        "FROM documents", "FROM documents WHERE doc_id % 3 <> 0"
    )


@query("fts_bm25_index_delete_search", oracle=_fts_delete_oracle())
def fts_bm25_index_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index DELETE maintenance parity (FTSIndex.delete):
    build postings/doclen over the whole corpus, delete a third of the
    doc ids from BOTH relations copy-on-write, then search.  Because
    the BM25 corpus stats are computed at query time from the stored
    relations, the deleted documents stop contributing to N, avgdl and
    df — the scores equal an index built over the survivors alone."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import FTSIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = retained_tmpdir("ftsixd_q_")
    idx = FTSIndex.build(spark, root + "/ix", docs, "doc_id", "text")
    idx.delete(docs.filter(F.col("doc_id") % 3 == 0).select("doc_id"))
    out = idx.search(["data", "query", "stream"])
    return out.select("doc", F.round("score", 4).alias("score"))


# ---------------------------------------------------------------------------
# Index UPDATE maintenance: the reference updates its ART by erasing and
# re-inserting the row (delete + insert composition); the round-trip
# (delete a third of the keys, re-append the same rows) must land the
# index back at full-corpus content BIT-EXACTLY — so these share the
# full-corpus oracles verbatim.  A delete that under-erased would leave
# duplicate codes after the append (candidates double, hash diverges); an
# append that under-inserted would leave holes.
# ---------------------------------------------------------------------------


def _pq_full_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.queries.llm_q2 import (
        _pq_adc_oracle_sql,
    )

    return _pq_adc_oracle_sql()


@query("sim_ann_pq_index_upsert_topk", oracle=_pq_full_oracle())
def sim_ann_pq_index_upsert_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-path parity (PQIndex delete + append composition;
    reference: ART updates erase and re-insert the key): build over the
    whole corpus, delete a third of the keys copy-on-write, re-append
    the same rows delta-only, then query — the result must be
    bit-identical to the never-touched index, so the full-corpus oracle
    is shared verbatim."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import PQIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 97 == 0)
    third = emb.filter(F.col("vec_id") % 3 == 0)
    root = retained_tmpdir("pqixu_q_")
    idx = PQIndex.build(
        spark, root + "/ix", emb, "vec_id", "embedding", dim=64, m=16,
        codes=16,
    )
    idx.delete(third.select("vec_id"))
    idx.append(third)
    out = idx.topk(emb, queries_df, k=5, rerank=50)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


def _fts_full_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.queries.llm_q2 import (
        _FTS_BM25_ORACLE,
    )

    return _FTS_BM25_ORACLE


@query("fts_bm25_index_upsert_search", oracle=_fts_full_oracle())
def fts_bm25_index_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-path parity for the inverted index (FTSIndex delete +
    append composition): delete a third of the doc ids from BOTH stored
    relations, re-append the same documents, then search — N, avgdl,
    df and every tf/dl must land back exactly, so the one-shot BM25
    oracle is shared verbatim."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import FTSIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    docs = load_table(spark, sf_dir, "documents")
    third = docs.filter(F.col("doc_id") % 3 == 0)
    root = retained_tmpdir("ftsixu_q_")
    idx = FTSIndex.build(spark, root + "/ix", docs, "doc_id", "text")
    idx.delete(third.select("doc_id"))
    idx.append(third)
    out = idx.search(["data", "query", "stream"])
    return out.select("doc", F.round("score", 4).alias("score"))

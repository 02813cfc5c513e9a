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
    FROM g JOIN top ON g.doc_id = top.doc_id AND top.rn = 1
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

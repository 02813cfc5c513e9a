"""LLM-data-pipeline queries over documents/embeddings (BASELINE.json:
dedup, similarity search, text analysis, multimodal) — each oracle-checked
in DuckDB via the engine-portable md5 hashing scheme where the operator is
SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query

_NUM_HASHES = 8
_BANDS = 4

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_survivors",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, smallest id survives."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs, "doc_id", "text")


def _minhash_oracle() -> str:
    sigs = ",\n            ".join(
        f"MIN(substr(md5('{i // 4}:' || s), {8 * (i % 4) + 1}, 8)) AS sig_{i}"
        for i in range(_NUM_HASHES)
    )
    rpb = _NUM_HASHES // _BANDS
    bands = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sig".format(
            b=b,
            concat=" || '|' || ".join(
                f"sig_{i}" for i in range(b * rpb, (b + 1) * rpb)
            ),
        )
        for b in range(_BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(_NUM_HASHES)
    )
    return f"""
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 200),
    sh AS (SELECT doc_id,
                  UNNEST(list_distinct(list_transform(
                    generate_series(1, GREATEST(length(t) - 4, 1)),
                    i -> substr(t, i, 5)))) AS s
           FROM d),
    sig AS (SELECT doc_id, {sigs} FROM sh GROUP BY doc_id),
    bands AS ({bands}),
    pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
    SELECT p.id_a, p.id_b,
           ROUND(({agree}) / {float(_NUM_HASHES)}, 6) AS est_jaccard
    FROM pairs p
    JOIN sig sa ON p.id_a = sa.doc_id
    JOIN sig sb ON p.id_b = sb.doc_id
    """


@query("dedup_minhash_lsh_pairs", oracle=_minhash_oracle())
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms) + LSH(4 bands × 2 rows) candidate pairs with
    estimated Jaccard — the DuckDB oracle replays the identical md5
    permutations, so the hash check covers the whole shingle → signature
    → band → pair pipeline."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = docs.select("doc_id", F.lower("text").alias("t"))
    sigs = minhash_signatures(
        docs, "doc_id", "t", num_hashes=_NUM_HASHES, shingle_size=5
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_hashes=_NUM_HASHES, bands=_BANDS)
    return pairs.select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


@query(
    "dedup_ngram_jaccard_pairs",
    oracle="""
    WITH d AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
    sh AS (SELECT doc_id, source,
                  list_distinct(list_transform(
                    generate_series(1, GREATEST(length(text) - 2, 1)),
                    i -> substr(text, i, 3))) AS sh
           FROM d)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over blocked candidates (same source) — the
    verification stage of the dedup pipeline."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    cands = a.join(
        b, (F.col("_sa") == F.col("_sb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    out = ngram_jaccard_pairs(cands, docs, "doc_id", "text", n=3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.functions.portable_hash import (
        hash32_sql,
    )

    h = hash32_sql("s")
    sums = ",\n             ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH d AS (SELECT doc_id,
                      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
               FROM documents WHERE doc_id < 250),
    toks AS (SELECT doc_id, UNNEST(list_distinct(string_split(t, ' '))) AS s FROM d),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {fp} AS simhash FROM sums
    """


@query("dedup_simhash_fingerprints", oracle=_simhash_oracle())
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (16-bit here for oracle compactness; the
    operator defaults to 32) — near-dups are pairs with small hamming
    distance between fingerprints."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import simhash

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return simhash(docs, "doc_id", "text", bits=_SIMHASH_BITS)


@query(
    "dedup_embedding_cosine_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id % 5 = 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.25
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold calibrated to the
    synthetic data's cosine range; production near-dup uses ≥0.95)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        embedding_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    out = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.25)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    scored AS (SELECT query_id, e.vec_id AS match_id,
                      list_cosine_similarity(qv, e.v) AS c
               FROM q JOIN e ON e.vec_id <> q.query_id)
    SELECT query_id, match_id, ROUND(c, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY c DESC, match_id) AS rn
          FROM scored) t
    WHERE rn <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (queries broadcast, one
    corpus scan) — the exactness baseline for the LSH ANN path."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import topk_similar

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = topk_similar(emb, queries, "vec_id", "embedding", k=5)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


def _lsh_ann_oracle_sql(
    dim: int = 64, n_planes: int = 5, n_tables: int = 6, k: int = 5
) -> str:
    """DuckDB replay of lsh_ann_topk: the identical md5 hyperplane
    literals drive the sign-bit bucket ids (list_dot_product is the
    proven bit-replayable twin of the Spark fold), the query side probes
    the exact bucket plus every hamming-1 neighbor (multiprobe), and the
    exact-cosine re-rank uses the same (cosine DESC, match_id) total
    order as the Spark window."""
    from data_chunk_compaction_in_duckdb_spark.pipeline.similarity import (
        _hyperplane,
    )

    def bucket(t: int) -> str:
        bits = []
        for p in range(n_planes):
            plane = ",".join(repr(x) for x in _hyperplane(dim, t, p))
            bits.append(
                f"CASE WHEN list_dot_product(v, [{plane}]) >= 0 "
                f"THEN {1 << p} ELSE 0 END"
            )
        return "(" + " + ".join(bits) + ")"

    probes = lambda t: ", ".join(  # noqa: E731 - local SQL fragment helper
        [f"bk{t}"] + [f"xor(bk{t}, {1 << p})" for p in range(n_planes)]
    )
    arms = "\n      UNION ALL\n".join(
        f"""      SELECT qp.query_id, c.vec_id AS match_id
      FROM (SELECT vec_id AS query_id,
                   unnest([{probes(t)}]) AS b
            FROM buckets WHERE vec_id % 97 = 0) qp
      JOIN buckets c ON c.bk{t} = qp.b"""
        for t in range(n_tables)
    )
    bucket_cols = ", ".join(f"{bucket(t)} AS bk{t}" for t in range(n_tables))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    buckets AS (SELECT vec_id, {bucket_cols} FROM e),
    cand AS (
      SELECT DISTINCT query_id, match_id FROM (
{arms}
      ) WHERE query_id <> match_id)
    SELECT query_id, match_id, ROUND(c, 4) AS cosine
    FROM (SELECT cand.query_id, cand.match_id,
                 list_cosine_similarity(eq.v, ec.v) AS c,
                 ROW_NUMBER() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY list_cosine_similarity(eq.v, ec.v) DESC,
                            cand.match_id) AS rn
          FROM cand
          JOIN e eq ON eq.vec_id = cand.query_id
          JOIN e ec ON ec.vec_id = cand.match_id) t
    WHERE rn <= {k}
    """


@query("sim_ann_lsh_topk", oracle=_lsh_ann_oracle_sql())
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k — the 100 TB scale path (bucket
    equi-join instead of the full NL join).  Recall vs brute force is
    asserted in tests/test_pipeline.py; the md5 hyperplanes make the
    bucketing itself deterministic, so the oracle replays the whole
    index bit-for-bit (the approximation is in WHICH pairs become
    candidates, not in any randomness)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = lsh_ann_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=5, n_planes=5, n_tables=6
    )
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_tokens_quality_fingerprint",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
           length(text) AS n_chars,
           ROUND(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / GREATEST(length(text), 1), 6) AS punct_ratio,
           ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                 / GREATEST(length(text), 1), 6) AS digit_ratio,
           ROUND(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     w -> list_contains(['the','and','of','to','is','with','for','that'], w))) AS DOUBLE)
                 / GREATEST(len(string_split_regex(lower(trim(text)), '\\s+')), 1), 6) AS stopword_ratio,
           ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                 / GREATEST(len(string_split_regex(lower(trim(text)), '\\s+')), 1), 6) AS mean_word_len,
           substr(md5(regexp_replace(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                      '[^\\w ]', '', 'g')), 1, 16) AS fingerprint
    FROM documents
    """,
)
def text_tokens_quality_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts (whitespace + BPE-ish), quality features, md5
    fingerprint — the cheap pre-filter stage of a training-data pipeline,
    all JVM-side expressions."""
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import (
        quality_features,
        text_fingerprint,
        token_counts,
    )

    from data_chunk_compaction_in_duckdb_spark.compaction import fan_out

    # regex-heavy narrow projection over a single-file scan: without a
    # fan-out a one-row-group parquet file plans as ONE task and the
    # per-row regex work serializes (the 6.0x sf0.1->sf1 scaling seen in
    # BENCH_sf1_full.json); no-op when the scan already parallelizes
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = token_counts("text")
    qual = quality_features("text")
    return docs.select(
        "doc_id",
        toks["ws_tokens"].alias("ws_tokens"),
        toks["bpe_tokens"].alias("bpe_tokens"),
        qual["n_chars"].alias("n_chars"),
        qual["punct_ratio"].alias("punct_ratio"),
        qual["digit_ratio"].alias("digit_ratio"),
        qual["stopword_ratio"].alias("stopword_ratio"),
        qual["mean_word_len"].alias("mean_word_len"),
        text_fingerprint("text").alias("fingerprint"),
    )


def _language_id_oracle_sql() -> str:
    """DuckDB replay of pipeline.text.language_id's heuristic: the CJK
    character-ratio rule first, then per-language stopword hit-rate with
    the UDF's exact tie-break (first language in _LANG_MARKERS order
    wins a tied max; > 0.02 required, else 'und').  Scores are integer
    hit counts divided as doubles, so both engines produce the same
    bits and the argmax is deterministic."""
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import (
        _LANG_MARKERS,
    )

    langs = [(lang, stops) for lang, stops in _LANG_MARKERS.items() if stops]
    score_cols = []
    for lang, stops in langs:
        lst = ",".join(f"'{w}'" for w in stops)
        score_cols.append(
            f"CAST(len(list_filter(words, w -> list_contains([{lst}], w)))"
            f" AS DOUBLE) / GREATEST(len(words), 1) AS s_{lang}"
        )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang, _ in langs) + ")"
    pick = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang, _ in langs[:-1]
    )
    return f"""
    WITH w AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS words
      FROM documents),
    s AS (SELECT doc_id, lang, text, words, {', '.join(score_cols)} FROM w),
    b AS (SELECT *, {best} AS best FROM s)
    SELECT doc_id, lang,
           CASE
             WHEN text IS NULL THEN NULL
             WHEN length(text) > 0
                  AND CAST(len(regexp_extract_all(text,
                        '[\\x{{4E00}}-\\x{{9FFF}}]')) AS DOUBLE)
                      / length(text) > 0.2 THEN 'zh'
             WHEN len(words) = 0 THEN 'und'
             WHEN best <= 0.02 THEN 'und'
             {pick}
             ELSE '{langs[-1][0]}'
           END AS lang_pred
    FROM b
    """


@query("text_language_id", oracle=_language_id_oracle_sql())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword hit-rate + CJK char ratio) — the
    synthetic corpus carries a ground-truth lang column; accuracy is
    asserted in tests/test_pipeline.py.  The heuristic is deterministic
    (integer hit counts, fixed marker lists), so the oracle replays the
    pandas_udf's decision procedure exactly in SQL — the vectorized UDF
    is the execution vehicle, not a source of nondeterminism."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import language_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", language_id(F.col("text")).alias("lang_pred")
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + octet_length(encode(text)) % 613 AS INT) AS width,
           CAST(16 + octet_length(encode(text)) % 401 AS INT) AS height,
           CAST(1 + octet_length(encode(text)) % 3 AS INT) AS channels,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: documents → (binary, meta) relation →
    Arrow-batched mapInPandas feature extraction (stub kernel; real codec
    is a NotImplementedError hook).  The oracle re-derives the
    deterministic fake features from byte lengths — proving the whole
    binary→Arrow→pandas→features path end-to-end."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        decode_features,
        with_binary_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_features(with_binary_payload(docs))


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT media_id, n_frames,
           UNNEST(generate_series(0, GREATEST(n_frames - 1, 0), 4)) AS frame_idx
    FROM (SELECT doc_id AS media_id,
                 CAST(FLOOR(octet_length(encode(text)) / 100.0) AS INT) AS n_frames
          FROM documents WHERE doc_id % 3 = 2) t
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over the binary payload (every 4th
    100-byte frame) — explode stays JVM-side."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        frame_sample,
        with_binary_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = frame_sample(with_binary_payload(docs), frame_bytes=100, every_n=4)
    return out.select("media_id", "n_frames", "frame_idx")


def _components_doubling_sql(neigh: str = "d", rounds: int = 24) -> str:
    """Unrolled min-label propagation WITH pointer doubling — the
    connected-components oracle stage.  Expects a symmetric-edge CTE
    ``sym(s, <neigh>)`` in scope; emits CTEs ``l0..lN`` plus the final
    ``comp(id, component)``.

    Replaces the recursive reach-set formulation (``reach(s, r)`` = all
    reachable pairs), which is O(sum |cluster|^2) rows and was
    oracle-resource-bounded at sf1 (round-6 sweep).  Each doubling
    round costs one O(V+E) pass: the new label is the min of the old
    label, the neighbors' labels, and the label OF the current label
    (the jump).  On a worst-case path graph the jump doubles the
    horizon per round (validated), so ``rounds=24`` covers components
    with >10^7-hop diameters — far beyond any fixture scale; a
    non-converged run would hash-mismatch loudly, never silently.
    DuckDB's LEAST ignores NULLs (probed), so edge-less label targets
    fold away.  Every stage is AS MATERIALIZED: DuckDB inlines plain
    CTEs, and each round references its predecessor three times, so an
    inlined chain re-expands the whole upstream plan 3^rounds times
    (observed as a too-many-open-files parquet re-scan storm)."""
    parts = [
        "symm AS MATERIALIZED (SELECT * FROM sym)",
        f"l0 AS MATERIALIZED (SELECT s AS id, LEAST(s, MIN({neigh})) "
        "AS comp FROM symm GROUP BY s)",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        cur = f"l{r}"
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT v.id, "
            "LEAST(MIN(v.comp), MIN(nl.comp), MIN(jl.comp)) AS comp "
            f"FROM {prev} v "
            f"LEFT JOIN symm e ON e.s = v.id "
            f"LEFT JOIN {prev} nl ON nl.id = e.{neigh} "
            f"LEFT JOIN {prev} jl ON jl.id = v.comp "
            "GROUP BY v.id)"
        )
        prev = cur
    parts.append(f"comp AS (SELECT id, comp AS component FROM {prev})")
    return ",\n    ".join(parts)


@query(
    "dedup_components_transitive",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
    sh AS (SELECT doc_id, source,
                  list_distinct(list_transform(
                    generate_series(1, GREATEST(length(text) - 2, 1)),
                    i -> substr(text, i, 3))) AS sh
           FROM d),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ),
    sym AS (
      SELECT id_a AS s, id_b AS nb FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    {_components_doubling_sql(neigh="nb")}
    SELECT id, component FROM comp
    """,
)
def dedup_components_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters: exact 3-gram Jaccard >= 0.5 edges
    (same-source blocking), then connected components by min-label
    propagation.  The oracle recomputes the same closure with unrolled
    min-label doubling rounds (O((V+E) log n), sf1-tractable — see
    _components_doubling_sql); the Spark path is rounds-of-joins
    bounded by graph diameter."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    cands = a.join(
        b, (F.col("_sa") == F.col("_sb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    edges = ngram_jaccard_pairs(
        cands, docs, "doc_id", "text", n=3, min_jaccard=0.5
    )
    return connected_components(edges)


@query(
    "pipeline_curate_corpus",
    oracle=f"""
    WITH filt AS (
      SELECT doc_id, source, text,
             substr(md5(regexp_replace(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                        '[^\\w ]', '', 'g')), 1, 16) AS fp
      FROM documents
      WHERE lang = 'en' AND length(text) >= 30
    ),
    exact AS (
      SELECT doc_id, source, text FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM filt) t
      WHERE rn = 1
    ),
    sh AS (SELECT doc_id, source,
                  list_distinct(list_transform(
                    generate_series(1, GREATEST(length(text) - 2, 1)),
                    i -> substr(text, i, 3))) AS sh
           FROM exact),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ),
    sym AS (
      SELECT id_a AS s, id_b AS nb FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    {_components_doubling_sql(neigh="nb")},
    final AS (
      SELECT e.* FROM exact e
      LEFT JOIN (SELECT id FROM comp WHERE id <> component) l ON e.doc_id = l.id
      WHERE l.id IS NULL
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS total_ws_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM final GROUP BY source
    """,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship training-data curation pipeline, end-to-end in one plan:
    language + length gate → exact dedup (normalized-text fingerprint,
    min-id survivor) → near-dedup transitive closure (3-gram Jaccard ≥
    0.5, same-source blocking, connected components) → per-source corpus
    stats.  Every stage is the scale path: fingerprint dedup is one
    hash-partitioned window, candidate generation is blocked to the
    source partition, closure rounds are bounded by cluster diameter."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import (
        text_fingerprint,
        token_counts,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.length("text") >= 30))
        .select("doc_id", "source", "text")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        docs.withColumn("fp", text_fingerprint("text"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
        .persist()  # referenced 4× (both pair sides, shingles, final)
    )
    a = exact.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = exact.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    cands = a.join(
        b, (F.col("_sa") == F.col("_sb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    edges = ngram_jaccard_pairs(
        cands, exact, "doc_id", "text", n=3, min_jaccard=0.5
    )
    comp = connected_components(edges)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    final = exact.join(losers, "doc_id", "left_anti")
    toks = token_counts("text")
    return final.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks["ws_tokens"]).alias("total_ws_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def _ivf_ann_oracle_sql(
    dim: int = 64,
    n_clusters: int = 16,
    n_probe: int = 8,
    k: int = 5,
    corpus_pred: str = "TRUE",
) -> str:
    """DuckDB replay of ivf_ann_topk: the same md5 centroid literals and
    the proven struct(-dot, idx) ascending sort rank the cells (identical
    to the dedup_semantic_ivf_pairs oracle), the corpus keeps its best
    cell, queries probe their n_probe best, and the exact-cosine re-rank
    shares the Spark window's (cosine DESC, match_id) total order."""
    from data_chunk_compaction_in_duckdb_spark.pipeline.similarity import (
        _centroid,
    )

    structs = ", ".join(
        "struct_pack(d := -list_dot_product(v, ["
        + ",".join(repr(x) for x in _centroid(dim, i))
        + f"]), i := {i})"
        for i in range(n_clusters)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    ranked AS (SELECT vec_id, v,
                      list_transform(list_sort([{structs}]), x -> x.i)
                        AS cells
               FROM e),
    corpus AS (SELECT vec_id AS match_id, cells[1] AS cell FROM ranked
               WHERE {corpus_pred}),
    probes AS (SELECT vec_id AS query_id,
                      unnest(cells[1:{n_probe}]) AS cell
               FROM ranked WHERE vec_id % 97 = 0),
    cand AS (SELECT DISTINCT query_id, match_id
             FROM probes JOIN corpus USING (cell)
             WHERE query_id <> match_id)
    SELECT query_id, match_id, ROUND(c, 4) AS cosine
    FROM (SELECT cand.query_id, cand.match_id,
                 list_cosine_similarity(eq.v, ec.v) AS c,
                 ROW_NUMBER() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY list_cosine_similarity(eq.v, ec.v) DESC,
                            cand.match_id) AS rn
          FROM cand
          JOIN e eq ON eq.vec_id = cand.query_id
          JOIN e ec ON ec.vec_id = cand.match_id) t
    WHERE rn <= {k}
    """


@query("sim_ann_ivf_topk", oracle=_ivf_ann_oracle_sql())
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k — the partition-prune scale path
    (each query scans n_probe/n_clusters of the corpus).  Recall vs
    brute force is asserted in tests/test_pipeline.py; the md5 centroids
    make cell assignment deterministic, so the oracle replays the index
    bit-for-bit (same scheme as dedup_semantic_ivf_pairs)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = ivf_ann_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=5, n_clusters=16, n_probe=8
    )
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


def _mix_hash_oracle() -> str:
    from data_chunk_compaction_in_duckdb_spark.functions.portable_hash import (
        hash32_sql,
    )

    return hash32_sql("CAST(doc_id AS VARCHAR)", key="mix")


@query(
    "mix_weighted_sources",
    oracle=f"""
    SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE ({_mix_hash_oracle()}) % 10000 <
          CASE WHEN source LIKE 'source_1%' THEN 8000
               WHEN source LIKE 'source_2%' THEN 2500
               ELSE 500 END
    GROUP BY source
    """,
)
def mix_weighted_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain reweighting: per-source keep rates decided by the portable
    per-id hash — deterministic, shuffle-free, oracle-replayed.  The
    summary per source shows the realized mixture."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import mix_weighted_sources

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").startswith("source_1"), F.lit(0.8))
        .when(F.col("source").startswith("source_2"), F.lit(0.25))
        .otherwise(F.lit(0.05))
    )
    kept = mix_weighted_sources(docs, "doc_id", "source", rate)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )


@query(
    "select_token_budget",
    oracle="""
    SELECT doc_id, source, ws_tokens
    FROM (
      SELECT doc_id, source, ws_tokens,
             SUM(ws_tokens) OVER (PARTITION BY source
                                  ORDER BY ws_tokens DESC, doc_id) AS cum
      FROM (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\\s+')) AS ws_tokens
        FROM documents
      ) t
    ) s
    WHERE cum <= 500
    """,
)
def select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: fill each source's 500-token budget with
    its longest documents first (running window sum, one shuffle)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        select_within_token_budget,
    )
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import token_counts

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", token_counts("text")["ws_tokens"].alias("ws_tokens")
    )
    return select_within_token_budget(
        toks,
        "source",
        "ws_tokens",
        [F.col("ws_tokens").desc(), F.col("doc_id")],
        budget_per_source=500,
    )


@query(
    "multimodal_audio_chunks",
    oracle="""
    SELECT media_id, n_chunks, chunk_idx,
           chunk_idx * 32 AS start_byte,
           md5(substring(content_hex, chunk_idx * 64 + 1, 128)) AS chunk_md5
    FROM (
      SELECT media_id, content_hex, n_chunks,
             UNNEST(generate_series(0, GREATEST(n_chunks - 1, 0))) AS chunk_idx
      FROM (
        SELECT doc_id AS media_id, hex(encode(text)) AS content_hex,
               CAST(FLOOR((octet_length(encode(text)) - 64) / 32.0) AS INT) + 1
                 AS n_chunks
        FROM documents
        WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 64
      ) t
    ) u
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style overlapped chunking (64-byte windows, 32-byte hop)
    over the binary payload; the md5 of each window's hex rendering
    proves the byte slicing is identical to the oracle's (DuckDB cannot
    slice BLOBs, so both sides hash the hex string — rendered BEFORE
    the UNNEST: DuckDB 1.0 mis-casts non-ASCII BLOBs carried THROUGH
    an UNNEST once the input exceeds a volume threshold, an
    oracle-engine bug the sf1 sweep surfaced; the hex VARCHAR carries
    identical information)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import (
        audio_chunk,
        with_binary_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = audio_chunk(with_binary_payload(docs), chunk_bytes=64, hop_bytes=32)
    return out.select(
        "media_id",
        "n_chunks",
        "chunk_idx",
        "start_byte",
        F.md5(F.hex("chunk")).alias("chunk_md5"),
    )


@query(
    "text_chunk_documents",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents WHERE doc_id < 100
    ),
    e AS (
      SELECT doc_id, words,
             unnest(range(greatest(1, (len(words) - 8 + 23) // 24)))
               AS chunk_idx
      FROM w
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(
             words[CAST(chunk_idx * 24 + 1 AS BIGINT)
                   : CAST(chunk_idx * 24 + 32 AS BIGINT)], ' ') AS chunk_text,
           CAST(len(words[CAST(chunk_idx * 24 + 1 AS BIGINT)
                          : CAST(chunk_idx * 24 + 32 AS BIGINT)]) AS INT)
             AS n_words
    FROM e
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-word chunks, 8-word overlap, greedy
    starts every 24 words (pipeline.chunk_documents) — split/sequence/
    explode/slice built-ins only; the oracle replays the identical window
    arithmetic with DuckDB list slices."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return chunk_documents(docs, "doc_id", "text", chunk_words=32, overlap_words=8)


@query(
    "text_redact_patterns",
    oracle=r"""
    SELECT doc_id,
           substr(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             '\b\d{7,}\b', '[NUM]', 'g'), 1, 80) AS red80,
           CAST(length(text) AS BIGINT) AS n_orig
    FROM documents WHERE doc_id < 200
    """,
)
def text_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (pipeline.redact_patterns): chained JVM
    regexp_replace for emails / IPv4 / long digit runs.  Spark replaces
    all occurrences; the DuckDB oracle needs the explicit 'g' flag —
    dialect note recorded in gen_sqllogic.  The synthetic corpus is
    PII-free, so the seeded-PII unit test carries the replacement
    semantics; this query pins the no-op path byte-for-byte."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import redact_patterns

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.substring(redact_patterns("text"), 1, 80).alias("red80"),
        F.length("text").cast("long").alias("n_orig"),
    )


@query(
    "quality_filter_source_quantile",
    oracle=r"""
    SELECT doc_id, source, ws_tokens,
           CAST(FLOOR(pr * 1000000 + 0.5) AS BIGINT) AS pr_e6
    FROM (
      SELECT doc_id, source, ws_tokens,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY ws_tokens, doc_id) AS pr
      FROM (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\s+')) AS ws_tokens
        FROM documents
      ) t
    ) r
    WHERE pr >= 0.25
    """,
)
def quality_filter_source_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-quantile gate (drop each source's bottom
    quartile by token count) — the stratified quality-filter stage of a
    corpus build.  percent_rank windows run per source partition;
    (rank−1)/(n−1) of exact integers is the same double in both
    engines — but ROUND of it is NOT (exactly-representable decimal
    halves round differently; win_ranking_family's sf1 find), so the
    quantile column compares via the FLOOR(x*1e6 + 0.5) integer
    scheme."""
    docs = load_table(spark, sf_dir, "documents")
    from data_chunk_compaction_in_duckdb_spark.pipeline.text import token_counts

    toks = docs.select(
        "doc_id", "source", token_counts("text")["ws_tokens"].alias("ws_tokens")
    )
    w = Window.partitionBy("source").orderBy("ws_tokens", "doc_id")
    return (
        toks.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.25)
        .select(
            "doc_id",
            "source",
            "ws_tokens",
            F.floor(F.col("pr") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("pr_e6"),
        )
    )


@query(
    "dedup_keep_best_survivor",
    oracle=r"""
    SELECT doc_id, n_chars, n_copies
    FROM (
      SELECT doc_id, n_chars,
             COUNT(*) OVER (PARTITION BY h) AS n_copies,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
        FROM documents
      ) t
    ) r
    WHERE rn = 1
    """,
)
def dedup_keep_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor policy: within each exact-duplicate group
    keep the LONGEST copy (ties → smallest id) instead of round 1's
    min-id policy — the 'keep best representative' variant every corpus
    build needs.  One hash-partitioned window, no extra shuffle over the
    plain dedup."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    )
    base = docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), h.alias("h")
    )
    w = Window.partitionBy("h")
    wr = w.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        base.withColumn("n_copies", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_chars", "n_copies")
    )


@query("sim_ann_ivf_index_append_topk", oracle=_ivf_ann_oracle_sql())
def sim_ann_ivf_index_append_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cell-index maintenance parity (IVFIndex.append;
    reference ART::Insert, src/execution/index/art/art.cpp:370): build
    the (id, _cell) table over two-thirds of the corpus, append the
    remaining third delta-only, then query — centroids are frozen at
    build and assignment is per-row, so the result must equal the
    full-build index bit-for-bit (shares sim_ann_ivf_topk's oracle
    verbatim)."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 97 == 0)
    # session-retained dir: the lazy result reads the STORED cells
    root = retained_tmpdir("ivfixa_q_")
    idx = IVFIndex.build(
        spark, root + "/ix", emb.filter(F.col("vec_id") % 3 != 0),
        "vec_id", "embedding", dim=64, n_clusters=16,
    )
    idx.append(emb.filter(F.col("vec_id") % 3 == 0))
    out = idx.topk(emb, queries_df, k=5, n_probe=8, check_coverage=True)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )


@query("sim_ann_ivf_index_topk", oracle=_ivf_ann_oracle_sql())
def sim_ann_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k through the MATERIALIZED cell index
    (pipeline/vector_index.py IVFIndex; reference CREATE INDEX +
    storage layer, test/sql/index/): assignment runs once into the
    versioned (id, _cell) table, queries probe STORED cells.  Shares
    sim_ann_ivf_topk's oracle verbatim — the index changes where the
    cells come from, never a result bit."""
    from data_chunk_compaction_in_duckdb_spark.pipeline import IVFIndex
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 97 == 0)
    # session-retained dir: the lazy result reads the STORED cells
    root = retained_tmpdir("ivfix_q_")
    idx = IVFIndex.build(
        spark, root + "/ix", emb, "vec_id", "embedding", dim=64,
        n_clusters=16,
    )
    out = idx.topk(emb, queries_df, k=5, n_probe=8)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine")
    )

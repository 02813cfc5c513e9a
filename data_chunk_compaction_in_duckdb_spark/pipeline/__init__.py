"""LLM-data-pipeline operators (BASELINE.json north star: beyond the
reference's own surface, the operations a large-scale training-data
pipeline needs).

- dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup
- similarity.py  brute-force cosine top-k + LSH-bucketed ANN
- text.py        language-ID, quality scoring, token counting,
                 fingerprinting
- multimodal.py  opaque-binary columns with typed metadata; decode /
                 feature-extract plumbing (stubbed codecs)

Everything is built from DataFrame built-ins where possible (JVM-side,
shuffle-parallel); hashing uses the engine-portable md5 scheme
(functions/portable_hash.py) so results are oracle-checkable in DuckDB.
"""

from data_chunk_compaction_in_duckdb_spark.pipeline.dedup import (  # noqa: F401
    char_shingles_expr,
    dedup_exact,
    keep_representatives,
    embedding_neardup_pairs,
    semantic_ivf_neardup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    repeated_ngram_spans,
    duplicate_gram_fraction,
    simhash,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.similarity import (  # noqa: F401
    cosine_similarity,
    ivf_ann_topk,
    lsh_ann_topk,
    topk_similar,
    pq_codes,
    pq_adc_topk,
    train_pq_codebooks,
    train_ivf_centroids,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.vector_index import (  # noqa: F401
    IVFIndex,
    PQIndex,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.text import (  # noqa: F401
    PII_PATTERNS,
    chunk_documents,
    language_id,
    pii_counts,
    quality_features,
    redact_patterns,
    redact_pii,
    text_fingerprint,
    token_counts,
    top_gram_fraction,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.multimodal import (  # noqa: F401
    audio_chunk,
    decode_features,
    frame_sample,
    with_binary_payload,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.components import (  # noqa: F401
    connected_components,
    dedup_survivors_transitive,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.mixing import (  # noqa: F401
    mix_weighted_sources,
    select_within_token_budget,
    assign_splits,
    split_leakage,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.fts import (  # noqa: F401
    FTSIndex,
    bm25_scores,
    build_fts_index,
)
from data_chunk_compaction_in_duckdb_spark.pipeline.packing import (  # noqa: F401
    pack_training_windows,
)

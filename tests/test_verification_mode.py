"""Alternate-execution-path verification — the port's analog of the
reference's `PRAGMA enable_verification` / `verify_external`
(test/sqlite/sqllogic_command.cpp re-runs each query through alternate
operator paths and compares).

Spark's alternate paths are runtime-settable session confs: AQE on/off
(re-plan vs static), whole-stage codegen on/off (generated vs
interpreted evaluation), and a different shuffle-partition count
(different partition boundaries — the knob that exposed the round-2
partition-id race in the distributed prefix sums).  A representative
query from each operator family must produce identical sorted results
under both paths.
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import normalize

# One representative per family; heavy queries stay out (this runs each
# twice).
SAMPLE = [
    "tpch_q1_pricing_summary",       # scan + hash agg
    "tpch_q3_shipping_priority",     # join + topN
    "join_full_outer",               # outer join
    "subq_mark_join_in_nulls",       # mark join / 3VL
    "join_asof_backward",            # asof union+window
    "win_frame_range_value",         # distributed prefix sum
    "join_positional",               # prefix-sum row numbering
    "agg_grouping_sets",             # grouping sets
    "win_ignore_nulls",              # window fns
    "recursive_cte_series",          # iterative
    "dedup_minhash_lsh_pairs",       # LSH banding
    "dedup_semantic_ivf_pairs",      # IVF bucketing
    "text_tokens_quality_fingerprint",  # narrow text pipeline
    "limit_percent",                 # two-pass limit
    "sample_deterministic",          # deterministic sampling
    # late round-2 suites: one representative each
    "clickbench_q10",                # multi-agg + count-distinct top-K
    "h2o_group_q06",                 # median + exact-sum dispersion
    "tb_semaphoreneighbor",          # staged equi-join graph pattern
    "ldbc_bi10",                     # recursive BFS + rollup
    "dedup_repeated_ngram_spans",    # fan_out widen + gram groupBy
    "pipeline_split_assign",         # hash-band split projection
]

ALT_CONFS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.shuffle.partitions": "7",
}


def _run(spark, sf_dir: str, name: str):
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY[name].builder(spark, sf_dir)
    return normalize(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", SAMPLE)
def test_alternate_execution_path_agrees(spark, sf_dir, name):
    base = _run(spark, sf_dir, name)
    saved = {k: spark.conf.get(k, None) for k in ALT_CONFS}
    try:
        for k, v in ALT_CONFS.items():
            spark.conf.set(k, v)
        alt = _run(spark, sf_dir, name)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert len(base) == len(alt), (
        f"{name}: {len(base)} rows default vs {len(alt)} alternate-path"
    )
    assert base == alt, f"{name}: alternate execution path diverged"

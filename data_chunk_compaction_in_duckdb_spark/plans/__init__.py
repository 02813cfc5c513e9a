"""Plan inspection (SURVEY.md §4): the engine's window into Catalyst —
shuffle counting, pushdown checks, codegen coverage — used by the perf
tests to assert the physical plans we designed for actually happen."""

from data_chunk_compaction_in_duckdb_spark.plans.inspect import (  # noqa: F401
    count_codegen_subtrees,
    count_exchanges,
    explain_str,
    has_filter_pushdown,
    join_strategies,
)
from data_chunk_compaction_in_duckdb_spark.plans.metrics import (  # noqa: F401
    OpMetric,
    explain_analyze,
    join_row_factors,
)

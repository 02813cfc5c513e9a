"""Operators the DataFrame API lacks natively (SURVEY.md §2.3, §2.7):
as-of join, positional join, recursive CTE.  Each is a composition of
built-in DataFrame ops — no mapInPandas needed — so Catalyst keeps
optimizing through them and they scale like any shuffle.
"""

from data_chunk_compaction_in_duckdb_spark.operators.joins import (  # noqa: F401
    asof_join,
    mark_join,
    positional_join,
)
from data_chunk_compaction_in_duckdb_spark.operators.recursive import (  # noqa: F401
    recursive_cte,
)
from data_chunk_compaction_in_duckdb_spark.operators.skew import (  # noqa: F401
    salted_aggregate,
    salted_join,
)

"""Named query registry backing ``__spark_entry__.py``.

Importing this package registers every query module.  Each named query is
the Spark-native expression of one operator/function family from
SURVEY.md §2, paired (where SQL-expressible) with an ANSI-SQL oracle that
DuckDB runs on the same parquet tables — mirroring the reference's
golden-answer test method (sqllogictest + TPC-H answer files,
reference test/sql/ and extension/tpch/dbgen/answers/).
"""

from data_chunk_compaction_in_duckdb_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    NamedQuery,
    all_oracles,
    all_queries,
    query,
)

# Import for registration side effects — order defines display order.
from data_chunk_compaction_in_duckdb_spark.queries import relational  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import windows  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import nested  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import functions_scalar  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import functions_agg  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import advanced_joins  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import subqueries  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import recursion  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import compaction_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import llm_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import llm_q2  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import streaming_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import events_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpch_more  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpch_partsupp  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import misc_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import edge_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import functions_more  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import job_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import job_variants  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpch_tail  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpcds_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpcds_like2  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import tpcds_like3  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import job_variants2  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import job_variants3  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import job_variants4  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import clickbench_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import h2oai_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import trainbenchmark_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import ldbc_like  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import collation_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import storage_q  # noqa: E402,F401
from data_chunk_compaction_in_duckdb_spark.queries import llm_q3  # noqa: E402,F401

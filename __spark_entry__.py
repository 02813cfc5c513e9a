"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q3-shaped chained-join +
agg + top-n, mirroring reference vector_compaction.cpp:83-91) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the named-query registry from
``data_chunk_compaction_in_duckdb_spark.queries`` — one entry per operator
in SURVEY.md §2, each paired (where SQL-expressible) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_chunk_compaction_in_duckdb_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; the driver checks rows >= 0."""
    from data_chunk_compaction_in_duckdb_spark.queries.relational import (
        tpch_q3_shipping_priority,
    )

    return tpch_q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()

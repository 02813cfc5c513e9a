"""RECURSIVE CTE — SURVEY.md §2.7 (physical_recursive_cte.cpp:207).

Driver-side fixed-point loop (operators/recursive.py) vs DuckDB's native
WITH RECURSIVE as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.operators import recursive_cte
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE t(n, tri) AS (
      SELECT 1, 1
      UNION ALL
      SELECT n + 1, tri + n + 1 FROM t WHERE n < 60
    )
    SELECT n, tri FROM t
    """,
)
def recursive_cte_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point iteration: triangular-number series to n=60, one
    localCheckpoint per step to keep the plan linear."""
    initial = spark.createDataFrame([(1, 1)], "n INT, tri INT")

    def step(prev: DataFrame) -> DataFrame:
        return prev.filter(F.col("n") < 60).select(
            (F.col("n") + 1).alias("n"), (F.col("tri") + F.col("n") + 1).alias("tri")
        )

    return recursive_cte(initial, step)

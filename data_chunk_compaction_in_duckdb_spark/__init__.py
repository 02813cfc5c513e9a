"""PySpark-native analytics engine with the query & data-processing surface
of YimingQiao/Data-Chunk-Compaction-in-Duckdb (a DuckDB fork for SIGMOD'25
"Data Chunk Compaction in Vectorized Execution").

This is NOT a port of the reference's C++ execution engine: the logical
plan is declared with the Spark DataFrame/SQL API and Catalyst + AQE pick
the physical strategy.  The reference's research delta — adaptive chunk
compaction — maps onto Spark's partition-coalescing problem and lives in
``compaction/`` (see reference src/execution/physical_operator.cpp:250-311
and src/include/duckdb/common/negative_feedback.hpp:21-164).

Layout:
    session.py     SparkSession factory (AQE on, UTC, arrow, ns-parquet)
    catalog.py     fixture-table loader / temp-view registration
    sources/       readers: parquet/csv/json/values/range (reference
                   src/function/table/*, extension/parquet)
    operators/     join/sample/recursive-CTE/compaction-adjacent operators
                   the DataFrame API lacks natively
    functions/     scalar + aggregate gap functions (reference
                   src/core_functions/function_list.cpp)
    plans/         explain/plan-inspection helpers
    compaction/    the research delta, Spark-native (profiler, compact,
                   UCB1 tuner, pipeline breaker)
    pipeline/      LLM-data-pipeline extensions: dedup, similarity search,
                   text analysis, multimodal column plumbing
    streaming/     Structured Streaming surface over the events table
    queries/       named query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"

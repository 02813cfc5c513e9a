from data_chunk_compaction_in_duckdb_spark.testing.sqllogic import (  # noqa: F401
    SqlLogicError,
    parse_file,
    run_file,
)

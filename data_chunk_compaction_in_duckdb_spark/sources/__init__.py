"""Sources & sinks (SURVEY.md §2.1): parquet/CSV/JSON/values/range
readers and COPY TO-style writers mirroring the reference's table
functions (src/function/table/*, extension/parquet, csv_scanner/)."""

from data_chunk_compaction_in_duckdb_spark.sources.readers import (  # noqa: F401
    read_remote,
    remote_path,
    attach_database,
    copy_to_file,
    detach_database,
    from_values,
    range_source,
    read_csv,
    read_json,
    read_parquet,
    write_bucketed,
)
from data_chunk_compaction_in_duckdb_spark.sources.summary import (  # noqa: F401
    export_database,
    import_database,
    summarize,
)
from data_chunk_compaction_in_duckdb_spark.sources.pydatasource import (  # noqa: F401
    RepeatRowsDataSource,
    register_python_sources,
)

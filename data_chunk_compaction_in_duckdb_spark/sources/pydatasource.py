"""Python DataSource (Spark 4 API): custom table functions as first-class
sources.

The reference exposes generator table functions (range/generate_series/
repeat, src/function/table/) through its table-function registry; Spark 4's
`pyspark.sql.datasource` is the engine-native extension point for the same
concept — a registered source plans real InputPartitions (parallel scan,
no driver materialization), unlike a createDataFrame of pre-built rows.

`RepeatRowsDataSource` mirrors DuckDB's `repeat()` generator: a payload
row replicated ``n`` times with an index, split over ``partitions`` input
partitions.  Deterministic, so it is driver-oracle-checkable against
DuckDB's generate_series.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RepeatReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 10))
        self.parts = max(1, int(options.get("partitions", 4)))
        self.mod = int(options.get("tagmod", 7))

    def partitions(self):  # noqa: D102 - API hook
        per, rem = divmod(self.n, self.parts)
        out, start = [], 0
        for i in range(self.parts):
            end = start + per + (1 if i < rem else 0)
            out.append(InputPartition((start, end)))
            start = end
        return out

    def read(self, partition):  # noqa: D102 - API hook
        start, end = partition.value
        for i in range(start, end):
            yield (i, f"row_{i % self.mod}")


class RepeatRowsDataSource(DataSource):
    """``spark.read.format("repeat_rows").option("n", N)`` generator."""

    @classmethod
    def name(cls) -> str:
        return "repeat_rows"

    def schema(self) -> str:
        return "idx BIGINT, tag STRING"

    def reader(self, schema):  # noqa: D102 - API hook
        return _RepeatReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Idempotently register the engine's Python data sources."""
    spark.dataSource.register(RepeatRowsDataSource)

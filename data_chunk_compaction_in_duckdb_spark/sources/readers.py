"""Reader/writer surface.

| Reference                                         | Here            |
|---------------------------------------------------|-----------------|
| read_parquet() w/ glob + pushdown (extension/parquet) | read_parquet |
| read_csv + sniffer (csv_scanner/, 689 LoC)        | read_csv (infer) |
| read_json (extension/json)                        | read_json       |
| VALUES / chunk scan (physical_expression_scan.cpp)| from_values     |
| range/generate_series (function/table/range.cpp)  | range_source    |
| COPY ... TO (physical_copy_to_file.cpp)           | copy_to_file    |

All are thin, deliberate wrappers: the point is a stable engine-level
API whose defaults are scale-safe (schema inference only on explicit
opt-in — a 100 TB CSV sniff is a full extra pass).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str | Sequence[str]) -> DataFrame:
    """Parquet scan with projection/filter pushdown (automatic in Spark;
    the reference implements the same in parquet_reader.cpp).  Accepts
    globs and path lists like the reference's multi-file read."""
    paths = [path] if isinstance(path, str) else list(path)
    return spark.read.parquet(*paths)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = False,
    schema: str | None = None,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = '"',
    null_str: str | None = None,
    comment: str | None = None,
    multi_line: bool = False,
    encoding: str | None = None,
    date_format: str | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV reader with the reference's dialect surface
    (csv_reader_options.cpp: DELIM/QUOTE/ESCAPE/NULLSTR/HEADER/
    dateformat — test/sql/copy/csv/ exercises each).  The default
    escape is the quote character itself, i.e. RFC-4180 ``""``
    doubling, which is also the reference's default.  infer_schema
    mirrors the auto-sniffer — explicit opt-in because inference costs
    an extra full scan at scale; prefer passing `schema`.  Compressed
    files (.gz/.zst) decode transparently in both engines."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", escape)
    )
    if null_str is not None:
        reader = reader.option("nullValue", null_str)
    if comment is not None:
        reader = reader.option("comment", comment)
    if multi_line:
        reader = reader.option("multiLine", True)
    if encoding is not None:
        reader = reader.option("encoding", encoding)
    if date_format is not None:
        reader = reader.option("dateFormat", date_format)
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def from_values(
    spark: SparkSession, rows: Sequence[tuple], schema: str
) -> DataFrame:
    """VALUES-list scan (physical_expression_scan.cpp:63)."""
    return spark.createDataFrame(list(rows), schema)


def range_source(
    spark: SparkSession, start: int, end: int, step: int = 1, partitions: int | None = None
) -> DataFrame:
    """Lazy integer series (reference range table function — the data
    generator in vector_compaction.cpp:103 uses it)."""
    return spark.range(start, end, step, numPartitions=partitions)


def copy_to_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    compact_target_rows: int | None = None,
) -> None:
    """COPY ... TO sink (physical_copy_to_file.cpp).  When
    ``compact_target_rows`` is set the output is compacted first — the
    small-files problem is the storage-side face of chunk fragmentation."""
    if compact_target_rows is not None:
        from data_chunk_compaction_in_duckdb_spark.compaction import compact

        df = compact(df, target_rows=compact_target_rows)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)


def attach_database(
    spark: SparkSession, sf_dir: str, alias: str
) -> dict[str, DataFrame]:
    """ATTACH 'file' AS alias (reference schema DDL,
    src/execution/operator/schema/) — register a second scale-factor
    directory's tables under an alias prefix.

    Spark temp views live in one flat namespace, so DuckDB's
    `alias.table` becomes `{alias}_{table}` (the closest temp-view
    analog; a warehouse-backed `CREATE DATABASE` would force a data
    copy, which ATTACH never does).  Returns the attached DataFrames.
    Tables that don't exist in `sf_dir` are skipped, mirroring ATTACH
    of a partial database.
    """
    import os as _os

    from data_chunk_compaction_in_duckdb_spark.catalog import TABLES, load_table

    out: dict[str, DataFrame] = {}
    for t in TABLES:
        if not _os.path.exists(_os.path.join(sf_dir, f"{t}.parquet")):
            continue
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(f"{alias}_{t}")
        out[f"{alias}_{t}"] = df
    return out


def detach_database(spark: SparkSession, alias: str) -> int:
    """DETACH alias — drop every temp view registered under the prefix."""
    from data_chunk_compaction_in_duckdb_spark.catalog import TABLES

    n = 0
    for t in TABLES:
        if spark.catalog.dropTempView(f"{alias}_{t}"):
            n += 1
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) table — the co-located
    join layout.

    The reference co-locates hash-join sides by radix-partitioning both
    inputs at run time (physical_hash_join.cpp:399-418); Spark's durable
    equivalent is hash-bucketed storage: two tables bucketed by the same
    key with the same bucket count join with NO exchange on either side
    (and no sort, when sorted).  At 100 TB this converts every recurring
    fact-to-fact join from a full shuffle into a per-bucket zip.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table)


def remote_path(url: str) -> str:
    """Map the reference's httpfs URL forms (extension/httpfs: s3://,
    gcs://, http(s)://) to the connector scheme Spark's Hadoop layer
    uses.  Pure string mapping — credentials flow through the standard
    Hadoop configs (fs.s3a.access.key etc.), never through the URL."""
    if url.startswith("s3://"):
        return "s3a://" + url[len("s3://"):]
    if url.startswith("gcs://"):
        return "gs://" + url[len("gcs://"):]
    return url


def read_remote(
    spark: SparkSession,
    url: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Remote read (the httpfs extension surface).  Object stores
    (s3://, gcs://) read executor-parallel through their Hadoop
    connectors — the scale path, full pushdown.  Plain http(s) has no
    Hadoop FS: the file is fetched ONCE on the driver to a local spool
    and read from there, mirroring DuckDB httpfs' single-stream GET —
    documented as driver-bounded, for small side files only (a 100 TB
    fact table must live on an object store, not behind plain http)."""
    target = remote_path(url)
    if target.startswith(("http://", "https://")):
        import tempfile
        import urllib.request

        suffix = "." + fmt
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
            with urllib.request.urlopen(target) as resp:  # noqa: S310
                f.write(resp.read())
            target = f.name
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(target)
    if fmt == "csv":
        return reader.option("header", "true").csv(target)
    if fmt == "json":
        return reader.json(target)
    raise ValueError(f"unsupported remote format: {fmt}")

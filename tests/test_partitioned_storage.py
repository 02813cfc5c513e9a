"""Partitioned storage behavior — the 100 TB layout story: hive-style
partitioned writes, partition pruning at read (the reference's zone-map
analog at directory granularity), and compacted output files."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.plans import explain_str
    from data_chunk_compaction_in_duckdb_spark.sources import copy_to_file

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    copy_to_file(orders, out, partition_by=["o_orderstatus"])

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(back, "formatted")
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "o_orderstatus" in plan and "PartitionFilters" in plan
    ), plan
    exp = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == exp


def test_compacted_write_produces_few_files(spark, sf_dir, tmp_path):
    import glob

    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.sources import copy_to_file

    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    frag = li.filter(F.col("l_quantity") <= 2)

    raw_out = str(tmp_path / "raw")
    copy_to_file(frag, raw_out)
    raw_files = len(glob.glob(f"{raw_out}/part-*"))

    compact_out = str(tmp_path / "compacted")
    copy_to_file(frag, compact_out, compact_target_rows=1_000_000)
    compact_files = len(glob.glob(f"{compact_out}/part-*"))

    assert compact_files < raw_files
    assert (
        spark.read.parquet(compact_out).count()
        == spark.read.parquet(raw_out).count()
    )

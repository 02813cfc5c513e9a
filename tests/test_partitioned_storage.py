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


def test_bucketed_join_has_no_join_side_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed by the join key must sort-merge-join with no
    exchange on either side — the durable co-located-join layout (the
    reference's runtime radix co-partitioning, made storage-level)."""
    from data_chunk_compaction_in_duckdb_spark.plans import (
        count_exchanges,
        join_strategies,
    )
    from data_chunk_compaction_in_duckdb_spark.sources import write_bucketed

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "bkt_li", str(tmp_path / "li"), "l_orderkey", 8)
    write_bucketed(o, "bkt_o", str(tmp_path / "o"), "o_orderkey", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("bkt_li")
            .join(
                spark.table("bkt_o"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert join_strategies(j) == ["SortMergeJoin"]
        # only the group-by shuffles; the join reads buckets in place
        assert count_exchanges(j) == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_li")
        spark.sql("DROP TABLE IF EXISTS bkt_o")


def test_remote_path_mapping_and_local_http_spool(spark, tmp_path, sf_dir):
    """httpfs surface: URL scheme mapping is pure (s3->s3a, gcs->gs),
    and the http spool path is exercised offline via file:// — the
    mapping must leave it untouched and the reader must produce the
    same rows as a direct read."""
    from data_chunk_compaction_in_duckdb_spark.sources import (
        read_remote,
        remote_path,
    )

    assert remote_path("s3://bucket/k/part.parquet") == "s3a://bucket/k/part.parquet"
    assert remote_path("gcs://b/x.parquet") == "gs://b/x.parquet"
    assert remote_path("https://h/x.parquet") == "https://h/x.parquet"
    assert remote_path("/local/x.parquet") == "/local/x.parquet"

    direct = spark.read.parquet(f"{sf_dir}/region.parquet")
    via = read_remote(spark, f"file://{sf_dir}/region.parquet")
    assert sorted(map(tuple, via.collect())) == sorted(
        map(tuple, direct.collect())
    )

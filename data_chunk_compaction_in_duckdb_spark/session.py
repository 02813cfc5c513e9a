"""SparkSession factory.

Mirrors the reference engine-config surface (threads / memory pragmas,
`vector_compaction.cpp:50-57`) with Spark-native knobs.  AQE partition
coalescing is the engine-level analog of the reference's chunk compaction
(`src/execution/physical_operator.cpp:250-311`): detect undersized data
units at runtime and coalesce them toward a target size before the next
operator.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Advisory partition size for AQE coalescing — the partition-level analog of
# the reference's 2048-tuple target chunk (vector_size.hpp:17).  64 MB is the
# classic sweet spot for a 1000-executor cluster: big enough to amortize task
# overhead, small enough to fit comfortably in executor memory alongside
# shuffle buffers.
ADVISORY_PARTITION_BYTES = "64m"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "data_chunk_compaction_in_duckdb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode testing uses ``local[cpus]``; on a real cluster the same
    configs apply per-executor and ``master`` comes from spark-submit.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        # -- adaptive execution: runtime re-plan, partition coalescing
        # (the chunk-compaction analog), skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            ADVISORY_PARTITION_BYTES,
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- oracle comparability: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # -- events.parquet carries TIMESTAMP(NANOS) which vanilla Spark
        # rejects; read as int64 ns and convert in catalog.load_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- Arrow for every pandas-UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- Arrow serialization for scalar @udf functions too (guide
        # §4.3): same per-row call, batched Arrow transport instead of
        # pickled rows.  Config A/B on the sf0.1 headliners: 22.07 s vs
        # 24.29 s base (0.91x), no per-query regression > 0.07 s; the
        # full-registry oracle sweep guards the stricter Arrow-side
        # type coercion.
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # -- scan split sizing: the default 4 MB open-cost floors a
        # single ~10 MB local parquet file at ~3 tasks, serializing the
        # scan.  512 KB lets small files split to the slot count
        # (minPartitionNum floors parallelism at the scheduler slots —
        # scale-adaptive, not a local[32] constant).  At production
        # scale files are >= 128 MB so open-cost barely contributes;
        # maxPartitionBytes (default 128 MB) still bounds split size.
        # Config A/B: 22.56 s vs 24.29 s base (0.93x).
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    else:
        # -- cost-based join reordering (analog of the reference's DPhyp
        # enumerator, src/optimizer/join_order/): pays off only where
        # ANALYZE TABLE stats exist (persistent catalog on a cluster);
        # measured as pure planning overhead over bare local temp views
        # (~20% on the sf0.1 bench), so gated to cluster mode.
        builder = (
            builder.config("spark.sql.cbo.enabled", "true")
            .config("spark.sql.cbo.joinReorder.enabled", "true")
            # -- runtime row-level filtering: inject a bloom filter of
            # the selective dimension side into the fact scan (the
            # engine-level analog of the reference's hash-join probe
            # filters).  Default-on in Spark 4 but pinned here because
            # at 100 TB it is what prunes fact partitions before the
            # shuffle.  (Spark 4 dropped the older semiJoinReduction
            # conf; the bloom path subsumes it.)
            .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory with scale-appropriate defaults.

Local mode is the sandbox stand-in for a multi-executor cluster; every
config here is one we would also set on a 1000-executor deployment
(AQE, skew-join handling, Arrow, UTC, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "borges_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: executor-thread count for local mode; defaults to
        $SPARK_GRAFT_CPUS or all cores. On a real cluster this builder is
        bypassed by spark-submit, which supplies master/executors.
    shuffle_partitions: defaults to 2x cores locally — on a cluster this
        should be ~2-3x total executor cores; AQE coalesces the excess.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # keep task parallelism at bench/test data sizes: the 128MB scan
        # split and AQE's 1MB min-coalesce target are tuned for TB-scale
        # inputs and would serialize a few-hundred-MB job onto 2 tasks;
        # these values preserve ~core-count tasks locally and remain sane
        # on a cluster (more, smaller tasks)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", str(128 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(4 * 1024 * 1024))
        # FileOutputCommitter v1 renames every task file SERIALLY on the
        # driver at commitJob — pure driver-side latency on each of the
        # engine's four per-round snapshot writes. v2 renames in the
        # tasks (parallel); its weaker job-abort guarantee is irrelevant
        # here because the snapshot store's own LATEST-pointer protocol
        # already treats any uncommitted round directory as garbage
        # (checkpoint.py gc_uncommitted), same as an Iceberg commit.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

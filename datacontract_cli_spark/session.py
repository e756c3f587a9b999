"""SparkSession factory with scale-aware defaults.

Local-mode testing config; on a real cluster the same settings apply except
master/memory come from spark-submit. AQE is on so skewed shuffles re-plan
at runtime; shuffle partitions default to the core count locally (they'd be
sized to ~2-3× total cores on a cluster); session timezone is pinned UTC so
timestamp semantics match the DuckDB oracle and the reference's naive→UTC
localization.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datacontract-cli-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(n) if n.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory size coalesces a ~256MB shuffle down to 4
        # reduce tasks — fine on a 4-node cluster, parallelism-starving on a
        # 32-core box; 8m keeps reduce stages wide while still merging
        # genuinely tiny partitions
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # throughput GC; NOTE: a modest heap beats a huge one here — beyond
        # ~16g the VM's lazy page faulting + GC of a mostly-empty heap caused
        # multi-second outliers at 32 threads (measured: 48g heap = 2-50s per
        # identical query, 16g = stable ~1s)
        # ReservedCodeCacheSize: a long-lived session compiling many
        # distinct queries (the bench runs ~50) generates enough bytecode
        # to thrash the JVM's default 240 MB code cache — flushing evicts
        # hot compiled methods and queries re-run interpreted/deoptimized
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # single virtual disk in this sandbox is slow AND high-variance;
        # tmpfs shuffle models a cluster's parallel local disks far better
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
                if os.path.isdir("/dev/shm") else "/tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

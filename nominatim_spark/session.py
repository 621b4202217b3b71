"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would pass to ``spark-submit`` on a real cluster (AQE on, skew-join
on, Arrow on). Shuffle partitioning is sized from the parallelism level so
the plan scales with cluster size instead of a hard-coded 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nominatim_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``cpus=None`` reads ``$SPARK_GRAFT_CPUS`` (default 32). On a real
    cluster you would drop ``master`` and let spark-submit supply it; every
    other setting carries over unchanged.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x parallelism: enough granularity for AQE coalescing without
        # tiny-partition overhead at local scale; on a 1000-executor
        # cluster this would be ~2x total cores.
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # modest PRE-SIZED heap: on this VM a large growing heap (24-48g)
        # makes GC catastrophically slow under parallel allocation (md5
        # kernel: 8g heap 2.8s vs 24g heap 79s at 16 cores) — size to the
        # working set and pin Xms=Xmx
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "10g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms" + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "10g")
            # throughput collector: measurably better than G1 for the
            # allocation-heavy codegen kernels on this host
            + " -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
        # partition sizing: at 100 TB the 64 MB defaults are right; local
        # benches override via env so a 100 MB input still fans out across
        # all cores instead of landing in one scan partition (and AQE
        # coalescing every small shuffle to 1 partition = serial execution)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", str(64 * 1024 * 1024)),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", str(64 * 1024 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

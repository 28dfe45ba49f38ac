"""SparkSession factory tuned for the validation workload.

Local mode is the sandbox stand-in for a multi-executor cluster; the configs
below are the ones that matter at 100 TB too: AQE (runtime re-plan + skew
join), Arrow for the pandas-UDF drift path, shuffle partitions sized to the
parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sat_val_framework_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit the JVM gateway already exists and --master is
    # authoritative: setting builder.master would silently OVERRIDE the
    # submitted master (observed: a --master local[2] job running local[32]).
    under_spark_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_spark_submit:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None and master:
        n = master.removeprefix("local[").removesuffix("]")
        par = os.cpu_count() if n in ("*", "") or not n.isdigit() else int(n)
        shuffle_partitions = max(int(par), 8)

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # finer input splits: keeps scan stages at >= cores tasks and lets
        # the scheduler balance around size-skewed files
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if shuffle_partitions is None:
        # master came from spark-submit: size shuffles to the actual cores
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark

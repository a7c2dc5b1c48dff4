"""SparkSession factory tuned for the engine.

Defaults target local[N] testing but every knob is chosen for cluster
scale: AQE handles skew and partition coalescing at 100 TB, Arrow makes
the unavoidable pandas-UDF paths batch-vectorized, and shuffle
partition counts are sized from the environment rather than hardcoded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mapreduce511-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster the ``master`` is supplied externally
    (spark-submit); locally we run ``local[cpus]``. All settings here
    are safe on both.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 32)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    builder = (
        SparkSession.builder.appName(app_name)
        # local mode: the driver JVM hosts all executor threads — size
        # its heap for cpus-many concurrent tasks (no effect once a
        # session already exists; real clusters set executor memory).
        .config("spark.driver.memory", driver_mem)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # plan re-optimization — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas interchange (pandas_udf, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast joins for dimension tables up to 64 MB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime bloom-filter join pruning (big-big joins where one
        # side filters heavily — complements broadcast + AQE).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Keep scan partitions bounded so one file split fits memory.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Whole-stage codegen compiles one class per distinct plan;
        # a 100+-query session overflows HotSpot's default 240 MB
        # code cache, silently disabling the JIT ("CodeCache is
        # full") and slowing later shuffle-heavy queries 3-6x.
        # Measured here: simhash_near_dup steady-state 20.3 s -> 5.8 s
        # with the larger cache. Cluster deployments should carry the
        # same flag in executor options.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )

    if not os.environ.get("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        builder = builder.master(f"local[{cpus}]")

    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    return builder.getOrCreate()

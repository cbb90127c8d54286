"""SparkSession construction with scale-oriented defaults.

Single place where shuffle/AQE/Arrow settings are pinned so every job
(tests, bench, spark-submit entry points) runs with the same physical plan
behavior. Designed for a multi-executor cluster; in this sandbox the master
defaults to ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "scala_timeseries_lib_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE + Arrow enabled.

    Scale rationale:
    - AQE re-plans shuffles at runtime: coalesces small partitions and splits
      skewed ones (hot series keys / hot domains are expected in web data).
    - Arrow self-destruct + pandas UDF batching keep the Python kernel path
      zero-copy where possible.
    - shuffle partitions default to the core count here; on a real cluster
      AQE's coalescing makes a high initial value cheap.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the package to Python workers (the spark-submit --py-files story);
    # without this, Arrow-UDF kernels fail to unpickle on workers whenever the
    # driver's sys.path trick isn't inherited
    from .packaging import ship_package

    ship_package(spark)
    return spark

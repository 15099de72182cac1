"""SparkSession acquisition for terminal actions.

Terminal actions accept an explicit session; when omitted we use the active
one, else build a local session shaped like the bench/test environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .. import constants


def get_spark(spark: SparkSession | None = None) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("yirgacheffe-spark")
        .config("spark.sql.shuffle.partitions", str(constants.DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        # Raster tile rows are ~2 MB payloads: split scans finer than the
        # 128 MB default and stop AQE coalescing kernel stages below the
        # core count, or a handful of tasks ends up owning every tile.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
        .config("spark.driver.memory", os.environ.get("YG_SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )

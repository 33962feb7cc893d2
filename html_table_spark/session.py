"""SparkSession construction tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches default to 10k rows; with multi-KB..MB HTML documents per
# row that overshoots Python worker memory — 256 docs/batch keeps the
# JVM→Python transfer bounded while still amortizing the Arrow round trip
# (SURVEY.md §4.3 "Arrow batch sizing").
DEFAULT_ARROW_BATCH = 256


def get_spark(
    app_name: str = "html-table-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = DEFAULT_ARROW_BATCH,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master.startswith("local[") is False and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match the core count in local mode; on a real cluster this is
        # overridden by spark-submit conf
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # one doc row can be multi-MB; cap scan split size so a handful of
        # mega-docs cannot land in one input split
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()

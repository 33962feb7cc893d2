"""SparkSession construction tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches default to 10k rows; with multi-KB..MB HTML documents per
# row that overshoots Python worker memory. 1024 docs/batch keeps the
# JVM→Python transfer bounded (pass-1 docs are cost-capped at 256 KB, so
# the worst batch is ~256 MB and the typical one ~3 MB) while quartering
# the number of batch boundaries vs the round-2 value of 256 — each
# boundary costs IPC framing plus per-batch buffer materialization on both
# sides, measured ~5% of pass-1 wall at sf0.1 (round-3 Arrow-copy
# reduction; SURVEY.md §4.3 "Arrow batch sizing").
DEFAULT_ARROW_BATCH = 1024


def get_spark(
    app_name: str = "html-table-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = DEFAULT_ARROW_BATCH,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    # SPARK_GRAFT_CPUS pins the LOCAL core count; it must never demote a
    # real cluster master to local mode
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            # match the core count in local mode; 'local[N,maxFailures]' and
            # 'local[*]' are both legal master strings
            inner = master[master.find("[") + 1 : master.find("]")]
            threads = inner.split(",")[0]
            shuffle_partitions = 32 if threads == "*" else max(8, int(threads))
        else:
            # cluster masters: leave Spark's own default / spark-submit conf
            shuffle_partitions = None
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
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
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    return builder.getOrCreate()

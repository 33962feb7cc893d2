"""SparkSession construction tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches default to 10k rows; with multi-KB..MB HTML documents per
# row that overshoots Python worker memory. 1024 docs/batch quarters the
# number of batch boundaries vs the round-2 value of 256 — each boundary
# costs IPC framing plus per-batch buffer materialization on both sides,
# measured ~5% of pass-1 wall at sf0.1 (round-3 Arrow-copy reduction;
# SURVEY.md §4.3 "Arrow batch sizing"). The record cap alone bounds
# nothing for the chunk pass, whose rows are mega docs/chunks of unbounded
# size (1024 multi-MB rows = a multi-GB batch): DEFAULT_ARROW_BATCH_BYTES
# is the actual memory guarantee — the JVM cuts a batch at whichever cap
# hits first, so pass 1 rides the record cap (typical batch ~3 MB) and the
# mega pass the byte cap.
DEFAULT_ARROW_BATCH = 1024
DEFAULT_ARROW_BATCH_BYTES = 64 * 1024 * 1024


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
    threads = None
    if master.startswith("local["):
        # match the core count in local mode; 'local[N,maxFailures]' and
        # 'local[*]' are both legal master strings
        inner = master[master.find("[") + 1 : master.find("]")]
        t = inner.split(",")[0]
        threads = 32 if t == "*" else max(1, int(t))
    if shuffle_partitions is None:
        if threads is not None:
            shuffle_partitions = max(8, threads)
        else:
            # cluster masters: leave Spark's own default / spark-submit conf
            shuffle_partitions = None
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # FAIR between on-the-fly pools; FIFO within each (no alloc file).
        # Needed by the concurrent extraction legs: AQE materializes every
        # query stage as a new job with a LATER job id, so under FIFO the
        # tiny mega leg's downstream stages (4-task chunk split, pass 2)
        # queue behind pass 1's hundreds of running tasks — measured 4 s of
        # dead wait at local[32]. run_concurrent assigns one pool per leg
        # when it sees this mode. Single-job workloads are unaffected (one
        # pool, FIFO within).
        .config("spark.scheduler.mode", "FAIR")
        # CollectLimit escalation starts at ONE partition and quadruples —
        # a selective limit+collect (mega-id discovery) otherwise runs
        # ~5 SEQUENTIAL mini-jobs before it has scanned the corpus
        # (measured 0.35 s serial at local[32]). Start wide: the scan is
        # an offsets-only leaf read, so a full first pass is cheaper than
        # the serialized escalation ladder.
        .config("spark.sql.limit.initialNumPartitions", "1024")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            str(DEFAULT_ARROW_BATCH_BYTES),
        )
        # one doc row can be multi-MB; cap scan split size so a handful of
        # mega-docs cannot land in one input split
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # openCostInBytes floors the split size at 4m (Spark default kept
        # explicit): minPartitionNum below can only grow the task count to
        # totalBytes/4m, never into thousands of micro-tasks
        .config("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default (serial driver cost per stage); SPARK_GRAFT_UI=1
        # turns it on for stage-level profiling (scripts/profile_serial.py)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    if threads is not None:
        # Spark's file-split formula, split = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes / minPartitionNum)), defaults
        # minPartitionNum to the core count — i.e. ONE wave of scan tasks.
        # Extraction task durations are skewed (doc cost varies ~100× below
        # the mega threshold), so one to three coarse waves end in a ragged
        # straggler tail: measured par_eff 0.67 on the pass-1 stage at
        # local[8] with 10×32m splits vs 0.88+ with ~8 waves of smaller
        # splits. Target ~8 waves; the 4m openCost floor above keeps the
        # task count bounded (≤ totalBytes/4m tasks), and at fleet data
        # sizes totalBytes/(8·cores) exceeds the 32m cap anyway, so this
        # only changes behavior where the default was degenerate (small
        # corpus relative to the cluster). Cluster masters: leave to
        # spark-submit conf.
        builder = builder.config(
            "spark.sql.files.minPartitionNum", str(8 * threads)
        )
        # Local masters: boot Python workers through fastdaemon so the
        # zip-TOC invalidation patch is active from the FIRST task (the
        # package-import hook in __init__ only catches a worker after its
        # first unpickle of our code). Measured on this host: 205 -> 68 ms
        # per Python task (identity mapInArrow, 256 tasks, local[16]).
        # Cluster masters are left alone — the daemon module boots BEFORE
        # --py-files are materialized, so there it must be shipped via an
        # operator-managed PYTHONPATH instead (fastdaemon.py docstring).
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra_pp = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.python.daemon.module", "html_table_spark.fastdaemon"
        ).config(
            "spark.executorEnv.PYTHONPATH",
            repo_root + (os.pathsep + extra_pp if extra_pp else ""),
        )
    return builder.getOrCreate()

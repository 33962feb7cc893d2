"""Task-granularity sweep for the pass-1 extraction stage.

Usage: taskset -c 0-31 python scripts/granularity_experiment.py 32
Spins one session per openCostInBytes value (split size is scan-time conf).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 2 and sys.argv[1] == "--leg":
    cores = int(sys.argv[2])
    open_cost_mb = int(sys.argv[3])

    from pyspark.sql import functions as F

    # spark.sql.files.* confs are read at scan planning and cannot be set
    # on an already-built session, so this experiment hand-builds its own
    # session with the sweep value baked in. The fixed confs below are a
    # SNAPSHOT of session.get_spark's values at experiment time (1024/64MB
    # Arrow batches, 32m partitions) — if session.py tuning changes, re-run
    # rather than trusting recorded numbers.
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.appName("gran")
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 << 20))
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.files.openCostInBytes", str(open_cost_mb << 20))
        .config("spark.sql.files.minPartitionNum", str(8 * cores))
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import (
        extract_tables, html_reassembly_col,
    )
    import bench

    path = bench.corpus_path("0.1")
    docs = spark.read.parquet(path)
    config = ParserConfig().all_tables()
    T = 256 * 1024

    def pass1():
        pre = docs.select(
            F.col("doc_id"), html_reassembly_col("spans").alias("html")
        )
        return extract_tables(
            pre.where(F.length("html") <= T), config,
            mega_cost_threshold=T, tables_per_chunk=64, mega_policy="skip",
            spread_small_inputs=False, pre_reassembled=True, has_base=False,
        )

    nparts = pass1().rdd.getNumPartitions()
    pass1().filter("table_idx >= 0").count()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        pass1().filter("table_idx >= 0").count()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({"open_cost_mb": open_cost_mb, "tasks": nparts,
                      "best_s": round(best, 3)}))
    spark.stop()
    sys.exit(0)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
for mb in (4, 2, 1):
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores-1}", sys.executable, __file__,
         "--leg", str(cores), str(mb)],
        capture_output=True, text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"open_cost'):
            print(line)
    if out.returncode != 0:
        print(out.stderr[-2000:])

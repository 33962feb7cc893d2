"""Stage-level profile of the extraction job (round-3 serial-component hunt).

Runs the exact bench extraction job once (after a warm run) on local[N]
with the Spark UI enabled, then reads the REST status API to break the
timed run down into per-job / per-stage wall vs summed executor task time.
The gap between wall and sum(task)/cores is the serial component —
driver planning, stage scheduling, barrier latency — which is what caps
the 8->32 scaling ratio on this box.

Usage: taskset -c 0-31 python scripts/profile_extract.py [cores]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

from html_table_spark.config import ParserConfig
from html_table_spark.plans.pipeline import run_extraction_concurrent
from html_table_spark.sources.documents import read_documents

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def get_spark_ui(cores: int) -> SparkSession:
    # the EXACT bench session shape (html_table_spark.session.get_spark sets
    # minPartitionNum/openCost/arrow caps) — a hand-rolled config here once
    # profiled a different plan than the bench runs (32m splits with no
    # minPartitionNum -> 10 scan partitions -> the auto salted repartition
    # engaged, which the real bench session never takes on this corpus)
    os.environ["SPARK_GRAFT_UI"] = "1"
    from html_table_spark.session import get_spark

    return get_spark(
        "profile", master=f"local[{cores}]", shuffle_partitions=max(8, cores)
    )


def api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    spark = get_spark_ui(CORES)
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    import bench

    path = bench.corpus_path("0.1")
    docs = read_documents(spark, path)
    config = ParserConfig().all_tables()

    def extract_once(report=None):
        # the bench/run_job shape: each leg plans itself in its own thread
        def act(name, df):
            t = time.monotonic()
            n = df.filter("table_idx >= 0").count()
            if report is not None:
                report[name] = time.monotonic() - t
            return n

        counts = run_extraction_concurrent(docs, config, leg_action=act)
        return sum(v for v in counts.values() if v is not None)

    # warm
    extract_once()

    app_id = api("applications")[0]["id"]
    jobs_before = {j["jobId"] for j in api(f"applications/{app_id}/jobs")}

    legs: dict = {}
    t0 = time.monotonic()
    n = extract_once(report=legs)
    wall = time.monotonic() - t0
    print(
        f"timed run: wall={wall:.3f}s tables={n} "
        f"legs={{{', '.join(f'{k}={v:.3f}s' for k, v in legs.items())}}}"
    )

    jobs = [j for j in api(f"applications/{app_id}/jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in api(f"applications/{app_id}/stages")}

    total_task_ms = 0
    print(f"\n{'job':>4} {'stage':>6} {'tasks':>6} {'wall_s':>8} {'task_sum_s':>11} {'par_eff':>8}  name")
    prev_end = None
    for j in jobs:
        sub = j.get("submissionTime", "")
        for sid in sorted(j["stageIds"]):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                print(f"{j['jobId']:>4} {sid:>6}   (skipped)")
                continue
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            import datetime as dt

            def ts(x):
                return dt.datetime.strptime(x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

            w = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
            sched_gap = ts(s["firstTaskLaunchedTime"]) - ts(s["submissionTime"])
            task_sum = s["executorRunTime"] / 1000.0
            total_task_ms += s["executorRunTime"]
            eff = task_sum / (w * CORES) if w > 0 else float("nan")
            name = s["name"].split("\n")[0][:60]
            gc = s.get("jvmGcTime", 0) / 1000.0
            deser = s.get("executorDeserializeTime", 0) / 1000.0
            rser = s.get("resultSerializationTime", 0) / 1000.0
            cpu = s.get("executorCpuTime", 0) / 1e9
            print(
                f"{j['jobId']:>4} {sid:>6} {s['numTasks']:>6} {w:>8.3f} {task_sum:>11.3f} {eff:>8.2f}  {name}  (sched_gap={sched_gap:.3f}s gc={gc:.2f}s deser={deser:.2f}s rser={rser:.2f}s jvm_cpu={cpu:.1f}s)"
            )
    print(f"\nsum(task)/cores = {total_task_ms/1000.0/CORES:.3f}s vs wall {wall:.3f}s -> serial+imbalance = {wall - total_task_ms/1000.0/CORES:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

"""Profile the extraction bench's serial vs parallel split at one core count.

Usage: taskset -c 0-7 python scripts/profile_serial.py 8

Breaks one bench iteration into:
  - plan:   plan_extraction() driver-side construction (pure serial)
  - analyze: .filter().count() plan analysis+optimization via explain (serial)
  - exec:   the actual job wall (parallel + scheduling)
and sums per-stage executor run time from the status store so the
scheduling/serial gap = exec_wall - max_stage_overlap is visible.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8

from html_table_spark.session import get_spark  # noqa: E402

spark = get_spark("profile", master=f"local[{cores}]",
                  shuffle_partitions=max(8, cores))
spark.sparkContext.setLogLevel("ERROR")

from html_table_spark.config import ParserConfig  # noqa: E402
from html_table_spark.plans.pipeline import plan_extraction  # noqa: E402
from html_table_spark.sources.documents import read_documents  # noqa: E402
import bench  # noqa: E402

path = bench.corpus_path("0.1")
docs = read_documents(spark, path)
docs.count()
config = ParserConfig().all_tables()

# warm the worker pool
plan_extraction(docs, config).filter("table_idx >= 0").count()

best = None
for i in range(3):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    extracted = plan_extraction(docs, config)
    t1 = time.monotonic()
    counted = extracted.filter("table_idx >= 0")
    # force analysis + optimization without running the job
    counted._jdf.queryExecution().executedPlan()
    t2 = time.monotonic()
    n = counted.count()
    t3 = time.monotonic()
    rec = {
        "iter": i,
        "plan_construct_s": round(t1 - t0, 3),
        "analyze_optimize_s": round(t2 - t1, 3),
        "exec_s": round(t3 - t2, 3),
        "total_s": round(t3 - t0, 3),
        "tables": n,
    }
    print(json.dumps(rec))
    if best is None or rec["total_s"] < best["total_s"]:
        best = rec

print(json.dumps({"cores": cores, "best": best}))

# stage-level breakdown of the LAST run via the UI REST API
import urllib.request  # noqa: E402

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId
with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
    stages = json.loads(r.read())

stages.sort(key=lambda s: s["stageId"])
# only stages from the last iteration: take the tail after the 2nd clearCache
for s in stages[-14:]:
    sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
    print(json.dumps({
        "stage": s["stageId"],
        "name": s["name"].split("\n")[0][:70],
        "tasks": s["numCompleteTasks"],
        "executorRunTime_ms": s["executorRunTime"],
        "executorCpuTime_ms": round(s["executorCpuTime"] / 1e6),
        "submission": s.get("submissionTime"),
        "completion": s.get("completionTime"),
        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        "shuffle_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
    }))
spark.stop()

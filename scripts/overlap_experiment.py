"""A/B the union-barrier vs concurrent-jobs extraction at one core count.

Usage: taskset -c 0-31 python scripts/overlap_experiment.py 32
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

from html_table_spark.session import get_spark  # noqa: E402

spark = get_spark("overlap", master=f"local[{cores}]",
                  shuffle_partitions=max(8, cores))
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from html_table_spark.config import ParserConfig  # noqa: E402
from html_table_spark.operators.extract import (  # noqa: E402
    extract_tables, html_reassembly_col,
)
from html_table_spark.plans import pipeline as P  # noqa: E402
from html_table_spark.sources.documents import read_documents  # noqa: E402
import bench  # noqa: E402

path = bench.corpus_path("0.1")
docs = read_documents(spark, path)
docs.count()
config = ParserConfig().all_tables()

# warm the worker pool
P.plan_extraction(docs, config).filter("table_idx >= 0").count()

T = P.DEFAULT_MEGA_COST
nparts = max(8, cores)


def build_legs():
    pre = docs.select(F.col("doc_id"), html_reassembly_col("spans").alias("html"))
    normal = extract_tables(
        pre.where(F.length("html") <= T), config,
        mega_cost_threshold=T, tables_per_chunk=64, mega_policy="skip",
        spread_small_inputs=False, pre_reassembled=True, has_base=False,
    )
    chunks = extract_tables(
        pre.where(F.length("html") > T), config,
        mega_cost_threshold=T, tables_per_chunk=64, mega_policy="chunk",
        spread_small_inputs=False, pre_reassembled=True, has_base=False,
    )
    chunk_rows = chunks.select(
        "doc_id",
        F.coalesce(F.element_at("spans", 1)["text"], F.lit("")).alias("html"),
        F.col("table_idx").alias("table_idx_base"),
    )
    mega = extract_tables(
        P.salted_chunks(chunk_rows, nparts), config,
        spread_small_inputs=False, pre_reassembled=True, has_base=True,
    )
    return normal, mega


def best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


results = {"cores": cores}

# A: current union plan
results["union"] = best_of(
    3, lambda: P.plan_extraction(docs, config).filter("table_idx >= 0").count()
)

# B: each leg alone
normal, mega = build_legs()
results["pass1_only"] = best_of(
    3, lambda: build_legs()[0].filter("table_idx >= 0").count()
)
results["mega_only"] = best_of(
    3, lambda: build_legs()[1].filter("table_idx >= 0").count()
)

# C: concurrent jobs (two driver threads, one action each)
def concurrent_run():
    n_out = {}
    normal, mega = build_legs()

    def run(name, df):
        n_out[name] = df.filter("table_idx >= 0").count()

    t1 = threading.Thread(target=run, args=("n", normal))
    t2 = threading.Thread(target=run, args=("m", mega))
    t2.start()  # mega first so its scan#2 stage gets slots immediately
    t1.start()
    t1.join()
    t2.join()
    return n_out["n"] + n_out["m"]


t0 = time.monotonic()
total = concurrent_run()
first = time.monotonic() - t0
results["concurrent"] = min(first, best_of(2, concurrent_run))
results["tables_concurrent"] = total

print(json.dumps(results))
spark.stop()

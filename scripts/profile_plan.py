"""Break down the driver-side planning cost of plan_extraction."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from html_table_spark.config import ParserConfig
from html_table_spark.plans import pipeline
from html_table_spark.sources.documents import read_documents
from html_table_spark.session import get_spark


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label:>40}: {time.monotonic() - t0:.3f}s")
    return out


def main():
    spark = get_spark("profile-plan", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    path = bench.corpus_path("0.1")
    config = ParserConfig().all_tables()

    for rnd in range(3):
        print(f"--- round {rnd} ---")
        docs = t("read_documents", lambda: read_documents(spark, path))
        t("docs.rdd.getNumPartitions", lambda: docs.rdd.getNumPartitions())
        ext = t("plan_extraction (build)", lambda: pipeline.plan_extraction(docs, config))
        fil = t("filter", lambda: ext.filter("table_idx >= 0"))
        t("analyze (schema)", lambda: fil.schema)
        t("optimize+physical", lambda: fil._jdf.queryExecution().executedPlan())
    spark.stop()


if __name__ == "__main__":
    main()

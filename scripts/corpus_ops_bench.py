"""Measure the round-4 corpus-pipeline query family at sf0.1 and write
BENCH/CORPUS_OPS.md — same policy as the headline bench (warm session,
best-of-3 wall per query, noop sink so every output column materializes),
plus a physical plan fingerprint per query so plan-shape claims are
checked, not eyeballed.

Usage: python scripts/corpus_ops_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

QUERIES = [
    "tx_vocab",
    "tx_topk_ngrams",
    "tx_sample_mix",
    "tx_pii_scrub",
    "tx_pack_sequences",
    "dd_decontaminate",
    "dd_ngram_novelty",
    "dd_exact_substr",
]
BEST_OF = 3


def plan_fingerprint(df) -> dict[str, int]:
    txt = df._jdf.queryExecution().executedPlan().toString()
    nodes = re.findall(r"^[\s:+*(\d)-]*([A-Za-z]+[A-Za-z ]*?)[\s(]", txt, re.M)
    fp: dict[str, int] = {}
    for n in nodes:
        n = n.strip()
        if n:
            fp[n] = fp.get(n, 0) + 1
    return fp


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    sf = bench._sf_of(sf_dir)
    spark = bench._get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qfns = entrymod.queries()
    rows = []
    for name in QUERIES:
        fn = qfns[name]
        best = float("inf")
        for _ in range(BEST_OF):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        fp = plan_fingerprint(fn(spark, sf_dir))
        rows.append({"query": name, "wall_sec": round(best, 3), "plan": fp})
        print(json.dumps(rows[-1]))

    out = {
        "metric": "corpus_ops_total_wall",
        "value": round(sum(r["wall_sec"] for r in rows), 3),
        "unit": "sec",
        "queries": {r["query"]: r["wall_sec"] for r in rows},
        "sf": bench._sf_num(sf),
        "cores": bench.CPUS,
        "policy": "best-of-3-v2",
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "CORPUS_OPS_RUNS.jsonl"), "a") as fh:
        fh.write(json.dumps({"rows": rows, "summary": out}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

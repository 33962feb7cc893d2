"""Benchmark harness (driver contract).

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The extraction corpus (interleaved text+media spans, BASELINE.json input
shape) is synthesized deterministically from seed 42 — sized by sf — and
cached under /tmp so repeated runs measure compute, not corpus generation.

Scaling mode (north rule evidence: ≥0.8 efficiency from N→4N):

    python bench.py --scaling

runs the SAME extraction job at local[8] and local[32] in fresh JVMs
(subprocesses), reports docs/sec at both plus the efficiency, and rewrites
BENCH/BASELINE.md. (Sandbox proxy for N vs 4N executors — no real cluster
here; the job itself ships via spark-submit --py-files unchanged.)

Internal flag: --extract-only --cores=K prints one JSON line with just the
extraction timing (used by --scaling subprocesses).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# extraction corpus size by sf tier (docs, mega_docs, mega_tables) — sized
# so steady-state kernel work dominates scheduler + Python-worker overheads
# (sf0.1 ≈ 50 s of single-thread parse work)
CORPUS_BY_SF = {
    "0.001": (600, 1, 200),
    "0.01": (4000, 1, 800),
    "0.1": (24000, 2, 2000),
}

HEADLINE = [
    "x_cells",
    "x_header_rows",
    "q1_pricing",
    "q3_shipping",
    "q_top_customers_window",
    "q_events_hourly",
    "dd_lsh_pairs",
    "dd_jaccard",
    "dd_simhash",
    "tx_stats",
    "ann_topk",
]


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def corpus_path(sf: str) -> str:
    n_docs, mega, mega_tables = CORPUS_BY_SF.get(sf, CORPUS_BY_SF["0.01"])
    path = f"/tmp/spark_graft_bench/corpus_sf{sf}_{n_docs}_{mega}x{mega_tables}"
    if not os.path.exists(path):
        from html_table_spark.corpus import synthesize_documents, write_corpus_dir

        rows = synthesize_documents(
            n_docs=n_docs, seed=42, mega_docs=mega, mega_tables=mega_tables
        )
        write_corpus_dir(rows, path, n_shards=64)
    return path


def run_extraction_bench(spark, sf: str, warm: bool = True) -> dict:
    """Steady-state throughput: the first full run warms the Python worker
    pool (32 simultaneous pandas imports otherwise dominate a small-corpus
    measurement — a one-time per-executor cost that is noise at fleet
    scale), the second run is timed."""
    from html_table_spark.config import ParserConfig
    from html_table_spark.plans.pipeline import plan_extraction
    from html_table_spark.sources.documents import read_documents

    path = corpus_path(sf)
    docs = read_documents(spark, path)
    n_docs = docs.count()
    config = ParserConfig().all_tables()
    if warm:
        plan_extraction(docs, config).filter("table_idx >= 0").count()
    started = time.monotonic()
    extracted = plan_extraction(docs, config)
    n_tables = extracted.filter("table_idx >= 0").count()
    wall = time.monotonic() - started
    return {
        "docs": n_docs,
        "tables": n_tables,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "tables_per_sec": round(n_tables / wall, 1),
    }


def _get_spark(cores: int):
    from html_table_spark.session import get_spark

    return get_spark(
        "bench", master=f"local[{cores}]", shuffle_partitions=max(8, cores)
    )


def main_bench() -> None:
    sf = _sf_of(SF_DIR)
    spark = _get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qfns = entrymod.queries()
    timings: dict[str, float] = {}
    # extraction pipeline first (the flagship metric)
    extraction = run_extraction_bench(spark, sf)
    timings["extraction_pipeline"] = extraction["wall_sec"]
    for name in HEADLINE:
        fn = qfns[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "extraction": extraction,
                "cores": CPUS,
            }
        )
    )
    spark.stop()


def main_extract_only(cores: int) -> None:
    sf = _sf_of(SF_DIR)
    spark = _get_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    result = run_extraction_bench(spark, sf, warm=True)
    result["cores"] = cores
    print(json.dumps(result))
    spark.stop()


def main_scaling() -> None:
    sf = _sf_of(SF_DIR)
    corpus_path(sf)  # pre-materialize so both runs share the cached corpus
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--extract-only", f"--cores={cores}"],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    n, n4 = results[8], results[32]
    efficiency = round(n4["docs_per_sec"] / (4.0 * n["docs_per_sec"]), 3)
    report = {
        "metric": "scaling_efficiency_8_to_32",
        "value": efficiency,
        "unit": "ratio",
        "queries": {
            "extract_local8_docs_per_sec": n["docs_per_sec"],
            "extract_local32_docs_per_sec": n4["docs_per_sec"],
            "extract_local8_tables_per_sec": n["tables_per_sec"],
            "extract_local32_tables_per_sec": n4["tables_per_sec"],
        },
        "sf": float(sf),
    }
    print(json.dumps(report))
    _write_bench_md(sf, n, n4, efficiency)


def _write_bench_md(sf: str, n: dict, n4: dict, efficiency: float) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            f"""# BENCH — measured extraction throughput + scaling efficiency

Same job, same deterministic corpus (seed 42, sf{sf}: {n['docs']} docs incl.
mega-doc skew fixtures), two parallelism levels in fresh JVMs — the sandbox
proxy for N vs 4N executors (no real cluster available; driver instruction).

| parallelism | docs/sec | tables/sec | wall (s) |
|---|---|---|---|
| local[8]  (N)  | {n['docs_per_sec']} | {n['tables_per_sec']} | {n['wall_sec']} |
| local[32] (4N) | {n4['docs_per_sec']} | {n4['tables_per_sec']} | {n4['wall_sec']} |

**Scaling efficiency N→4N: {efficiency}** (target ≥ 0.8, BASELINE.json).

Efficiency = docs/sec(4N) / (4 × docs/sec(N)). The pipeline is the full
plan (cost pre-pass → salted repartition → mega-doc split → mapInPandas
extraction → count), not a parser micro-benchmark. Reproduce with
`python bench.py --scaling`.
"""
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--extract-only" in sys.argv:
        cores = 8
        for arg in sys.argv:
            if arg.startswith("--cores="):
                cores = int(arg.split("=")[1])
        main_extract_only(cores)
    else:
        main_bench()

"""Spark-free scaling control: the extraction kernel under a plain
multiprocessing pool on the SAME pinned CPUs and the SAME corpus as
``bench.py --scaling``.

Purpose (round-2 VERDICT, "What's wrong" #1): separate the single-box
hardware ceiling from engine overhead. Whatever N→4N efficiency THIS
harness reaches is the most any execution engine could show on this
machine — there is no JVM, no py4j, no socket, no shuffle; just worker
processes pulling parquet shards off a shared queue, reassembling HTML
(``spans.doc_spans_to_html``, the Python twin of the pipeline's JVM-side
``html_reassembly_col``) and running the identical Arrow extraction
kernel (``make_arrow_extractor``) the Spark job runs.

The interesting derived number is the IMPLIED CEILING on Spark's N→4N
efficiency: Spark's low-core legs run at kernel speed (CPU-bound, no bus
contention), so

    max_spark_eff(N→4N) ≈ pool_docs_per_sec(4N) / (4 × spark_docs_per_sec(N))

— if the bare pool's aggregate throughput at 4N cores is itself below
4× Spark's N-core throughput, the shortfall is the shared memory bus,
not Arrow/IPC engineering debt.

Usage:
    python scripts/pool_control.py                 # full sweep 4/8/16/32
    python scripts/pool_control.py --run --cores=8 # one pinned leg (internal)

Each leg is re-invoked under ``taskset -c 0-(k-1)`` exactly like
bench.py --scaling, best-of-$SPARK_GRAFT_SCALING_ATTEMPTS (default 2).
Results append to BENCH/POOL_RUNS.jsonl; the summary prints as JSON.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = (4, 8, 16, 32)


def _corpus_files(sf_dir: str) -> list[str]:
    import bench

    sf = bench._sf_of(sf_dir)
    path = bench.corpus_path(sf)  # materializes if missing (shared cache)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    if not files:
        raise RuntimeError(f"no parquet shards under {path}")
    return files


def _worker_init(barrier) -> None:
    # pay imports + kernel warm-up before timing starts (Spark legs time
    # against a warmed worker pool; the control must too)
    global _EXTRACT
    import pyarrow as pa

    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import make_arrow_extractor

    _EXTRACT = make_arrow_extractor(ParserConfig().all_tables())
    warm = pa.RecordBatch.from_pydict(
        {"doc_id": ["w"], "html": ["<table><tr><td>w</td></tr></table>"]}
    )
    for _ in _EXTRACT(iter([warm])):
        pass
    # real rendezvous: EVERY worker (and the parent, the +1 party) has
    # finished importing before any timed work starts — a noop-task round
    # is not a barrier, since one fast worker can drain all the noops
    # while the others are still paying imports inside the timed window
    barrier.wait()


def _process_file(path: str) -> tuple[int, int]:
    """One parquet shard → (docs, tables) through the real kernel."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_table_spark.spans import doc_spans_to_html

    docs = 0
    tables = 0
    table = pq.read_table(path, columns=["doc_id", "spans"])
    for batch in table.to_batches(max_chunksize=2048):
        ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        htmls = [doc_spans_to_html(s or []) for s in spans]
        docs += len(ids)
        rb = pa.RecordBatch.from_pydict({"doc_id": ids, "html": htmls})
        for out in _EXTRACT(iter([rb])):
            tables += out.num_rows
    return docs, tables


def main_leg(cores: int) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    files = _corpus_files(sf_dir)
    # dynamic balancing: shards come off a shared queue, so the mega-doc
    # shards can't straggle a statically-assigned worker (chunksize=1)
    barrier = mp.Barrier(cores + 1)
    with mp.Pool(
        processes=cores, initializer=_worker_init, initargs=(barrier,)
    ) as pool:
        barrier.wait()  # all workers warmed before the clock starts
        started = time.monotonic()
        docs = 0
        tables = 0
        for d, t in pool.imap_unordered(_process_file, files, chunksize=1):
            docs += d
            tables += t
        wall = time.monotonic() - started
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": docs,
                "tables": tables,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(docs / wall, 1),
                "tables_per_sec": round(tables / wall, 1),
            }
        )
    )


def main_sweep() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _corpus_files(sf_dir)  # pre-materialize outside the timed legs
    attempts = int(os.environ.get("SPARK_GRAFT_SCALING_ATTEMPTS", "2"))
    results: dict[int, dict] = {}
    for cores in CORES:
        best = None
        for _ in range(attempts):
            bench._wait_for_quiet()
            out = subprocess.run(
                [
                    "taskset", "-c", f"0-{cores - 1}",
                    sys.executable, os.path.abspath(__file__),
                    "--run", f"--cores={cores}",
                ],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if out.returncode != 0 or not lines:
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(f"pool leg cores={cores} failed")
            r = json.loads(lines[-1])
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        results[cores] = best
    effs = {
        f"{n}->{n4}": round(results[n4]["docs_per_sec"] / (4 * results[n]["docs_per_sec"]), 3)
        for n, n4 in ((4, 16), (8, 32))
    }
    record = {
        "ts": time.time(),
        "sf_dir": sf_dir,
        "results": {str(k): v for k, v in results.items()},
        "efficiency": effs,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "POOL_RUNS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    if "--run" in sys.argv:
        cores = next(
            int(a.split("=")[1]) for a in sys.argv if a.startswith("--cores=")
        )
        main_leg(cores)
    else:
        main_sweep()

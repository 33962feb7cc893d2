"""Direct memory-bandwidth control for the 8->32 scaling question.

Round-3 VERDICT item 1: the claim "extraction 8->32 = 0.635 is the box's
shared-memory-bus ceiling" was supported by three indirect controls
(Spark-free pool, per-core ratio structure, config-graded deficits) but
never measured directly. This script measures the ceiling itself: a pure
memory-bandwidth kernel with ZERO parse work, scheduling, IPC, or Python
object churn — if *it* stops scaling past 8 cores, nothing that streams
memory on this box can clear the north rule at 8->32, and the 4->16 pair
is the authoritative proxy; if it scales ~1.0, the extraction pipeline
has real per-document traffic left to cut.

Kernels (numpy, releases the GIL, but workers are separate PROCESSES so
even GIL-bound phases could not serialize):
  copy : np.copyto(dst, src)      — 8 B/elem read + 8 B/elem write
  triad: t = s*c; t += b; a <- t  — STREAM-triad semantics in two fused
         numpy passes over preallocated buffers (no temporaries)

Each worker process pins itself to ONE core inside the same 0..P-1 range
`taskset` gives the Spark legs (bench.py:390-396), allocates buffers far
beyond its L3 slice (64 MiB per array), warms up, then streams until a
shared deadline; a multiprocessing Barrier aligns the measurement window
across workers. Aggregate GB/s = sum of per-worker bytes moved / window.

Usage:
    python scripts/membw_control.py              # sweep 4,8,16,32, best-of-3
    python scripts/membw_control.py --quick      # 1 rep (smoke)
    python scripts/membw_control.py --cores=8    # one leg

Appends a dated evidence block to BENCH/BASELINE.md with the 4->16 and
8->32 efficiencies next to the extraction pipeline's, and the raw legs
to BENCH/MEMBW_RUNS.jsonl.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N_ELEM = 64 * 1024 * 1024 // 8   # 64 MiB per float64 array
WINDOW_SEC = 4.0
WARMUP_SEC = 1.0
SWEEP = (4, 8, 16, 32)


def _worker(core: int, kernel: str, barrier, out_q) -> None:
    os.sched_setaffinity(0, {core})
    rng = np.random.default_rng(core)
    b = rng.random(N_ELEM)
    c = rng.random(N_ELEM)
    a = np.empty_like(b)
    t = np.empty_like(b)

    def step() -> int:
        if kernel == "copy":
            np.copyto(a, b)
            return 2 * N_ELEM * 8          # read b + write a
        np.multiply(c, 0.42, out=t)        # read c, write t
        np.add(t, b, out=t)                # read t+b, write t
        np.copyto(a, t)                    # read t, write a
        return 7 * N_ELEM * 8              # triad as two fused passes

    deadline = time.perf_counter() + WARMUP_SEC
    while time.perf_counter() < deadline:
        step()
    barrier.wait()
    start = time.perf_counter()
    deadline = start + WINDOW_SEC
    moved = 0
    while time.perf_counter() < deadline:
        moved += step()
    out_q.put((core, moved, time.perf_counter() - start))


def run_leg(cores: int, kernel: str) -> float:
    """Aggregate GB/s across `cores` single-core-pinned workers."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(cores)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(i, kernel, barrier, out_q))
        for i in range(cores)
    ]
    for p in procs:
        p.start()
    # generous timeout so a crashed worker fails the leg instead of
    # deadlocking the parent on an empty queue
    results = [out_q.get(timeout=WARMUP_SEC + WINDOW_SEC + 120) for _ in procs]
    for p in procs:
        p.join()
    return sum(moved / secs for _, moved, secs in results) / 1e9


def eff(th: dict[int, float], lo: int, hi: int) -> float:
    return (th[hi] / th[lo]) / (hi / lo)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 1 if args.quick else args.reps

    if args.cores:
        for kernel in ("copy", "triad"):
            gbps = max(run_leg(args.cores, kernel) for _ in range(reps))
            print(json.dumps({"cores": args.cores, "kernel": kernel,
                              "gbps": round(gbps, 2)}))
        return 0

    legs: dict[str, dict[int, float]] = {"copy": {}, "triad": {}}
    raw = []
    for kernel in ("copy", "triad"):
        for cores in SWEEP:
            best = 0.0
            for rep in range(reps):
                gbps = run_leg(cores, kernel)
                raw.append({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                            "kernel": kernel, "cores": cores, "rep": rep,
                            "gbps": round(gbps, 2)})
                best = max(best, gbps)
                print(f"  {kernel} @ {cores:2d} cores rep {rep}: "
                      f"{gbps:8.2f} GB/s", file=sys.stderr)
            legs[kernel][cores] = best

    summary = {
        "metric": "memory_bandwidth_scaling_control",
        "window_sec": WINDOW_SEC,
        "array_mib": N_ELEM * 8 // (1024 * 1024),
        "legs": {k: {str(c): round(v, 2) for c, v in d.items()}
                 for k, d in legs.items()},
        "eff_4_16": {k: round(eff(d, 4, 16), 3) for k, d in legs.items()},
        "eff_8_32": {k: round(eff(d, 8, 32), 3) for k, d in legs.items()},
    }
    print(json.dumps(summary))

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
    with open(os.path.join(bench_dir, "MEMBW_RUNS.jsonl"), "a") as f:
        for row in raw:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

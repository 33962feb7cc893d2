"""SF1.0 wall-clock-linearity evidence run (round-3 VERDICT item 6).

All prior bench evidence is sf0.1 (96k extraction docs, 5k dedup docs).
This script runs the extraction pipeline and the top-cost queries at 10x
that scale, back-to-back with fresh sf0.1 legs in the SAME session/box
window, and records whether any stage changes complexity class — the
named suspects: the mega-doc discovery cap, the Jaccard recompute
router, the LSH band explode.

10x inputs, structure-preserving by construction (no external data):

- Extraction corpus: bench.py's own deterministic generator at the new
  "1.0" tier — 960,000 bulk docs + 40 mega docs x 2000 tables (10x the
  bulk AND 10x the mega count, identical per-doc and per-mega shape).
- documents.parquet: ten replicas of the sf0.1 table; replica r > 0
  appends "~r" to EVERY whitespace token. Within a replica the shingle
  multiset structure (hence Jaccard/LSH collision structure) is exactly
  sf0.1's; across replicas token sets are disjoint, so candidate pairs
  scale exactly 10x — a super-linear pair count would be an engine
  artifact, which is the thing under test.
- embeddings.parquet: ten replicas; replica r multiplies every vector
  elementwise by a seeded random +-1 sign pattern. Same-replica dot
  products are EXACTLY preserved ((s*x).(s*y) = x.y), cross-replica
  cosines are near-zero random projections — 10x the volume, identical
  within-replica neighbor geometry.

Per query, both SFs also record a PLAN FINGERPRINT (the multiset of
physical node names from formatted explain) — "identical plan shapes"
is checked, not eyeballed.

Usage:  taskset -c 0-31 python scripts/sf1_run.py   (or bare; ~15 min)
Writes BENCH/SF1.md + raw legs to BENCH/SF1_RUNS.jsonl.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/spark_graft_sf1"
REPLICAS = 10
QUERIES = [
    "dd_jaccard", "dd_lsh_pairs", "dd_embed_cosine", "ann_ivf", "dd_simhash",
    # round-4 north-rule ops: per-doc linear kernels — 10x rows, flat plans
    "mc_blocks", "pdf_spans",
]
BEST_OF = 3

# round-4 corpus-pipeline family (--corpus-only): documents-table ops whose
# candidate/window streams must scale linearly in replica count by the same
# construction argument (within a replica the token structure is exactly
# sf0.1's; across replicas token sets are disjoint)
CORPUS_QUERIES = [
    "tx_vocab", "tx_topk_ngrams", "tx_sample_mix", "tx_pii_scrub",
    "tx_pack_sequences", "dd_decontaminate", "dd_ngram_novelty",
    "dd_exact_substr",
]


def synth_sf1_tables() -> None:
    """documents + embeddings at 10x sf0.1, structure-preserving."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1_DIR, exist_ok=True)
    docs_out = os.path.join(SF1_DIR, "documents.parquet")
    emb_out = os.path.join(SF1_DIR, "embeddings.parquet")
    if os.path.exists(docs_out) and os.path.exists(emb_out):
        return

    base = duckdb.sql(
        f"SELECT * FROM '{SF01_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(base)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for r in range(REPLICAS):
        for doc_id, text, lang, source, _ in base:
            if r == 0:
                t = text
            else:
                t = " ".join(f"{w}~{r}" for w in text.split())
            ids.append(doc_id + r * n)
            texts.append(t)
            langs.append(lang)
            sources.append(source)
            n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        docs_out,
    )

    ebase = duckdb.sql(
        f"SELECT * FROM '{SF01_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    en = len(ebase)
    dim = len(ebase[0][1])
    vec_ids, vecs, labels = [], [], []
    for r in range(REPLICAS):
        signs = (
            np.ones(dim, np.float32)
            if r == 0
            else np.random.default_rng(1000 + r)
            .choice(np.array([-1.0, 1.0], np.float32), size=dim)
        )
        for vec_id, emb, label in ebase:
            vec_ids.append(vec_id + r * en)
            vecs.append((np.asarray(emb, np.float32) * signs).tolist())
            labels.append(label)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        emb_out,
    )


def plan_fingerprint(df) -> dict[str, int]:
    """Multiset of physical operator names from formatted explain."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)
    nodes = re.findall(r"^\(\d+\) (\S+)", text, re.MULTILINE)
    out: dict[str, int] = {}
    for name in nodes:
        # strip codegen annotations so fingerprints compare operators
        name = name.split("[")[0]
        out[name] = out.get(name, 0) + 1
    return out


def run_queries(spark, entry, sf_dir: str, names=None) -> dict:
    out = {}
    qmap = entry.queries()
    for q in names or QUERIES:
        fn = qmap[q]
        fp = plan_fingerprint(fn(spark, sf_dir))
        wall = float("inf")
        rows = None
        for _ in range(BEST_OF):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows = fn(spark, sf_dir).count()
            wall = min(wall, time.monotonic() - t0)
        out[q] = {"wall_sec": round(wall, 3), "rows": rows, "plan": fp}
    return out


def run_embed_variants(spark) -> dict:
    """dd_embed_cosine with fixed 8-bit buckets (the gated query) vs the
    round-4 auto log2(n) bucket width, both SFs — the measured fix for
    the 44x blowup the first sf1.0 pass found."""
    from html_table_spark.operators.similarity import (
        embedding_near_dup_pairs,
        with_perturbed_twins,
    )

    out = {}
    for sf_name, sf_dir in (("sf0.1", SF01_DIR), ("sf1.0", SF1_DIR)):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        # the exact corpus the gated dd_embed_cosine query measures:
        # perturbed twin per vector, threshold 0.85
        twins = with_perturbed_twins(emb, id_offset=100000, delta=0.5)
        for mode, bits in (("fixed8", 8), ("auto", None)):
            wall = float("inf")
            rows = None
            for _ in range(BEST_OF):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                rows = embedding_near_dup_pairs(
                    twins, threshold=0.85, n_tables=8,
                    planes_per_table=bits, seed=7,
                ).count()
                wall = min(wall, time.monotonic() - t0)
            out[f"{sf_name}_{mode}"] = {"wall_sec": round(wall, 3), "rows": rows}
            print(f"  embed {sf_name} {mode}: {wall:.2f}s {rows} pairs",
                  file=sys.stderr)
    return out


def main() -> int:
    import bench
    from html_table_spark.session import get_spark

    embed_only = "--embed-only" in sys.argv
    synth_sf1_tables()
    if "--only" in sys.argv:
        # ad-hoc subset (e.g. newly added ops): same measurement path,
        # same session, sf0.1 first, appended to the same evidence log
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        import __spark_entry__ as entry

        spark = get_spark("sf1-only", master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        results = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "cores": 32,
                   "policy": f"best-of-{BEST_OF}, same session, sf0.1 first",
                   "family": "only:" + ",".join(names)}
        print("== subset sf0.1 ==", file=sys.stderr)
        results["queries_sf0.1"] = run_queries(spark, entry, SF01_DIR, names)
        print("== subset sf1.0 ==", file=sys.stderr)
        results["queries_sf1.0"] = run_queries(spark, entry, SF1_DIR, names)
        spark.stop()
        bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
        with open(os.path.join(bench_dir, "SF1_RUNS.jsonl"), "a") as f:
            f.write(json.dumps(results) + "\n")
        print(json.dumps(results))
        return 0
    if "--corpus-only" in sys.argv:
        import __spark_entry__ as entry

        spark = get_spark("sf1-corpus", master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        results = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "cores": 32,
                   "policy": f"best-of-{BEST_OF}, same session, sf0.1 first",
                   "family": "corpus-ops"}
        print("== corpus queries sf0.1 ==", file=sys.stderr)
        results["queries_sf0.1"] = run_queries(spark, entry, SF01_DIR,
                                               CORPUS_QUERIES)
        print("== corpus queries sf1.0 ==", file=sys.stderr)
        results["queries_sf1.0"] = run_queries(spark, entry, SF1_DIR,
                                               CORPUS_QUERIES)
        spark.stop()
        bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
        with open(os.path.join(bench_dir, "SF1_RUNS.jsonl"), "a") as f:
            f.write(json.dumps(results) + "\n")
        print(json.dumps(results))
        return 0
    if embed_only:
        spark = get_spark("sf1-embed", master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        results = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "cores": 32,
                   "policy": f"best-of-{BEST_OF}", "embed_variants":
                   run_embed_variants(spark)}
        spark.stop()
        bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
        with open(os.path.join(bench_dir, "SF1_RUNS.jsonl"), "a") as f:
            f.write(json.dumps(results) + "\n")
        print(json.dumps(results))
        return 0
    corpus_10 = bench.corpus_path("1.0")  # generates + caches on first call
    print(f"corpora ready: {SF1_DIR}, {corpus_10}", file=sys.stderr)

    import __spark_entry__ as entry

    spark = get_spark("sf1-evidence", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "cores": 32,
               "policy": f"best-of-{BEST_OF}, same session, sf0.1 first"}
    print("== extraction sf0.1 ==", file=sys.stderr)
    results["extraction_sf0.1"] = bench.run_extraction_bench(spark, "0.1")
    print("== extraction sf1.0 ==", file=sys.stderr)
    results["extraction_sf1.0"] = bench.run_extraction_bench(spark, "1.0")
    print("== queries sf0.1 ==", file=sys.stderr)
    results["queries_sf0.1"] = run_queries(spark, entry, SF01_DIR)
    print("== queries sf1.0 ==", file=sys.stderr)
    results["queries_sf1.0"] = run_queries(spark, entry, SF1_DIR)
    spark.stop()

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
    with open(os.path.join(bench_dir, "SF1_RUNS.jsonl"), "a") as f:
        f.write(json.dumps(results) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

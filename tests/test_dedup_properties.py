"""Property-based invariants for the end-of-round dedup operators.

Each property runs a handful of hypothesis-generated corpora through the
real Spark operator (one action per example — examples kept small so the
suite stays fast) and checks the algebraic invariants that must hold on
ANY input, complementing the hand-built goldens in test_corpus_ops.py and
the DuckDB value oracles in the driver gate.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from html_table_spark.operators import corpus as corpus_ops
from html_table_spark.operators import dedup

# tiny word alphabet → heavy segment/text collisions, which is the
# interesting regime for dedup invariants
_WORDS = st.sampled_from(["a", "b", "c", "dd", "ee"])
_TEXT = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=6)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@settings(max_examples=8, deadline=None)
@given(texts=_CORPUS)
def test_segment_dedup_conservation(spark, texts):
    """(1) every document keeps exactly ceil(tokens/seg_len) segments in
    n_segs; (2) total kept count == number of DISTINCT segments in the
    corpus; (3) each doc's clean_text is a subsequence of its original
    segment sequence (order preserved, only removals)."""
    seg_len = 2
    out = {r.doc_id: r for r in
           dedup.segment_dedup(_docs(spark, texts), seg_len=seg_len).collect()}
    all_segs = set()
    for i, t in enumerate(texts):
        toks = t.split() if t.strip() else []
        segs = [" ".join(toks[j:j + seg_len])
                for j in range(0, len(toks), seg_len)]
        assert out[i].n_segs == math.ceil(len(toks) / seg_len)
        kept = out[i].clean_text.split() if out[i].clean_text else []
        # kept tokens are a subsequence of the original tokens
        it = iter(toks)
        assert all(tok in it for tok in kept)
        all_segs.update(segs)
    assert sum(r.n_kept for r in out.values()) == len(all_segs)


@settings(max_examples=8, deadline=None)
@given(
    hist=st.lists(_TEXT, min_size=1, max_size=5),
    batch=st.lists(_TEXT, min_size=1, max_size=5),
)
def test_bloom_dedup_equals_naive_membership(spark, hist, batch):
    """bloom_dedup must equal the naive per-row EXISTS on every corpus —
    including a deliberately saturated 64-bit bitmap (every probe a false
    positive) where tier 2 carries the whole answer."""
    h = _docs(spark, hist)
    b = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {r.doc_id: r.is_dup
           for r in dedup.bloom_dedup(b, h, n_bits=64, k=2).collect()}
    want = {100 + i: t in set(hist) for i, t in enumerate(batch)}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=6,
    )
)
def test_leakage_safe_split_never_splits_an_edge(spark, pairs):
    docs = _docs(spark, ["x"] * 8)
    pdf = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs] or [(0, 0)],
        "id_a long, id_b long",
    ).filter(F.col("id_a") != F.col("id_b"))
    out = corpus_ops.leakage_safe_split(docs, pdf, val_frac=0.5)
    s = {r.doc_id: r.split for r in out.collect()}
    assert len(s) == 8
    for a, b in pairs:
        assert s[a] == s[b]


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(
    st.lists(st.sampled_from(["ab", "ba", "abc", "aab", "b"]),
             min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=4,
))
def test_bpe_matches_reference_on_random_corpora(spark, texts):
    """The distributed trainer must equal the textbook dict-based BPE on
    ANY corpus — argmax ties, greedy overlap, early stop included."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_bpe_ref", os.path.join(os.path.dirname(__file__), "test_bpe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _py_bpe = mod._py_bpe
    from html_table_spark.operators import bpe

    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    got = [tuple(r) for r in bpe.bpe_merge_table(
        _docs(spark, texts), 4).collect()]
    assert got == _py_bpe(wc, 4)


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 1000))
def test_ann_batch_matches_bruteforce_within_probed_clusters(spark, seed):
    """ivf_topk_join's per-query top-k must equal a brute-force rescore
    restricted to the probed clusters (the blocking is semantic; the
    ranking inside it must be exact)."""
    import random

    from html_table_spark.operators import similarity

    rng = random.Random(seed)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(20)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    out = similarity.ivf_topk_join(emb, queries, k=3, nprobe=2,
                                   n_centroids=4)
    rows = out.collect()
    # exact per-query invariants: ranks 1..k dense, cosine non-increasing
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i].cosine >= rs[i + 1].cosine for i in range(len(rs) - 1))
        # rank 1 of a query that is an index member is itself at cos 1.0
        assert rs[0].vec_id == q and rs[0].cosine == 1.0

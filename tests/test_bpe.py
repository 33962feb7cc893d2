"""Distributed BPE tokenizer training (operators/bpe.py).

Pins the Sennrich-reference semantics on hand-built corpora (greedy
left-to-right merge application, max-count-then-lexicographic argmax,
early stop) against an independent pure-Python BPE implementation, plus
the plan invariants that matter at scale (broadcast tokenization map, no
corpus-sized work inside the merge loop).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from html_table_spark.operators import bpe


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference: the textbook dict-based BPE trainer."""
    vocab = [(list(w), c) for w, c in word_counts.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in vocab:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + c
                )
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        nv = []
        for toks, cnt in vocab:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nv.append((out, cnt))
        vocab = nv
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference_implementation(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
    ]
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    got = [tuple(r) for r in bpe.bpe_merge_table(_docs(spark, texts), 6).collect()]
    assert got == _py_bpe(wc, 6)


def test_bpe_greedy_overlap_semantics(spark):
    # "aaaa" under merge (a,a): greedy left-to-right gives ["aa","aa"],
    # so rank-2 pair counts must see (aa,aa), never (a,aa)/(aa,a)
    merges = [tuple(r) for r in bpe.bpe_merge_table(_docs(spark, ["aaaa aaaa"]), 2).collect()]
    assert merges[0][1:] == ("a", "a", "aa", 6)  # 3 disjoint-greedy pairs x 2 words
    assert merges[1][1:] == ("aa", "aa", "aaaa", 2)


def test_bpe_tie_breaks_lexicographic(spark):
    # pairs (a,b) and (c,d) both occur twice; (a,b) wins the tie
    merges = [tuple(r) for r in bpe.bpe_merge_table(_docs(spark, ["ab cd ab cd"]), 1).collect()]
    assert merges[0] == (1, "a", "b", "ab", 2)


def test_bpe_early_stop_when_vocab_exhausted(spark):
    # one 2-char word: after 1 merge nothing is left to pair
    merges = bpe.bpe_merge_table(_docs(spark, ["xy xy"]), 8).collect()
    assert len(merges) == 1
    assert tuple(merges[0]) == (1, "x", "y", "xy", 2)


def test_bpe_token_counts_and_empty_doc(spark):
    texts = ["ab ab ab", "ab c", ""]
    out = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_token_counts(_docs(spark, texts), 1).collect()
    }
    # merge (a,b): "ab" -> 1 token, "c" -> 1 token
    assert out == {0: 3, 1: 2, 2: 0}


def test_bpe_token_counts_vocab_side_is_broadcast(spark):
    plan = (
        bpe.bpe_token_counts(_docs(spark, ["ab ab", "cd"]), 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_train_returns_final_vocab_map(spark):
    merges, vocab = bpe.bpe_train(_docs(spark, ["abc abc abd"]), 2)
    toks = {r.w: list(r.toks) for r in vocab.collect()}
    # merge 1: (a,b) count 3 -> ab; merge 2: (ab,c) count 2 -> abc
    assert [m[1:4] for m in merges] == [("a", "b", "ab"), ("ab", "c", "abc")]
    assert toks == {"abc": ["abc"], "abd": ["ab", "d"]}


@pytest.mark.parametrize("n_merges", [1, 4])
def test_bpe_merge_loop_is_vocab_sized(spark, n_merges):
    """The merge-iteration pair aggregate must read the checkpointed
    vocab relation, not re-scan the corpus: its optimized plan contains
    no parquet/data-source scan nodes."""
    docs = _docs(spark, ["ab ab cd", "ab ef"])
    _, vocab = bpe.bpe_train(docs, n_merges)
    plan = vocab._jdf.queryExecution().optimizedPlan().toString()
    # the loop's output must read the checkpoint RDD and ONLY it: a plan
    # that also re-scans a source relation would mean per-iteration
    # corpus passes (LogicalRDD is how a localCheckpoint scan prints;
    # "ExistingRDD"/"LogicalRDD" both appear depending on version)
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    # the createDataFrame source would print as LocalRelation; parquet
    # sources as a file Relation — neither may appear inside the loop
    assert "LocalRelation" not in plan
    assert "parquet" not in plan.lower()

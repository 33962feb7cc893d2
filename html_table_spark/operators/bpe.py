"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning (Sennrich et al. 2016, ACL — the
tokenizer-training step every LLM data pipeline runs before packing) in
the production-scale shape:

1. ONE corpus-sized aggregation collapses the corpus to its word-frequency
   relation ``(word, count)`` — after this pass the corpus is never read
   again, exactly how reference trainers (e.g. the original
   ``subword-nmt``, HuggingFace ``tokenizers``) operate on a word-count
   dictionary rather than the raw stream.
2. Every merge iteration then runs on the VOCABULARY relation only
   (vocab-sized, not corpus-sized): weighted pair counts via a two-phase
   hash aggregate, one single-row collect for the argmax (deterministic:
   max count, ties toward the lexicographically smallest pair — the
   reference convention), and a pure-JVM rewrite of each word's token
   list. At web scale the vocabulary is ~10^7 rows against a 10^12-row
   corpus, so iterations cost ~nothing compared to step 1.

The rewrite applies a merge ``(l, r) -> lr`` with the greedy
left-to-right non-overlapping semantics of the reference implementations
("aaa" under ``(a,a)`` becomes ``["aa","a"]``): each token is wrapped in
sentinel bytes (``\\x1e token \\x1f``) and the merge becomes one literal
``replace`` — string ``replace`` scans left-to-right and never rematches
inside a replacement, which is exactly the BPE merge-application order.
Per-token wrapping (not a single separator) is what makes adjacent
occurrences like ``⟨a⟩⟨a⟩⟨a⟩⟨a⟩`` merge to ``⟨aa⟩⟨aa⟩``: with a shared
single separator the first replacement would consume the boundary the
second occurrence needs. The sentinels are control bytes that whitespace
tokenization can never emit inside a token.

Plan-growth discipline: the vocabulary DataFrame is eagerly
``localCheckpoint``-ed every iteration (the connected_components
pattern) so the lineage stays one-iteration deep instead of growing a
2^iters logical plan; each checkpoint materializes only the vocab-sized
relation.

The DuckDB oracle twin (``__spark_entry__.oracle_sql['tx_bpe_train']``)
replays the whole loop as a single-row recursive CTE over list lambdas —
same sentinel-replace rewrite, same ``(-count, l, r)`` argmax — so the
driver gate checks the full merge table by value, not rows-only, even
though the op is iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# sentinel bytes wrapping every token during merge application; whitespace
# tokenization can never produce them inside a token
_SEPL = "\x1e"
_SEPR = "\x1f"


def word_counts(
    docs: DataFrame, text_col: str = "text", word_col: str = "w"
) -> DataFrame:
    """The one corpus-sized pass: whitespace words with frequencies.
    Two-phase hash aggregate; only (word, partial count) shuffles."""
    from .util import ensure_parallelism

    return (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(tokens(text_col)).alias(word_col))
        .groupBy(word_col)
        .agg(F.count("*").alias("cnt"))
    )


def _char_split(col: str) -> F.Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.col(col).substr(i, F.lit(1)),
    )


def _apply_merge(toks_col, left: str, right: str) -> F.Column:
    """Rewrite one merge over a token array via the sentinel-wrapped
    literal replace (greedy left-to-right non-overlapping, the reference
    BPE application order)."""
    s = F.concat(
        F.lit(_SEPL), F.array_join(toks_col, _SEPR + _SEPL), F.lit(_SEPR)
    )
    s2 = F.replace(
        s,
        F.lit(_SEPL + left + _SEPR + _SEPL + right + _SEPR),
        F.lit(_SEPL + left + right + _SEPR),
    )
    return F.split(F.btrim(s2, F.lit(_SEPL + _SEPR)), _SEPR + _SEPL)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, final_vocab)`` where ``merges`` is the learned
    merge table ``[(rank, left, right, merged, pair_count), ...]``
    (driver-side — it IS the model, n_merges rows) and ``final_vocab`` is
    the vocabulary DataFrame ``(w, cnt, toks)`` after all merges — the
    word → token-sequence map ``bpe_token_counts`` broadcasts to tokenize
    the corpus without re-running merges per document.

    Each iteration collects exactly ONE row (the argmax pair) — an
    index-build constant like the IVF centroid collects, not a data-path
    collect. Stops early if the vocabulary runs out of pairs.
    """
    vocab = (
        word_counts(docs, text_col)
        .select("w", "cnt", _char_split("w").alias("toks"))
        .localCheckpoint()
    )
    # the sentinel bytes are NOT regex whitespace, so tokenization can in
    # principle emit them inside a token of a hostile corpus — that would
    # corrupt the literal-replace merge application silently. Fail fast
    # instead (vocab-sized check against the checkpointed relation).
    n_bad = vocab.filter(
        F.col("w").contains(_SEPL) | F.col("w").contains(_SEPR)
    ).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} vocabulary words contain the BPE sentinel bytes "
            "\\x1e/\\x1f; strip them from the corpus before training"
        )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("toks")
        pair = F.when(
            n < 2, F.array().cast("array<struct<l:string,r:string>>")
        ).otherwise(
            F.zip_with(
                F.slice("toks", 1, n - 1),
                F.slice("toks", 2, n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        )
        top = (
            vocab.select(F.explode(pair).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, left, right, left + right, cnt))
        # lazy checkpoint: materialized by the NEXT iteration's pair-count
        # job (or the caller's first action after an early break), halving
        # the Spark jobs per iteration while still truncating lineage to
        # one-iteration depth
        vocab = vocab.select(
            "w", "cnt", _apply_merge(F.col("toks"), left, right).alias("toks")
        ).localCheckpoint(eager=False)
    return merges, vocab


def bpe_merge_table(docs: DataFrame, n_merges: int = 8,
                    text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame
    ``(rank, left_tok, right_tok, merged, pair_count)`` — the model
    artifact a tokenizer consumer loads."""
    merges, _ = bpe_train(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        merges,
        "rank int, left_tok string, right_tok string, merged string,"
        " pair_count long",
    )


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under the learned BPE vocabulary —
    the number every packing/budget stage actually consumes.

    Scale design: tokenization never re-applies merges per document.
    The final vocabulary (word → merged-token count) is vocab-sized and
    **broadcast**; the corpus side explodes to words and probes the
    broadcast relation map-side, then partial-aggregates per document —
    one corpus-sized shuffle of ``(doc_id, partial sum)`` only. Documents
    with no words keep a row with 0 tokens (explode_outer), so corpus
    accounting stays total.
    """
    _, vocab = bpe_train(docs, n_merges, text_col)
    wlen = vocab.select("w", F.size("toks").alias("n_toks"))
    words = docs.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("w")
    )
    return (
        words.join(F.broadcast(wlen), "w", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("n_toks", F.lit(0)))
            .cast("long")
            .alias("n_bpe_tokens")
        )
    )

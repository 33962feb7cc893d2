"""Corpus-level analysis and data-mixing operators.

These complement the per-document text analysis in ``functions/text.py``
with the corpus-wide passes a training-data pipeline runs between filtering
and tokenization: boilerplate n-gram discovery, vocabulary statistics, and
deterministic stratified sampling for mixture construction.

All three are pure DataFrame compositions (JVM expressions + hash
aggregates + one small window each) with exact DuckDB oracle twins in
``__spark_entry__.oracle_sql``.

Scale notes (100 TB):

- ``topk_ngrams``: the heavy stream is (lang, gram) and collapses through a
  two-phase hash aggregate *before* the ranking window, so the window input
  cardinality is bounded by vocabulary², not corpus size. The window
  partitions by language — a handful of huge partitions if ranked rows were
  corpus-sized, but they are post-aggregate counts, so each language
  partition holds at most |vocab per lang|² rows. For web-scale vocabularies,
  cap with a count threshold filter (``HAVING cnt >= t``) before the window.
- ``vocab_stats``: two chained hash aggregates, (source, token) then
  (source); the shuffled payload is tokens + counts, never documents.
- ``stratified_sample``: exact per-stratum quota via hash-ranking — ranking
  key is ``md5(text)`` so the sample is deterministic, reproducible across
  engines, and independent of input partitioning/row order. The window sorts
  per stratum; at 100 TB replace the exact rank with a hash-threshold
  (keep if md5(text) < quantile(quota/count)) to avoid the per-stratum
  sort — same distribution, no window. The exact form is kept because the
  reference-twin gate needs byte-identical membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, token_count, tokens


def topk_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 5,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` word n-grams per group by corpus frequency — the
    boilerplate-discovery pass (the most frequent n-grams per language are
    the site chrome / template phrases a cleaning pipeline strips).

    Documents with fewer than ``n`` tokens are excluded (their whole-text
    fallback shingle is not a real n-gram). Ties break on the gram string
    ascending, so the result is deterministic.

    Returns ``(group_col, gram, cnt, rnk)`` with ``rnk`` in 1..k.
    """
    grams = docs.where(token_count(text_col) >= n).select(
        F.col(group_col),
        F.explode(shingles(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy(group_col, "gram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(group_col, "gram", "cnt", "rnk")
    )


def vocab_stats(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocabulary statistics: total token count, vocabulary size,
    hapax-legomena count (tokens occurring exactly once in the group), and
    type-token ratio — the corpus-health signals used to spot generator
    collapse / crawler loops in a training mix (a source whose TTR craters
    is emitting templated text).

    Returns ``(group_col, n_tokens, vocab, hapax, ttr)``.
    """
    tok = docs.select(F.col(group_col), F.explode(tokens(text_col)).alias("tok"))
    counts = tok.groupBy(group_col, "tok").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(group_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        )
        .select(
            group_col,
            "n_tokens",
            "vocab",
            "hapax",
            F.round(F.col("vocab") / F.col("n_tokens"), 4).alias("ttr"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    quota: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified sampling: keep exactly ``min(quota, |stratum|)``
    documents per group, selected by ranking on a content hash — the
    data-mixing primitive for building a training mixture with fixed
    per-language (or per-source) budgets.

    Hash-ranking (``md5(text)``, ties broken by id) makes the sample a pure
    function of content: re-running on a re-partitioned, re-ordered, or
    incrementally-grown corpus keeps previously-selected documents stable
    near the top of the ranking, unlike ``rand()``-based sampling.

    Returns ``(id_col, group_col, rnk)`` with ``rnk`` in 1..quota.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(text_col)).asc(), F.col(id_col).asc()
    )
    return (
        docs.select(id_col, group_col, F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= quota)
    )

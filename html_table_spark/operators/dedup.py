"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these at 100 TB):

- **exact**: one hash aggregate on a 32-byte digest — map-side partial
  aggregation, then a single shuffle on the digest. Never shuffles raw text.
- **MinHash signatures**: computed entirely with JVM array expressions
  (``transform``/``array_min`` over the shingle array) — zero Python, zero
  explode, zero shuffle; one pass over the text column.
- **LSH candidate pairs**: signatures are banded; candidates come from a
  self-join on (band_idx, band_key) — the shuffle moves only
  (doc_id, 32-byte band key), NOT documents.  Band keys with huge buckets
  (degenerate content) can be frequency-capped before the join.
- **verification**: exact n-gram Jaccard only on LSH candidates (a tiny
  fraction of the N² pair space).
- **SimHash**: vectorized Arrow path (pandas UDF) producing a 64-bit
  fingerprint; near-dup = hamming distance on a long — cheap to band by
  prefix for the same LSH trick.

The portable hash for MinHash is ``md5(shingle || '#' || seed)`` — chosen
because Spark and DuckDB produce identical digests, which makes every stage
up to Jaccard verifiable by the driver's DuckDB oracle.  (xxhash64 would be
~3× faster; swap ``_mh`` for production — the structure is hash-agnostic.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.text import fingerprint, shingles, tokens


# -- exact dedup -----------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-hash groups with >1 member: (fp, dup_count, canonical_id).
    Canonical = smallest id (deterministic)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def distinct_by_content(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (min id wins) — the classic
    training-corpus exact-dedup pass as one aggregate."""
    canon = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(canon, id_col, "left_semi")


# -- MinHash + LSH ----------------------------------------------------------

# MinHash component i = min over md5(shingle || '#i'). String-min over hex
# digests == min over the 128-bit integers (fixed width).
def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — all JVM-side array expressions.

    The whole signature is ONE array column built in a single pass
    (per-shingle digest arrays → element-wise running min via
    aggregate/zip_with), then cached and split into k scalar columns.
    One expression → the shingle construction appears once in the plan
    (computing k separate mh_i columns would let Catalyst's CollapseProject
    inline the split/slice/concat shingling into every one — higher-order
    functions are interpreted, not codegen'd, so that's a real k×
    recompute); one cache → the LSH self-join reads the tiny signatures
    twice without recomputing, and nothing larger stays pinned in executor
    storage. At 10^12-doc scale the cache becomes writing the signature
    table out once and reading it back.
    """
    from .util import ensure_parallelism

    sh = shingles(F.col(text_col), shingle_n)
    digests = F.transform(
        sh,
        lambda s: F.array(
            *[F.md5(F.concat(s, F.lit(f"#{i}"))) for i in range(num_hashes)]
        ),
    )
    # 'g' sorts after every hex digit — a safe identity for string-min
    sig = F.aggregate(
        digests,
        F.array_repeat(F.lit("g" * 32), num_hashes),
        lambda acc, d: F.zip_with(acc, d, lambda a, b: F.least(a, b)),
    )
    cached = ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), sig.alias("_sig")
    ).cache()
    return cached.select(
        id_col,
        *[
            F.element_at("_sig", i + 1).alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Band the signature and self-join on band keys → (id_a, id_b) candidate
    pairs (id_a < id_b). Only (id, band_key) crosses the shuffle."""
    rows_per_band = num_hashes // bands
    banded = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh_{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_key")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_shingles: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct shingles for the given candidate pairs:
    (id_a, id_b, jaccard).

    Shingle SETS (array_distinct, bounded by doc token count) travel only
    for ids present in ``pairs`` (semi-join pruned), and the intersection is
    one ``array_intersect`` per candidate pair — no explode, no per-shingle
    shuffle rows, no count aggregations. Candidate pairs are a vanishing
    fraction of N² after LSH banding, so the joined set is small by
    construction even at corpus scale.

    ``max_shingles`` bounds the worst case at scale: one mega-document's
    distinct-shingle array otherwise travels once per candidate pair it
    appears in. With a cap, each doc ships at most ``max_shingles`` sorted
    shingles (a deterministic prefix sample) plus a ``capped`` marker;
    pairs touching a capped doc carry ``approx = true`` so callers can
    route them to an exact recompute (the two-doc fallback is trivially
    cheap — the cap exists to protect the *join*, not to avoid the math).
    With the default ``None`` the result is exact and the ``approx``
    column is omitted."""
    ids = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    ).distinct()
    sh = F.array_distinct(shingles(F.col(text_col), shingle_n))
    pruned = df.join(ids, id_col, "left_semi")
    if max_shingles is None:
        sets = pruned.select(F.col(id_col), sh.alias("sh_set"))
    else:
        # materialize the shingle set once per row — shingling (regexp +
        # interpreted higher-order funcs over the full text) dominates this
        # stage, and codegen subexpression elimination is not guaranteed
        # across two select expressions
        sets = pruned.select(F.col(id_col), sh.alias("_sh")).select(
            F.col(id_col),
            F.slice(F.array_sort("_sh"), 1, max_shingles).alias("sh_set"),
            (F.size("_sh") > max_shingles).alias("capped"),
        )
    a_cols = [F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a")]
    b_cols = [F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b")]
    if max_shingles is not None:
        a_cols.append(F.col("capped").alias("capped_a"))
        b_cols.append(F.col("capped").alias("capped_b"))
    a = sets.select(*a_cols)
    b = sets.select(*b_cols)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    out_cols = [
        F.col("id_a"),
        F.col("id_b"),
        F.round(
            inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter),
            4,
        ).alias("jaccard"),
    ]
    if max_shingles is not None:
        out_cols.append((F.col("capped_a") | F.col("capped_b")).alias("approx"))
    return pairs.join(a, "id_a").join(b, "id_b").select(*out_cols)


def ngram_jaccard_routed(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_shingles: int = 4096,
) -> DataFrame:
    """The exact-recompute router ``BENCH/JACCARD_CAP.md`` promises: run the
    capped Jaccard for the bulk (bounded worst-case row payload through the
    pair join), then route every ``approx = true`` pair — pairs touching a
    doc whose distinct-shingle set exceeded the cap — through an exact
    two-doc recompute, and coalesce the branches. End-to-end output equals
    the uncapped computation exactly while the join never ships more than
    ``max_shingles`` shingles per row: the capped pass protects the join,
    the exact pass re-reads only the handful of mega docs named by approx
    pairs (semi-join pruned inside :func:`ngram_jaccard`).

    The capped result is materialized once (eager ``localCheckpoint``, as
    in :func:`connected_components`) — both branches filter it, and
    recomputing the shingle join per branch would double the expensive
    stage. Checkpoint blocks are released by the ContextCleaner when the
    returned DataFrame is dropped; a bare ``persist()`` here would leak a
    cache entry per invocation for the session lifetime. The materialized
    set is pairs-sized (ids + one double + one bool), not corpus-sized."""
    capped = ngram_jaccard(
        df, pairs, text_col, id_col, shingle_n, max_shingles=max_shingles
    ).localCheckpoint(eager=True)
    exact_pairs = capped.filter(F.col("approx")).select("id_a", "id_b")
    kept = capped.filter(~F.col("approx")).select("id_a", "id_b", "jaccard")
    exact = ngram_jaccard(
        df, exact_pairs, text_col, id_col, shingle_n, max_shingles=None
    )
    return kept.unionByName(exact)


# -- SimHash (vectorized Arrow path; non-SQL-expressible) --------------------

def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, Arrow-batched (one Python call
    per ~10k rows).  Token hash = first 8 bytes of md5 — deterministic
    across runs/platforms.  Bit voting is numpy-vectorized
    (``unpackbits``): the per-token × per-bit Python loop would otherwise
    dominate the stage."""
    import hashlib

    import numpy as np

    out = []
    md5 = hashlib.md5
    for text in texts:
        toks = text.split() if text else []
        if not toks:
            out.append(0)
            continue
        digests = b"".join(md5(t.encode("utf-8")).digest()[:8] for t in toks)
        bits = np.unpackbits(
            np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8), axis=1
        )
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
        sig_bits = (votes > 0).astype(np.uint8)
        sig = int.from_bytes(np.packbits(sig_bits).tobytes(), "big")
        # fold into signed 64-bit for Spark LongType
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out)


def simhash64(col) -> Column:
    """Column wrapper; the pandas_udf is registered lazily because the
    decorator needs an active SparkSession (type resolution)."""
    return pandas_udf(_simhash64_batch, "long")(col)


def simhash_banded_pairs(
    sigs: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Candidate generation + verification over precomputed 64-bit SimHash
    signatures, banded on ``bands`` disjoint 64/bands-bit segments.

    Output contract: pairs that COLLIDE IN ≥1 BAND and verify at hamming
    ≤ ``max_hamming`` — banding is the candidate policy, not a filter.
    Pigeonhole guarantee: a pair at hamming distance ≤ bands-1 leaves at
    least one segment untouched, so recall is 100% only for
    ``max_hamming ≤ bands-1`` (the round-1 prefix-only banding missed ~58%
    of hamming-3 pairs: C(48,3)/C(64,3) of the differing-bit placements
    avoid a fixed 16-bit window). With ``max_hamming > bands-1`` the
    result is blocking-defined: a pair whose differing bits touch every
    band is never generated as a candidate (the dd_simhash driver query
    runs 16/4 deliberately — its DuckDB oracle replicates the identical
    banding, so the semantics are pinned, not accidental). Verification is
    JVM-side ``bit_count(a XOR b)``; only (id, 8-byte signature, band key)
    rows ever shuffle — ``bands``× the row count of the prefix scheme,
    same join shape."""
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    seg = 64 // bands
    mask = (1 << seg) - 1
    banded = sigs.select(
        F.col(id_col),
        F.col(sig_col).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(sig_col, 64 - seg * (i + 1))
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sig", "band.band_idx", "band.band_key")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
        "band_idx", "band_key",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
        "band_idx", "band_key",
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])  # multi-band collisions
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash over document text: Arrow-batched
    signature computation, then :func:`simhash_banded_pairs` (100% recall
    for hamming ≤ bands-1)."""
    from .util import ensure_parallelism

    sigs = (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), simhash64(F.col(text_col)).alias("sig"))
        # both sides of the self-join read this — without materialization the
        # pandas UDF runs twice (locally a cache; at corpus scale write the
        # signature table out and bucket it)
        .cache()
    )
    return simhash_banded_pairs(
        sigs, bands=bands, max_hamming=max_hamming, id_col=id_col
    )


# -- cluster resolution ------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    pointer_jumping: bool = False,
) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS: (node, component) where component
    is the minimum id reachable through the pair graph. The missing last
    mile of every dedup pipeline — pair lists don't dedupe a corpus;
    canonical-per-cluster does.

    Algorithm: iterative min-label propagation — each round every node
    takes min(own label, neighbors' labels); converges in graph-diameter
    rounds. Near-dup graphs are unions of near-cliques (diameter 2-3 in
    practice), so 3-4 rounds close almost everything; the loop stops the
    first round nothing changes (one count() action per round — driver
    control flow, never data through the driver). Each round is one join
    on the edge list + one min-aggregate: shuffles carry (node, label)
    ids only, never documents.

    ``pointer_jumping=True`` (round-4, VERDICT item 5) adds a
    path-doubling step after each propagation round: ``L(v) <-
    min(L(v), L(L(v)))`` as one self-join of the label table on
    ``label == node``. Labels then chase their component minimum at
    geometrically doubling distance, so a diameter-d graph converges in
    O(log d) rounds instead of d — the adversarial-chain case (template
    spam that daisy-chains near-dups) that makes plain propagation blow
    past ``max_iters``. Same invariants: labels only decrease and always
    name a node of the same component (L(v) is reachable from v, and
    L(L(v)) is reachable from L(v)), so the fixed point is the same
    per-component minimum the plain variant returns. Costs one extra
    ids-only shuffle per round — leave it off for the common shallow
    near-clique graphs; the non-convergence RuntimeError names it when a
    deep graph trips the bound. (Same O(log n) round-bound class as the
    Kiveris et al. large-star/small-star alternation, with join shapes
    that reuse this function's existing label table.)

    The edge list is cached and the labels are eagerly
    localCheckpoint-ed EVERY round: each round's plan references the
    previous labels twice, so without per-round truncation the logical
    plan doubles per round — 2^rounds Catalyst nodes, a driver OOM long
    before the data is large (at 10^12-doc scale use reliable
    ``checkpoint()`` to cluster storage instead). The returned
    DataFrame is lineage-free (checkpointed) — no caller-owned cache.
    Raises ``RuntimeError`` if label propagation has not converged after
    ``max_iters`` rounds: a silently-split component would make
    ``dedup_by_clusters`` keep duplicate canonicals.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    changed = 0
    # max_iters bounds the number of LABEL-CHANGING rounds; convergence is
    # only observable one round later (the first round with changed == 0),
    # so run up to max_iters + 1 rounds — otherwise a graph of diameter
    # exactly max_iters would raise with fully-converged labels and the
    # effective capacity would be max_iters - 1.
    for it in range(max_iters + 1):
        nbr_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(nbr_min, labels.node == nbr_min.u, "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        pre_jump = None
        if pointer_jumping:
            # path doubling: L(v) <- min(L(v), L(L(v))). Every label value
            # is itself a node of the label table (initial labels are the
            # nodes; mins never leave that set), so the lookup is total —
            # left join + coalesce only guards the invariant. Cached so
            # the self-join doesn't recompute the propagation join twice.
            pre_jump = new_labels.cache()
            jump = pre_jump.select(
                F.col("node").alias("jn"), F.col("label").alias("jl")
            )
            new_labels = pre_jump.join(
                jump, pre_jump.label == jump.jn, "left"
            ).select(
                "node",
                F.least(F.col("label"), F.coalesce("jl", F.col("label"))).alias(
                    "label"
                ),
            )
        # eager localCheckpoint EVERY round (round-4 fix): each round's
        # plan references the previous round's labels twice (the nbr join
        # and the changed-count join), so plan size DOUBLES per round —
        # the old every-5-rounds cadence let the tree grow 2^5x between
        # cuts, and a non-converging 10-round run OOM'd the driver just
        # RENDERING the plan string. Per-round truncation keeps the plan
        # constant-size; the materialization it forces was already paid
        # by the changed-count action. (At 10^12-doc scale use reliable
        # checkpoint() to cluster storage on the same cadence.)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        if pre_jump is not None:
            # new_labels is checkpointed (self-contained); the pre-jump
            # intermediate is no longer reachable
            pre_jump.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # a silently-split component makes dedup_by_clusters keep duplicate
        # "canonicals" — never return wrong clusters without a signal
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge after {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters or pass "
            "pointer_jumping=True (O(log diameter) rounds) for long-chain "
            "graphs"
        )
    # localCheckpoint truncates the per-round join lineage (25 rounds of
    # joins would otherwise replay from the edge list on any recompute) and
    # lets us release the loop cache instead of leaking it to the caller
    out = labels.select("node", F.col("label").alias("component")).localCheckpoint(
        eager=True
    )
    labels.unpersist()
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with a benchmark/eval set — the n-gram-overlap
    decontamination pass every LLM training pipeline runs before training
    (GPT-3 §C / PaLM §7 style; 8–13-grams in production, parameterized here).

    Returns ``(id_col, n_hits)`` for contaminated documents only, where
    ``n_hits`` counts the document's *distinct* n-grams that appear anywhere
    in the benchmark set.

    Scale design (100 TB corpus, MB–GB benchmark): the blocklist side is
    benchmark-sized, never corpus-sized — ``array_distinct`` per benchmark
    doc, one global ``distinct``, then **broadcast**, so the corpus side
    never shuffles: each partition probes the broadcast hash relation
    map-side and the per-doc hit count partial-aggregates before the one
    small shuffle on contaminated ids. Shingling is the shared JVM
    ``shingles()`` expression (zip_with over shifted slices — no explode
    until after the per-doc distinct). For multi-TB benchmark suites, swap
    the gram string for ``xxhash64(gram)`` on both sides before the join —
    structure unchanged; strings are kept here so the DuckDB oracle can
    re-derive the exact hit counts.
    """
    from .util import ensure_parallelism

    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(text_col, n))).alias("g")
        )
        .distinct()
    )
    doc_grams = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g", "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def dup_substring_stats(
    docs: DataFrame,
    k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-substring detection: extract a fixed ``k``-char window
    starting at every token boundary and report, per doc, how many of its
    distinct windows occur in at least one other document — the flagging
    pass of exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"). Fixed-length char windows
    (vs word n-grams) normalize for token length, so a 40-char window means
    the same amount of copied content whether it spans 4 long words or 12
    short ones.

    Window anchors are **content-defined** (token starts), which is the
    property that makes this work: a fixed-grid stride (every s chars from
    the document start) only detects copies whose document offsets happen
    to agree modulo s, while content-defined anchors are shift-invariant —
    a copied word-aligned span of ≥ k chars is detected regardless of where
    it lands in either document (the CDC trick, replacing the paper's
    suffix array with a distributable hash aggregate).

    Documents with no full-length window (fewer than ``k`` chars from any
    token start) are omitted. Returns
    ``(id_col, n_windows, n_dup, dup_frac)``.

    Scale design: the exploded stream carries (k-char window, id); document
    frequency is a two-phase hash aggregate. Windows per doc ≈ token count,
    same order as the shingle passes. At 100 TB, map the window through
    ``xxhash64`` before the shuffle (8 bytes vs k); strings are kept so the
    DuckDB oracle recomputes identical counts.
    """
    from .util import ensure_parallelism

    tk = tokens(text_col)
    # slice only as many tokens as k chars can possibly need (each token is
    # ≥1 char + a joiner space ⇒ ceil((k+1)/2) tokens suffice) — the window
    # build is interpreted HOF work, so per-window op count is the cost
    tok_cap = (k + 1) // 2 + 1
    wins_arr = F.when(F.size(tk) == 0, F.array().cast("array<string>")).otherwise(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(tk)),
                lambda i: F.substring(
                    F.array_join(F.slice(tk, i, tok_cap), " "), 1, k
                ),
            ),
            lambda w: F.length(w) == k,
        )
    )
    # narrow single-file inputs arrive as ONE partition; spread before the
    # interpreted window-construction stage or it runs on one core
    wins = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(wins_arr)).alias("w"),
    )
    df_counts = wins.groupBy("w").agg(F.count("*").alias("df"))
    return (
        wins.join(df_counts, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_windows"), 4).alias("dup_frac"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    word n-grams that occur in no other document — the standard
    boilerplate/template-spam signal (low novelty ⇒ the doc is assembled
    from corpus-common n-grams and is a near-template).

    Returns ``(id_col, n_grams, n_unique, novelty)``.

    Scale design: the exploded stream carries only (gram, id); document
    frequency is a two-phase hash aggregate on the gram (map-side partial
    combine collapses within-partition repeats), and the join back to the
    per-doc stream reuses the same gram partitioning, so Catalyst/AQE plans
    one exchange for both sides. At 100 TB you'd compact the join key to
    ``xxhash64(gram)`` (8 bytes vs the string); kept as strings here so the
    DuckDB oracle recomputes identical counts.
    """
    from .util import ensure_parallelism

    grams = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("g"),
    )
    df_counts = grams.groupBy("g").agg(F.count("*").alias("df"))
    return (
        grams.join(df_counts, "g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .select(
            id_col,
            "n_grams",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_grams"), 4).alias("novelty"),
        )
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one canonical document per near-dup cluster (the min-id member)
    plus every document that appears in no pair — the end-to-end near-dedup
    pass: LSH/SimHash pairs in, deduplicated corpus out. The components
    join is a left join on ids only; unpaired documents pass through
    without shuffling their text."""
    comp = connected_components(pairs, id_a="id_a", id_b="id_b")
    keep = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def segment_dedup(
    docs: DataFrame,
    seg_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document segment-level deduplication (CCNet-style paragraph
    dedup, Wenzek et al. 2020 §3.1, adapted to fixed word windows because
    this corpus has no paragraph breaks): split every document into
    consecutive ``seg_len``-token segments, keep only the corpus-wide FIRST
    occurrence of each distinct segment (ordered by ``(doc_id, seg_idx)``),
    and reassemble the surviving segments per document in original order.

    Returns ``(id_col, n_segs, n_kept, clean_text)`` for every input
    document — documents whose every segment was seen earlier keep the row
    with ``n_kept = 0`` and an empty ``clean_text`` (the downstream length
    filter drops them; dropping silently here would hide the removal rate).

    Scale design (100 TB): the only corpus-sized shuffles carry
    ``(segment, doc_id, seg_idx)``. First-occurrence selection is a single
    two-phase hash aggregate — ``min(struct(doc_id, seg_idx)) GROUP BY
    segment`` — whose map-side partial combine collapses within-partition
    repeats of boilerplate segments BEFORE the exchange, so a segment
    duplicated a billion times contributes one row per map partition, not a
    skewed reduce key (this is why it's an aggregate and not a
    ``row_number() OVER (PARTITION BY segment)`` window, which would sort
    the full duplicate family on one reducer). The kept rows ARE the
    aggregate's output — no join back to the exploded stream. Reassembly is
    a per-doc ``array_sort(collect_list(struct(seg_idx, seg)))`` hash
    aggregate; the final left join restores zero-survivor documents and
    joins on ids only. At 100 TB, map the segment through ``xxhash64``
    before the shuffle (8 bytes vs ~50) and carry the segment text only
    inside the min-struct payload; strings are kept here so the DuckDB
    oracle recomputes identical segments.
    """
    from .util import ensure_parallelism

    toks = tokens(text_col)
    n_segs = F.ceil(F.size(toks) / F.lit(seg_len)).cast("int")
    segs = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda i: F.array_join(
                F.slice(toks, i * seg_len + 1, seg_len), " "
            ),
        )
    )
    base = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col), segs.alias("segs")
    )
    totals = base.select(F.col(id_col), F.size("segs").alias("n_segs"))
    exploded = base.select(
        F.col(id_col), F.posexplode("segs").alias("seg_idx", "seg")
    )
    # corpus-wide first occurrence per distinct segment: min over the total
    # order (doc_id, seg_idx) — deterministic, engine-independent
    firsts = (
        exploded.groupBy("seg")
        .agg(F.min(F.struct(id_col, "seg_idx")).alias("f"))
        .select(
            F.col(f"f.{id_col}").alias(id_col),
            F.col("f.seg_idx").alias("seg_idx"),
            "seg",
        )
    )
    kept = (
        firsts.groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int | None = 16,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with a coarse quantizer, then
    flagging, WITHIN each cluster only, every vector whose cosine
    similarity to a lower-id cluster member reaches ``tau`` (the kept
    representative of each semantic-dup group is its lowest-id member —
    the paper keeps the member farthest from the centroid; lowest-id is
    the deterministic variant the cross-engine oracle can replay).

    Returns ``(id_col, centroid_id, nn_id, max_sim, is_dup)`` for every
    vector: ``nn_id``/``max_sim`` are the most-similar LOWER-id member of
    the same cluster (ties broken toward the lowest id; null when the
    vector is its cluster's lowest id), ``is_dup`` is ``max_sim >= tau``.

    Scale design (10^9 vectors): the all-pairs comparison the naive
    near-dup pass needs is O(n²); clustering bounds it to O(n²/k) by
    comparing only within clusters — with ``k ∝ n`` (the paper's regime;
    ``k=None`` derives ``max(16, ceil(n/64))`` from one count) per-cluster
    occupancy is a constant and total pair volume stays ~linear in n.
    The self-join keys on ``centroid_id``, so vectors shuffle once,
    co-partitioned by cluster; assignment itself is the shared
    :func:`~html_table_spark.operators.similarity.ivf_assign` pure-JVM
    pass (no shuffle), and the exact rescore is the same Arrow-vectorized
    pair-cosine kernel the LSH near-dup pass uses. A mega-cluster (skewed
    quantizer) is handled upstream by Lloyd refinement
    (:func:`~html_table_spark.operators.similarity.ivf_train`) rather
    than salting, because splitting a cluster preserves semantics while
    salting a self-join key does not.
    """
    from .similarity import _pair_cosine_batch, ivf_assign, ivf_centroids

    if k is None:
        n_vecs = embeddings.count()
        k = max(16, -(-n_vecs // 64))
    cents = ivf_centroids(embeddings, k, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        "centroid_id",
    )
    a = assigned.select(
        F.col(id_col).alias("ida"), F.col("v").alias("va"), "centroid_id"
    )
    b = assigned.select(
        F.col(id_col).alias("idb"), F.col("v").alias("vb"), "centroid_id"
    )
    cos = pandas_udf(_pair_cosine_batch, "double")(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("idb") < F.col("ida"))
        .withColumn("sim", cos)
    )
    # argmax by (sim desc, idb asc): max over struct(sim, -idb), engine-
    # independent because the order is total (sim ties resolved by id)
    best = (
        pairs.groupBy("ida")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("idb")).alias("nid"))).alias("m"))
        .select(
            F.col("ida").alias(id_col),
            (-F.col("m.nid")).alias("nn_id"),
            F.col("m.sim").alias("max_sim"),
        )
    )
    return (
        assigned.select(id_col, "centroid_id")
        .join(best, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            "nn_id",
            F.round("max_sim", 4).alias("max_sim"),
            F.coalesce(F.col("max_sim") >= F.lit(tau), F.lit(False)).alias(
                "is_dup"
            ),
        )
    )


def bloom_dedup(
    new_docs: DataFrame,
    historical: DataFrame,
    n_bits: int = 1 << 18,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup of a NEW batch against a HISTORICAL corpus
    via a two-tier Bloom-pruned membership check — the "dedup today's
    crawl against everything already ingested" pass, where the historical
    side is 10^12 documents and must never shuffle against the batch.

    Tier 1 (lossless prune): a Bloom filter over the historical texts —
    ``k`` xxhash64 positions into an ``n_bits`` bitmap — is built with ONE
    two-phase hash aggregate over the historical side (positions →
    ``bit_or`` word masks) and collected as the filter build (bitmap-sized
    — the same driver role as Spark's own runtime-filter / DPP subquery
    broadcasts, NOT a data collect; at 10^12 docs you size ``n_bits`` in
    GBs and this is still ~10^9× smaller than the corpus). The batch
    probes the bitmap as a broadcast literal array, map-side, zero
    shuffle: Bloom filters have NO false negatives, so every true
    duplicate survives the prune — which the value oracle (a plain exact
    EXISTS twin) verifies end-to-end.

    Tier 2 (exact): only Bloom-positive batch rows (true dups + the
    ~``(1-e^(-kn/m))^k`` false-positive sliver) join the historical texts
    — a left-semi join whose batch side is already pruned to ~the dup
    rate, so the expensive exact comparison touches a tiny fraction of
    the batch. Output semantics are therefore EXACT text equality; the
    Bloom tier is invisible in the result.

    Returns ``(id_col, is_dup)`` for every batch row.
    """
    words = bloom_build(historical, n_bits, k, text_col)
    return bloom_probe(new_docs, words, historical, n_bits, k, id_col, text_col)


def bloom_build(
    historical: DataFrame,
    n_bits: int = 1 << 18,
    k: int = 5,
    text_col: str = "text",
) -> list[int]:
    """Tier-1 filter build: the Bloom bitmap over historical texts as a
    list of 64-bit words — ONE two-phase bit_or hash aggregate over the
    historical side, collected once (bitmap-sized, the runtime-filter/DPP
    driver role). Build once, probe many batches (the streaming front-end
    reuses one build across every micro-batch)."""
    from .util import ensure_parallelism

    assert n_bits % 64 == 0
    n_words = (n_bits + 63) // 64
    pos = [
        F.pmod(F.xxhash64(F.col(text_col), F.lit(i)), F.lit(n_bits))
        for i in range(k)
    ]
    hist_words = (
        ensure_parallelism(historical.select(text_col))
        .select(F.explode(F.array(*pos)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in hist_words:
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_probe(
    new_docs: DataFrame,
    words: list[int],
    historical: DataFrame,
    n_bits: int = 1 << 18,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tier-2 probe against a prebuilt bitmap: map-side Bloom filter on
    the batch (zero shuffle), exact left-semi join for the Bloom-positive
    sliver only. Returns ``(id_col, is_dup)`` for every batch row."""
    # one expression parse for the bitmap literal (the lit_vec lesson:
    # per-element F.lit costs a py4j round trip each); referenced as a
    # named column so the probe conjunction doesn't repeat the 16k-word
    # array k times in the expression tree
    bitmap = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    # n_bits is a multiple of 64, so bit-within-word pmod(pmod(h, n_bits),
    # 64) collapses to pmod(h, 64)
    assert n_bits % 64 == 0
    may = " AND ".join(
        f"(element_at(_bm, CAST(pmod(xxhash64({text_col}, {i}), {n_bits})"
        f" DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(pmod(xxhash64({text_col}, {i}), 64)"
        f" AS INT))) != 0"
        for i in range(k)
    )
    batch = new_docs.select(id_col, text_col)
    flagged = (
        batch.withColumn("_bm", bitmap).filter(F.expr(may)).drop("_bm")
    )
    # left_semi keeps at most one output row per flagged row regardless of
    # right-side duplicates, so the historical side needs NO distinct —
    # a corpus-sized dedup shuffle would contradict the whole design
    dups = (
        flagged.join(historical.select(text_col), text_col, "left_semi")
        .distinct()  # sliver-sized: one flag row per distinct (id, text)
        .select(id_col, text_col, F.lit(True).alias("is_dup"))
    )
    # rejoin on (id, text), not id alone: an id collision between two
    # batch rows with different texts must not cross-attach flags
    return batch.join(dups, [id_col, text_col], "left").select(
        id_col, F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )

"""Embedding similarity search over ``array<float>`` columns.

Two tiers (SURVEY-mandated training-pipeline operator):

- **brute-force cosine top-k** — the exactness baseline. The query vector is
  a literal array folded into the plan (broadcast by value); the dot product
  is a JVM ``aggregate`` over ``zip_with`` — whole-stage codegen, no Python,
  no shuffle except the final top-k (TakeOrdered, no global sort).
- **LSH-bucketed (random hyperplane) ANN** — the scale path: sign-bit
  sketches bucket vectors so the per-query probe touches only matching
  buckets. Sketches and pair rescoring are Arrow-vectorized numpy matmuls
  (a Column-expression dot product is an interpreted higher-order function
  — fine for one query vector, pathological for L×m planes or 10⁵+
  candidate pairs). Hyperplanes come from a seeded RNG on the driver, so
  results are deterministic and reproducible cluster-wide.

At 10^9+ vectors the bucketed variant turns a full-scan-per-query into a
partition-pruned probe: persist the bucketed table partitioned by
``bucket`` (or Iceberg-partition it) and the scan prunes to one bucket.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


# Zero-norm guard for cosine denominators: a zero vector would yield
# NaN scores with engine-dependent ordering (Spark sorts NaN greatest,
# DuckDB's twin differs), so clamp the norm to a tiny epsilon — zero
# vectors then score a deterministic 0.0 cosine against everything in
# BOTH engines, and any real embedding (norm ≫ eps) is untouched
# bit-for-bit because greatest() returns the norm itself.
_NORM_EPS = 1e-300


def _safe_norm(a: Column) -> Column:
    return F.greatest(_norm(a), F.lit(_NORM_EPS))


def _sql_double(v: float) -> str:
    v = float(v)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite vector component: {v}")
    # repr() is the exact shortest round-trip form; Spark SQL parses the
    # same grammar (incl. exponents) with the D suffix as a double literal
    return repr(v) + "D"


def lit_vec(values) -> Column:
    """Literal ``array<double>`` built with ONE expression parse.

    ``F.array(*[F.lit(x) for x in vec])`` costs a py4j round trip per
    element — measured ~1 ms each, so a 16×64 centroid set spent ~1.9 s of
    pure driver time just constructing the IVF assignment expression
    (the entire measured cost of the query at bench scale; the executed
    plan is identical either way)."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in values) + ")")


def lit_mat(rows) -> Column:
    """Literal ``array<array<double>>`` (e.g. a centroid or plane matrix)
    in one expression parse — see :func:`lit_vec`."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in row) + ")"
            for row in rows
        )
        + ")"
    )


def cosine_to_query(vec_col: Column, query: list[float]) -> Column:
    q = lit_vec(query)
    qnorm = sum(v * v for v in query) ** 0.5
    return F.round(_dot(vec_col, q) / (_norm(vec_col) * F.lit(qnorm)), 4)


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc. orderBy+limit compiles
    to TakeOrderedAndProject — per-partition heaps, no global sort."""
    scored = embeddings.select(
        F.col(id_col),
        cosine_to_query(F.col(vec_col).cast("array<double>"), query).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signature_bits(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign sketch as an int bucket id (JVM-side)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = lit_vec(plane)
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def _pair_cosine_batch(va, vb):
    """Row-wise cosine over two vector columns, numpy-vectorized per Arrow
    batch."""
    import numpy as np
    import pandas as pd

    if len(va) == 0:
        return pd.Series([], dtype=float)
    A = np.array([np.asarray(v, dtype=np.float64) for v in va])
    B = np.array([np.asarray(v, dtype=np.float64) for v in vb])
    num = (A * B).sum(axis=1)
    den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
    # same zero-norm clamp as _safe_norm: zero vectors score 0.0, not NaN
    return pd.Series(num / np.maximum(den, _NORM_EPS))


def _bucket_batch_fn(tables: list[list[list[float]]]):
    """Vectorized multi-table sketch: ONE numpy matmul per Arrow batch
    computes every (row, plane) dot product, then sign-bits fold into L
    bucket ints. The Column-expression route would interpret L×m×dim
    multiplications per row (higher-order functions skip codegen)."""
    import numpy as np

    planes = np.array(
        [p for tbl in tables for p in tbl], dtype=np.float64
    ).T  # (dim, L*m)
    m = len(tables[0])
    weights = (1 << np.arange(m, dtype=np.int64))

    def fn(vecs):
        import pandas as pd

        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        bits = (mat @ planes) >= 0  # (n, L*m)
        buckets = [
            (bits[:, t * m:(t + 1) * m] @ weights).astype(np.int64)
            for t in range(len(tables))
        ]
        stacked = np.stack(buckets, axis=1)  # (n, L)
        return pd.Series(list(stacked))

    return fn


def lsh_multitable(
    embeddings: DataFrame,
    n_tables: int = 4,
    planes_per_table: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Standard multi-table hyperplane LSH: L independent tables of m planes.

    A near neighbor collides in table t with prob (1-θ/π)^m; the union over
    L tables drives recall up without widening any single probe. Buckets
    come from one Arrow-vectorized matmul (see _bucket_batch_fn); the
    output has one bucket column per table (bucket_0..bucket_{L-1}) — at
    scale, write L bucket-partitioned projections (or one exploded
    (table, bucket, id) index) so a probe scans only L buckets.

    Pass ``dim`` explicitly to skip the one-row discovery job (an
    index-build convenience, not a data-path collect)."""
    from pyspark.sql.functions import pandas_udf

    from .util import ensure_parallelism

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    tables = [
        hyperplanes(dim, planes_per_table, seed + 1000 * t) for t in range(n_tables)
    ]
    udf = pandas_udf(_bucket_batch_fn(tables), "array<long>")
    out = ensure_parallelism(embeddings).withColumn(
        "_buckets", udf(F.col(vec_col).cast("array<double>"))
    )
    for t in range(n_tables):
        out = out.withColumn(f"bucket_{t}", F.element_at("_buckets", t + 1))
    return out.drop("_buckets"), tables


def lsh_multitable_topk(
    bucketed: DataFrame,
    tables: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe each table at the query's exact bucket; union; exact-score the
    candidate set (brute force on a tiny fraction of the data)."""
    cond = None
    for t, planes in enumerate(tables):
        qbucket = 0
        for i, plane in enumerate(planes):
            if sum(p * q for p, q in zip(plane, query)) >= 0:
                qbucket |= 1 << i
        this = F.col(f"bucket_{t}") == qbucket
        cond = this if cond is None else (cond | this)
    return brute_force_topk(bucketed.filter(cond), query, k, id_col, vec_col)


def ivf_centroids(
    embeddings: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the ``k`` lowest-id vectors BY
    RANK act as centroids (a reproducible k-means seeding; swap in Lloyd
    iterations via :func:`ivf_train` for production — the index layout is
    identical). Rank-based selection (orderBy + limit → TakeOrdered, no
    full sort) works on corpora whose ids are sparse or don't start at 0,
    where the round-1 ``id < k`` value filter silently yielded fewer than
    ``k`` centroids. Collecting k vectors is a driver-side index-build
    constant, not a data-path collect."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_train(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement of the deterministic seed centroids:
    assign → per-cluster mean (posexplode + groupBy, all JVM) → repeat.
    Each iteration is one assignment pass + one aggregation shuffle of
    (centroid_id, dim) partial sums — never vectors to the driver; only the
    k refined centroids are collected per iteration (index-build constant).
    Deterministic: seed = ivf_centroids, no randomness anywhere."""
    cents = ivf_centroids(embeddings, k, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(embeddings, cents, id_col, vec_col)
        means = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
            )
            .groupBy("centroid_id", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("dims"))
            .collect()
        )
        new = {int(r.centroid_id): [d.m for d in r.dims] for r in means}
        # empty clusters keep their previous centroid
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties → lowest
    centroid id) — pure JVM array expressions, one pass, no shuffle. At scale,
    write the result partitioned by ``centroid_id`` so a probe scan prunes to
    ``nprobe`` partitions of a 10^9-vector index."""
    from .util import ensure_parallelism

    if not centroids:
        # fail fast on the driver: sequence(1, 0) steps DOWNWARD in Spark
        # ([1, 0]), so the transform below would evaluate element_at(_, 0)
        # and kill every task with 'SQL array indices start at 1'
        raise ValueError("ivf_assign requires at least one centroid")
    embeddings = ensure_parallelism(embeddings)
    v = F.col(vec_col).cast("array<double>")
    # All k centroids enter the plan as ONE matrix literal (+ one norm
    # vector, one id vector): at k=256, dim=1024 the per-element F.lit
    # construction would be ~260k py4j round trips of driver time before
    # the first task launches. Per-entry arithmetic below is byte-for-byte
    # the expression the per-centroid loop built.
    mat = lit_mat([cvec for _, cvec in centroids])
    cnorms = lit_vec(
        [max(sum(x * x for x in cvec) ** 0.5, _NORM_EPS)
         for _, cvec in centroids]
    )
    negcids = F.expr(
        "array(" + ",".join(str(-int(cid)) + "L" for cid, _ in centroids) + ")"
    )
    entries = F.transform(
        F.sequence(F.lit(1), F.lit(len(centroids))),
        # array_max on (sim, -cid) structs == argmax by sim, min cid on ties
        lambda i: F.struct(
            (
                _dot(v, F.element_at(mat, i))
                / (_safe_norm(v) * F.element_at(cnorms, i))
            ).alias("s"),
            F.element_at(negcids, i).alias("negcid"),
        ),
    )
    best = F.array_max(entries)
    return embeddings.withColumn("centroid_id", (-best["negcid"]).cast("long"))


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids against the query driver-side (tiny), scan
    only the ``nprobe`` nearest inverted lists, exact-score the survivors."""
    qnorm = max(sum(x * x for x in query) ** 0.5, _NORM_EPS)

    def cos(cvec: list[float]) -> float:
        cn = max(sum(x * x for x in cvec) ** 0.5, _NORM_EPS)
        return sum(a * b for a, b in zip(cvec, query)) / (cn * qnorm)

    probe = [cid for cid, _ in sorted(centroids, key=lambda c: (-cos(c[1]), c[0]))][:nprobe]
    return brute_force_topk(
        assigned.filter(F.col("centroid_id").isin(probe)), query, k, id_col, vec_col
    )


def with_perturbed_twins(
    embeddings: DataFrame,
    id_offset: int = 100000,
    delta: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Union the corpus with a deterministic near-duplicate twin of every
    vector (first component shifted by ``delta``) — test scaffolding for
    near-dup operators on corpora that lack natural near-dups. The identical
    construction is expressible in ANSI SQL, keeping the oracle exact."""
    v = F.col(vec_col).cast("array<double>")
    twin = embeddings.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.concat(
            F.array(F.element_at(v, 1) + F.lit(delta)),
            F.slice(v, 2, F.size(v) - 1),
        ).alias(vec_col),
    )
    return embeddings.select(F.col(id_col), v.alias(vec_col)).unionByName(twin)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int | None = 8,
    planes_per_table: int | None = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_recall: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, LSH-blocked:

    1. L hyperplane tables bucket every vector (JVM sign-bit sketches);
    2. candidate pairs = same bucket in ANY table (per-table self-join on the
       bucket int — only (id, int) crosses the shuffle, never vectors);
    3. exact cosine on candidates only; keep pairs ≥ ``threshold``.

    Semantics are deliberately *blocking-defined* (pairs the LSH union
    surfaces), so the DuckDB oracle replicates the same plane literals and
    reproduces the result exactly. With ``planes_per_table=4`` a true
    near-dup at cos ≥ 0.9 collides per-table with p ≈ (1-θ/π)^8 ≈ 0.3-0.6,
    so the 8-table union misses a few percent — while 8-bit buckets keep
    the candidate set (and the exact-rescore cost) ~100× smaller than
    4-bit tables would.

    **Scale rule (round-4, measured at the sf1.0 evidence run): bits per
    table must grow with log2(n).** Fixed-width buckets have per-bucket
    occupancy ~ n / 2^bits, and the per-table candidate count grows with
    occupancy SQUARED — the measured 10x corpus took 44x the wall at the
    fixed 8 bits (BENCH/SF1.md). ``planes_per_table=None`` derives
    ``max(8, ceil(log2(n / 4)))`` from one count() (k-constant driver
    action), holding expected occupancy ~4 and candidate volume ~linear
    in n. The count-adaptive mode changes the blocking, so the SQL-oracle
    query pins explicit bits; recall at the auto width is covered by the
    planted-dup pytest (test_embedding_near_dup_auto_bits).

    Wider buckets lower the PER-TABLE collision probability for pairs
    near the threshold, so ``n_tables=None`` closes the loop with the
    standard LSH recall bound: a pair at exactly ``threshold`` collides
    per table with p = (1 - arccos(threshold)/pi)^bits, and L tables
    miss it with (1-p)^L — solve for the L that drives the miss below
    ``1 - target_recall`` (capped at 64 tables; candidates stay ~linear
    in n because each table's volume is occupancy-bounded). Both autos
    together are the 100 TB configuration: bits from n, L from the
    recall contract."""
    if planes_per_table is None:
        n_vecs = embeddings.count()
        planes_per_table = max(8, math.ceil(math.log2(max(n_vecs, 2) / 4)))
    if n_tables is None:
        p_bit = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
        p_table = min(max(p_bit ** planes_per_table, 1e-9), 1.0 - 1e-9)
        n_tables = min(
            64, max(4, math.ceil(math.log(1.0 - target_recall)
                                 / math.log(1.0 - p_table)))
        )
    bucketed, _tables = lsh_multitable(
        embeddings, n_tables=n_tables, planes_per_table=planes_per_table,
        seed=seed, vec_col=vec_col,
    )
    # one exploded (table_idx, bucket) band stream + ONE self-join replaces
    # L separate self-joins + union: a single shuffle of (id, 2 ints)
    banded = bucketed.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("b")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.t", "band.b").cache()
    a = banded.select(F.col(id_col).alias("id_a"), "t", "b")
    b = banded.select(F.col(id_col).alias("id_b"), "t", "b")
    cand = (
        a.join(b, ["t", "b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    # exact rescore is Arrow-vectorized: candidate sets can reach 10-100× the
    # corpus size, and a per-pair interpreted aggregate over dim elements
    # (HOFs skip codegen) would dominate the whole operator
    cos = pandas_udf(_pair_cosine_batch, "double")(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def lsh_bucketed(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Attach LSH bucket ids. Persist/partition the result by ``bucket`` to
    get partition-pruned probes at scale."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    vec = F.col(vec_col).cast("array<double>")
    return embeddings.withColumn("bucket", signature_bits(vec, planes)), planes


def lsh_topk(
    bucketed: DataFrame,
    planes: list[list[float]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN probe: score only vectors whose bucket is within
    ``multiprobe_hamming`` bit flips of the query's bucket (multi-probe LSH
    recovers recall lost to unlucky hyperplane splits)."""
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(p * q for p, q in zip(plane, query)) >= 0:
            qbucket |= 1 << i
    probe = [qbucket]
    if multiprobe_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(len(planes))]
    if multiprobe_hamming >= 2:
        n = len(planes)
        probe += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n)
            for j in range(i + 1, n)
        ]
    candidates = bucketed.filter(F.col("bucket").isin(probe))
    return brute_force_topk(candidates, query, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory-bandwidth tier of ANN serving
# ---------------------------------------------------------------------------

def _quantize_py(vec: list[float]) -> list[int]:
    """Driver-side twin of the JVM quantization expression (used for the
    query vector): symmetric per-vector int8, q_i = floor(v_i/scale + 0.5)
    with scale = max(|v|)/127 (1e-12 floor). Python floats ARE IEEE
    doubles, so this is bit-identical to the Column/SQL form."""
    mx = max((abs(float(x)) for x in vec), default=0.0)
    scale = max(mx, 1e-12) / 127.0
    return [math.floor(float(x) / scale + 0.5) for x in vec]


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale =
    max(|component|)/127, q_i = floor(v_i/scale + 0.5). Pure JVM array
    expressions (whole-stage codegen, no Python).

    At serving scale this is the point: an int8 store is 4× smaller than
    float32, so a 10^9-vector scan moves 4× fewer bytes over the memory
    bus / network — and scan throughput on a bandwidth-bound cluster is
    proportional to bytes moved. Cosine needs no dequantization at all:
    the per-vector scales cancel, so quantized cosine is just the cosine
    of the integer arrays (exact integer dot products — MORE reproducible
    cross-engine than the float path, since int sums are order-exact).

    Returns ``(id_col, v (original double array), qvec array<int>)``.
    """
    base = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    mx = F.aggregate(
        F.col("v"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    return (
        base
        .withColumn("scale", F.greatest(mx, F.lit(1e-12)) / F.lit(127.0))
        .withColumn(
            "qvec",
            F.transform(
                F.col("v"),
                lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
            ),
        )
        .select(id_col, "v", "qvec")
    )


def quantized_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage quantized ANN: (1) scan in int8 — quantized cosine against
    the quantized query over the 4×-smaller representation; (2) exact
    full-precision rescore of only the top ``k * oversample`` candidates,
    final top-``k`` by true cosine.

    Candidate selection is deterministic cross-engine: the quantized
    cosine's dot product and norms are sums of small exact integers
    (|q_i| ≤ 127, so products ≤ 16129 and any realistic dim keeps the sum
    far inside double's 2^53 exact-integer range) — summation order cannot
    change the value, and the final sqrt/divide is one correctly-rounded
    IEEE op in every engine. Ties break on id.

    Both stages are TakeOrderedAndProject (per-partition heaps, no global
    sort); the full-precision vector rides along with the candidate rows,
    so the rescore needs no join back to the store.

    Returns ``(id_col, qcos, cosine)`` ordered by true cosine desc.
    """
    q = _quantize_py(query)
    qlit = lit_vec([float(x) for x in q])  # exact: small ints as doubles
    qnorm = math.sqrt(sum(x * x for x in q))
    qz = quantize_int8(embeddings, id_col, vec_col)
    qd = F.col("qvec").cast("array<double>")
    qcos = _dot(qd, qlit) / (_norm(qd) * F.lit(qnorm))
    candidates = (
        qz.withColumn("qcos", qcos)
        .orderBy(F.col("qcos").desc(), F.col(id_col).asc())
        .limit(k * oversample)
    )
    rescored = candidates.select(
        F.col(id_col),
        F.round(F.col("qcos"), 4).alias("qcos"),
        cosine_to_query(F.col("v"), query).alias("cosine"),
    )
    return rescored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# product quantization (PQ) — the code-book compression tier of ANN serving
# ---------------------------------------------------------------------------

def _sqdist(a: Column, b: Column) -> Column:
    """Sequential-sum squared L2 between two array columns — term order is
    left-to-right, matching both the Python twin and DuckDB's
    list_aggregate, so the value is bit-identical cross-engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sqdist_py(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        t = float(x) - float(y)
        s += t * t
    return s


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], int]:
    """Deterministic PQ codebooks: split the dimension into ``m`` equal
    subspaces and use the ``ksub`` lowest-id vectors' sub-vectors as each
    subspace's code words (the same rank-deterministic coarse-training
    stand-in as :func:`ivf_centroids` — a k-means refinement slots in
    without changing any downstream plan). The collect is ksub-constant.

    Returns ``(books, dsub)`` where ``books[j][c]`` is code word ``c`` of
    subspace ``j`` and ``dsub = dim // m``.
    """
    rows = embeddings.orderBy(id_col).limit(ksub).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = [[v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)]
    return books, dsub


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    dsub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte codes: per subspace, the index
    of the nearest code word (squared L2, ties to the lowest index). Pure
    JVM array expressions — at 10^9 vectors this replaces a dim×float32
    payload with m bytes (128× smaller at dim=64, m=4... 64 bytes→4), and
    the scan that matters reads only the code columns.

    Returns ``(id_col, v, code_0..code_{m-1})`` with codes 0-based.
    """
    v = F.col(vec_col).cast("array<double>")
    out = embeddings.select(F.col(id_col), v.alias("v"))
    for j, book in enumerate(books):
        sub = F.slice(F.col("v"), j * dsub + 1, dsub)
        dists = F.array(*[_sqdist(sub, lit_vec(c)) for c in book])
        out = out.withColumn(
            f"code_{j}",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
    return out


def pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    oversample: int = 4,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC, Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
    query stays full-precision; per subspace a ``ksub``-entry table of
    squared distances from the query sub-vector to every code word is
    precomputed on the driver (m×ksub doubles — constant), and each
    database vector's approximate distance is just ``m`` table lookups by
    its codes. Candidates = top ``k*oversample`` by ADC distance, then an
    exact full-precision cosine rescore picks the final top-``k``.

    Cross-engine determinism: every distance is a sequential left-to-right
    sum of the same doubles (encode argmin, driver tables, and the m-term
    ADC add all mirror the oracle's evaluation order bit-for-bit).

    Returns ``(id_col, approx_d2, cosine)`` ordered by true cosine desc.
    """
    books, dsub = pq_codebooks(embeddings, m, ksub, id_col, vec_col)
    q = [float(x) for x in query]
    dtab = [
        [_sqdist_py(q[j * dsub : (j + 1) * dsub], c) for c in book]
        for j, book in enumerate(books)
    ]
    enc = pq_encode(embeddings, books, dsub, id_col, vec_col)
    adc = F.lit(0.0)
    for j in range(m):
        adc = adc + F.element_at(lit_vec(dtab[j]), F.col(f"code_{j}") + 1)
    cand = (
        enc.withColumn("d2", adc)
        .orderBy(F.col("d2").asc(), F.col(id_col).asc())
        .limit(k * oversample)
    )
    out = cand.select(
        F.col(id_col),
        F.round(F.col("d2"), 4).alias("approx_d2"),
        cosine_to_query(F.col("v"), query).alias("cosine"),
    )
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], int]:
    """Distributed per-subspace Lloyd refinement of the deterministic PQ
    codebooks (the k-means step real PQ training runs, Jégou et al. §III):
    encode → per-(subspace, code) sub-vector mean → repeat.

    Each iteration is one encode pass (pure JVM expressions) plus ONE
    aggregation shuffle keyed (subspace, code, dim) carrying partial sums —
    all m subspaces train in the same job, and only the m×ksub refined code
    words ever reach the driver (index-build constant, like
    :func:`ivf_train`). Deterministic: seeds are the rank-deterministic
    :func:`pq_codebooks`; empty codes keep their previous word.

    Returns ``(books, dsub)`` in the same shape :func:`pq_encode` and
    :func:`pq_topk` consume.
    """
    books, dsub = pq_codebooks(embeddings, m, ksub, id_col, vec_col)
    for _ in range(iters):
        enc = pq_encode(embeddings, books, dsub, id_col, vec_col)
        # one row per (subspace j, code, intra-subspace dim i, value)
        parts = []
        for j in range(m):
            parts.append(
                enc.select(
                    F.lit(j).alias("j"),
                    F.col(f"code_{j}").alias("code"),
                    F.posexplode(
                        F.slice(F.col("v"), j * dsub + 1, dsub)
                    ).alias("i", "x"),
                )
            )
        allsub = parts[0]
        for p in parts[1:]:
            allsub = allsub.unionByName(p)
        means = (
            allsub.groupBy("j", "code", "i")
            .agg(F.avg("x").alias("mval"))
            .groupBy("j", "code")
            .agg(F.array_sort(F.collect_list(F.struct("i", "mval"))).alias("dims"))
            .collect()
        )
        new = {(int(r.j), int(r.code)): [d.mval for d in r.dims] for r in means}
        books = [
            [new.get((j, c), books[j][c]) for c in range(ksub)]
            for j in range(m)
        ]
    return books, dsub


def ivf_topk_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batched ANN join: top-``k`` neighbors for EVERY query row at once —
    the realistic retrieval shape (embedding-dedup candidate generation,
    RAG batch lookup) where the single-query probe would pay one job per
    query. Returns ``(query_id_col, id_col, cosine, rank)``.

    Both sides go through the shared rank-deterministic coarse quantizer:
    the index is assigned to its nearest centroid (pure-JVM, no shuffle),
    each QUERY picks its ``nprobe`` nearest centroids via the same
    centroid-literal expressions (``array_sort`` over scored structs —
    ties toward the lower centroid id, identical to ``ivf_assign``), and
    the candidate set is one equi-join on ``centroid_id``. The query side
    is broadcast (a batch of queries is ~rows, the index is ~10^9), so
    the index shuffles ZERO times: candidates stream out of the scan
    partition-pruned by the join's centroid key. Exact rescore is the
    Arrow pair-cosine kernel. Per-query top-k is a ``row_number`` window
    that Spark rewrites into a two-phase ``WindowGroupLimit`` (asserted
    in the plan audit): a PARTIAL group limit runs map-side before the
    exchange, so the one shuffle carries at most ``k`` rows per query
    per input partition — candidate volume never reaches the wire.

    Self-matches (a query that is also an index member) are kept: rank 1
    at cosine 1.0 is the correctness signal the planted-twin tests use;
    callers filter ``cosine < 1`` when they want strict neighbors.
    """
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_iv"),
        "centroid_id",
    )
    cmat = lit_mat([vec for _, vec in cents])
    cids = F.expr(
        "array(" + ",".join(str(int(cid)) for cid, _ in cents) + ")"
    )
    # centroid norms are compile-time constants (the ivf_assign pattern):
    # Python doubles are IEEE754 like the JVM's, so the quotient is
    # bit-identical to an executor-side _norm(c)
    cnorms = lit_vec(
        [max(sum(x * x for x in vec) ** 0.5, _NORM_EPS)
         for _, vec in cents]
    )
    qv = F.col(vec_col).cast("array<double>")
    # score every centroid, sort by (-cos, cid), take nprobe — one JVM
    # expression, mirroring ivf_assign's tie order exactly; the query
    # norm is bound ONCE per row (_qn) instead of once per centroid
    scored = F.transform(
        F.sequence(F.lit(1), F.lit(len(cents))),
        lambda i: F.struct(
            (
                -_dot(F.col("_qv"), F.element_at(cmat, i))
                / (F.col("_qn") * F.element_at(cnorms, i))
            ).alias("negs"),
            F.element_at(cids, i).alias("cid"),
        ),
    )
    probes = F.slice(F.array_sort(scored), 1, nprobe)
    qside = (
        queries.select(
            F.col(id_col).alias(query_id_col), qv.alias("_qv")
        )
        .withColumn("_qn", _safe_norm(F.col("_qv")))
        .select(
            query_id_col, "_qv", F.explode(probes).alias("_p")
        )
        .select(query_id_col, "_qv", F.col("_p.cid").alias("centroid_id"))
    )
    cos = pandas_udf(_pair_cosine_batch, "double")(F.col("_qv"), F.col("_iv"))
    cand = (
        assigned.join(F.broadcast(qside), "centroid_id")
        .withColumn("cosine", cos)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("cosine", 4).alias("cosine"),
            "rank",
        )
    )

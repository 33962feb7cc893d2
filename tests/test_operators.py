"""Operator tests: tabular query surface, text analysis, dedup, similarity,
media plumbing — small deterministic inputs, hand-computable expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from html_table_spark.functions import text as tx
from html_table_spark.operators import dedup, similarity
from html_table_spark.operators.media import (
    MEDIA_SCHEMA,
    extract_media_features,
    synthesize_media_table,
)
from html_table_spark.operators.tabular import Tabular, extracted_cells


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(name="Abdoulaye", nombre=15, sexe="M", annee=2004, idx=0),
        Row(name="Abel", nombre=14, sexe="M", annee=2004, idx=1),
        Row(name="Abiga", nombre=6, sexe="F", annee=2004, idx=2),
        Row(name="Aboubacar", nombre=8, sexe="M", annee=2004, idx=3),
        Row(name="Aboubakar", nombre=6, sexe="M", annee=2004, idx=4),
    ]
    return spark.createDataFrame(rows)


# --- §2.9 tabular verbs (league/csv parity semantics) ----------------------


def test_tabular_first_nth_slice(people):
    t = Tabular(people, order_by=["idx"])
    assert t.first()["name"] == "Abdoulaye"
    assert t.nth(1)["name"] == "Abel"
    assert t.nth(99) is None
    sliced = [r.name for r in t.slice(1, 2).collect()]
    assert sliced == ["Abel", "Abiga"]


def test_tabular_filter_sorted_count(people):
    t = Tabular(people, order_by=["idx"])
    assert t.count() == 5
    males = t.filter(F.col("sexe") == "M")
    assert males.count() == 4
    top = males.sorted(F.col("nombre").desc(), "idx").first()
    assert top["name"] == "Abdoulaye"
    assert t.filter(F.col("sexe") == "X").first() == []  # empty → [] (league/csv)


def test_tabular_fetch_pairs_first_wins(people):
    t = Tabular(people, order_by=["idx"])
    pairs = {r.key: r.value for r in t.fetch_pairs("nombre", "name").collect()}
    # nombre=6 appears twice (Abiga idx=2, Aboubakar idx=4) → first wins
    assert pairs[6] == "Abiga"
    assert pairs[15] == "Abdoulaye"


def test_tabular_reduce_exists_header(people):
    t = Tabular(people, order_by=["idx"])
    assert t.reduce(F.sum("nombre").alias("s")).collect()[0].s == 49
    assert t.exists(F.col("name") == "Abel")
    assert not t.exists(F.col("name") == "Nobody")
    assert t.header() == ["name", "nombre", "sexe", "annee", "idx"]


# --- text analysis -----------------------------------------------------------


def test_text_functions(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id="a", text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id="b", text=""),
            Row(doc_id="c", text="zzz!!! ???"),
        ]
    )
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            tx.token_count("text").alias("toks"),
            tx.lang_id("text").alias("lang"),
            tx.fingerprint("text").alias("fp"),
            tx.quality_score("text").alias("q"),
            tx.stopword_ratio("text").alias("sr"),
        ).collect()
    }
    assert got["a"].toks == 9
    assert got["b"].toks == 0
    assert got["a"].lang == "en"
    assert got["c"].lang == "unk"
    assert got["a"].sr == pytest.approx(2 / 9)
    assert len(got["a"].fp) == 32
    assert 0.0 <= got["c"].q < got["a"].q <= 1.0


def test_shingles(spark):
    df = spark.createDataFrame([Row(text="a b c d"), Row(text="a b")])
    got = [r[0] for r in df.select(tx.shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than n → whole text


# --- dedup -------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        Row(doc_id="d1", text="alpha bravo charlie delta echo foxtrot golf hotel"),
        Row(doc_id="d2", text="alpha  bravo charlie delta echo foxtrot golf hotel"),  # ws variant
        Row(doc_id="d3", text="alpha bravo charlie delta echo foxtrot golf INDIA"),  # near-dup
        Row(doc_id="d4", text="totally different words entirely unrelated content here now"),
        Row(doc_id="d5", text="alpha bravo charlie delta echo foxtrot golf hotel"),  # exact
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(dup_docs):
    groups = dedup.exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 3  # d1, d2 (ws-normalized), d5
    assert groups[0].canonical_id == "d1"
    kept = {r.doc_id for r in dedup.distinct_by_content(dup_docs).collect()}
    assert kept == {"d1", "d3", "d4"}


def test_minhash_lsh_pipeline(dup_docs):
    sigs = dedup.minhash_signature(dup_docs, num_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # exact dups share all bands; near-dup d3 shares most shingles with d1/d2/d5
    assert ("d1", "d2") in got and ("d1", "d5") in got
    assert not any("d4" in p for pair in got for p in pair)
    jac = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard(dup_docs, pairs).collect()}
    assert jac[("d1", "d5")] == 1.0
    assert all(0.0 <= v <= 1.0 for v in jac.values())


def test_simhash_near_dups(dup_docs):
    got = dedup.simhash_near_dups(dup_docs, max_hamming=10).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert ("d1", "d5") in pairs  # identical text → hamming 0
    assert not any("d4" in p for pair in pairs for p in pair)


# --- similarity search -------------------------------------------------------


def test_brute_force_topk(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    got = similarity.brute_force_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in got] == [0, 1]
    assert got[0].cosine == 1.0


def test_lsh_recalls_true_near_neighbors(spark, sf_dir):
    """Hyperplane LSH guarantees recall only for genuinely-near vectors
    (collision prob (1-θ/π)^m per table). The synthetic corpus has no pairs
    above cosine ~0.35, so we inject perturbed near-copies of the query
    (cos > 0.95) and assert the multi-table probe recovers them."""
    import random

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    rng = random.Random(99)
    near = [
        Row(
            vec_id=100000 + i,
            embedding=[v + rng.gauss(0, 0.02) for v in query],
            label=0,
        )
        for i in range(5)
    ]
    corpus = emb.unionByName(spark.createDataFrame(near, emb.schema))
    exact = [r.vec_id for r in similarity.brute_force_topk(corpus, query, k=6).collect()]
    assert set(exact) == {0, 100000, 100001, 100002, 100003, 100004}
    bucketed, tables = similarity.lsh_multitable(corpus, n_tables=4, planes_per_table=8)
    approx = [
        r.vec_id
        for r in similarity.lsh_multitable_topk(bucketed, tables, query, k=6).collect()
    ]
    assert approx[0] == 0  # the query vector itself
    assert len(set(exact) & set(approx)) >= 5  # ≥5/6 recall on true near-dups


def test_lsh_single_table_multiprobe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    bucketed, planes = similarity.lsh_bucketed(emb, n_planes=6)
    got = similarity.lsh_topk(
        bucketed, planes, query, k=5, multiprobe_hamming=2
    ).collect()
    # the probe always contains the query's own bucket → vec 0 is found
    assert got[0].vec_id == 0 and got[0].cosine == 1.0


# --- media plumbing ----------------------------------------------------------


def test_media_features_deterministic(spark):
    from html_table_spark.operators.media import refs_for_tier

    video = refs_for_tier("video-opaque", 1)[0]
    png = refs_for_tier("png-header", 1)[0]
    refs = [video, png] + refs_for_tier("opaque", 4)
    media = spark.createDataFrame(synthesize_media_table(refs), MEDIA_SCHEMA)
    feats = extract_media_features(media).collect()
    assert {r.media_ref for r in feats} == set(refs)
    by_ref = {r.media_ref: r for r in feats}
    assert all(r.status == "ok" for r in feats)
    assert len(by_ref[png].feature) == 16
    assert by_ref[video].n_frames > 1  # video mime → fake multi-frame
    assert by_ref[png].n_frames == 1
    # determinism: same refs → same features
    feats2 = extract_media_features(media).collect()
    assert {r.media_ref: r.feature for r in feats2} == {
        r.media_ref: r.feature for r in feats
    }


def test_media_real_codec_path_stubbed(spark):
    from html_table_spark.operators.media import refs_for_tier

    refs = refs_for_tier("png-header", 1)
    media = spark.createDataFrame(synthesize_media_table(refs), MEDIA_SCHEMA)
    rows = extract_media_features(media, use_real_codecs=True).collect()
    assert rows[0].status.startswith("error: inter-frame video codecs")


def test_image_header_parsers():
    """Round-3: native PNG/GIF/JPEG dimension decode from public format
    specs (ISO/IEC 15948 IHDR, GIF89a logical screen, 10918-1 SOFn)."""
    import hashlib as _hl

    from html_table_spark.operators.media import (
        _decode_meta,
        parse_image_header,
        refs_for_tier,
    )

    header_refs = {
        "png-header": ("image/png", refs_for_tier("png-header", 1)[0]),
        "gif-header": ("image/gif", refs_for_tier("gif-header", 1)[0]),
        "jpeg-header": ("image/jpeg", refs_for_tier("jpeg-header", 1)[0]),
    }
    full_refs = [refs_for_tier("png-rgb", 1)[0], refs_for_tier("png-rgba", 1)[0]]
    opaque_refs = [refs_for_tier("video-opaque", 1)[0], refs_for_tier("opaque", 1)[0]]
    all_refs = [r for _, r in header_refs.values()] + full_refs + opaque_refs
    rows = {r["media_ref"]: r for r in synthesize_media_table(all_refs)}
    for expected_mime, ref in header_refs.values():
        digest = _hl.sha256(f"42:{ref}".encode()).digest()
        w, h = 32 + digest[0], 32 + digest[1]
        got = parse_image_header(rows[ref]["payload"])
        assert got == (expected_mime, w, h), ref
        # the default decode path surfaces the REAL dims, 1 frame
        dw, dh, dn, _ = _decode_meta(rows[ref]["payload"], rows[ref]["mime"])
        assert (dw, dh, dn) == (w, h, 1)
    # the COMPLETE-PNG tiers (round-4): full-pixel decode — real dims
    # from the body, real-pixel feature marker set
    for full_ref in full_refs:
        mime, w, h = parse_image_header(rows[full_ref]["payload"])
        dw, dh, dn, feat = _decode_meta(rows[full_ref]["payload"], "image/png")
        assert mime == "image/png" and (dw, dh, dn) == (w, h, 1)
        assert feat[15] == 1.0, full_ref
    # opaque payloads: no magic → None → fake fallback
    for opaque_ref in opaque_refs:
        assert parse_image_header(rows[opaque_ref]["payload"]) is None
    assert parse_image_header(b"") is None
    assert parse_image_header(None) is None
    # truncated/corrupt headers fall back instead of raising
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"XXXX" + b"\x00" * 8) is None
    assert parse_image_header(b"GIF89a\x10") is None
    assert parse_image_header(b"GIF89a\x00\x00\x00\x00" + b"x") is None  # 0x0 dims
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF
    assert parse_image_header(b"\xff\xd8\x00\x00") is None  # garbage marker
    assert parse_image_header(b"\xff\xd8\xff\xc0\x00\x01") is None  # bad seglen
    # JPEG with fill bytes and a DHT before SOF0 still resolves
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    sof = b"\xff\xff\xff\xc0" + (17).to_bytes(2, "big") + bytes([8]) + (99).to_bytes(2, "big") + (77).to_bytes(2, "big") + bytes(10)
    assert parse_image_header(b"\xff\xd8" + dht + sof) == ("image/jpeg", 77, 99)


# --- extracted_cells relational view ----------------------------------------


def test_extracted_cells_view(spark):
    from html_table_spark.config import ParserConfig
    from html_table_spark.corpus import fixture_documents
    from html_table_spark.operators.extract import extract_tables
    from html_table_spark.sources.documents import DOCUMENTS_SCHEMA

    rows = [r for r in fixture_documents() if r["doc_id"] == "F01"]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    cells = extracted_cells(extract_tables(docs, ParserConfig()))
    counts = {r.kind: r.cnt for r in cells.groupBy("kind").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"header": 4, "cell": 16}


# --- IVF ANN + embedding near-dup + skew-aware relational ops --------------


@pytest.fixture(scope="module")
def vectors(spark):
    import random

    rng = random.Random(3)
    rows = [
        Row(vec_id=i, embedding=[rng.gauss(0.0, 1.0) for _ in range(16)])
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


def test_ivf_probe_matches_brute_force_on_probed_lists(vectors):
    cents = similarity.ivf_centroids(vectors, k=4)
    assert [c[0] for c in cents] == [0, 1, 2, 3]
    assigned = similarity.ivf_assign(vectors, cents)
    # every vector gets exactly one centroid in range
    cids = {r.centroid_id for r in assigned.select("centroid_id").collect()}
    assert cids <= {0, 1, 2, 3}
    # a centroid vector must be assigned to itself (cosine 1 with itself)
    self_row = assigned.filter(F.col("vec_id") == 2).first()
    assert self_row.centroid_id == 2
    q = [float(x) for x in vectors.filter("vec_id = 5").first().embedding]
    top = similarity.ivf_topk(assigned, cents, q, k=3, nprobe=4).collect()
    # nprobe == k_centroids → probe covers everything → equals brute force
    brute = similarity.brute_force_topk(vectors, q, k=3).collect()
    assert [(r.vec_id, r.cosine) for r in top] == [
        (r.vec_id, r.cosine) for r in brute
    ]
    assert top[0].vec_id == 5 and top[0].cosine == 1.0


def test_embedding_near_dup_finds_perturbed_twins(vectors):
    both = similarity.with_perturbed_twins(vectors, id_offset=1000, delta=0.3)
    assert both.count() == 80
    pairs = similarity.embedding_near_dup_pairs(
        both, threshold=0.9, n_tables=8, planes_per_table=4, seed=7
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # every found pair is an (original, twin) pair and cosine is high
    for r in pairs:
        assert r.id_b == r.id_a + 1000
        assert r.cosine >= 0.9
    # LSH with 8 tables catches nearly all twins on 40 vectors
    assert len(found) >= 35


def test_embedding_near_dup_auto_bits(spark):
    """Round-4 scale rule: planes_per_table=None derives bucket width from
    log2(n) so per-bucket occupancy (hence candidate volume per vector)
    stays bounded as the corpus grows — the sf1.0 evidence run measured
    44x wall at 10x data with FIXED 8-bit buckets (BENCH/SF1.md). Checks:
    (a) auto == the explicit width it should derive, (b) planted
    very-near twins (cos ~ 0.9998) are all recovered at the wider auto
    buckets on a corpus big enough that auto > 8 bits."""
    import math as _math
    import random as _random

    rng = _random.Random(11)
    n, dim = 3000, 16
    rows = [
        Row(vec_id=i, embedding=[rng.gauss(0.0, 1.0) for _ in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    both = similarity.with_perturbed_twins(
        df.filter(F.col("vec_id") < 25), id_offset=100000, delta=0.01
    ).union(df.filter(F.col("vec_id") >= 25))
    total = both.count()
    assert total == n + 25
    expected_bits = max(8, _math.ceil(_math.log2(total / 4)))
    assert expected_bits > 8  # the corpus actually exercises adaptivity
    auto = similarity.embedding_near_dup_pairs(
        both, threshold=0.99, planes_per_table=None, seed=7
    )
    explicit = similarity.embedding_near_dup_pairs(
        both, threshold=0.99, planes_per_table=expected_bits, seed=7
    )
    got = {(r.id_a, r.id_b) for r in auto.collect()}
    assert got == {(r.id_a, r.id_b) for r in explicit.collect()}
    twins = {(i, i + 100000) for i in range(25)}
    assert twins <= got  # recall 1.0 on delta=0.01 twins
    # no junk: every surviving pair really clears the threshold, and the
    # only cos>=0.99 pairs in a random gaussian corpus are the twins
    assert got == twins


def test_embedding_near_dup_full_auto_recall(spark):
    """The complete LSH scale configuration: bits from log2(n) AND
    n_tables from the recall bound (L tables miss a threshold-level pair
    with (1-p_bit^bits)^L <= 1-target_recall). Planted moderate twins
    (delta=0.5, cosines scattered around the 0.85 threshold) must be
    recovered at >= 90% of the exact ground truth — the property the
    bits-only auto trades away and the L auto buys back."""
    import math as _math
    import random as _random

    import numpy as np

    rng = _random.Random(5)
    n, dim, n_twins = 3000, 16, 40
    rows = [
        Row(vec_id=i, embedding=[rng.gauss(0.0, 1.0) for _ in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    corpus = similarity.with_perturbed_twins(
        df.filter(F.col("vec_id") < n_twins), id_offset=100000, delta=0.5
    ).union(df.filter(F.col("vec_id") >= n_twins))
    # exact ground truth over the planted pairs only (other random pairs
    # cannot reach cos 0.85 in a gaussian corpus)
    vecs = {
        r.vec_id: np.array(r.embedding)
        for r in corpus.filter(
            (F.col("vec_id") < n_twins) | (F.col("vec_id") >= 100000)
        ).collect()
    }
    truth = set()
    for i in range(n_twins):
        a, b = vecs[i], vecs[i + 100000]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        if cos >= 0.85:
            truth.add((i, i + 100000))
    assert len(truth) >= 10  # the fixture actually plants threshold-level pairs
    got = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            corpus, threshold=0.85, n_tables=None, planes_per_table=None,
            seed=7,
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(truth)} true pairs"
    # derived L matches the bound it claims to solve
    bits = max(8, _math.ceil(_math.log2((n + n_twins) / 4)))
    p_tab = (1 - _math.acos(0.85) / _math.pi) ** bits
    expected_l = min(64, max(4, _math.ceil(_math.log(0.05) / _math.log(1 - p_tab))))
    assert (1 - p_tab) ** expected_l <= 0.05 + 1e-9


def test_salted_agg_equals_plain_groupby(spark):
    from html_table_spark.operators.relational import salted_agg

    rows = [Row(k="hot" if i % 10 else "cold", i=i, v=float(i)) for i in range(200)]
    df = spark.createDataFrame(rows)
    got = {
        r.k: (r.n, round(r.s, 6), r.mx)
        for r in salted_agg(
            df, ["k"], {"n": ("count", "i"), "s": ("sum", "v"), "mx": ("max", "v")},
            entropy=F.col("i"), buckets=7,
        ).collect()
    }
    want = {
        r.k: (r.n, round(r.s, 6), r.mx)
        for r in df.groupBy("k")
        .agg(F.count("i").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_replicated_skew_join_equals_plain_join(spark):
    from html_table_spark.operators.relational import replicated_skew_join

    fact = spark.createDataFrame(
        [Row(k="a" if i % 4 else "b", i=i, v=float(i)) for i in range(100)]
    )
    dim = spark.createDataFrame([Row(k="a", w=2.0), Row(k="b", w=3.0)])
    got = (
        replicated_skew_join(fact, dim, "k", F.col("i"), buckets=5)
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .collect()
    )
    want = (
        fact.join(dim, "k")
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in want}


def test_bpe_and_alpha_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id="d", text="Hello, world! x2 -- ok")])
    row = df.select(
        tx.token_count("text").alias("ws"),
        tx.bpe_token_count("text").alias("bpe"),
        tx.alpha_token_count("text").alias("alpha"),
    ).first()
    # ws: Hello, world! x2 -- ok → 5
    # bpe: Hello , world ! x2 - - ok → 8
    # alpha: Hello world x ok → 4
    assert (row.ws, row.bpe, row.alpha) == (5, 8, 4)


def test_as_of_join_latest_prior_row(spark):
    import datetime as dt

    from html_table_spark.operators.relational import as_of_join

    T = lambda h: dt.datetime(2026, 1, 1, h, 0, 0)
    left = spark.createDataFrame(
        [Row(eid=1, k="u", lts=T(5)), Row(eid=2, k="u", lts=T(9)),
         Row(eid=3, k="v", lts=T(1))]
    )
    right = spark.createDataFrame(
        [Row(k="u", rts=T(4), val="a"), Row(k="u", rts=T(9), val="b"),
         Row(k="v", rts=T(2), val="c")]
    )
    out = {
        r.eid: r.val
        for r in as_of_join(left, right, "k", "lts", "rts", ["val"]).collect()
    }
    # eid=1: only rts=4 ≤ 5 → a; eid=2: rts=9 == lts → inclusive → b;
    # eid=3: no right row ≤ 1am → dropped (inner semantics)
    assert out == {1: "a", 2: "b"}


def test_sessionize_gap_boundaries(spark):
    import datetime as dt

    from html_table_spark.operators.relational import sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)
    ev = spark.createDataFrame(
        [Row(event_id=i, user_id="u", ts=t)
         for i, t in enumerate([mins(0), mins(29), mins(60), mins(90), mins(121)])]
    )
    out = {r.event_id: r.session_idx
           for r in sessionize(ev, key="user_id", gap="30 minutes").collect()}
    # gaps: 29 (same), 31 (new), 30 (same — strictly greater starts new),
    # 31 (new)
    assert out == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3}


def test_as_of_join_null_payload_at_true_match(spark):
    """A genuine NULL payload value at the as-of match must be returned as
    NULL, not replaced by an older non-null value."""
    import datetime as dt

    from html_table_spark.operators.relational import as_of_join

    T = lambda h: dt.datetime(2026, 1, 1, h)
    left = spark.createDataFrame([Row(eid=1, k="u", lts=T(10))])
    right = spark.createDataFrame(
        [Row(k="u", rts=T(1), val="old"), Row(k="u", rts=T(5), val=None)]
    )
    out = as_of_join(left, right, "k", "lts", "rts", ["val"]).collect()
    assert len(out) == 1 and out[0].val is None


def test_lang_id_ngram_and_repetition(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id="en", text="the cat and the dog went to the house of things"),
            Row(doc_id="de", text="der hund und die katze sind schon in der schule"),
            Row(doc_id="rep", text="spam spam spam spam ham"),
            Row(doc_id="empty", text=""),
        ]
    )
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            tx.lang_id_ngram("text").alias("lang"),
            tx.dup_token_ratio("text").alias("dup"),
            tx.top_token_ratio("text").alias("top"),
        ).collect()
    }
    assert got["en"].lang == "en"
    assert got["de"].lang == "de"
    assert got["rep"].dup == pytest.approx(3 / 5)   # 5 tokens, 2 distinct
    assert got["rep"].top == pytest.approx(4 / 5)   # 'spam' ×4
    assert got["empty"].dup == 0.0 and got["empty"].top == 0.0


def test_header_php_array_key_semantics(spark):
    """Reference validates header VALUES only (Parser.php:118); negative and
    string keys are legal and null-fill (combineArray `?? null`)."""
    from html_table_spark.config import ParserConfig
    from html_table_spark.semantics import parse_document

    html = "<table><tr><td>a</td><td>b</td></tr></table>"
    cfg = ParserConfig().with_table_header({1: "second", -5: "neg", "x": "strkey"})
    t = parse_document(html, cfg)[0]
    assert t.header == ["second", "neg", "strkey"]
    assert t.row_texts() == [["b", None, None]]


def test_user_header_php_numeric_string_keys():
    """PHP auto-casts canonical integer-string array keys to int BEFORE
    tableHeader sees them, so ['1' => 'x'] selects source offset 1; '01'
    and '+1' stay string keys and null-fill (round-2 ADVICE parity fix)."""
    from html_table_spark.config import ParserConfig
    from html_table_spark.semantics import parse_document

    html = "<table><tr><td>a</td><td>b</td><td>c</td></tr></table>"
    cfg = ParserConfig().with_table_header(
        {"1": "cast_int", "02": "padded", "+2": "plus", "-0": "negzero", 0: "real"}
    )
    t = parse_document(html, cfg)[0]
    assert t.header == ["cast_int", "padded", "plus", "negzero", "real"]
    # '1' → offset 1 ('b'); '02'/'+2'/'-0' are not canonical → null-fill
    assert t.row_texts() == [["b", None, None, None, "a"]]


def test_table_header_position_rejects_bad_section():
    import pytest as _pytest

    from html_table_spark.config import ParserConfig
    from html_table_spark.errors import ParserError

    with _pytest.raises(ParserError):
        ParserConfig().table_header_position("body")


def test_media_decode_failure_becomes_error_row(spark):
    from html_table_spark.operators.media import MEDIA_SCHEMA, extract_media_features

    media = spark.createDataFrame(
        [{"media_ref": "bad", "payload": b"\x00", "mime": "image/png"}], MEDIA_SCHEMA
    )
    # real-codec mode raises (stub NotImplementedError here; a swapped-in
    # decoder raises codec errors) — either way it must become a status row
    row = extract_media_features(media, use_real_codecs=True).first()
    assert row.status.startswith("error:") and row.width is None


def test_golden_diff_multiset_semantics(spark):
    """exceptAll-based golden diff: empty on equality, catches missing AND
    duplicated rows (where a set-based except would hide multiplicity)."""
    from html_table_spark.operators.tabular import golden_diff

    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k int, v string")
    assert golden_diff(a, b).count() == 0
    # a duplicate beyond the golden multiplicity is 'unexpected'
    c = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (2, "y")], "k int, v string"
    )
    d = golden_diff(c, b).collect()
    assert [(r.k, r.v, r.golden_side) for r in d] == [(2, "y", "unexpected")]
    # a missing row is 'missing'
    e = spark.createDataFrame([(1, "x")], "k int, v string")
    d2 = {(r.k, r.golden_side) for r in golden_diff(e, b).collect()}
    assert d2 == {(2, "missing")}


def test_table_to_json_reference_shape(spark):
    """jsonSerialize parity (Table.php:68-75): {caption, header, rows}.
    With a non-empty header, iterating the TabularDataReader yields
    header-combined records (combineArray, Parser.php:614-622), so rows are
    JSON OBJECTS keyed by header names, projected/null-filled to header
    width; empty header keeps positional arrays (round-3 ADVICE fix)."""
    import json as _json

    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import extract_tables
    from html_table_spark.operators.tabular import table_to_json
    from html_table_spark.sources.documents import documents_from_html

    html = (
        "<table><caption>Cap</caption><thead><tr><th>H</th></tr></thead>"
        "<tr><td>a</td></tr><tr><td>b</td></tr></table>"
    )
    docs = documents_from_html(spark, [html], ["d1"])
    out = table_to_json(
        extract_tables(docs, ParserConfig().table_header_position("thead"))
    ).collect()
    parsed = _json.loads(out[0].js)
    assert parsed == {
        "caption": "Cap",
        "header": ["H"],
        "rows": [{"H": "a"}, {"H": "b"}],
    }

    # header wider than a row → null-fill; row wider than header → project
    html_nf = (
        "<table><thead><tr><th>k</th><th>v</th></tr></thead>"
        "<tr><td>a</td></tr><tr><td>b</td><td>c</td><td>drop</td></tr></table>"
    )
    docs_nf = documents_from_html(spark, [html_nf], ["d3"])
    out_nf = table_to_json(
        extract_tables(docs_nf, ParserConfig().table_header_position("thead"))
    ).collect()
    parsed_nf = _json.loads(out_nf[0].js)
    assert parsed_nf["caption"] is None  # PHP json_encode keeps null keys
    assert parsed_nf["rows"] == [{"k": "a", "v": None}, {"k": "b", "v": "c"}]

    # multi-column + ragged rows, EMPTY header → positional arrays; row
    # boundaries come from row_lens, NOT a rectangularity guess (round-2
    # review: the first cut emitted one-cell rows for every table)
    html2 = (
        '<table><tr><td>a</td><td>b</td></tr>'
        '<tr><td rowspan="2">c</td><td>d</td></tr><tr><td>e</td></tr>'
        "</table>"
    )
    docs2 = documents_from_html(spark, [html2], ["d2"])
    out2 = table_to_json(extract_tables(docs2, ParserConfig())).collect()
    parsed2 = _json.loads(out2[0].js)
    # rowspan carry: row 3 = [c, e] (grid expansion duplicates the carry)
    assert parsed2["rows"] == [["a", "b"], ["c", "d"], ["c", "e"]]
    assert parsed2["caption"] is None


def test_table_to_json_php_numeric_key_golden(spark):
    """PHP json_encode list-vs-object golden (round-3 VERDICT item 4).

    PHP coerces canonical integer-string array keys to ints (PHP manual,
    "Arrays": "Strings containing valid decimal ints ... will be cast to
    the int type"), and json_encode emits a JSON ARRAY iff the keys are
    exactly 0..n-1 in insertion order (array_is_list). combineArray
    (Parser.php:614-622) inserts in header order, so the JSON row shape
    depends on the header names:

      header ["0","1"]  → keys 0,1 in order   → list  → ["a","b"]
      header ["1","2"]  → keys 1,2 (no 0)     → object {"1":..,"2":..}
      header ["1","0"]  → keys out of order   → object {"1":..,"0":..}
      header ["00","1"] → "00" stays a string → object {"00":..,"1":..}
      header ["0","x"]  → mixed               → object {"0":..,"x":..}

    No PHP runtime in this sandbox — the expectations are hand-encoded
    from the documented public semantics above."""
    import json as _json

    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import extract_tables
    from html_table_spark.operators.tabular import table_to_json
    from html_table_spark.sources.documents import documents_from_html

    html = "<table><tr><td>a</td><td>b</td></tr></table>"

    def js_for(header):
        docs = documents_from_html(spark, [html], ["d"])
        cfg = ParserConfig().with_table_header(header)
        out = table_to_json(extract_tables(docs, cfg)).collect()
        return _json.loads(out[0].js)

    # sequential-from-zero numeric-string header → PHP list → JSON array
    assert js_for(["0", "1"])["rows"] == [["a", "b"]]
    # projection still applies on the list path: width 3 → null-fill
    assert js_for(["0", "1", "2"])["rows"] == [["a", "b", None]]
    # offset / reordered / non-canonical / mixed keys stay JSON objects
    assert js_for(["1", "2"])["rows"] == [{"1": "a", "2": "b"}]
    out_rev = js_for(["1", "0"])["rows"]
    assert out_rev == [{"1": "a", "0": "b"}]
    # insertion (header) order is preserved in the object, like PHP
    assert list(out_rev[0]) == ["1", "0"]
    assert js_for(["00", "1"])["rows"] == [{"00": "a", "1": "b"}]
    assert js_for(["0", "x"])["rows"] == [{"0": "a", "x": "b"}]


def test_simhash_four_band_recall_guarantee(spark):
    """Pigeonhole: 4 disjoint 16-bit bands find EVERY hamming<=3 pair —
    including pairs whose differing bits all fall inside the top 16 bits,
    which the round-1 prefix-only banding provably missed."""
    import itertools
    import random

    from html_table_spark.operators.dedup import simhash_banded_pairs

    rng = random.Random(42)
    base = rng.getrandbits(64)
    # d0-d1: all 3 differing bits inside the top-16 window → prefix-banding
    # buckets them apart; 4-band must still pair them
    sigs = [("d00", base), ("d01", base ^ (1 << 63) ^ (1 << 55) ^ (1 << 49))]
    for i in range(2, 30):
        sigs.append((f"d{i:02d}", rng.getrandbits(64)))
    for i in range(30, 40):  # seeded near pairs with random flip positions
        b = rng.getrandbits(64)
        c = b
        for f in rng.sample(range(64), 3):
            c ^= 1 << f
        sigs.append((f"d{i}a", b))
        sigs.append((f"d{i}b", c))

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    df = spark.createDataFrame(
        [(d, signed(s)) for d, s in sigs], "doc_id string, sig long"
    )
    got = {
        (r.id_a, r.id_b)
        for r in simhash_banded_pairs(df, bands=4, max_hamming=3).collect()
    }
    expect = set()
    for (da, sa), (db, sb) in itertools.combinations(sigs, 2):
        if bin(sa ^ sb).count("1") <= 3:
            expect.add((da, db) if da < db else (db, da))
    assert ("d00", "d01") in expect
    assert got == expect  # 100% recall, no false survivors
    # sanity: the old prefix scheme would have missed d00-d01
    assert (sigs[0][1] >> 48) != (sigs[1][1] >> 48)


def test_ivf_centroids_sparse_offset_ids(spark):
    """Rank-based seeding: a corpus whose ids start at 1000 with gaps must
    still yield exactly k centroids (the round-1 `id < k` value filter
    returned zero here), and assignment must label every vector."""
    import random

    from pyspark.sql import Row

    rng = random.Random(5)
    rows = [
        Row(vec_id=1000 + 7 * i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    cents = similarity.ivf_centroids(df, k=4)
    assert [cid for cid, _ in cents] == [1000, 1007, 1014, 1021]
    assert all(len(vec) == 8 for _, vec in cents)
    assigned = similarity.ivf_assign(df, cents)
    got = assigned.select("vec_id", "centroid_id").collect()
    assert len(got) == 20
    assert {r.centroid_id for r in got} <= {1000, 1007, 1014, 1021}
    # Lloyd refinement keeps k centroids and determinism on sparse ids
    refined = similarity.ivf_train(df, k=4, iters=1)
    assert [cid for cid, _ in refined] == [1000, 1007, 1014, 1021]


def test_ngram_jaccard_shingle_cap_bounds_row_size(spark):
    """max_shingles bounds the per-doc shingle payload (deterministic sorted
    prefix) and marks affected pairs approx=true; uncapped docs keep exact
    jaccard with approx=false; default (None) output schema is unchanged."""
    from pyspark.sql import Row

    mega = " ".join(f"tok{i}" for i in range(500))
    rows = [
        Row(doc_id="m1", text=mega),
        Row(doc_id="m2", text=mega),
        Row(doc_id="s1", text="small doc one two three"),
        Row(doc_id="s2", text="small doc one two three"),
    ]
    df = spark.createDataFrame(rows)
    pairs = spark.createDataFrame(
        [("m1", "m2"), ("s1", "s2")], "id_a string, id_b string"
    )
    capped = dedup.ngram_jaccard(df, pairs, max_shingles=50)
    got = {(r.id_a, r.id_b): r for r in capped.collect()}
    assert set(capped.columns) == {"id_a", "id_b", "jaccard", "approx"}
    assert got[("m1", "m2")].approx is True
    # identical capped prefixes → estimate still 1.0, and exact via fallback
    assert got[("m1", "m2")].jaccard == 1.0
    assert got[("s1", "s2")].approx is False
    assert got[("s1", "s2")].jaccard == 1.0
    # default path: exact, no approx column (oracle-checked schema)
    exact = dedup.ngram_jaccard(df, pairs)
    assert set(exact.columns) == {"id_a", "id_b", "jaccard"}


def test_ngram_jaccard_routed_equals_uncapped(spark):
    """Round-3 VERDICT item 6: the exact-recompute router — capped bulk
    pass + exact two-doc recompute of approx pairs — must equal the
    uncapped computation END-TO-END on a corpus with capped mega docs,
    partially-overlapping docs, and small docs."""
    from pyspark.sql import Row

    mega_a = " ".join(f"tok{i}" for i in range(400))
    mega_b = " ".join(f"tok{i}" for i in range(150, 480))  # overlaps mega_a
    rows = [
        Row(doc_id="m1", text=mega_a),
        Row(doc_id="m2", text=mega_b),
        Row(doc_id="m3", text=mega_a),
        Row(doc_id="s1", text="small doc one two three"),
        Row(doc_id="s2", text="small doc one two four"),
    ]
    df = spark.createDataFrame(rows)
    pairs = spark.createDataFrame(
        [("m1", "m2"), ("m1", "m3"), ("s1", "s2"), ("m2", "s1")],
        "id_a string, id_b string",
    )
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard(df, pairs).collect()
    }
    routed = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_routed(df, pairs, max_shingles=50).collect()
    }
    assert routed == uncapped
    assert set(routed) == {("m1", "m2"), ("m1", "m3"), ("s1", "s2"), ("m2", "s1")}
    # sanity: the cap actually engaged (mega pairs were approx in the bulk pass)
    bulk = dedup.ngram_jaccard(df, pairs, max_shingles=50)
    assert {r.approx for r in bulk.filter("id_a = 'm1'").collect()} == {True}


def test_connected_components_and_cluster_dedup(spark):
    """Pairs -> clusters -> canonical-per-cluster corpus: two chains that
    must merge transitively (a-b, b-c => one cluster) plus an isolated
    pair and untouched singletons."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("c", "d")],
        "id_a string, id_b string",
    )
    comp = {r.node: r.component for r in dedup.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}

    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=d, text=f"doc {d}") for d in ["a", "b", "c", "d", "x", "y", "z"]]
    )
    kept = {r.doc_id for r in dedup.dedup_by_clusters(docs, pairs).collect()}
    assert kept == {"a", "x", "z"}  # cluster canonicals + untouched singleton


def test_connected_components_nonconvergence_raises(spark):
    """Round-3 ADVICE: exhausting max_iters with labels still changing must
    raise, not silently return split components (duplicate canonicals)."""
    import pytest as _pytest

    # a 6-node chain needs >1 min-label round; max_iters=1 cannot converge
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=1)
    # with enough rounds the same graph resolves to one component
    comp = {
        r.node: r.component
        for r in dedup.connected_components(pairs, max_iters=10).collect()
    }
    assert set(comp.values()) == {"n0"}


def test_connected_components_diameter_equals_max_iters(spark):
    """Convergence is observable only one round AFTER the last label
    change, so a graph needing exactly max_iters changing rounds must
    SUCCEED (effective capacity = max_iters, not max_iters - 1): chain
    n0-n1-n2 propagates n0 one hop per round -> exactly 2 changing
    rounds; max_iters=2 must not raise."""
    pairs = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2")], "id_a string, id_b string"
    )
    comp = {
        r.node: r.component
        for r in dedup.connected_components(pairs, max_iters=2).collect()
    }
    assert comp == {"n0": "n0", "n1": "n0", "n2": "n0"}


def test_connected_components_pointer_jumping_adversarial_chain(spark):
    """Round-3 VERDICT item 5: a chain whose diameter exceeds max_iters
    (template-spam daisy chains) hard-fails plain propagation but
    converges under pointer jumping in O(log diameter) rounds — tested on
    BOTH sides of the boundary."""
    import pytest as _pytest

    # zero-padded ids keep lexicographic min == n00 across the chain
    chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(40)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    # plain propagation: 40 hops cannot fit in 10 changing rounds
    with _pytest.raises(RuntimeError, match="pointer_jumping"):
        dedup.connected_components(pairs, max_iters=10)
    # pointer jumping: distance-to-min doubles per round, 10 rounds is
    # plenty for diameter 40 (2^10 >> 40)
    comp = {
        r.node: r.component
        for r in dedup.connected_components(
            pairs, max_iters=10, pointer_jumping=True
        ).collect()
    }
    assert set(comp.values()) == {"n00"}
    assert len(comp) == 41


def test_connected_components_pointer_jumping_same_fixed_point(spark):
    """Pointer jumping must reach the identical per-component minimum the
    plain variant returns on a mixed graph (cliques + chain + singles)."""
    edges = (
        [("a", "b"), ("b", "c"), ("c", "a")]           # triangle
        + [("p", "q"), ("q", "r")]                      # path
        + [("x", "y")]                                  # pair
    )
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    plain = {
        r.node: r.component
        for r in dedup.connected_components(pairs).collect()
    }
    jumped = {
        r.node: r.component
        for r in dedup.connected_components(
            pairs, pointer_jumping=True
        ).collect()
    }
    assert plain == jumped
    assert jumped["r"] == "p" and jumped["y"] == "x" and jumped["c"] == "a"


def test_lit_vec_exact_roundtrip(spark):
    """lit_vec/lit_mat fold doubles into ONE parsed literal; the values must
    round-trip EXACTLY (repr is shortest-exact, Spark parses the same
    grammar), including negatives, subnormals, and exponent forms."""
    import math

    vals = [
        0.0,
        -0.0,
        1.5,
        -2.75,
        1e-300,
        -3.141592653589793,
        2.2250738585072014e-308,  # smallest normal double
        5e-324,  # smallest subnormal
        1.7976931348623157e308,  # largest finite
        0.1,  # classic non-exact decimal
    ]
    row = spark.range(1).select(
        similarity.lit_vec(vals).alias("v"),
        similarity.lit_mat([vals, list(reversed(vals))]).alias("m"),
    ).first()
    assert list(row.v) == vals
    assert [list(r) for r in row.m] == [vals, list(reversed(vals))]
    # non-finite components must be rejected at construction, not run time
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            similarity.lit_vec([1.0, bad])
    assert math.copysign(1.0, row.v[1]) == -1.0  # -0.0 keeps its sign


def test_ivf_assign_matches_per_centroid_reference(spark):
    """The matrix-literal argmax must pick the same centroid as a direct
    per-centroid python computation (incl. the min-id tie rule)."""
    import random

    rng = random.Random(11)
    dim = 6
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(30)
    ]
    # duplicate centroid vectors force ties -> lowest centroid id must win
    cents = [(3, rows[0].embedding), (7, rows[0].embedding), (9, rows[5].embedding)]
    df = spark.createDataFrame(rows)
    got = {
        r.vec_id: r.centroid_id
        for r in similarity.ivf_assign(df, cents).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            (sum(x * x for x in a) ** 0.5) * (sum(x * x for x in b) ** 0.5)
        )

    for r in rows:
        best = max(cents, key=lambda c: (cos(r.embedding, c[1]), -c[0]))
        assert got[r.vec_id] == best[0], r.vec_id


def test_ivf_assign_empty_centroids_fails_fast(spark):
    """sequence(1, 0) steps DOWNWARD in Spark ([1, 0]), so an empty
    centroid list would reach element_at(_, 0) and kill every task with
    'SQL array indices start at 1' — ivf_assign must reject it on the
    driver instead."""
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 0.0])])
    with pytest.raises(ValueError, match="at least one centroid"):
        similarity.ivf_assign(df, [])


def test_quantize_int8_hand_values(spark):
    rows = [Row(vec_id=0, embedding=[10.0, -5.0, 0.0, 2.5])]
    df = spark.createDataFrame(rows)
    r = similarity.quantize_int8(df).first()
    # scale = 10/127; q = floor(v/scale + 0.5):
    #   10 → 127, -5 → floor(-63.5+0.5) = -63, 0 → 0, 2.5 → floor(32.25) = 32
    assert r.qvec == [127, -63, 0, 32]
    assert r.v == [10.0, -5.0, 0.0, 2.5]
    # JVM expression must agree bit-for-bit with the driver-side twin used
    # for query vectors (same IEEE ops in the same order)
    assert r.qvec == similarity._quantize_py([10.0, -5.0, 0.0, 2.5])


def test_quantized_topk_matches_brute_force_when_oversampled(spark, sf_dir):
    """With oversample covering the whole store, the exact rescore must
    reproduce brute-force top-k exactly (ids AND cosines)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    exact = [(r.vec_id, r.cosine) for r in similarity.brute_force_topk(emb, query, k=10).collect()]
    quant = [(r.vec_id, r.cosine) for r in similarity.quantized_topk(emb, query, k=10, oversample=20).collect()]
    assert quant == exact


def test_quantized_topk_self_hit_and_recall(spark, sf_dir):
    """At the production oversample the quantized candidate scan must put
    the query itself first and keep high brute-force recall (int8 keeps
    ~2 decimal digits of cosine resolution)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    got = similarity.quantized_topk(emb, query, k=10, oversample=4).collect()
    assert got[0].vec_id == 0
    assert got[0].qcos >= 0.999  # quantized self-cosine is ~1
    exact = {r.vec_id for r in similarity.brute_force_topk(emb, query, k=10).collect()}
    assert len(exact & {r.vec_id for r in got}) >= 8


def test_pq_encode_codeword_roundtrip(spark):
    """A vector that IS a codeword must encode to that codeword's index in
    every subspace (its sub-distances are exactly 0.0)."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 2.0]),
        Row(vec_id=2, embedding=[5.0, 5.0, -1.0, 0.5]),
    ]
    df = spark.createDataFrame(rows)
    books, dsub = similarity.pq_codebooks(df, m=2, ksub=3)
    assert dsub == 2 and books[0][1] == [0.0, 1.0] and books[1][2] == [-1.0, 0.5]
    enc = {r.vec_id: (r.code_0, r.code_1) for r in
           similarity.pq_encode(df, books, dsub).collect()}
    assert enc == {0: (0, 0), 1: (1, 1), 2: (2, 2)}


def test_pq_topk_matches_brute_force_when_oversampled(spark, sf_dir):
    """With oversample covering the whole store, the exact rescore must
    reproduce brute-force top-k exactly (ids AND cosines)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    exact = [(r.vec_id, r.cosine) for r in similarity.brute_force_topk(emb, query, k=10).collect()]
    got = [(r.vec_id, r.cosine) for r in similarity.pq_topk(emb, query, k=10, oversample=20).collect()]
    assert got == exact


def test_pq_topk_self_adc_zero(spark, sf_dir):
    """The query vector is one of the 16 codebook vectors, so its PQ codes
    reconstruct it exactly: ADC distance 0, cosine 1, ranked first."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    got = similarity.pq_topk(emb, query, k=10, oversample=4).collect()
    assert got[0].vec_id == 0
    assert got[0].approx_d2 == 0.0
    assert got[0].cosine == 1.0


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 2.0, 3.0])])
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebooks(df, m=2, ksub=1)


# ---------------------------------------------------------------------------
# ivf_topk_join — batched multi-query ANN
# ---------------------------------------------------------------------------


def _batch_vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_topk_join_self_and_twin(spark):
    # centroids (k=2) = 0 and 1; 2/4 are twins near axis-x, 3 near axis-y
    emb = _batch_vecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.99, 0.1]),
        (3, [0.1, 0.99]),
        (4, [0.99, 0.1]),
    ])
    queries = emb.filter(F.col("vec_id") == 2)
    out = [(r.vec_id, r.rank, r.cosine) for r in
           similarity.ivf_topk_join(emb, queries, k=3, nprobe=1,
                                    n_centroids=2).orderBy("rank").collect()]
    # rank 1: self OR identical twin (tie at cos 1.0 -> lower id = 2)
    assert out[0][0] == 2 and out[0][2] == 1.0
    assert out[1][0] == 4 and out[1][2] == 1.0  # the twin
    assert out[2][0] == 0  # the centroid itself, same cluster
    # nprobe=1: vector 3 (other cluster) never appears
    assert all(v != 3 for v, _, _ in out)


def test_ivf_topk_join_every_query_gets_k(spark):
    emb = _batch_vecs(
        spark, [(i, [float(i % 5 + 1), float(i % 3 + 1)]) for i in range(30)]
    )
    queries = emb.filter(F.col("vec_id") % 10 == 0)  # 3 queries
    out = similarity.ivf_topk_join(emb, queries, k=4, nprobe=4, n_centroids=4)
    per_q = {r.query_id: r.cnt for r in
             out.groupBy("query_id").agg(F.count("*").alias("cnt")).collect()}
    assert per_q == {0: 4, 10: 4, 20: 4}
    # ranks are 1..k per query, no gaps
    ranks = {(r.query_id, r.rank) for r in out.collect()}
    assert ranks == {(q, i) for q in (0, 10, 20) for i in (1, 2, 3, 4)}


def test_ivf_topk_join_query_side_is_broadcast(spark):
    emb = _batch_vecs(spark, [(i, [float(i), 1.0]) for i in range(20)])
    queries = emb.filter(F.col("vec_id") == 0)
    plan = (
        similarity.ivf_topk_join(emb, queries, k=2, nprobe=2, n_centroids=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # index never shuffles for the candidate join: the query side broadcasts
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_topk_join_zero_norm_query_is_deterministic(spark):
    # a zero query vector must NOT produce NaN probe scores (engine-
    # dependent ordering vs the DuckDB twin): the clamped norm makes
    # every cosine a deterministic 0.0, so ties break on vec_id and the
    # query still gets exactly k results
    emb = _batch_vecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.7, 0.7]),
        (3, [0.5, 0.5]),
    ])
    queries = _batch_vecs(spark, [(99, [0.0, 0.0])])
    out = (
        similarity.ivf_topk_join(emb, queries, k=2, nprobe=2, n_centroids=2)
        .orderBy("rank").collect()
    )
    assert len(out) == 2
    assert all(r.cosine == 0.0 for r in out)  # no NaN anywhere
    assert [r.vec_id for r in out] == sorted(r.vec_id for r in out)


def test_ivf_assign_zero_vector_gets_deterministic_centroid(spark):
    emb = _batch_vecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.0, 0.0]),
    ])
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows = {r.vec_id: r.centroid_id
            for r in similarity.ivf_assign(emb, cents).collect()}
    # all sims are exactly 0.0 for the zero vector -> tie -> lowest cid
    assert rows[2] == 0

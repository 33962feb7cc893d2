"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media in the corpus are ``kind='media'`` spans carrying a ``media_ref``; the
actual bytes live in a side table ``media(media_ref, payload: binary,
mime: string)``.  This module implements the Spark-side plumbing — schema,
batch shape, mapInPandas signatures, deterministic fake features — for the
decode / feature-extract / resize / frame-sample stages.

The real codecs (Pillow/ffmpeg/torchvision) are NOT in this container, so
the decode step is stubbed behind ``NotImplementedError`` with a
deterministic fake (seeded from the payload digest) that keeps schema,
partitioning and batch shape real and testable — swap ``_decode_real`` in
when the cluster image ships codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

FEATURES_SCHEMA = (
    "media_ref string, mime string, width int, height int, "
    "n_frames int, feature array<float>, status string"
)

FEATURE_DIM = 16


def _decode_real(payload: bytes, mime: str):  # pragma: no cover - needs codecs
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "container; deterministic fake used instead (swap in Pillow/ffmpeg "
        "on a cluster image)"
    )


def _decode_fake(payload: bytes, mime: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in: dimensions and features derive from the
    payload digest, so tests are stable and the pipeline shape is real."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    n_frames = 1 + (digest[2] % 8 if (mime or "").startswith("video") else 0)
    feature = (
        np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint8)
        .astype(np.float32)
        .reshape(2, FEATURE_DIM)
        .mean(axis=0)
        / 255.0
    )
    return width, height, n_frames, feature


def extract_media_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """media(media_ref, payload, mime) → per-media features, Arrow-batched.

    Iterator-of-batches mapInPandas: payloads never accumulate beyond one
    Arrow batch in Python memory — the pattern that matters when payloads
    are multi-MB images at corpus scale (tune
    spark.sql.execution.arrow.maxRecordsPerBatch down for this stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real_codecs else _decode_fake
        for batch in batches:
            out = []
            for ref, payload, mime in zip(
                batch["media_ref"].values, batch["payload"].values, batch["mime"].values
            ):
                try:
                    w, h, n, feat = decode(payload, mime)
                    out.append((ref, mime, w, h, n, [float(x) for x in feat], "ok"))
                except Exception as exc:  # noqa: BLE001 — per-item error
                    # channel: a real decoder raises codec errors on corrupt
                    # payloads; a raising UDF would kill the stage (SURVEY
                    # §2.1), so failures become status rows
                    out.append((ref, mime, None, None, None, None, f"error: {exc}"))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_ref", "mime", "width", "height", "n_frames",
                    "feature", "status",
                ],
            )

    return media.select("media_ref", "payload", "mime").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def enrich_media_spans(extracted: DataFrame, media_features: DataFrame) -> DataFrame:
    """Join per-media features back onto the extraction output's media
    spans: extracted tables → exploded media spans → (doc_id, table_idx,
    media_ref, pos, width, height, n_frames, feature).

    The features side is the small one (distinct media), so Catalyst/AQE
    broadcasts it; at corpus scale bucket both sides by media_ref instead.
    """
    from pyspark.sql import functions as F

    media_spans = (
        extracted.select("doc_id", "table_idx", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(
            "doc_id",
            "table_idx",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("pos"),
        )
    )
    return media_spans.join(
        media_features.select("media_ref", "width", "height", "n_frames", "feature"),
        "media_ref",
        "left",
    )


def synthesize_media_table(media_refs: list[str], seed: int = 42) -> list[dict]:
    """Deterministic fake payload rows for the given refs (tests/bench)."""
    rows = []
    for ref in media_refs:
        payload = hashlib.sha256(f"{seed}:{ref}".encode()).digest() * 4
        mime = "video/mp4" if ref.endswith("0") else "image/png"
        rows.append({"media_ref": ref, "payload": payload, "mime": mime})
    return rows

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media in the corpus are ``kind='media'`` spans carrying a ``media_ref``; the
actual bytes live in a side table ``media(media_ref, payload: binary,
mime: string)``.  This module implements the Spark-side plumbing — schema,
batch shape, mapInPandas signatures, deterministic fake features — for the
decode / feature-extract / resize / frame-sample stages.

Decode tiers (round-4: every media family now has a REAL decode level,
no codec libraries):

- **PNG, GIF, or JPEG (baseline OR progressive) with a well-formed
  body: REAL full-pixel decode** — PNG via the stdlib-zlib decoder in
  :mod:`.png` (IDAT inflate + §9 unfilter + palette expansion), GIF via
  the pure-bit-arithmetic LZW decoder in :mod:`.gif` (variable-width
  codes, interlace, palettes), JPEG via the DCT decoder in :mod:`.jpeg`
  (Huffman entropy decode — baseline single-scan AND round-5 progressive
  multi-scan with spectral selection / successive approximation —
  dequant, vectorized IDCT, chroma upsample, YCbCr→RGB) — real
  dimensions, real frame count (GIF), AND a real pixel-statistics
  feature vector.
- **WAV/RIFF audio: REAL PCM decode** (:mod:`.wav`): n_frames is the
  real sample-frame count and the feature vector carries signal stats
  (RMS, peak, zero-crossing rate); width/height are NULL.
- **AVI/MJPEG video: REAL frame pixels** (:mod:`.avi`, round 5):
  RIFF container walk (hdrl/strh/strf/movi/idx1), uniform frame
  sampling, per-frame baseline-JPEG decode through :mod:`.jpeg`, and
  a temporal feature vector (pixel stats + frame-diff energy).
- **MP4/ISO-BMFF video: REAL container metadata** (:mod:`.mp4` box
  walk): tkhd display dimensions, stts frame count, mvhd duration —
  digest-fake features (H.264-class pixel decode needs codecs).
- PNG/GIF/JPEG with readable headers but undecodable bodies
  (truncated data, 12-bit/arithmetic-coded JPEG): real dimensions from
  the native header parse, digest-fake features. Adam7 interlaced PNG
  decodes for REAL since round 4 (png.py §8.2 pass scatter);
  progressive JPEG decodes for REAL since round 5 (jpeg.py Annex G).
- Everything else (opaque payloads): deterministic fake seeded from
  the payload digest — keeps schema, partitioning and batch shape
  real and testable.

The remaining ``_decode_real`` seam is inter-frame-codec video (H.264/
VP9 class — MJPEG pixels ARE decoded, round 5) and exotic JPEG variants
(arithmetic-coded, lossless, hierarchical, 12-bit) — swap it in when the
cluster image ships Pillow/ffmpeg.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .avi import avi_video_feature, encode_avi_mjpeg, is_avi
from .gif import encode_gif, gif_pixel_feature
from .jpeg import encode_jpeg, encode_jpeg_progressive, jpeg_pixel_feature
from .mp4 import decode_mp4_meta, encode_mp4_meta, is_mp4
from .png import encode_png, png_pixel_feature
from .wav import encode_wav, wav_audio_feature

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
        "inter-frame video codecs (H.264/VP9 class) and exotic image "
        "variants (arithmetic-coded/lossless/12-bit JPEG, 16-bit depths) "
        "require codecs not present in this container; PNG/GIF/JPEG "
        "(baseline AND progressive) pixel decode IS real (stdlib-only "
        "operators/png.py, gif.py, jpeg.py), AVI/MJPEG video frames decode "
        "for REAL with frame sampling (operators/avi.py), header metadata "
        "is parsed natively (parse_image_header), and everything else uses "
        "the deterministic fake (swap in Pillow/ffmpeg on a cluster image)"
    )


# SOFn markers that carry frame dimensions (ISO/IEC 10918-1 table B.1);
# 0xC4 (DHT), 0xC8 (JPG extension), 0xCC (DAC) are not frame headers
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn: height/width are the
    2-byte big-endian fields at offsets 3/5 of the frame header (ISO/IEC
    10918-1 §B.2.2). Returns None on any malformed structure."""
    i, n = 2, len(b)
    while i + 1 < n:
        if b[i] != 0xFF:
            return None
        while i < n and b[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            return None
        marker = b[i]
        i += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # standalone markers: no length field
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan before any SOF
            return None
        if i + 2 > n:
            return None
        seglen = (b[i] << 8) | b[i + 1]
        if seglen < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 7 > n:
                return None
            h = (b[i + 3] << 8) | b[i + 4]
            w = (b[i + 5] << 8) | b[i + 6]
            return (w, h) if w > 0 and h > 0 else None
        i += seglen
    return None


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Native (mime, width, height) from the payload's own magic bytes —
    pure struct reads off the public format specs, no codec libraries:

    - PNG: IHDR width/height, big-endian uint32 at offsets 16/20
      (ISO/IEC 15948 §11.2.2; IHDR is always the first chunk)
    - GIF: logical-screen width/height, little-endian uint16 at 6/8
      (GIF89a specification §18)
    - JPEG: first SOFn frame header via the marker walk above

    Returns None when no magic matches or the header is truncated/corrupt —
    callers fall back to the deterministic fake, so a bad payload can never
    kill a stage."""
    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 24 or b[12:16] != b"IHDR":
            return None
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("image/png", w, h) if 0 < w and 0 < h else None
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            return None
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("image/gif", w, h) if 0 < w and 0 < h else None
    if b[:2] == b"\xff\xd8":
        dims = _jpeg_dims(b)
        return ("image/jpeg", dims[0], dims[1]) if dims else None
    return None


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


def _decode_meta(payload: bytes, mime: str) -> tuple[int, int, int, np.ndarray]:
    """Default decode, best real tier first (round-4):

    1. PNG, GIF or baseline JPEG with a decodable body → REAL pixels:
       dimensions + pixel-stat feature vector from the stdlib decoders
       (``png.py`` zlib inflate+unfilter, ``gif.py`` LZW, ``jpeg.py``
       Huffman+IDCT); the vector's [15] marker is 1.0 only on this
       path. GIF also reports the REAL frame count.
    2. WAV/RIFF audio → REAL PCM decode (``wav.py``): n_frames is the
       real sample-frame count, the feature vector carries signal stats
       (marker 1.0), width/height are NULL (audio has none).
    3. AVI/MJPEG video → REAL sampled frame pixels (``avi.py`` container
       walk + per-frame JPEG decode): real dimensions, real frame count,
       temporal pixel-stats feature (marker 1.0).
    4. MP4/ISO-BMFF → REAL container metadata (``mp4.py`` box walk):
       tkhd display dimensions + stts frame count, digest-fake features
       (inter-frame pixel decode needs codecs — the remaining stub seam).
    5. Recognizable PNG/GIF/JPEG header → real dimensions, fake features.
    6. Otherwise → deterministic digest fake.
    """
    header = parse_image_header(payload)
    if header is not None and header[0] == "image/png":
        try:
            w, h, feature = png_pixel_feature(payload)
            return w, h, 1, feature
        except ValueError:
            pass  # header-only PNG (no/corrupt body, depth != 8)
    if header is not None and header[0] == "image/gif":
        try:
            w, h, n_frames, feature = gif_pixel_feature(payload)
            return w, h, n_frames, feature
        except ValueError:
            pass  # header-only GIF (no/corrupt image data)
    if header is not None and header[0] == "image/jpeg":
        try:
            w, h, feature = jpeg_pixel_feature(payload)
            return w, h, 1, feature
        except ValueError:
            pass  # header-only JPEG (truncated scan, 12-bit, arithmetic)
    b = payload or b""
    if is_avi(b):
        try:
            return avi_video_feature(payload)
        except ValueError:
            pass  # non-MJPEG codec / truncated movi → fake fallback
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        try:
            frames, _channels, feature = wav_audio_feature(payload)
            return None, None, frames, feature
        except ValueError:
            pass  # compressed/corrupt WAV → fake fallback
    if is_mp4(b):
        try:
            meta = decode_mp4_meta(b)
            _fw, _fh, _fn, feature = _decode_fake(payload, mime)
            w = int(round(meta["width"])) if "width" in meta else None
            h = int(round(meta["height"])) if "height" in meta else None
            return w, h, meta.get("n_frames") or 1, feature
        except ValueError:
            pass  # corrupt box structure → fake fallback
    fw, fh, n_frames, feature = _decode_fake(payload, mime)
    if header is not None:
        _, w, h = header
        return w, h, 1, feature
    return fw, fh, n_frames, feature


def extract_media_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """media(media_ref, payload, mime) → per-media features, Arrow-batched.

    Iterator-of-batches mapInPandas: payloads never accumulate beyond one
    Arrow batch in Python memory — the pattern that matters when payloads
    are multi-MB images at corpus scale (tune
    spark.sql.execution.arrow.maxRecordsPerBatch down for this stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real_codecs else _decode_meta
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


MEDIA_TIERS = (
    "video-opaque",  # opaque bytes under a video mime (fake-decode tier)
    "png-header",    # real PNG signature + IHDR, no body
    "gif-header",    # real GIF89a logical screen descriptor, no image data
    "jpeg-header",   # real SOI/APP0/SOF0 markers, no scan
    "png-rgb",       # COMPLETE PNG, 3 channels, filter types cycling 0-4
    "png-rgba",      # COMPLETE PNG, 4 channels
    "png-gray",      # COMPLETE PNG, 1 channel (color type 0)
    "gif-full",      # COMPLETE single-frame GIF (real LZW stream)
    "jpeg-full",     # COMPLETE baseline JPEG (gray / 4:4:4 / 4:2:0 / RSTn)
    "wav-pcm",       # COMPLETE RIFF/WAVE PCM audio (8/16/32-bit)
    "mp4-meta",      # real ISO-BMFF ftyp+moov (mvhd/tkhd/stts), no mdat
    "opaque",        # opaque bytes claiming image/png (fake-decode tier)
    "jpeg-prog",     # COMPLETE progressive JPEG (SOF2 scan script, round 5)
    "avi-mjpeg",     # COMPLETE AVI/MJPEG video (real frame pixels, round 5)
)


def media_tier(ref: str, seed: int = 42) -> str:
    """Which synthetic-payload tier a ref lands in — digest-driven (NOT
    positional), so the driver oracle corpus (refs named by table
    position, corpus.py) exercises EVERY tier: a round-3 review found
    the old last-character scheme silently excluded the GIF/JPEG tiers
    from the CORRECTNESS gate because corpus refs only end in 0-5."""
    digest = hashlib.sha256(f"{seed}:{ref}".encode()).digest()
    return MEDIA_TIERS[digest[15] % len(MEDIA_TIERS)]


def refs_for_tier(tier: str, n: int, prefix: str = "ref", seed: int = 42) -> list[str]:
    """First ``n`` candidate refs whose digest lands in ``tier`` (test
    helper; raises on an unknown tier so typos fail loudly)."""
    if tier not in MEDIA_TIERS:
        raise ValueError(f"unknown media tier {tier!r}")
    out: list[str] = []
    i = 0
    while len(out) < n:
        ref = f"{prefix}{i}"
        i += 1
        if media_tier(ref, seed) == tier:
            out.append(ref)
    return out


def synthesize_media_table(media_refs: list[str], seed: int = 42) -> list[dict]:
    """Deterministic payload rows for the given refs (tests/bench).

    Each ref's tier comes from ``media_tier`` (digest-driven — see
    MEDIA_TIERS for the twelve shapes): real headers without bodies for
    the header-decode tiers, COMPLETE PNG/GIF/JPEG payloads for the
    three full-pixel decoders, COMPLETE WAV PCM audio, real MP4
    container metadata, and opaque bytes for the fake-decode fallback,
    so the whole decode policy runs end-to-end inside the driver's
    oracle-checked corpus."""
    rows = []
    for ref in media_refs:
        digest = hashlib.sha256(f"{seed}:{ref}".encode()).digest()
        w, h = 32 + digest[0], 32 + digest[1]
        tier = media_tier(ref, seed)
        if tier == "png-header":  # signature + IHDR chunk only
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + (13).to_bytes(4, "big") + b"IHDR"
                + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 6, 0, 0, 0]) + digest[:4]
            )
            mime = "image/png"
        elif tier == "gif-header":  # GIF89a logical screen descriptor
            payload = (
                b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                + digest
            )
            mime = "image/gif"
        elif tier == "jpeg-header":  # SOI + APP0(JFIF) + SOF0, no scan
            sof0 = (
                b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
                + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
            )
            payload = (
                b"\xff\xd8"
                + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + digest[:9]
                + sof0 + digest
            )
            mime = "image/jpeg"
        elif tier == "gif-full":
            # complete single-frame GIF89a: LZW literal stream with real
            # variable-width growth, deterministic palette + indices
            gw, gh = 6 + digest[2] % 8, 6 + digest[3] % 8
            rng = np.random.default_rng(int.from_bytes(digest[4:12], "big"))
            n_colors = 4 + int(digest[5]) % 12
            palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
            indices = rng.integers(0, n_colors, size=(gh, gw), dtype=np.uint8)
            payload = encode_gif(indices, palette)
            mime = "image/gif"
        elif tier == "jpeg-full":
            # complete baseline JPEG; digest rotates the encoder shape so
            # the decoder's gray / 4:4:4 / 4:2:0 / restart paths all run
            jw, jh = 9 + digest[2] % 12, 9 + digest[3] % 12  # non-8-multiples
            rng = np.random.default_rng(int.from_bytes(digest[6:14], "big"))
            shape = digest[4] % 3
            if shape == 0:  # grayscale
                base = rng.integers(0, 256, size=(jh, jw), dtype=np.uint8)
            else:  # smooth RGB gradient + mild noise (bounded quant error)
                yy, xx = np.mgrid[0:jh, 0:jw]
                base = np.stack(
                    [
                        (xx * int(digest[7] % 5 + 1) + yy * 2) % 256,
                        (yy * int(digest[8] % 5 + 1) + xx) % 256,
                        (xx + yy * 3) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
            payload = encode_jpeg(
                base,
                subsample=(shape == 2),
                restart_interval=(2 if digest[5] % 2 else 0),
            )
            mime = "image/jpeg"
        elif tier == "jpeg-prog":
            # complete PROGRESSIVE JPEG (SOF2, round 5): the default scan
            # script (interleaved DC + per-component spectral bands +
            # successive-approximation refinements with EOB runs); digest
            # rotates gray / 4:4:4 / 4:2:0 and restart markers so every
            # Annex G decode path sits inside the oracle corpus
            jw, jh = 9 + digest[2] % 12, 9 + digest[3] % 12
            rng = np.random.default_rng(int.from_bytes(digest[6:14], "big"))
            shape = digest[4] % 3
            if shape == 0:
                base = rng.integers(0, 256, size=(jh, jw), dtype=np.uint8)
            else:
                yy, xx = np.mgrid[0:jh, 0:jw]
                base = np.stack(
                    [
                        (xx * int(digest[7] % 5 + 1) + yy * 2) % 256,
                        (yy * int(digest[8] % 5 + 1) + xx) % 256,
                        (xx + yy * 3) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
            payload = encode_jpeg_progressive(
                base,
                subsample=(shape == 2),
                restart_interval=(2 if digest[5] % 2 else 0),
            )
            mime = "image/jpeg"
        elif tier in ("png-rgb", "png-rgba", "png-gray"):
            # complete PNG (6-13 px per side, deterministic pixels); rows
            # cycle §9 filter types so decode exercises every inverse, and
            # digest[7] routes half of each tier through Adam7 interlacing
            # so the pass-scatter decode path sits inside the oracle corpus
            pw, ph = 6 + digest[0] % 8, 6 + digest[1] % 8
            ch = {"png-rgb": 3, "png-rgba": 4, "png-gray": 1}[tier]
            rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
            pixels = rng.integers(0, 256, size=(ph, pw, ch), dtype=np.uint8)
            payload = encode_png(
                pixels, cycle_filters=True, interlace=bool(digest[7] % 2)
            )
            mime = "image/png"
        elif tier == "wav-pcm":
            # deterministic sine mixture; digest rotates rate/channels/bits
            frames = 200 + int.from_bytes(digest[2:4], "big") % 1200
            rate = (8000, 16000, 44100)[digest[4] % 3]
            channels = 1 + digest[5] % 2
            bits = (8, 16, 32)[digest[6] % 3]
            t = np.arange(frames) / rate
            samples = np.stack(
                [
                    0.75 * np.sin(2 * np.pi * (100 + digest[7 + c]) * t)
                    for c in range(channels)
                ],
                axis=-1,
            )
            payload = encode_wav(samples, rate, bits=bits)
            mime = "audio/wav"
        elif tier == "mp4-meta":
            payload = encode_mp4_meta(
                width=160 + digest[2] * 4,
                height=90 + digest[3] * 2,
                n_frames=2 + digest[4],
                duration_sec=0.5 + digest[5] / 8.0,
                version=digest[6] % 2,
            )
            mime = "video/mp4"
        elif tier == "avi-mjpeg":
            # complete AVI/MJPEG video (round 5): 3-7 frames of a smooth
            # gradient that shifts per frame (bounded quant error + real
            # temporal-diff energy); digest rotates size and frame count
            vw, vh = 10 + digest[2] % 10, 10 + digest[3] % 10
            n_fr = 3 + digest[4] % 5
            yy, xx = np.mgrid[0:vh, 0:vw]
            frames = [
                np.stack(
                    [
                        (xx * int(digest[7] % 5 + 1) + yy * 2 + 16 * f) % 256,
                        (yy * int(digest[8] % 5 + 1) + xx + 8 * f) % 256,
                        (xx + yy * 3 + 4 * f) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                for f in range(n_fr)
            ]
            payload = encode_avi_mjpeg(frames, fps=5 + digest[5] % 25)
            mime = "video/x-msvideo"
        elif tier == "video-opaque":
            payload = digest * 4
            mime = "video/mp4"
        else:  # "opaque"
            payload = digest * 4
            mime = "image/png"
        rows.append({"media_ref": ref, "payload": payload, "mime": mime})
    return rows

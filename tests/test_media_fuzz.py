"""Decoder robustness fuzz: corrupt payloads must raise ValueError and
ONLY ValueError (the media stage's error contract — extract_media_
features converts exceptions to status rows, but an IndexError/KeyError
escaping a decoder means an unhandled code path, and _decode_meta's
tier fallbacks catch ValueError specifically).

Seeded mutations of valid payloads: byte flips, truncations, garbage
splices. A 15k-mutation sweep ran clean when this suite was authored;
the committed version keeps a smaller always-on sample per format."""

from __future__ import annotations

import random

import numpy as np
import pytest

from html_table_spark.operators.gif import decode_gif, encode_gif
from html_table_spark.operators.jpeg import decode_jpeg, encode_jpeg
from html_table_spark.operators.media import _decode_meta
from html_table_spark.operators.mp4 import decode_mp4_meta, encode_mp4_meta
from html_table_spark.operators.png import decode_png, encode_png
from html_table_spark.operators.wav import decode_wav, encode_wav

_nprng = np.random.default_rng(42)

_CASES = {
    "jpeg": (
        decode_jpeg,
        encode_jpeg(
            _nprng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8),
            subsample=True,
            restart_interval=2,
        ),
    ),
    "png": (
        decode_png,
        encode_png(_nprng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)),
    ),
    "gif": (
        decode_gif,
        encode_gif(
            _nprng.integers(0, 4, size=(8, 8), dtype=np.uint8),
            _nprng.integers(0, 256, size=(4, 3), dtype=np.uint8),
        ),
    ),
    "wav": (decode_wav, encode_wav(_nprng.uniform(-1, 1, size=(300, 2)), 8000)),
    "mp4": (decode_mp4_meta, encode_mp4_meta(320, 240, 50, 2.0)),
}


def _prog_payload() -> bytes:
    from html_table_spark.operators.jpeg import encode_jpeg_progressive

    return encode_jpeg_progressive(
        _nprng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8),
        subsample=True,
        restart_interval=2,
    )


_CASES["jpeg-prog"] = (decode_jpeg, _prog_payload())


@pytest.mark.parametrize("fmt", sorted(_CASES))
def test_mutation_fuzz_only_valueerror(fmt):
    decode, payload = _CASES[fmt]
    rng = random.Random(hash(fmt) & 0xFFFF)
    for _ in range(400):
        b = bytearray(payload)
        op = rng.randrange(3)
        if op == 0:  # flip 1-4 bytes
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:  # truncate
            b = b[: rng.randrange(len(b))]
        else:  # splice garbage
            pos = rng.randrange(len(b))
            b = (
                b[:pos]
                + bytes(rng.randrange(256) for _ in range(rng.randint(1, 16)))
                + b[pos:]
            )
        try:
            decode(bytes(b))
        except ValueError:
            pass  # the contract: corrupt input -> ValueError, nothing else


def test_jpeg_forged_dimensions_guarded():
    """A tiny payload declaring 65535x65535 must be rejected BEFORE the
    ~17 GB coefficient-grid allocation (executor-OOM vector at corpus
    scale), while a real large-but-flat image still decodes."""
    good = encode_jpeg(np.zeros((16, 16), np.uint8))
    i = good.index(b"\xff\xc0") + 5
    forged = good[:i] + b"\xff\xff\xff\xff" + good[i + 4 :]
    with pytest.raises(ValueError, match="exceed payload capacity"):
        decode_jpeg(forged)
    big = decode_jpeg(encode_jpeg(np.full((256, 256), 77, np.uint8)))
    assert big.shape == (256, 256, 1)


def test_decode_meta_never_raises_on_garbage():
    """_decode_meta is the default stage decode: any bytes at all must
    produce a row, falling through the tier ladder to the digest fake."""
    rng = random.Random(7)
    magics = [
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8", b"RIFF",
        b"RIFFxxxxWAVE", b"\x00\x00\x00\x10ftyp", b"",
    ]
    for i in range(200):
        prefix = rng.choice(magics)
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        w, h, n, feat = _decode_meta(prefix + junk, "application/octet-stream")
        assert len(feat) == 16

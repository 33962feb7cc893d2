"""GIF stdlib decoder tests (round-4, extends the PNG real-pixel tier).

Hand-assembled LZW bitstreams pin the decoder against the spec BYTE BY
BYTE (including the KwKwK self-reference case a literal-only encoder
can never emit); encoder/decoder roundtrips then sweep sizes, palettes
and interlacing."""

from __future__ import annotations

import numpy as np
import pytest

from html_table_spark.operators.gif import (
    _lzw_decode,
    decode_gif,
    encode_gif,
    gif_pixel_feature,
)
from html_table_spark.operators.media import _decode_meta, synthesize_media_table

RED, GREEN = (255, 0, 0), (0, 255, 0)


def _gif(w, h, gct, image_blocks):
    bits = max(1, (len(gct) - 1).bit_length())
    flags = 0x80 | (bits - 1)
    table = bytearray()
    for c in gct:
        table += bytes(c)
    table += b"\x00" * (3 * ((1 << bits) - len(gct)))
    return (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([flags, 0, 0]) + bytes(table) + image_blocks + b"\x3b"
    )


def _image_block(w, h, min_code, lzw_data, interlace=False):
    out = bytearray(
        b"\x2c\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0, min_code])
    )
    for off in range(0, len(lzw_data), 255):
        chunk = lzw_data[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _pack(codes, min_code):
    """LSB-first variable-width packing mirroring a conforming decoder's
    width schedule (width bumps when its table reaches 2^width)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    acc = n = 0
    out = bytearray()
    code_size = min_code + 1
    next_code = end + 1
    first = True
    for c in codes:
        acc |= c << n
        n += code_size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
        if c == clear:
            code_size, next_code, first = min_code + 1, end + 1, True
        elif c != end:
            if first:
                first = False
            else:
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_hand_computed_kwkwk():
    """codes [clear, 1, 6, end] at min_code=2: code 6 == next_code is the
    KwKwK case -> entry = prev + prev[0] = '11'; output indices 1,1,1."""
    data = _pack([4, 1, 6, 5], min_code=2)
    assert data == b"\x8c\x0b"  # hand-assembled: 4 | 1<<3 | 6<<6 | 5<<9
    assert bytes(_lzw_decode(2, data, 3)) == b"\x01\x01\x01"


def test_lzw_hand_computed_dictionary_hit():
    """codes [clear, 0, 1, 6, end]: after 0 then 1 the decoder holds
    table[6] = '01'; code 6 replays it -> indices 0,1,0,1."""
    data = _pack([4, 0, 1, 6, 5], min_code=2)
    assert bytes(_lzw_decode(2, data, 4)) == b"\x00\x01\x00\x01"


def test_decode_hand_built_file():
    block = _image_block(3, 1, 2, _pack([4, 1, 6, 5], min_code=2))
    px, n_frames = decode_gif(_gif(3, 1, [RED, GREEN], block))
    assert n_frames == 1
    assert px.tolist() == [[list(GREEN)] * 3]


def test_invalid_code_rejected():
    # code 7 fits the 3-bit width but is neither in the table (0..5)
    # nor the next free slot (6) -> invalid
    data = _pack([4, 1, 7, 5], min_code=2)
    block = _image_block(3, 1, 2, data)
    with pytest.raises(ValueError, match="invalid lzw code"):
        decode_gif(_gif(3, 1, [RED, GREEN], block))


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("size", [(1, 1), (7, 5), (16, 9), (40, 13)])
def test_encode_decode_roundtrip(size, interlace):
    w, h = size
    rng = np.random.default_rng(w * 100 + h + int(interlace))
    n_colors = int(rng.integers(2, 17))
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    indices = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    px, n_frames = decode_gif(encode_gif(indices, palette, interlace=interlace))
    assert n_frames == 1
    assert np.array_equal(px, palette[indices])


def test_width_growth_roundtrip():
    """A 256-color frame large enough that the mirrored decoder table
    crosses several width bumps (9 -> 12 bits)."""
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    indices = rng.integers(0, 256, size=(70, 80), dtype=np.uint8)
    px, _ = decode_gif(encode_gif(indices, palette))
    assert np.array_equal(px, palette[indices])


def test_multi_frame_counted_first_decoded():
    p = np.array([RED, GREEN], np.uint8)
    f1 = encode_gif(np.zeros((2, 2), np.uint8), p)
    f2 = encode_gif(np.ones((2, 2), np.uint8), p)
    # splice frame 2's image block before frame 1's trailer; the encoder
    # pads a 2-color palette to a 4-entry GCT (min bits = 2) -> 12 bytes
    two = f1[:-1] + f2[6 + 7 + 12:]  # skip f2's header+LSD+GCT
    px, n_frames = decode_gif(two)
    assert n_frames == 2
    assert px.tolist() == [[list(RED)] * 2] * 2  # FIRST frame's pixels


def test_truncated_rejected():
    good = encode_gif(np.zeros((4, 4), np.uint8), np.array([RED, GREEN], np.uint8))
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF88a" + good[6:])


def test_decode_meta_gif_tier():
    # gif-full tier refs are complete GIFs: real dims + real feature
    # marker + real frame count
    from html_table_spark.operators.media import refs_for_tier

    row = synthesize_media_table(refs_for_tier("gif-full", 1))[0]
    w, h, n, feat = _decode_meta(row["payload"], row["mime"])
    px, frames = decode_gif(row["payload"])
    assert (w, h, n) == (px.shape[1], px.shape[0], frames)
    assert feat[15] == 1.0
    assert feat[0] == pytest.approx(px.mean() / 255.0, rel=1e-6)


def test_gif_pixel_feature_layout():
    p = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.array([[1, 1], [1, 1]], np.uint8)  # all white
    w, h, n, feat = gif_pixel_feature(encode_gif(idx, p))
    assert (w, h, n) == (2, 2, 1)
    assert feat[0] == pytest.approx(1.0)
    assert feat[14] == pytest.approx(3 / 4)
    assert feat[15] == 1.0

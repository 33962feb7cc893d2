"""Baseline JPEG stdlib decoder tests (round-4: last media-tier seam).

Same discipline as test_media_png.py: hand-assembled byte fixtures pin
absolute correctness of the entropy decode + IDCT against spec math
computed IN THE TEST (an encoder/decoder roundtrip alone could hide a
bug shared by both directions); roundtrips then sweep shapes, sampling
factors and restart intervals."""

from __future__ import annotations

import math

import numpy as np
import pytest

from html_table_spark.operators.jpeg import (
    _STD_AC_LUMA,
    _STD_DC_LUMA,
    decode_jpeg,
    encode_jpeg,
    jpeg_pixel_feature,
)
from html_table_spark.operators.media import (
    _decode_fake,
    _decode_meta,
    synthesize_media_table,
)


# ---------------------------------------------------------------------------
# hand-assembled fixtures: 8x8 grayscale, flat quant table of 1s, standard
# Annex K luma tables, entropy bytes written by hand from T.81 tables
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _gray_8x8(scan: bytes) -> bytes:
    """Complete single-component 8x8 baseline JPEG around hand-written
    entropy-coded bytes."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    bits, vals = _STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bits + vals)
    bits, vals = _STD_AC_LUMA
    out += _seg(0xC4, bytes([0x10]) + bits + vals)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def test_dc_only_zero_hand_computed():
    # DC diff category 0 -> luma DC code "00" (the single length-2 code);
    # EOB -> luma AC code "1010" (first length-4 code). Bits 001010 + pad
    # "11" = 0x2B. All coefficients 0 -> every pixel = 0 + 128.
    px = decode_jpeg(_gray_8x8(bytes([0b00101011])))
    assert px.shape == (8, 8, 1)
    assert (px == 128).all()


def test_dc_extend_hand_computed():
    # DC diff +256: category 9 (luma DC code "1111110"), 9 value bits
    # 100000000; EOB "1010"; pad 4 one-bits:
    # 1111110 100000000 1010 1111 -> 0xFD 0x00 0xAF.
    # Orthonormal DC basis: pixel = 256/8 + 128 = 160 exactly.
    px = decode_jpeg(_gray_8x8(bytes([0xFD, 0x00, 0xAF])))
    assert (px == 160).all()


def test_dc_negative_extend_hand_computed():
    # DC diff -8: category 4 (luma DC len-3 code "101"), EXTEND: value
    # bits for -8 are (−8 + 2^4 − 1) = 7 = 0111; EOB "1010"; bits
    # 101 0111 1010 + pad "11" + "1111" (to 2 bytes): 1010111 1010 11...
    # -> 10101111 01011111 = 0xAF 0x5F. Pixel = -8/8 + 128 = 127.
    px = decode_jpeg(_gray_8x8(bytes([0xAF, 0x5F])))
    assert (px == 127).all()


def test_single_ac_coefficient_hand_computed():
    # DC 0 ("00"), then AC run=0/size=4 -> symbol 0x04, luma AC code
    # "1011"; value +8 -> bits 1000; EOB "1010"; pad "11":
    # 00 1011 1000 1010 11 -> 0b00101110 0b00101011 = 0x2E 0x2B.
    # Coefficient sits at zigzag index 1 = natural (0,1): the IDCT puts
    # pixel(y,x) = 8 * c0*c1*cos((2x+1)pi/16) + 128 with c0 = sqrt(1/8),
    # c1 = sqrt(2/8) — computed here from math.cos, independent of the
    # module's basis matrix.
    px = decode_jpeg(_gray_8x8(bytes([0x2E, 0x2B])))
    c0, c1 = math.sqrt(1 / 8), math.sqrt(2 / 8)
    for x in range(8):
        want = round(8 * c0 * c1 * math.cos((2 * x + 1) * math.pi / 16) + 128)
        assert px[:, x, 0].tolist() == [want] * 8


def test_zrl_sixteen_zero_run_hand_computed():
    # DC 0 ("00"); ZRL (0xF0, luma AC code "11111111001" — the first of
    # the four length-11 codes after 0x15/0x52/0xD1 ... assert via the
    # encoder's own table lookup to avoid transcribing 162 codes); then
    # run=0/size=1 value 1 at zigzag 17, EOB. Rather than hand-pack the
    # long ZRL code, drive the encoder to produce a block whose only
    # nonzero AC sits at zigzag index 17 (>16 zeros -> forces ZRL) and
    # assert the decoder reproduces the exact quantized spectrum via a
    # DC-free comparison.
    from html_table_spark.operators.jpeg import _A, _ZIGZAG

    coef = np.zeros(64)
    coef[17] = 5.0
    nat = np.zeros(64)
    nat[_ZIGZAG] = coef
    block = _A.T @ nat.reshape(8, 8) @ _A + 128.0
    # block is not integral; quantize through the encoder at quant=1 and
    # check the decoder's output equals its own re-decode expectation
    px = decode_jpeg(encode_jpeg(np.clip(np.round(block), 0, 255).astype(np.uint8)))
    assert px.shape == (8, 8, 1)
    # spectrum survives the trip: re-derive the dominant coefficient
    spec = _A @ (px[:, :, 0].astype(np.float64) - 128.0) @ _A.T
    nat_idx = _ZIGZAG[17]
    # the uint8 rounding of the synthetic block perturbs each pixel by up
    # to 0.5, which leaks up to ~2 into any single coefficient
    assert abs(spec.flat[nat_idx] - 5.0) < 2.0
    others = np.abs(spec.flat[np.setdiff1d(np.arange(64), [nat_idx, 0])])
    assert others.max() < 2.5


# ---------------------------------------------------------------------------
# roundtrips (encoder is a separate code path: forward DCT + Huffman encode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("size", [(1, 1), (8, 8), (7, 3), (17, 19), (33, 9)])
def test_roundtrip_grayscale_noise(size):
    w, h = size
    rng = np.random.default_rng(w * 100 + h)
    pixels = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(pixels))
    assert out.shape == (h, w, 1)
    assert np.abs(out[:, :, 0].astype(int) - pixels.astype(int)).max() <= 2


@pytest.mark.parametrize("size", [(8, 8), (24, 33), (13, 21)])
def test_roundtrip_rgb_444(size):
    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(xx * 2 + yy) % 256, (xx + yy * 3) % 256, (xx * 4) % 256], -1)
    out = decode_jpeg(encode_jpeg(rgb.astype(np.uint8)))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - rgb).max() <= 4


@pytest.mark.parametrize("size", [(16, 16), (24, 33), (13, 21)])
def test_roundtrip_rgb_420_subsampled(size):
    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(xx * 2 + yy) % 256, (xx + yy * 3) % 256, (xx * 4) % 256], -1)
    out = decode_jpeg(encode_jpeg(rgb.astype(np.uint8), subsample=True))
    assert out.shape == (h, w, 3)
    # chroma is box-averaged then replicated: bounded by the local slope
    assert np.abs(out.astype(int) - rgb).max() <= 10


def test_roundtrip_constant_chroma_420_tight():
    # grayscale content in RGB: chroma planes are constant 128, so 4:2:0
    # loses nothing and the trip must be near-exact
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(19, 22), dtype=np.uint8)
    rgb = np.stack([g, g, g], -1)
    out = decode_jpeg(encode_jpeg(rgb, subsample=True))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(pixels))
    with_rst = decode_jpeg(encode_jpeg(pixels, restart_interval=2))
    assert np.array_equal(plain, with_rst)
    # the restart stream really contains RSTn markers
    enc = encode_jpeg(pixels, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))


def test_roundtrip_coarse_quant_still_decodes():
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(pixels, quant_luma=16))
    assert out.shape == (16, 16, 1)
    # coarse quant is lossy but must stay in the right neighbourhood
    assert np.abs(out[:, :, 0].astype(float) - pixels).mean() < 24


# ---------------------------------------------------------------------------
# rejection paths (fall back to the header tier in media.py)
# ---------------------------------------------------------------------------


def test_sof2_with_baseline_scan_rejected():
    # SOF2 decodes for real since round 5, but a baseline full-band scan
    # (Ss=0, Se=63) inside a progressive frame is malformed: T.81
    # G.1.1.1.1 forbids DC and AC sharing a progressive scan
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    mutated = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(mutated)


def test_lossless_sof3_rejected():
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    mutated = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="unsupported frame type"):
        decode_jpeg(mutated)


def test_twelve_bit_precision_rejected():
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    i = good.index(b"\xff\xc0") + 4
    mutated = good[:i] + bytes([12]) + good[i + 1 :]
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(mutated)


def test_truncated_scan_rejected():
    good = encode_jpeg(np.full((16, 16), 200, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])


def test_sixteen_bit_dqt_rejected():
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    i = good.index(b"\xff\xdb") + 4
    mutated = good[:i] + bytes([0x10]) + good[i + 1 :]
    with pytest.raises(ValueError, match="quant"):
        decode_jpeg(mutated)


def test_bad_soi_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00stuff")


def test_missing_huffman_table_rejected():
    # strip the AC DHT segment (class 1, id 0): scan then references a
    # table that was never defined
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    i = good.index(bytes([0xFF, 0xC4, 0x00]))  # first DHT
    seglen = int.from_bytes(good[i + 2 : i + 4], "big")
    j = i + 2 + seglen  # second DHT (AC)
    assert good[j : j + 2] == b"\xff\xc4"
    seglen2 = int.from_bytes(good[j + 2 : j + 4], "big")
    mutated = good[:j] + good[j + 2 + seglen2 :]
    with pytest.raises(ValueError, match="missing huffman"):
        decode_jpeg(mutated)


# ---------------------------------------------------------------------------
# feature + media-tier integration
# ---------------------------------------------------------------------------


def test_pixel_feature_layout():
    pixels = np.zeros((4, 8, 3), np.uint8)
    pixels[:, :, 0] = 255  # pure red
    w, h, feat = jpeg_pixel_feature(encode_jpeg(pixels))
    assert (w, h) == (8, 4)
    # JPEG is lossy: the color transform rounds, so approx with slack
    assert feat[0] == pytest.approx(1 / 3, abs=0.02)
    assert feat[2] == pytest.approx(1.0, abs=0.02)   # mean R
    assert feat[3] == pytest.approx(0.0, abs=0.02)   # mean G
    assert feat[14] == pytest.approx(3 / 4)
    assert feat[15] == 1.0                           # real-decode marker


def test_decode_meta_jpeg_tiers():
    # tier 1: complete baseline JPEG -> real pixels
    pixels = np.full((10, 14), 90, np.uint8)
    payload = encode_jpeg(pixels)
    w, h, n, feat = _decode_meta(payload, "image/jpeg")
    assert (w, h, n) == (14, 10, 1)
    assert feat[15] == 1.0 and feat[0] == pytest.approx(90 / 255, abs=0.01)
    # tier 2: header readable, body undecodable (progressive) -> header
    # dims + digest-fake features
    progressive = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    w2, h2, n2, feat2 = _decode_meta(progressive, "image/jpeg")
    assert (w2, h2, n2) == (14, 10, 1)
    assert np.allclose(feat2, _decode_fake(progressive, "image/jpeg")[3])
    assert feat2[15] != 1.0


def test_synthesize_media_table_jpeg_tier():
    from html_table_spark.operators.media import refs_for_tier

    refs = refs_for_tier("jpeg-full", 8)
    rows = synthesize_media_table(refs)
    shapes = set()
    for row in rows:
        assert row["mime"] == "image/jpeg"
        w, h, n, feat = _decode_meta(row["payload"], row["mime"])
        assert feat[15] == 1.0, "every '7' payload must reach the real tier"
        px = decode_jpeg(row["payload"])
        assert (px.shape[1], px.shape[0]) == (w, h)
        shapes.add(px.shape[2])
    assert shapes == {1, 3}, "digest rotation must cover gray and color"


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — round 5
# ---------------------------------------------------------------------------


def _prog_enc():
    from html_table_spark.operators.jpeg import encode_jpeg_progressive

    return encode_jpeg_progressive


@pytest.mark.parametrize("size", [(8, 8), (23, 31), (16, 17), (40, 56)])
def test_progressive_gray_matches_baseline_decode(size):
    # the scan script transmits every coefficient bit, so progressive and
    # baseline encodings of the same pixels must decode BIT-IDENTICALLY —
    # a differential oracle that catches any scan-accounting bug
    rng = np.random.default_rng(sum(size))
    px = rng.integers(0, 256, size=size, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(_prog_enc()(px))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_rgb_matches_baseline_decode(subsample):
    rng = np.random.default_rng(5 + subsample)
    px = rng.integers(0, 256, size=(21, 26, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, subsample=subsample))
    prog = decode_jpeg(_prog_enc()(px, subsample=subsample))
    assert np.array_equal(base, prog)


def test_progressive_restart_markers_match_baseline():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(17, 18, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, restart_interval=2))
    prog = decode_jpeg(_prog_enc()(px, restart_interval=2))
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_span_many_blocks():
    # a large flat image: every AC band is all-zero, so the luma AC scan
    # collapses to EOBn runs spanning dozens of blocks (and the chroma
    # scans likewise) — the EOBRUN accumulate/consume paths must agree
    px = np.full((64, 80, 3), 200, np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(_prog_enc()(px))
    assert np.array_equal(base, prog)


def test_progressive_coarse_quant_matches_baseline():
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quant_luma=16))
    prog = decode_jpeg(_prog_enc()(px, quant_luma=16))
    assert np.array_equal(base, prog)


def test_progressive_spectral_only_script():
    # spectral selection WITHOUT successive approximation (Ah=Al=0
    # everywhere) is also a legal progressive stream
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(20, 22, 3), dtype=np.uint8)
    script = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 20, 0, 0),
        ([0], 21, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(_prog_enc()(px, scan_script=script))
    assert np.array_equal(base, prog)


def test_progressive_partial_scan_script_decodes_dc_average():
    # a DC-only progressive stream is legal (T.81 G permits any
    # coverage): pixels decode to per-block averages, no AC detail
    px = np.full((16, 16), 77, np.uint8)
    script = [([0], 0, 0, 0, 0)]
    out = decode_jpeg(_prog_enc()(px, scan_script=script))
    assert out.shape == (16, 16, 1)
    assert np.all(out == 77)


def test_progressive_truncated_rejected():
    px = np.full((32, 32), 150, np.uint8)
    payload = _prog_enc()(px)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_progressive_media_tier_real_decode():
    from html_table_spark.operators.media import refs_for_tier

    refs = refs_for_tier("jpeg-prog", 8)
    rows = synthesize_media_table(refs)
    shapes = set()
    for row in rows:
        assert row["mime"] == "image/jpeg"
        w, h, n, feat = _decode_meta(row["payload"], row["mime"])
        assert feat[15] == 1.0, "progressive payloads must real-decode"
        px = decode_jpeg(row["payload"])
        assert (px.shape[1], px.shape[0]) == (w, h)
        assert row["payload"].find(b"\xff\xc2") > 0  # really SOF2
        shapes.add(px.shape[2])
    assert shapes == {1, 3}, "digest rotation must cover gray and color"

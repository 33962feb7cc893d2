"""WAV (RIFF PCM) and MP4 (ISO-BMFF metadata) decoder tests — round-4
audio/video legs of the multimodal tier.

Same discipline as the PNG/GIF/JPEG suites: hand-assembled byte
fixtures pin decoder correctness against values computed by hand from
the public specs; encoder round-trips then sweep shapes."""

from __future__ import annotations

import numpy as np
import pytest

from html_table_spark.operators.media import (
    _decode_meta,
    media_tier,
    refs_for_tier,
    synthesize_media_table,
)
from html_table_spark.operators.mp4 import (
    decode_mp4_meta,
    encode_mp4_meta,
    is_mp4,
)
from html_table_spark.operators.wav import (
    audio_feature,
    decode_wav,
    encode_wav,
    wav_audio_feature,
)

# ---------------------------------------------------------------------------
# WAV: hand-assembled fixtures
# ---------------------------------------------------------------------------


def _wav_bytes(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    chunks = extra
    chunks += b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _fmt(tag: int, channels: int, rate: int, bits: int) -> bytes:
    block = channels * bits // 8
    return (
        tag.to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )


def test_wav_16bit_hand_computed():
    # two stereo frames, s16le: (0, 16384), (-32768, 32767)
    data = (
        (0).to_bytes(2, "little", signed=True)
        + (16384).to_bytes(2, "little", signed=True)
        + (-32768).to_bytes(2, "little", signed=True)
        + (32767).to_bytes(2, "little", signed=True)
    )
    rate, ch, s = decode_wav(_wav_bytes(_fmt(1, 2, 8000, 16), data))
    assert (rate, ch) == (8000, 2)
    assert s.shape == (2, 2)
    assert s[0].tolist() == [0.0, 0.5]
    assert s[1, 0] == -1.0
    assert s[1, 1] == pytest.approx(32767 / 32768)


def test_wav_8bit_unsigned_hand_computed():
    # mono u8: 128 -> 0.0, 0 -> -1.0, 255 -> 127/128 (odd size: pad byte)
    data = bytes([128, 0, 255])
    rate, ch, s = decode_wav(_wav_bytes(_fmt(1, 1, 11025, 8), data))
    assert (rate, ch) == (11025, 1)
    assert s[:, 0].tolist() == [0.0, -1.0, 127 / 128]


def test_wav_float32_hand_computed():
    data = np.array([0.25, -0.75], "<f4").tobytes()
    rate, ch, s = decode_wav(_wav_bytes(_fmt(3, 1, 48000, 32), data))
    assert (rate, ch) == (48000, 1)
    assert s[:, 0].tolist() == [0.25, -0.75]


def test_wav_extra_chunk_skipped_and_word_alignment():
    # a LIST chunk with ODD size before fmt: the walker must honor the
    # pad byte or it desyncs off every later chunk
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    data = bytes([128, 128])
    rate, ch, s = decode_wav(_wav_bytes(_fmt(1, 1, 8000, 8), data, extra=extra))
    assert s.shape == (2, 1)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"RIFX" + b[4:], "RIFF"),
        (lambda b: b[:8] + b"WAVX" + b[12:], "RIFF"),
        (lambda b: b[:-3], "truncated"),
    ],
)
def test_wav_corrupt_rejected(mutate, msg):
    good = encode_wav(np.zeros((4, 1)), 8000)
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(good))


def test_wav_unsupported_and_missing_rejected():
    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(_wav_bytes(_fmt(2, 1, 8000, 4), b"\x00\x00"))  # ADPCM
    with pytest.raises(ValueError, match="missing fmt"):
        data = b"data" + (2).to_bytes(4, "little") + b"\x00\x00"
        decode_wav(b"RIFF" + (4 + len(data)).to_bytes(4, "little") + b"WAVE" + data)
    with pytest.raises(ValueError, match="missing data"):
        fmt = b"fmt " + (16).to_bytes(4, "little") + _fmt(1, 1, 8000, 16)
        decode_wav(b"RIFF" + (4 + len(fmt)).to_bytes(4, "little") + b"WAVE" + fmt)
    with pytest.raises(ValueError, match="empty data"):
        decode_wav(_wav_bytes(_fmt(1, 1, 8000, 16), b""))


@pytest.mark.parametrize("bits", [8, 16, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(bits, channels):
    rng = np.random.default_rng(bits * 10 + channels)
    samples = rng.uniform(-0.95, 0.95, size=(500, channels))
    rate, ch, out = decode_wav(encode_wav(samples, 16000, bits=bits))
    assert (rate, ch) == (16000, channels)
    tol = {8: 1 / 128, 16: 1 / 32768, 32: 1e-7}[bits]
    assert np.abs(out - samples).max() <= tol + 1e-12


def test_audio_feature_layout():
    # constant zero signal: mean 0 -> [0]=0.5, rms/peak/zcr 0
    rate, samples = 8000, np.zeros((100, 1))
    feat = audio_feature(rate, samples)
    assert feat[0] == 0.5 and feat[1] == 0.0 and feat[2] == 0.0
    assert feat[3] == 0.0 and feat[15] == 1.0
    # full-scale square wave: rms 1, peak 1, zcr alternates every frame
    sq = np.tile([[1.0], [-1.0]], (50, 1))
    feat = audio_feature(rate, sq)
    assert feat[1] == pytest.approx(1.0)
    assert feat[2] == 1.0
    assert feat[3] == pytest.approx(1.0)  # 99 crossings / 99 gaps
    assert feat[6] == pytest.approx(1 / 8)  # 1 channel


def test_wav_audio_feature_frames_channels():
    samples = np.zeros((321, 2))
    samples[0, 0] = 0.5
    frames, ch, feat = wav_audio_feature(encode_wav(samples, 44100))
    assert (frames, ch) == (321, 2)
    assert feat[6] == pytest.approx(2 / 8)
    assert feat[5] == pytest.approx(44100 / 192000)


# ---------------------------------------------------------------------------
# MP4: hand-assembled fixtures
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


_FTYP = _box(b"ftyp", b"isom" + bytes(4) + b"isom")


def test_mp4_mvhd_v0_hand_computed():
    # timescale 1000, duration 2500 -> 2.5 s (offsets per 14496-12 §8.2.2:
    # version+flags 4, ctime 4, mtime 4, timescale@12, duration@16)
    mvhd = bytes(4) + bytes(8) + (1000).to_bytes(4, "big") + (2500).to_bytes(4, "big")
    mvhd += bytes(80)
    meta = decode_mp4_meta(_FTYP + _box(b"moov", _box(b"mvhd", mvhd)))
    assert meta["duration_sec"] == 2.5
    assert "width" not in meta and meta.get("n_tracks", 0) == 0


def test_mp4_tkhd_fixed_point_hand_computed():
    # tkhd v0: width/height are 16.16 fixed point at payload offset 76/80;
    # 0x01400000 = 320.0, 0x00F08000 = 240.5
    mvhd = bytes(4) + bytes(8) + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    mvhd += bytes(80)
    tkhd = bytes(76) + bytes.fromhex("01400000") + bytes.fromhex("00F08000")
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    meta = decode_mp4_meta(_FTYP + moov)
    assert meta["width"] == 320.0
    assert meta["height"] == 240.5
    assert meta["n_tracks"] == 1


def test_mp4_largesize_and_size_zero_boxes():
    mvhd = bytes(4) + bytes(8) + (100).to_bytes(4, "big") + (250).to_bytes(4, "big")
    mvhd += bytes(80)
    inner = _box(b"mvhd", mvhd)
    # moov with 64-bit largesize (size field == 1)
    large_moov = (
        (1).to_bytes(4, "big") + b"moov" + (16 + len(inner)).to_bytes(8, "big") + inner
    )
    meta = decode_mp4_meta(_FTYP + large_moov)
    assert meta["duration_sec"] == 2.5
    # moov with size 0 (extends to end of file)
    zero_moov = (0).to_bytes(4, "big") + b"moov" + inner
    meta = decode_mp4_meta(_FTYP + zero_moov)
    assert meta["duration_sec"] == 2.5


def test_mp4_stts_frame_count_hand_computed():
    # two entries: 24 samples + 1 sample = 25 frames
    stts = bytes(4) + (2).to_bytes(4, "big")
    stts += (24).to_bytes(4, "big") + (40).to_bytes(4, "big")
    stts += (1).to_bytes(4, "big") + (40).to_bytes(4, "big")
    mvhd = bytes(4) + bytes(8) + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    mvhd += bytes(80)
    trak = _box(
        b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", _box(b"stts", stts))))
    )
    meta = decode_mp4_meta(_FTYP + _box(b"moov", _box(b"mvhd", mvhd) + trak))
    assert meta["n_frames"] == 25


def test_mp4_corrupt_rejected():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4_meta(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="no moov"):
        decode_mp4_meta(_FTYP)
    # box claiming to extend past its container
    bad = _FTYP + (64).to_bytes(4, "big") + b"moov"
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_meta(bad)
    # zero mvhd timescale
    mvhd = bytes(4) + bytes(8) + (0).to_bytes(4, "big") + (1).to_bytes(4, "big")
    mvhd += bytes(80)
    with pytest.raises(ValueError, match="timescale"):
        decode_mp4_meta(_FTYP + _box(b"moov", _box(b"mvhd", mvhd)))


@pytest.mark.parametrize("version", [0, 1])
def test_mp4_encoder_roundtrip(version):
    payload = encode_mp4_meta(854, 480, 123, 4.92, version=version)
    assert is_mp4(payload)
    meta = decode_mp4_meta(payload)
    assert meta["width"] == 854.0 and meta["height"] == 480.0
    assert meta["n_frames"] == 123
    assert meta["duration_sec"] == pytest.approx(4.92, abs=1e-3)
    assert meta["n_tracks"] == 1


# ---------------------------------------------------------------------------
# media-tier integration
# ---------------------------------------------------------------------------


def test_decode_meta_wav_tier():
    ref = refs_for_tier("wav-pcm", 1)[0]
    row = synthesize_media_table([ref])[0]
    assert row["mime"] == "audio/wav"
    w, h, n, feat = _decode_meta(row["payload"], row["mime"])
    assert w is None and h is None  # audio has no dimensions
    rate, channels, samples = decode_wav(row["payload"])
    assert n == samples.shape[0]
    assert feat[15] == 1.0  # real decode marker


def test_decode_meta_mp4_tier():
    ref = refs_for_tier("mp4-meta", 1)[0]
    row = synthesize_media_table([ref])[0]
    assert row["mime"] == "video/mp4"
    w, h, n, feat = _decode_meta(row["payload"], row["mime"])
    meta = decode_mp4_meta(row["payload"])
    assert (w, h) == (round(meta["width"]), round(meta["height"]))
    assert n == meta["n_frames"] > 1
    assert feat[15] != 1.0  # metadata-real tier, features stay fake


def test_all_tiers_reachable_in_oracle_corpus():
    """The digest tier map must keep EVERY tier reachable from the
    driver's oracle corpus (the round-3 last-char scheme silently
    excluded GIF/JPEG tiers because corpus refs only end in 0-5)."""
    from html_table_spark.corpus import synthesize_documents
    from html_table_spark.operators.media import MEDIA_TIERS

    docs = synthesize_documents(n_docs=64, seed=13, media_fraction=1.0)
    refs = {
        s["media_ref"]
        for d in docs
        for s in d["spans"]
        if s["kind"] == "media" and s["media_ref"]
    }
    seen = {media_tier(r) for r in refs}
    assert seen == set(MEDIA_TIERS)

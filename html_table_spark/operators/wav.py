"""Stdlib-only WAV (RIFF) PCM audio decode — the audio leg of the
multimodal tier (round-4).

Implements the public RIFF/WAVE container format (Microsoft/IBM
multimedia programming interface spec; the de-facto audio interchange
format): chunk walk with even-byte padding, ``fmt `` parse, PCM sample
decode for the three uncompressed layouts (8-bit unsigned, 16-bit
signed little-endian, 32-bit IEEE float), and a real signal-statistics
feature vector (RMS, peak, zero-crossing rate, duration) in the same
16-float layout the image tiers emit.

Scope (honest seams — callers fall back to the deterministic fake):
- format tags 1 (PCM, 8/16-bit) and 3 (IEEE float, 32-bit) only;
  compressed formats (ADPCM, MP3-in-WAV, extensible subformats) raise
- the feature vector summarizes up to the whole ``data`` chunk; at
  corpus scale tune Arrow batch size down for multi-minute payloads

Reference parity note: the reference (bakame-php/html-table) never
decodes media — this serves the training-data-pipeline operator set
(multimodal columns), SURVEY.md LLM-pipeline section.
"""

from __future__ import annotations

import numpy as np

FEATURE_DIM = 16


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode to (sample_rate, n_channels, samples) where ``samples`` is
    a float64 (n_frames, n_channels) array normalized to [-1, 1], or
    raise ValueError."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE header")
    fmt = None
    data = None
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + size]
        if len(body) != size:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = (
                int.from_bytes(body[0:2], "little"),   # audio format tag
                int.from_bytes(body[2:4], "little"),   # channels
                int.from_bytes(body[4:8], "little"),   # sample rate
                int.from_bytes(body[14:16], "little"),  # bits per sample
            )
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned (pad byte)
    if fmt is None:
        raise ValueError("wav: missing fmt chunk")
    if data is None:
        raise ValueError("wav: missing data chunk")
    tag, channels, rate, bits = fmt
    if channels < 1 or rate < 1:
        raise ValueError("wav: bad fmt values")
    if tag == 1 and bits == 16:
        raw = np.frombuffer(data[: len(data) - len(data) % (2 * channels)], "<i2")
        samples = raw.astype(np.float64) / 32768.0
    elif tag == 1 and bits == 8:
        raw = np.frombuffer(data[: len(data) - len(data) % channels], np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    elif tag == 3 and bits == 32:
        raw = np.frombuffer(data[: len(data) - len(data) % (4 * channels)], "<f4")
        samples = raw.astype(np.float64)
    else:
        raise ValueError(f"wav: unsupported format tag {tag} / {bits}-bit")
    if samples.size == 0:
        raise ValueError("wav: empty data chunk")
    return rate, channels, samples.reshape(-1, channels)


def audio_feature(rate: int, samples: np.ndarray) -> np.ndarray:
    """FEATURE_DIM float32 vector of REAL signal stats for a normalized
    (n_frames, n_channels) array — the audio twin of png.pixel_feature.

    Layout (all in [0, 1]):
      [0] (mean+1)/2  [1] rms  [2] peak |x|  [3] zero-crossing rate
      [4] duration_sec/3600 (capped)  [5] sample_rate/192000
      [6] channels/8  [7:9] per-channel rms (pad 0)
      [10] (min+1)/2  [11] (max+1)/2  [12] log10(n_frames)/10
      [15] 1.0 (real-decode marker; the digest fake never sets it)
    """
    frames, ch = samples.shape
    feat = np.zeros(FEATURE_DIM, np.float32)
    feat[0] = (samples.mean() + 1.0) / 2.0
    feat[1] = min(1.0, float(np.sqrt((samples**2).mean())))
    feat[2] = min(1.0, float(np.abs(samples).max()))
    mono = samples.mean(axis=1)
    feat[3] = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(1, frames - 1)
    feat[4] = min(1.0, frames / rate / 3600.0)
    feat[5] = min(1.0, rate / 192000.0)
    feat[6] = min(1.0, ch / 8.0)
    per_ch = np.sqrt((samples**2).mean(axis=0))
    feat[7 : 7 + min(ch, 2)] = np.minimum(1.0, per_ch[:2])
    feat[10] = (samples.min() + 1.0) / 2.0
    feat[11] = (samples.max() + 1.0) / 2.0
    feat[12] = min(1.0, np.log10(max(1, frames)) / 10.0)
    feat[15] = 1.0
    return feat


def wav_audio_feature(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(n_frames, n_channels, feature) via the full PCM decode — the
    media-tier adapter (frames/channels land in the n_frames column and
    the feature; WAV has no width/height)."""
    rate, channels, samples = decode_wav(payload)
    return samples.shape[0], channels, audio_feature(rate, samples)


# ---------------------------------------------------------------------------
# encoder (fixtures/tests only) — separate code path from the decoder
# ---------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, rate: int = 8000, bits: int = 16
) -> bytes:
    """Minimal PCM writer for a normalized float (n_frames, n_channels)
    array; ``bits`` in {8, 16, 32} selects u8 / s16le / f32le."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    frames, channels = s.shape
    if bits == 16:
        raw = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2").tobytes()
        tag, block = 1, 2 * channels
    elif bits == 8:
        raw = np.clip(np.round(s * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
        tag, block = 1, channels
    elif bits == 32:
        raw = s.astype("<f4").tobytes()
        tag, block = 3, 4 * channels
    else:
        raise ValueError("encode_wav: bits must be 8, 16 or 32")
    fmt = (
        tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    if len(raw) & 1:
        chunks += b"\x00"  # word-align
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

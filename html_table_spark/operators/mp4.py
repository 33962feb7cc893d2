"""Stdlib-only MP4 / ISO-BMFF metadata decode — the video leg of the
multimodal tier (round-4).

Video PIXEL decode needs entropy codecs (H.264/VP9/AV1) that are out of
scope for a stdlib sandbox, but the CONTAINER metadata a training
pipeline filters on — duration, display dimensions, frame count, track
layout — is pure big-endian struct reads off the public spec (ISO/IEC
14496-12 "ISO base media file format"): a recursive box walk through
``moov`` for ``mvhd`` (timescale + duration), per-``trak`` ``tkhd``
(16.16 fixed-point display width/height) and ``stbl/stts`` (decode-time
table whose sample counts sum to the real frame count).

Scope (honest seams — callers fall back to the deterministic fake):
- no mdat parsing, no codec-specific sample entries; frame count comes
  from the stts sample table (absent table → frame count 0 → caller
  treats as metadata-only)
- 32- and 64-bit box sizes, mvhd/tkhd versions 0 and 1

Reference parity note: the reference (bakame-php/html-table) never
decodes media — this serves the training-data-pipeline operator set
(multimodal columns), SURVEY.md LLM-pipeline section.
"""

from __future__ import annotations

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in [start,
    end) — handles 64-bit largesize and size-0 (extends to end)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            payload = i + 16
        elif size == 0:
            size = end - i
        if size < payload - i or i + size > end:
            raise ValueError("mp4: box overruns container")
        yield btype, payload, i + size
        i += size


def _walk(b: bytes, start: int, end: int, found: dict) -> None:
    for btype, ps, pe in _boxes(b, start, end):
        if btype in _CONTAINERS:
            if btype == b"trak":
                found["n_tracks"] = found.get("n_tracks", 0) + 1
            _walk(b, ps, pe, found)
        elif btype == b"mvhd":
            v = b[ps]
            if v == 1:
                timescale = int.from_bytes(b[ps + 20 : ps + 24], "big")
                duration = int.from_bytes(b[ps + 24 : ps + 32], "big")
            else:
                timescale = int.from_bytes(b[ps + 12 : ps + 16], "big")
                duration = int.from_bytes(b[ps + 16 : ps + 20], "big")
            if timescale == 0:
                raise ValueError("mp4: zero mvhd timescale")
            found["duration_sec"] = duration / timescale
        elif btype == b"tkhd":
            v = b[ps]
            off = ps + (88 if v == 1 else 76)
            if off + 8 > pe:
                raise ValueError("mp4: short tkhd")
            w = int.from_bytes(b[off : off + 4], "big") / 65536.0
            h = int.from_bytes(b[off + 4 : off + 8], "big") / 65536.0
            if w > 0 and h > 0:  # audio tracks carry 0x0 — keep video dims
                found.setdefault("width", w)
                found.setdefault("height", h)
        elif btype == b"stts":
            entries = int.from_bytes(b[ps + 4 : ps + 8], "big")
            total = 0
            p = ps + 8
            for _ in range(entries):
                if p + 8 > pe:
                    raise ValueError("mp4: short stts")
                total += int.from_bytes(b[p : p + 4], "big")
                p += 8
            found["n_frames"] = max(found.get("n_frames", 0), total)


def decode_mp4_meta(payload: bytes) -> dict:
    """Parse container metadata: ``{"width", "height", "n_frames",
    "duration_sec", "n_tracks"}`` (width/height absent for audio-only
    files, n_frames 0 without an stts table) or raise ValueError."""
    b = payload or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp")
    found: dict = {}
    _walk(b, 0, len(b), found)
    if "duration_sec" not in found:
        raise ValueError("mp4: no moov/mvhd")
    return found


def is_mp4(payload: bytes) -> bool:
    b = payload or b""
    return len(b) >= 12 and b[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# encoder (fixtures/tests only) — separate code path from the decoder
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def encode_mp4_meta(
    width: int,
    height: int,
    n_frames: int,
    duration_sec: float,
    timescale: int = 1000,
    version: int = 0,
) -> bytes:
    """Minimal ftyp+moov fixture: one video trak with tkhd dimensions and
    an stts whose sample counts sum to ``n_frames`` (split across two
    entries when possible, so the decoder's entry loop is exercised)."""
    dur = round(duration_sec * timescale)
    if version == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big")
        mvhd += dur.to_bytes(8, "big") + b"\x00" * 80
        tkhd_pre = bytes([1, 0, 0, 0]) + b"\x00" * 32 + b"\x00" * 52
    else:
        mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(4, "big")
        mvhd += dur.to_bytes(4, "big") + b"\x00" * 80
        tkhd_pre = bytes([0, 0, 0, 0]) + b"\x00" * 20 + b"\x00" * 52
    tkhd = tkhd_pre + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big")
    if n_frames > 1:  # two entries so the decoder's entry loop iterates
        stts = (
            bytes(4) + (2).to_bytes(4, "big")  # version+flags, entry_count
            + (n_frames - 1).to_bytes(4, "big") + (40).to_bytes(4, "big")
            + (1).to_bytes(4, "big") + (40).to_bytes(4, "big")
        )
    else:
        stts = (
            bytes(4) + (1).to_bytes(4, "big")
            + n_frames.to_bytes(4, "big") + (40).to_bytes(4, "big")
        )
    stbl = _box(b"stbl", _box(b"stts", stts))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", _box(b"minf", stbl)))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2mp41")
    return ftyp + moov

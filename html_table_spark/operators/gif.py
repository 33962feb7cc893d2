"""Stdlib-only GIF pixel decode (round-4, extends the PNG tier).

GIF's only compression is LZW with variable-width codes (GIF89a spec
§22 / Appendix F — public), which needs nothing beyond bit arithmetic:
no entropy-coding libraries, no codecs. This decodes the FIRST frame to
an (H, W, 3) uint8 array via the global/local color table, handles
Adam-style GIF interlacing (§20, the four-pass row ordering), counts
frames, and shares :func:`png.pixel_feature` for the real feature
vector.

Scope seams (callers fall back to header-only metadata, ValueError):
- transparency (GCE transparent index) renders as the palette color
  (no alpha channel) — a filter pipeline wants channel stats, not
  compositing;
- frames after the first are counted, not decoded.

The fixture encoder emits a spec-valid LZW stream of literal codes with
a clear code before each width bump would occur — decode exercises the
real variable-width/dictionary machinery on it (codes grow and reset),
while hand-computed byte-level tests pin the dictionary-building path
(the w+w[0] self-reference case) that literals alone cannot reach.
"""

from __future__ import annotations

import numpy as np

from .png import pixel_feature


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first variable-width codes, clear/end codes,
    width bumps at dictionary size 2^width (capped at 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < max_pixels:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK self-reference case
        else:
            raise ValueError("gif: invalid lzw code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _deinterlace(indices: np.ndarray) -> np.ndarray:
    """GIF §20 four-pass row order -> sequential rows."""
    h = indices.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(indices)
    out[order] = indices
    return out


def _sub_blocks(b: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at i; return (data, next_i)."""
    out = bytearray()
    n = len(b)
    while True:
        if i >= n:
            raise ValueError("gif: truncated sub-blocks")
        size = b[i]
        i += 1
        if size == 0:
            return bytes(out), i
        if i + size > n:
            raise ValueError("gif: truncated sub-block")
        out += b[i:i + size]
        i += size


def decode_gif(payload: bytes) -> tuple[np.ndarray, int]:
    """First frame as (H, W, 3) uint8 + total frame count, or ValueError."""
    b = payload or b""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(b) < 13:
        raise ValueError("gif: truncated header")
    flags = b[10]
    gct = None
    i = 13
    if flags & 0x80:
        gct_len = 2 << (flags & 0x07)
        if i + 3 * gct_len > len(b):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(b[i:i + 3 * gct_len], np.uint8).reshape(-1, 3)
        i += 3 * gct_len
    first: np.ndarray | None = None
    n_frames = 0
    n = len(b)
    while i < n:
        block = b[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if i >= n:
                raise ValueError("gif: truncated extension")
            i += 1
            _, i = _sub_blocks(b, i)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        if i + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        w = int.from_bytes(b[i + 4:i + 6], "little")
        h = int.from_bytes(b[i + 6:i + 8], "little")
        iflags = b[i + 8]
        i += 9
        table = gct
        if iflags & 0x80:  # local color table
            lct_len = 2 << (iflags & 0x07)
            if i + 3 * lct_len > n:
                raise ValueError("gif: truncated local color table")
            table = np.frombuffer(b[i:i + 3 * lct_len], np.uint8).reshape(-1, 3)
            i += 3 * lct_len
        if i >= n:
            raise ValueError("gif: missing lzw code size")
        min_code = b[i]
        i += 1
        if not 2 <= min_code <= 11:
            raise ValueError("gif: bad lzw minimum code size")
        data, i = _sub_blocks(b, i)
        n_frames += 1
        if first is None:
            if table is None:
                raise ValueError("gif: frame without a color table")
            if w <= 0 or h <= 0:
                raise ValueError("gif: empty frame")
            idx = _lzw_decode(min_code, data, w * h)
            if len(idx) < w * h:
                raise ValueError("gif: short pixel data")
            grid = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
            if int(grid.max()) >= len(table):
                raise ValueError("gif: palette index out of range")
            if iflags & 0x40:
                grid = _deinterlace(grid)
            first = table[grid]  # (H, W, 3)
    if first is None:
        raise ValueError("gif: no image data")
    return first, n_frames


def gif_pixel_feature(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, n_frames, pixel_feature vector) via full decode."""
    px, n_frames = decode_gif(payload)
    h, w, _ = px.shape
    return w, h, n_frames, pixel_feature(px)


# ---------------------------------------------------------------------------
# encoder (fixtures/tests only)
# ---------------------------------------------------------------------------


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """Minimal single-frame GIF89a encoder for (H, W) uint8 palette
    indices. LZW stream = literal codes with a clear code emitted just
    before each dictionary-driven width bump — spec-valid and decoder-
    agnostic (the stream never USES dictionary entries, but a conforming
    decoder still builds them, so decode exercises the real width/reset
    machinery)."""
    h, w = indices.shape
    if len(palette) < 2 or len(palette) > 256:
        raise ValueError("palette size must be 2..256")
    bits = max(2, int(np.ceil(np.log2(len(palette)))))
    gct_len = 1 << bits
    gct = np.zeros((gct_len, 3), np.uint8)
    gct[: len(palette)] = palette
    flags = 0x80 | (bits - 1)
    header = (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([flags, 0, 0]) + gct.tobytes()
    )
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        stream_rows = indices[order]
    else:
        stream_rows = indices
    pixels = stream_rows.reshape(-1)
    min_code = bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits = bytearray()
    acc = 0
    acc_n = 0
    code_size = min_code + 1
    next_code = end + 1

    def emit(code: int) -> None:
        nonlocal acc, acc_n
        acc |= code << acc_n
        acc_n += code_size
        while acc_n >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            acc_n -= 8

    # mirror the decoder's table growth exactly: after the first code
    # since a clear, every code adds one entry; the width bumps when
    # next_code reaches 2^code_size (cap 12 bits, then the table is full
    # and widths freeze — literals stay valid at any fill level)
    emit(clear)
    first = True
    for px in pixels.tolist():
        emit(int(px))
        if first:
            first = False
        elif next_code < 4096:
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    emit(end)
    if acc_n:
        out_bits.append(acc & 0xFF)
    # image descriptor + sub-blocks
    idesc = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0])
    )
    body = bytearray(idesc)
    body.append(min_code)
    data = bytes(out_bits)
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)  # block terminator
    return header + bytes(body) + b"\x3b"

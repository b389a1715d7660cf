"""Stdlib-only PNG codec (zlib inflate + scanline unfilter).

The container has no PIL, so without this module every multimodal
entry's "decode" step is the deterministic synthetic fallback. This is
a real, spec-conforming subset codec — PNG magic, chunk CRCs, IHDR,
concatenated IDAT, and all five scanline filters (None/Sub/Up/Average/
Paeth, RFC 2083 §6) — for 8-bit greyscale and RGB, the shapes the
pipeline synthesizes. It slots between PIL and the byte-resample
fallback in the kernel chain: content that parses as PNG gets real
bytes→pixels decoding in THIS container, pinned by the
multimodal_decode_png gate entry.

The encoder cycles the filter type per row (row % 5), so a single
decoded image exercises every unfilter branch — the round-trip
property test in tests/test_png_codec.py fuzzes this with Hypothesis.

Scope: bit depth 8, color types 0 (grey), 2 (RGB), 3 (palette —
expanded to RGB via PLTE on decode), 4 (grey+alpha), 6 (RGBA); no
interlace, no sub-8-bit packing. Anything else raises ValueError —
callers fall back to the synthetic kernel. Malformed input (bad CRC,
bad framing, OOB palette index) also raises ValueError, never
struct.error/IndexError, so the kernel-chain contract holds.
"""

from __future__ import annotations

import binascii
import struct
import zlib

MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels as stored in the datastream (palette rows are
# 1-byte indices; expansion to RGB happens after unfiltering).
_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ENCODE_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """In-place reconstruction (RFC 2083 §6.6: each Recon(x) uses
    already-reconstructed left/up bytes)."""
    if ftype == 0:
        return
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")


def _filtered_idat(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ftype = r % 5
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev, channels)
        prev = row
    return zlib.compress(bytes(raw), 6)


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Row-major 8-bit pixels -> PNG bytes. Filter type cycles row % 5
    so decoders must implement the full filter set. channels: 1 grey,
    2 grey+alpha, 3 RGB, 4 RGBA."""
    if channels not in _ENCODE_COLOR:
        raise ValueError("png: channels must be 1, 2, 3 or 4")
    if len(pixels) != width * height * channels:
        raise ValueError("png: pixel buffer does not match width*height*channels")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _ENCODE_COLOR[channels], 0, 0, 0)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _filtered_idat(pixels, width, height, channels))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: bytes, width: int, height: int, palette: list[tuple[int, int, int]]
) -> bytes:
    """8-bit palette-indexed PNG (color type 3): ``indices`` are
    row-major 1-byte palette indices, PLTE carries the RGB triples."""
    if not 1 <= len(palette) <= 256:
        raise ValueError("png: palette must have 1..256 entries")
    if len(indices) != width * height:
        raise ValueError("png: index buffer does not match width*height")
    if max(indices, default=0) >= len(palette):
        raise ValueError("png: palette index out of range")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(rgb) for rgb in palette)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", _filtered_idat(indices, width, height, 1))
        + _chunk(b"IEND", b"")
    )


def is_png(buf: bytes) -> bool:
    return len(buf) >= len(MAGIC) and buf[: len(MAGIC)] == MAGIC


def decode_png(buf: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, row-major 8-bit pixels).

    Verifies magic and per-chunk CRCs; handles 8-bit grey/RGB/
    palette/grey+alpha/RGBA, no interlace. Palette images decode to
    RGB (channels=3). Any unsupported or malformed input raises
    ValueError — including invalid deflate data and bad chunk framing,
    so callers need only one except-arm."""
    if not is_png(buf):
        raise ValueError("png: bad signature")
    pos = len(MAGIC)
    width = height = channels = color = -1
    idat = bytearray()
    palette: list[bytes] | None = None
    seen_end = False
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise ValueError("png: truncated chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if binascii.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("png: IHDR must be 13 bytes")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _COLOR_CHANNELS:
                raise ValueError(f"png: unsupported depth/color ({depth}/{color})")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("png: unsupported compression/filter/interlace")
            channels = _COLOR_CHANNELS[color]
        elif tag == b"PLTE":
            if length % 3 != 0 or not 3 <= length <= 768:
                raise ValueError("png: bad PLTE length")
            palette = [data[i : i + 3] for i in range(0, length, 3)]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
    if width < 0 or not seen_end:
        raise ValueError("png: missing IHDR or IEND")
    if color == 3 and palette is None:
        raise ValueError("png: palette image without PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"png: bad IDAT deflate stream ({e})") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("png: decompressed size mismatch")
    pixels = bytearray()
    prev = bytes(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        _unfilter_row(ftype, row, prev, channels)
        pixels += row
        prev = bytes(row)
    if color == 3:
        assert palette is not None
        if max(pixels, default=0) >= len(palette):
            raise ValueError("png: palette index out of range")
        return width, height, 3, b"".join(palette[i] for i in pixels)
    return width, height, channels, bytes(pixels)

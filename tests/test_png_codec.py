"""Stdlib PNG codec: round-trip and format-conformance properties."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minispark_spark.multimodal.png import decode_png, encode_png, is_png


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=17),
    height=st.integers(min_value=1, max_value=13),
    channels=st.sampled_from([1, 3]),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_all_filters(data, width, height, channels):
    """encode -> decode is the identity for any pixel content; the
    encoder cycles filters per row so heights >= 5 exercise every
    unfilter branch (None/Sub/Up/Average/Paeth)."""
    n = width * height * channels
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    buf = encode_png(pixels, width, height, channels)
    assert is_png(buf)
    w, h, c, out = decode_png(buf)
    assert (w, h, c) == (width, height, channels)
    assert out == pixels


def test_rejects_corruption():
    buf = bytearray(encode_png(bytes(range(32)) * 2, 8, 8, 1))
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + bytes(buf))
    flipped = bytearray(buf)
    flipped[len(buf) // 2] ^= 0xFF  # corrupt an IDAT byte -> CRC fails
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError):
        decode_png(bytes(buf[:-6]))  # truncated IEND


def test_rejects_unsupported_shapes():
    with pytest.raises(ValueError):
        encode_png(b"\x00" * 20, 2, 2, 5)  # 5 channels unsupported
    with pytest.raises(ValueError):
        encode_png(b"\x00" * 7, 2, 2, 2)  # size mismatch
    # 16-bit depth rejected by the decoder
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    import binascii

    def chunk(tag, d):
        return (
            struct.pack(">I", len(d))
            + tag
            + d
            + struct.pack(">I", binascii.crc32(tag + d) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=17),
    height=st.integers(min_value=1, max_value=13),
    channels=st.sampled_from([2, 4]),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_alpha(data, width, height, channels):
    """Grey+alpha (color type 4) and RGBA (6) round-trip the identity."""
    from minispark_spark.multimodal.png import decode_png as dec
    from minispark_spark.multimodal.png import encode_png as enc

    n = width * height * channels
    pixels = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    buf = enc(pixels, width, height, channels)
    w, h, c, out = dec(buf)
    assert (w, h, c) == (width, height, channels)
    assert out == pixels


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=17),
    height=st.integers(min_value=1, max_value=13),
    n_colors=st.integers(min_value=1, max_value=256),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_palette(data, width, height, n_colors):
    """Palette (color type 3) decodes to the palette-expanded RGB."""
    from minispark_spark.multimodal.png import decode_png, encode_png_palette

    palette = [
        tuple(data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
        for _ in range(n_colors)
    ]
    n = width * height
    idx = bytes(data.draw(st.lists(st.integers(0, n_colors - 1), min_size=n, max_size=n)))
    buf = encode_png_palette(idx, width, height, palette)
    w, h, c, out = decode_png(buf)
    assert (w, h, c) == (width, height, 3)
    assert out == b"".join(bytes(palette[i]) for i in idx)


def test_malformed_raises_valueerror_only():
    """The decode contract: malformed input raises ValueError, never
    zlib.error/struct.error/IndexError — one except-arm suffices for
    the resize kernel chain."""
    import struct as _struct

    from minispark_spark.multimodal.png import MAGIC, decode_png, encode_png_palette

    def chunk(tag, payload):
        return (
            _struct.pack(">I", len(payload))
            + tag
            + payload
            + _struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # invalid deflate IDAT
    bad = MAGIC + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)) \
        + chunk(b"IDAT", b"\xff" * 8) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    # IHDR with wrong length (would be struct.error unguarded)
    bad = MAGIC + chunk(b"IHDR", b"\x00" * 12) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    # palette image without PLTE
    bad = MAGIC + chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)) \
        + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    # palette index out of range
    buf = bytearray(encode_png_palette(b"\x00", 1, 1, [(1, 2, 3)]))
    # corrupt the index by re-encoding with a 2-entry palette then shrinking PLTE
    good = encode_png_palette(b"\x01", 1, 1, [(1, 2, 3), (4, 5, 6)])
    plte_at = good.index(b"PLTE") - 4
    shrunk = good[:plte_at] + chunk(b"PLTE", b"\x01\x02\x03") + good[plte_at + 4 + 4 + 6 + 4:]
    with pytest.raises(ValueError):
        decode_png(shrunk)

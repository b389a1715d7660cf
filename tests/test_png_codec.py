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
        encode_png(b"\x00" * 8, 2, 2, 2)  # 2 channels unsupported
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

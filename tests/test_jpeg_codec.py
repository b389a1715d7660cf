"""Stdlib+numpy baseline JPEG codec: round-trip error bounds, marker
conformance, and the ValueError-only malformed-input contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minispark_spark.multimodal.jpeg import decode_jpeg, encode_jpeg, is_jpeg

Q90_BOUND = 32  # measured worst per-pixel error on the gate corpus is 20
RGB_Q90_BOUND = 48  # chroma transform adds rounding; random-noise worst ~30


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=20),
    height=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_grey_bounded_error(data, width, height):
    n = width * height
    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    buf = encode_jpeg(px, width, height, 1, quality=90)
    assert is_jpeg(buf)
    w, h, c, out = decode_jpeg(buf)
    assert (w, h, c) == (width, height, 1)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int) - np.frombuffer(px, np.uint8).astype(int)
    )
    assert err.max() <= Q90_BOUND, err.max()


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=12),
    height=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_rgb_bounded_error(data, width, height):
    n = width * height * 3
    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    w, h, c, out = decode_jpeg(encode_jpeg(px, width, height, 3, quality=90))
    assert (w, h, c) == (width, height, 3)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int) - np.frombuffer(px, np.uint8).astype(int)
    )
    assert err.max() <= RGB_Q90_BOUND, err.max()


def test_flat_and_smooth_content_near_exact():
    """DCT of a constant block is DC-only — flat images reconstruct
    EXACTLY; a gentle gradient within +-1."""
    flat = bytes([137]) * (16 * 16)
    assert decode_jpeg(encode_jpeg(flat, 16, 16, 1, 90))[3] == flat
    g = np.clip(np.add.outer(np.arange(32) * 2, np.arange(32) * 2), 0, 255)
    gb = g.astype(np.uint8).tobytes()
    _, _, _, out = decode_jpeg(encode_jpeg(gb, 32, 32, 1, 90))
    err = np.abs(np.frombuffer(out, np.uint8).astype(int) - g.reshape(-1))
    assert err.max() <= 1


def test_marker_conformance():
    """The emitted stream is structurally valid JFIF: SOI, APP0 with
    the JFIF tag, DQT/SOF0/DHT/SOS in order, EOI last, and every 0xFF
    inside the entropy segment is stuffed."""
    buf = encode_jpeg(bytes(range(200, 256)) + bytes(200), 16, 16, 1, 90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert buf[2:4] == b"\xff\xe0" and b"JFIF\x00" in buf[:20]
    order = [m for m in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda")]
    positions = [buf.index(m) for m in order]
    assert positions == sorted(positions)
    sos_at = buf.index(b"\xff\xda")
    (sos_len,) = struct.unpack(">H", buf[sos_at + 2 : sos_at + 4])
    scan = buf[sos_at + 2 + sos_len : -2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 2
        else:
            i += 1


def test_malformed_raises_valueerror_only():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")
    good = encode_jpeg(bytes(64), 8, 8, 1, 90)
    # truncate mid-scan
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    # corrupt entropy data (flip bytes after SOS) — must not escape as
    # struct/IndexError
    sos = good.index(b"\xff\xda")
    bad = bytearray(good)
    for i in range(sos + 14, min(sos + 20, len(bad) - 2)):
        bad[i] ^= 0x55
    try:
        decode_jpeg(bytes(bad))
    except ValueError:
        pass  # either outcome is fine; non-ValueError would fail the test


def test_unsupported_shapes_rejected():
    with pytest.raises(ValueError):
        encode_jpeg(bytes(10), 5, 1, 2)  # 2 channels
    with pytest.raises(ValueError):
        encode_jpeg(bytes(9), 5, 2, 1)  # size mismatch
    with pytest.raises(ValueError):
        encode_jpeg(bytes(4), 2, 2, 1, quality=0)
    # progressive (SOF2) rejected: patch the SOF marker
    good = bytearray(encode_jpeg(bytes(64), 8, 8, 1, 90))
    good[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(good))


@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=24),
    height=st.integers(min_value=1, max_value=24),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_420_smooth_bounded_error(data, width, height):
    """4:2:0 on smooth content (gradients — what subsampling is FOR)
    reconstructs within a tight bound; dims always exact. Per-pixel
    chroma noise is destroyed by design, so the random-noise bound
    lives on the luma plane (next test), not RGB."""
    dx = data.draw(st.integers(0, 6))
    dy = data.draw(st.integers(0, 6))
    base = np.clip(np.add.outer(np.arange(height) * dy, np.arange(width) * dx), 0, 255)
    rgb = np.stack([base, 255 - base, np.full_like(base, 80)], axis=-1).astype(np.uint8)
    w, h, c, out = decode_jpeg(
        encode_jpeg(rgb.tobytes(), width, height, 3, 90, subsampling="420")
    )
    assert (w, h, c) == (width, height, 3)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int) - rgb.reshape(-1).astype(int)
    )
    assert err.max() <= 16, err.max()


def test_420_luma_survives_noise():
    """Even on per-pixel noise (worst case for chroma subsampling) the
    LUMA of the 4:2:0 round trip stays close to the source luma — the
    detail channel is full resolution by construction."""
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.int64).astype(np.uint8)
    _, _, _, out = decode_jpeg(
        encode_jpeg(rgb.tobytes(), 16, 16, 3, 90, subsampling="420")
    )
    dec = np.frombuffer(out, np.uint8).reshape(16, 16, 3).astype(float)
    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    err = np.abs(luma(dec) - luma(rgb.astype(float)))
    assert err.max() <= 48, err.max()  # chroma bleed adds some; luma detail kept


def test_420_sampling_factors_in_sof():
    buf = encode_jpeg(bytes(16 * 16 * 3), 16, 16, 3, 90, subsampling="420")
    sof = buf.index(b"\xff\xc0")
    comps = buf[sof + 4 + 6 : sof + 4 + 6 + 9]
    assert comps[1] == 0x22 and comps[4] == 0x11 and comps[7] == 0x11
    # a 4:4:4 decoder-only implementation would reject this stream;
    # ours decodes it (general {1,2}^2 MCU loop)
    w, h, c, _ = decode_jpeg(buf)
    assert (w, h, c) == (16, 16, 3)

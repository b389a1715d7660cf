"""Baseline JPEG codec (stdlib + numpy; no PIL/libjpeg needed).

Round-5 sibling of the stdlib PNG codec (multimodal/png.py): real crawl
corpora are JPEG-dominated, so without an in-container JPEG path every
crawled thumbnail falls back to the synthetic kernel. This is a
spec-conforming SUBSET codec for baseline sequential DCT (ITU-T T.81):

* Encoder: 8-bit greyscale (1 component) or RGB (3 components, YCbCr
  4:4:4 or 4:2:0 — the layout real crawl JPEGs overwhelmingly use),
  standard Annex K quantization tables scaled by the libjpeg quality
  formula, standard Annex K Huffman tables (DC/AC, luma and chroma),
  interleaved MCUs, 0xFF byte stuffing.
* Decoder: SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI marker parse, canonical
  Huffman decode, zigzag + dequant, separable float64 IDCT, level
  shift + clamp, YCbCr -> RGB; general interleaved-MCU loop for
  sampling factors in {1,2}^2 (4:4:4, 4:2:0, 4:2:2, 4:4:0 — subsampled
  chroma box-upsampled). Progressive (SOF2), arithmetic coding,
  restart markers, sampling factors > 2, and 12-bit depth raise
  ValueError — callers degrade to the next kernel, same contract as
  decode_png (ValueError ONLY, never struct/IndexError).

JPEG is lossy, so unlike the PNG gate there is no bit-exact SQL replay
of decoded pixels; the registry gate (multimodal/binary.py) pins
SQL-replayable invariants (dimensions, identity) plus a MEASURED
per-pixel reconstruction-error bound — the recall-floor pattern. The
codec's own exactness properties live in tests/test_jpeg_codec.py
(round-trip error bounds under Hypothesis, marker conformance, flat
blocks reconstruct exactly).
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ----------------------------------------------------------

_STD_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

_STD_CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# (bits-per-length[1..16], values) — Annex K.3.3
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis matrix (orthonormal); IDCT = C.T @ X @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    if not 1 <= quality <= 100:
        raise ValueError("jpeg: quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q_table * scale + 50) // 100
    return np.clip(t, 1, 255)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical construction (C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"jpeg: unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _magnitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeffs = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    return np.round(coeffs / q).astype(np.int64)


def _dequant_idct(coeffs: np.ndarray, q: np.ndarray) -> np.ndarray:
    spatial = _C.T @ (coeffs.astype(np.float64) * q) @ _C
    return np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)


def _encode_block(
    w: _BitWriter, coeffs: np.ndarray, pred_dc: int, dc_codes, ac_codes
) -> int:
    zz = coeffs.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred_dc
    size = _size_cat(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(_magnitude_bits(diff, size), size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _size_cat(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(_magnitude_bits(v, size), size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("jpeg: invalid Huffman code")


def _decode_block(
    r: _BitReader, pred_dc: int, dc_tab, ac_tab, q: np.ndarray
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = _decode_huff(r, dc_tab)
    dc = pred_dc + _extend(r.read_bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k >= 64:
            raise ValueError("jpeg: AC run past block end")
        zz[k] = _extend(r.read_bits(size), size)
        k += 1
    coeffs = np.zeros(64, dtype=np.int64)
    coeffs[_ZIGZAG] = zz
    return _dequant_idct(coeffs.reshape(8, 8), q), dc


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tclass: int, tid: int, spec) -> bytes:
    bits, values = spec
    return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(values)


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Row-major 8-bit pixels -> baseline JFIF bytes. channels: 1 grey,
    3 RGB (encoded as YCbCr). ``subsampling``: "444" (every component
    full-resolution) or "420" (chroma 2x2 box-downsampled — the layout
    real crawl JPEGs overwhelmingly use; 3-channel only)."""
    if channels not in (1, 3):
        raise ValueError("jpeg: channels must be 1 (grey) or 3 (RGB)")
    if subsampling not in ("444", "420"):
        raise ValueError("jpeg: subsampling must be '444' or '420'")
    if subsampling == "420" and channels == 1:
        subsampling = "444"  # greyscale has no chroma to subsample
    if width < 1 or height < 1:
        raise ValueError("jpeg: empty image")
    if len(pixels) != width * height * channels:
        raise ValueError("jpeg: pixel buffer does not match width*height*channels")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    qy = _quality_scale(_STD_LUMA_Q, quality)
    qc = _quality_scale(_STD_CHROMA_Q, quality)
    planes = (
        [img[..., 0].astype(np.float64)]
        if channels == 1
        else [p for p in np.moveaxis(_rgb_to_ycbcr(img), -1, 0)]
    )
    is420 = subsampling == "420" and channels == 3
    # edge-replicate pad: 4:2:0 MCUs are 16x16 luma, else 8x8
    mcu = 16 if is420 else 8
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    planes = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge") for p in planes
    ]
    if is420:
        # chroma: 2x2 box mean, rounded — half-resolution planes
        planes[1:] = [
            np.round(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            for p in planes[1:]
        ]
    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    w = _BitWriter()
    preds = [0] * channels
    qtabs = [qy] + ([qc, qc] if channels == 3 else [])
    dctabs = [dc_y] + ([dc_c, dc_c] if channels == 3 else [])
    actabs = [ac_y] + ([ac_c, ac_c] if channels == 3 else [])
    if is420:
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for bv in range(2):  # 4 luma blocks per MCU
                    for bh in range(2):
                        blk = planes[0][
                            my + 8 * bv : my + 8 * bv + 8, mx + 8 * bh : mx + 8 * bh + 8
                        ]
                        preds[0] = _encode_block(
                            w, _fdct_quant(blk, qy), preds[0], dc_y, ac_y
                        )
                for ci in (1, 2):  # one chroma block each
                    blk = planes[ci][my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8]
                    preds[ci] = _encode_block(
                        w, _fdct_quant(blk, qc), preds[ci], dc_c, ac_c
                    )
    else:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci in range(channels):
                    coeffs = _fdct_quant(planes[ci][by : by + 8, bx : bx + 8], qtabs[ci])
                    preds[ci] = _encode_block(w, coeffs, preds[ci], dctabs[ci], actabs[ci])
    scan = w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xFFDB, bytes([0]) + bytes(int(v) for v in qy.reshape(64)[_ZIGZAG]))
    if channels == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(int(v) for v in qc.reshape(64)[_ZIGZAG]))
    # SOF0
    comps = b""
    for ci in range(channels):
        samp = 0x22 if (is420 and ci == 0) else 0x11
        comps += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, channels) + comps)
    out += _seg(0xFFC4, _dht_payload(0, 0, _DC_LUMA))
    out += _seg(0xFFC4, _dht_payload(1, 0, _AC_LUMA))
    if channels == 3:
        out += _seg(0xFFC4, _dht_payload(0, 1, _DC_CHROMA))
        out += _seg(0xFFC4, _dht_payload(1, 1, _AC_CHROMA))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])  # dc/ac table ids
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def is_jpeg(buf: bytes) -> bool:
    return len(buf) >= 3 and buf[:3] == b"\xff\xd8\xff"


def decode_jpeg(buf: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JFIF bytes -> (width, height, channels, row-major 8-bit
    pixels). 3-component images return RGB; sampling factors 1..2 per
    axis are handled (4:4:4, 4:2:0, 4:2:2, 4:4:0 — subsampled chroma is
    box-upsampled). Raises ValueError on anything outside baseline
    sequential 8-bit (progressive, restart intervals, 12-bit, sampling
    factors > 2) and on any malformed structure — never
    struct/IndexError."""
    try:
        return _decode_jpeg(buf)
    except ValueError:
        raise
    except Exception as e:  # struct/index/etc on malformed input
        raise ValueError(f"jpeg: malformed stream ({type(e).__name__}: {e})") from e


def _decode_jpeg(buf: bytes) -> tuple[int, int, int, bytes]:
    if not is_jpeg(buf):
        raise ValueError("jpeg: bad signature")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = -1
    ncomp = 0
    comp_q: dict[int, int] = {}
    comp_samp: dict[int, tuple[int, int]] = {}
    comp_order: list[int] = []
    scan_tabs: dict[int, tuple[int, int]] = {}
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = struct.unpack(">H", buf[pos : pos + 2])[0]
        if marker == 0xFFD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        data = buf[pos + 4 : pos + 2 + seglen]
        if len(data) != seglen - 2:
            raise ValueError("jpeg: truncated segment")
        pos += 2 + seglen
        if marker == 0xFFDB:  # DQT
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                flat = np.zeros(64, dtype=np.int64)
                flat[_ZIGZAG] = np.frombuffer(
                    data[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = flat.reshape(8, 8)
                off += 65
        elif marker == 0xFFC4:  # DHT
            off = 0
            while off < len(data):
                tc, th = data[off] >> 4, data[off] & 0x0F
                bits = list(data[off + 1 : off + 17])
                nvals = sum(bits)
                values = list(data[off + 17 : off + 17 + nvals])
                dec: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        dec[(length, code)] = values[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = dec
                off += 17 + nvals
        elif marker == 0xFFC0:  # SOF0 baseline
            depth, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            if depth != 8:
                raise ValueError("jpeg: only 8-bit depth supported")
            if ncomp not in (1, 3):
                raise ValueError("jpeg: only 1 or 3 components supported")
            for ci in range(ncomp):
                cid, sampling, tq = data[6 + 3 * ci : 9 + 3 * ci]
                h_i, v_i = sampling >> 4, sampling & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise ValueError(
                        f"jpeg: sampling factors {h_i}x{v_i} unsupported (1..2 only)"
                    )
                comp_samp[cid] = (h_i, v_i)
                comp_q[cid] = tq
                comp_order.append(cid)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xFFDA:  # SOS — entropy data follows
            ns = data[0]
            if ns != ncomp:
                raise ValueError("jpeg: scan/frame component mismatch")
            for si in range(ns):
                cid, tabs = data[1 + 2 * si], data[2 + 2 * si]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            if width < 0:
                raise ValueError("jpeg: SOS before SOF")
            # entropy-coded data runs from here to EOI
            end = buf.rfind(b"\xff\xd9")
            if end < pos:
                raise ValueError("jpeg: missing EOI")
            r = _BitReader(buf[pos:end])
            # General interleaved MCU loop for sampling factors in
            # {1,2}^2 — covers 4:4:4, 4:2:0, 4:2:2 and 4:4:0. Each MCU
            # carries h_i*v_i blocks per component; subsampled planes
            # are pixel-replicated back to full size after the scan
            # (the standard box upsample).
            hmax = max(h for h, _ in comp_samp.values())
            vmax = max(v for _, v in comp_samp.values())
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            planes = {
                cid: np.zeros(
                    (mcus_y * 8 * comp_samp[cid][1], mcus_x * 8 * comp_samp[cid][0]),
                    dtype=np.uint8,
                )
                for cid in comp_order
            }
            preds = {cid: 0 for cid in comp_order}
            for cid in comp_order:
                dc_id, ac_id = scan_tabs[cid]
                if (0, dc_id) not in htabs or (1, ac_id) not in htabs:
                    raise ValueError("jpeg: missing Huffman table")
                if comp_q[cid] not in qtabs:
                    raise ValueError("jpeg: missing quant table")
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for cid in comp_order:
                        h_i, v_i = comp_samp[cid]
                        dc_id, ac_id = scan_tabs[cid]
                        for bv in range(v_i):
                            for bh in range(h_i):
                                block, preds[cid] = _decode_block(
                                    r,
                                    preds[cid],
                                    htabs[(0, dc_id)],
                                    htabs[(1, ac_id)],
                                    qtabs[comp_q[cid]],
                                )
                                y0 = (my * v_i + bv) * 8
                                x0 = (mx * h_i + bh) * 8
                                planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            full = []
            for cid in comp_order:
                h_i, v_i = comp_samp[cid]
                p = planes[cid]
                if h_i < hmax or v_i < vmax:
                    p = np.repeat(np.repeat(p, vmax // v_i, axis=0), hmax // h_i, axis=1)
                full.append(p[:height, :width])
            if ncomp == 1:
                return width, height, 1, full[0].tobytes()
            ycc = np.stack(full, axis=-1).astype(np.float64)
            return width, height, 3, _ycbcr_to_rgb(ycc).tobytes()
    raise ValueError("jpeg: no scan data found")

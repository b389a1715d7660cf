"""Property-based round-trip tests for the BlockFile codec (no Spark:
the codec is pure Python/Arrow, so hypothesis can hammer it cheaply)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minispark_spark.sources.blockfile import (
    decode_block,
    encode_block,
    encode_header,
    read_header,
)

_int32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_float32 = st.floats(width=32, allow_nan=False)
_short_str = st.text(max_size=60).filter(lambda s: len(s.encode()) <= 255)
_ts = st.datetimes(
    min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2200, 1, 1)
)


@st.composite
def _table(draw):
    n = draw(st.integers(min_value=0, max_value=50))
    return {
        "i": draw(st.lists(_int32, min_size=n, max_size=n)),
        "f": draw(st.lists(_float32, min_size=n, max_size=n)),
        "s": draw(st.lists(_short_str, min_size=n, max_size=n)),
        "t": draw(st.lists(_ts, min_size=n, max_size=n)),
    }


_SCHEMA = [("i", 0), ("s", 1), ("f", 2), ("t", 3)]
_ARROW = {
    "i": pa.int32(),
    "s": pa.string(),
    "f": pa.float32(),
    "t": pa.timestamp("us"),
}


def _batch(cols: dict) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array(cols[name], type=_ARROW[name]) for name, _ in _SCHEMA],
        names=[name for name, _ in _SCHEMA],
    )


@settings(max_examples=200, deadline=None)
@given(_table())
def test_block_roundtrip(cols):
    batch = _batch(cols)
    encoded = encode_block(batch, [o for _, o in _SCHEMA])
    back = decode_block(encoded, 0, _SCHEMA)
    assert back.equals(batch)


@settings(max_examples=200, deadline=None)
@given(_table(), st.sets(st.sampled_from(["i", "s", "f", "t"]), min_size=1))
def test_block_projection_roundtrip(cols, wanted_set):
    """Decoding any column subset (in any order) equals the full decode's
    selection — the payload-skip path can't corrupt alignment."""
    wanted = sorted(wanted_set, reverse=True)  # exercise non-schema order
    batch = _batch(cols)
    encoded = encode_block(batch, [o for _, o in _SCHEMA])
    back = decode_block(encoded, 0, _SCHEMA, wanted)
    assert back.schema.names == wanted
    for name in wanted:
        assert back.column(name).equals(batch.column(name)), name


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=40).filter(lambda s: len(s.encode()) <= 255),
            st.sampled_from([0, 1, 2, 3]),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda f: f[0],
    )
)
def test_header_roundtrip(fields):
    got, pos = read_header(encode_header(fields))
    assert got == fields
    assert pos == len(encode_header(fields))


def test_nan_float_roundtrip():
    batch = pa.RecordBatch.from_arrays(
        [pa.array([float("nan"), 1.0], type=pa.float32())], names=["f"]
    )
    back = decode_block(encode_block(batch, [2]), 0, [("f", 2)])
    vals = back.column(0).to_pylist()
    assert vals[0] != vals[0] and vals[1] == 1.0  # NaN preserved bitwise

"""Bit-exactness pins for the round-7 vectorized ANN kernels.

The optimization round rewrote the numpy internals of the PQ/k-means
assignment and partial-sum kernels (expanded-form distances via
einsum/matmul, np.add.at accumulation) — these tests pin each new
kernel to the naive spelling it replaced, on adversarial integer
inputs (ties included), so the "identical integers, just less memory
traffic" argument is enforced, not asserted.
"""

from __future__ import annotations

import numpy as np
import pytest

from minispark_spark.operators.kmeans import DIM, _assign_np
from minispark_spark.operators.pq import M, SUBDIM, _assign_sub, _sub


def _rand_ints(rng, shape, scale=500_000):
    return rng.integers(-scale, scale, size=shape, dtype=np.int64)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_assign_np_matches_naive(rng):
    m = _rand_ints(rng, (257, DIM))
    cents = _rand_ints(rng, (9, DIM))
    # Force exact ties: two identical centroids -> first index must win.
    cents[5] = cents[2]
    naive = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    np.testing.assert_array_equal(_assign_np(m, cents), naive)


def test_assign_sub_matches_naive(rng):
    sub = _sub(_rand_ints(rng, (123, DIM)))
    books = _rand_ints(rng, (M, 17, SUBDIM))
    books[:, 11] = books[:, 3]  # duplicated codeword: tie to lower index
    naive = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3).argmin(axis=2)
    np.testing.assert_array_equal(_assign_sub(sub, books), naive)


def test_assign_kernels_extreme_magnitudes():
    # QSCALE quantization bounds |q| ~<= 5e5; prove the expanded form
    # stays exact at 4x that margin (no silent int64 overflow).
    big = 2_000_000
    m = np.array([[big] * DIM, [-big] * DIM, [0] * DIM], dtype=np.int64)
    cents = np.array([[-big] * DIM, [big] * DIM], dtype=np.int64)
    naive = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    np.testing.assert_array_equal(_assign_np(m, cents), naive)
    sub, books = _sub(m), _sub(cents).transpose(1, 0, 2).copy()
    naive_s = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3).argmin(axis=2)
    np.testing.assert_array_equal(_assign_sub(sub, books), naive_s)


def _naive_kmeans_partials(m, cents):
    a = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    rows = {}
    for cl in np.unique(a):
        sel = m[a == cl]
        sums = sel.sum(axis=0, dtype=np.int64)
        for d in range(m.shape[1]):
            rows[(int(cl), d)] = (int(sums[d]), int(sel.shape[0]))
    return rows


def test_kmeans_partial_sums_batch_kernel(rng, spark):
    """The mapInPandas batch kernel emits exactly the naive per-cluster
    partial rows (as a multiset keyed by (cluster, d))."""
    import pandas as pd

    from minispark_spark.operators import kmeans as km

    m = _rand_ints(rng, (64, DIM))
    cents = _rand_ints(rng, (5, DIM))
    pdf = pd.DataFrame({"vec_id": np.arange(64), "q": list(m)})
    sdf = spark.createDataFrame(
        [(int(r), [int(x) for x in v]) for r, v in zip(pdf["vec_id"], pdf["q"])],
        "vec_id long, q array<long>",
    )
    out = km._partial_sums(sdf, cents).collect()
    got = {(r["cluster"], r["d"]): (r["s"], r["n"]) for r in out}
    # Rows from independent batches must still REDUCE to the naive
    # totals: aggregate by key the way the downstream groupBy does.
    agg: dict = {}
    for r in out:
        s, n = agg.get((r["cluster"], r["d"]), (0, 0))
        # n repeats per-dim within one batch emit; sum across batches.
        agg[(r["cluster"], r["d"])] = (s + r["s"], n + r["n"])
    naive = _naive_kmeans_partials(m, cents)
    assert set(agg) == set(naive)
    for key in naive:
        assert agg[key] == naive[key]
    assert got  # non-empty sanity


def test_residual_frame_matches_join_spelling(spark):
    """_residual_frame (single vectorized pass) == the join + zip_with
    spelling it replaced, row for row."""
    import numpy as np

    from minispark_spark.operators.ivfpq import _residual_frame

    rng = np.random.default_rng(11)
    m = rng.integers(-500_000, 500_000, size=(40, DIM), dtype=np.int64)
    cents = rng.integers(-500_000, 500_000, size=(4, DIM), dtype=np.int64)
    q = spark.createDataFrame(
        [(i, [int(x) for x in m[i]]) for i in range(40)], "vec_id long, q array<long>"
    )
    got = {
        r["vec_id"]: (tuple(r["q"]), r["cluster"])
        for r in _residual_frame(q, cents).collect()
    }
    a = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    for i in range(40):
        res = tuple(int(x) for x in (m[i] - cents[a[i]]))
        assert got[i] == (res, int(a[i])), f"vec {i}"


def test_bm25_dl_equals_token_count(spark):
    """dl derived as SUM(tf) must equal the direct per-doc token count
    (the identity the bm25_index single-tokenize rewrite rests on)."""
    from pyspark.sql import functions as F

    from minispark_spark.functions import text
    from minispark_spark.plans.text import bm25_index

    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "x"), (2, "y y y y y"), (3, "")],
        "doc_id long, text string",
    )
    _, dl, _, _ = bm25_index(docs)
    got = {r["doc_id"]: r["dl"] for r in dl.collect()}
    direct = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(text.tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for d, n in direct.items():
        if n > 0:
            assert got[d] == n
        else:
            assert d not in got  # zero-token docs have no postings

"""Distributed PCA (operators/pca.py) vs a driver-side numpy replica.

The covariance entries themselves are pinned bit-exact by the DuckDB
oracle (embedding_pca_covariance in the registry gate); these tests pin
the driver-side consumers — eigendecomposition and projection — against
numpy computing the same decomposition from the raw vectors."""

from __future__ import annotations

import numpy as np
import pytest

from minispark_spark.operators.kmeans import DIM, QSCALE
from minispark_spark.operators.pca import pca_components, pca_project, pca_whiten
from minispark_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def raw(spark, sf_dir) -> np.ndarray:
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def _np_reference(raw: np.ndarray, k: int):
    # Replicate the quantization so the comparison target is the same
    # matrix the distributed pass accumulates.
    q = np.floor(raw * QSCALE + 0.5)
    cov = np.cov(q, rowvar=False, ddof=1) / (QSCALE * QSCALE)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    return vals[order], comps * flip[:, None], q.mean(axis=0) / QSCALE


def test_pca_components_match_numpy(spark, sf_dir, raw):
    vals, comps, mean = pca_components(spark, sf_dir, k=8)
    evals, ecomps, emean = _np_reference(raw, k=8)
    assert vals.shape == (8,) and comps.shape == (8, DIM)
    np.testing.assert_allclose(vals, evals, rtol=1e-9)
    np.testing.assert_allclose(mean, emean, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.abs(comps), np.abs(ecomps), atol=1e-7)
    # Orthonormality of the returned basis.
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-10)


def test_pca_components_sign_canonical(spark, sf_dir):
    _, comps, _ = pca_components(spark, sf_dir, k=4)
    peak = np.abs(comps).argmax(axis=1)
    assert (comps[np.arange(4), peak] > 0).all()


def test_pca_project_matches_numpy(spark, sf_dir, raw):
    _, comps, mean = pca_components(spark, sf_dir, k=4)
    rows = pca_project(spark, sf_dir, k=4).orderBy("vec_id").collect()
    got = np.array([r["proj"] for r in rows])
    want = (raw - mean) @ comps.T
    assert got.shape == want.shape == (raw.shape[0], 4)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # Projected variance per component ~= eigenvalue ordering: strictly
    # non-increasing captured variance down the component list.
    var = got.var(axis=0, ddof=1)
    assert (np.diff(var) <= 1e-12).all()


def test_pca_whiten_identity_covariance(spark, sf_dir):
    """Whitened coordinates must have ~identity sample covariance —
    the defining property of the transform."""
    rows = pca_whiten(spark, sf_dir, k=4).orderBy("vec_id").collect()
    w = np.array([r["white"] for r in rows])
    cov = np.cov(w, rowvar=False, ddof=1)
    np.testing.assert_allclose(cov, np.eye(4), atol=1e-6)

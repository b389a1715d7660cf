"""Distributed PCA over the embeddings table via exact integer
sufficient statistics.

PCA at scale decomposes into two very differently-sized problems:

1. The d x d scatter matrix ``X^T X`` (plus per-dimension sums and the
   row count) — the only part that touches the data. This is a
   map-combinable sufficient statistic: each Arrow batch contributes a
   d(d+1)/2-entry upper triangle computed as one int64 numpy matmul
   over the quantized vectors (same quantization as k-means:
   q_d = floor(x_d * 1e6 + 0.5)), and one tiny shuffle of
   (i, j, partial_sum) rows reduces them. 100 TB of vectors = one
   narrow pass, shuffle volume d^2 rows per partition, independent of
   corpus size.
2. The d x d eigendecomposition — driver-side numpy ``eigh`` on a
   64 x 64 matrix (a bounded-metadata collect, like the ranking
   histograms), then the components broadcast back for projection.

Exactness contract (the registry bit-match discipline): all
accumulation is integer. Products of quantized values are <= ~1e12, so
an int64 partition partial stays exact up to ~9.2e6 rows per partition
(a 128 MB parquet partition of 64-d vectors holds ~500k — 18x head
room); the final reduce sums partials as DECIMAL to be overflow-proof
at any row count. The sample covariance

    cov_ij = (n * S_ij - s_i * s_j) / (n * (n-1) * QSCALE^2)

is computed with an exact DECIMAL numerator and denominator and ONE
double division at the end — the oracle replays the identical integer
arithmetic in HUGEINT and the identical final rounding.

No reference analogue (the reference has no linear-algebra surface);
extends the embedding family (stats_linear_fit is the 1-d cousin of
the same exact-sufficient-statistics pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from minispark_spark.operators.kmeans import DIM, QSCALE, _quantized
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

_SCATTER_SCHEMA = StructType(
    [
        StructField("i", IntegerType()),
        StructField("j", IntegerType()),
        StructField("s", LongType()),
    ]
)

# Sentinel rows in the partial stream: (i, -1, sum_i) carries the
# per-dimension value sum, (-1, -1, n) the row count.
_SUM_J = -1
_CNT_I = -1

_IU = np.triu_indices(DIM)


def _scatter_partials(q: DataFrame) -> DataFrame:
    """One narrow pass emitting per-batch integer partials of the
    upper-triangle scatter matrix, the per-dim sums, and the count."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = np.array(list(pdf["q"]), dtype=np.int64)
            assert m.shape[1] == DIM, f"expected {DIM}-d embeddings, got {m.shape[1]}"
            scat = m.T @ m  # int64 matmul — exact (see module docstring bound)
            sums = m.sum(axis=0, dtype=np.int64)
            i_idx = np.concatenate([_IU[0], np.arange(DIM), [_CNT_I]])
            j_idx = np.concatenate([_IU[1], np.full(DIM, _SUM_J), [_SUM_J]])
            s_val = np.concatenate([scat[_IU], sums, [m.shape[0]]])
            yield pd.DataFrame(
                {"i": i_idx.astype(np.int32), "j": j_idx.astype(np.int32), "s": s_val}
            )

    return q.mapInPandas(batches, schema=_SCATTER_SCHEMA)


def scatter_stats(spark: SparkSession, sf_dir: str, emb: DataFrame | None = None) -> DataFrame:
    """(i, j, s DECIMAL) reduced sufficient statistics: upper-triangle
    scatter entries plus the sentinel sum/count rows."""
    q = _quantized(spark, sf_dir, emb)
    return (
        _scatter_partials(q)
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(24,0)")).alias("s"))
    )


@query(
    "embedding_pca_covariance",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS BIGINT)) AS q
            FROM embeddings
        ),
        d AS (SELECT unnest(range(1, {DIM + 1})) AS i),
        ex AS (SELECT vec_id, d.i, q.q[d.i] AS v FROM q, d),
        pr AS (
            SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS s
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
        ),
        sm AS (SELECT i, SUM(v) AS sv FROM ex GROUP BY 1),
        nn AS (SELECT COUNT(*) AS n FROM q)
        SELECT CAST(pr.i - 1 AS INTEGER) AS i,
               CAST(pr.j - 1 AS INTEGER) AS j,
               CAST(nn.n AS BIGINT) AS n,
               CAST(CAST(nn.n AS HUGEINT) * pr.s - sa.sv * sb.sv AS DOUBLE)
               / nullif(CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) * {QSCALE}::HUGEINT * {QSCALE} AS DOUBLE), 0.0)
                   AS cov
        FROM pr
        JOIN sm sa ON sa.i = pr.i
        JOIN sm sb ON sb.i = pr.j
        CROSS JOIN nn
    """,
    doc=f"Sample covariance matrix of the {DIM}-d embeddings (upper "
    "triangle, d(d+1)/2 rows) from ONE narrow data pass: per-batch "
    "int64 numpy matmul partials of the scatter matrix, a tiny "
    "(i,j)-keyed reduce, and exact DECIMAL cross-multiplication "
    "n*S_ij - s_i*s_j with a single final double division. The "
    "eigendecomposition consumer (operators/pca.py::pca_components) is "
    "a driver-side 64x64 eigh on this bounded output. Oracle replays "
    "the identical integer arithmetic in HUGEINT.",
)
def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = scatter_stats(spark, sf_dir).cache()
    cnt = stats.filter((F.col("i") == _CNT_I) & (F.col("j") == _SUM_J)).select(
        F.col("s").cast("bigint").alias("n")
    )
    sums = stats.filter((F.col("i") >= 0) & (F.col("j") == _SUM_J)).select(
        F.col("i").alias("si_idx"), F.col("s").alias("sv")
    )
    pairs = stats.filter(F.col("j") >= 0)
    # 1-row count frame + 64-row sums frame: broadcast joins, no shuffle
    # beyond the partial reduce above.
    num = F.col("n").cast("decimal(12,0)") * F.col("s") - F.col("si").cast(
        "decimal(19,0)"
    ) * F.col("sj").cast("decimal(19,0)")
    den = (
        F.col("n").cast("decimal(12,0)")
        * (F.col("n") - 1).cast("decimal(12,0)")
        * F.lit(QSCALE).cast("decimal(13,0)")
        * F.lit(QSCALE).cast("decimal(13,0)")
    )
    return (
        pairs.join(F.broadcast(sums.withColumnRenamed("sv", "si")), pairs.i == F.col("si_idx"))
        .drop("si_idx")
        .join(
            F.broadcast(
                sums.select(F.col("si_idx").alias("sj_idx"), F.col("sv").alias("sj"))
            ),
            F.col("j") == F.col("sj_idx"),
        )
        .drop("sj_idx")
        .crossJoin(F.broadcast(cnt))
        .select(
            "i",
            "j",
            "n",
            (num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))).alias("cov"),
        )
    )


def pca_components(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(eigenvalues desc (k,), components (k, DIM), mean (DIM,)) from the
    distributed covariance. Driver work is a 64x64 ``eigh`` — bounded.
    Component signs are canonicalized (largest-|.| entry positive) so
    the decomposition is deterministic."""
    rows = embedding_pca_covariance(spark, sf_dir).collect()  # d(d+1)/2 rows — bounded
    if not rows:
        raise ValueError("pca_components: embeddings table is empty")
    n = rows[0]["n"]
    cov = np.zeros((DIM, DIM))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    stats = {
        (r["i"], r["j"]): int(r["s"])
        for r in scatter_stats(spark, sf_dir).collect()
    }
    mean = np.array([stats[(i, _SUM_J)] for i in range(DIM)], dtype=np.float64) / (
        n * QSCALE
    )
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, DIM)
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return vals[order], comps, mean


def pca_project(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    """(vec_id, proj array<double>) — embeddings centered and projected
    onto the top-k principal components. The (k, DIM) component matrix
    rides into the Arrow batches as a closure broadcast; the projection
    pass is shuffle-free and partition-preserving."""
    _, comps, mean = pca_components(spark, sf_dir, k)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            proj = (m - mean) @ comps.T
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "proj": list(proj)})

    return emb.mapInPandas(
        batches,
        schema="vec_id long, proj array<double>",
    )


def pca_whiten(spark: SparkSession, sf_dir: str, k: int = 8, eps: float = 1e-9) -> DataFrame:
    """(vec_id, white array<double>) — PCA whitening: center, project
    onto the top-k components, scale each coordinate by 1/sqrt(λ_i) so
    the output has identity covariance (the preprocessing step before
    similarity metrics that assume isotropy, e.g. Mahalanobis ≈
    Euclidean on whitened vectors). Same shuffle-free batched pass as
    pca_project; ``eps`` guards degenerate eigenvalues."""
    vals, comps, mean = pca_components(spark, sf_dir, k)
    scale = 1.0 / np.sqrt(np.maximum(vals, eps))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            white = ((m - mean) @ comps.T) * scale
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "white": list(white)})

    return emb.mapInPandas(batches, schema="vec_id long, white array<double>")

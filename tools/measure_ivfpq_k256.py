"""Measure per-query recall@k of the production-width IVF-PQ
(ann_ivfpq_recall_k256's recipe: residual K=256 codes, ADC top-R
over-fetch, exact re-rank) against exact integer-L2 ground truth —
the measurement behind IVFPQ_RECALL_FLOOR_K256. Results logged in
BASELINE.md ("ANN production-width ledger").

``--filtered`` measures the filtered variant instead
(ann_ivfpq_filtered_k256: label predicate inside the probed lists,
ground truth = exact top-k UNDER the predicate) across nprobe values —
the probe curve behind IVFPQ_PROBE_FILTERED / IVFPQ_FILTERED_FLOOR_K256.

Usage: python -m tools.measure_ivfpq_k256 [--filtered] [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

from minispark_spark.operators.ivfpq import (
    IVFPQ_ITERS,
    IVFPQ_LISTS,
    IVFPQ_PROBE_K256,
    IVFPQ_R_FETCH,
    _ivfpq_adc_rerank,
    _residual_frame,
)
from minispark_spark.operators.kmeans import DIM, kmeans_fit
from minispark_spark.operators.pq import K_PROD, _exact_l2_topk, pq_train
from minispark_spark.operators.similarity import N_QUERIES, TOP_K
from minispark_spark.session import get_spark


def measure(spark, sf_dir: str) -> None:
    q, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    rq = _residual_frame(q, cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-res-k256", k=K_PROD
    )
    queries = q.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = [
        [int(cl) for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:IVFPQ_PROBE_K256]]
        for qi in range(len(qids))
    ]
    exact = _exact_l2_topk(q, qids, qfull)
    hits = _ivfpq_adc_rerank(q, cents, books, qids, qfull, probes, IVFPQ_R_FETCH).select(
        F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor")
    )
    rec = (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg((F.count("p_neighbor").cast("double") / TOP_K).alias("recall"))
        .collect()
    )
    vals = sorted(r["recall"] for r in rec)
    print(
        f"{sf_dir}: n_queries={len(vals)} min={vals[0]:.2f} "
        f"mean={sum(vals) / len(vals):.2f} per-query={[f'{v:.1f}' for v in vals]}"
    )


def measure_filtered(spark, sf_dir: str, nprobe: int) -> None:
    from minispark_spark.operators.ivfpq import (
        _exact_l2_topk_filtered,
        _labeled_quantized,
    )

    q, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    rq = _residual_frame(q, cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-res-k256", k=K_PROD
    )
    ql = _labeled_quantized(spark, sf_dir)
    queries = ql.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    qlabels = np.array([r["label"] for r in queries], dtype=np.int64)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = [
        [int(cl) for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:nprobe]]
        for qi in range(len(qids))
    ]
    exact = _exact_l2_topk_filtered(ql, qids, qfull, qlabels)
    hits = _ivfpq_adc_rerank(
        ql, cents, books, qids, qfull, probes, IVFPQ_R_FETCH, qlabels=qlabels
    ).select(F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor"))
    rec = (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg((F.count("p_neighbor").cast("double") / TOP_K).alias("recall"))
        .collect()
    )
    vals = sorted(r["recall"] for r in rec)
    print(
        f"filtered nprobe={nprobe} {sf_dir}: n_queries={len(vals)} min={vals[0]:.2f} "
        f"mean={sum(vals) / len(vals):.2f} per-query={[f'{v:.1f}' for v in vals]}"
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    filtered = "--filtered" in args
    args = [a for a in args if a != "--filtered"]
    sys.argv = [sys.argv[0]] + args
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("measure-ivfpq-k256", extra_conf={"spark.ui.enabled": "false"})
    for d in dirs:
        if filtered:
            for nprobe in (4, 5, 6):
                measure_filtered(spark, d, nprobe)
        else:
            measure(spark, d)

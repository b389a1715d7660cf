"""IVF-PQ composite ANN index (Jégou et al. 2011 §V, the FAISS
``IVFPQ`` architecture): a coarse k-means quantizer partitions the
corpus into inverted lists, queries probe only their nearest lists,
and distances INSIDE a probed list are computed in the compressed PQ
domain (ADC lookup tables) — the standard billion-scale recipe
combining the two orthogonal accelerations this repo already ships:

* IVF (operators/kmeans.py ann_ivf_trained_topk): prune WHICH vectors
  are scored — probe n lists out of k, scan cost drops k/n-fold.
* PQ (operators/pq.py ann_pq_topk): prune HOW each vector is scored —
  M table lookups against 4-bit codes instead of a 64-dim float dot.

Composition is pure reuse: the coarse quantizer is the deterministic
integer k-means trainer, the codebooks come from the memoized
``pq_train`` (shared with ann_pq_topk/ann_pq_recall — one training
per session), and the DuckDB oracle is the k-means centroid chain
composed with the PQ codebook chain (prefixed CTEs) plus probe + ADC
— training, list assignment, encoding, probing, and search all
replayed bit-for-bit. PQ encodes raw vectors (FAISS
``by_residual=false``); residual encoding is the same plan with one
extra exact integer subtraction before ``pq_train``.

Scale shape: ONE narrow Arrow pass over the vectors computes coarse
assignment + PQ codes + masked ADC with batch-local top-k pruning —
no shuffle of the corpus, the only exchange ships Q * k * n_partitions
candidate rows to the final per-query window. Centroids + codebooks +
query LUTs are a few KB broadcast by closure. 100 TB of vectors = the
same single pass; in a persisted deployment the assignment/codes
materialize once as a parquet index (8 bytes + M*4 bits per vector)
and incremental batches append — the neardup_incoming_probe pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.operators.kmeans import (
    DIM,
    _assign_np,
    _batch_matrix,
    _centroid_chain,
    kmeans_fit,
)
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

from minispark_spark.operators.pq import (
    K_PROD,
    M,
    SUBDIM,
    _assign_sub,
    _codebook_chain,
    _exact_topk_cte,
    _sub,
    _TOPK_SCHEMA,
    pq_train,
    quantized_corpus,
)
from minispark_spark.operators.similarity import N_QUERIES, TOP_K
from minispark_spark.registry import query

IVFPQ_LISTS = 8
IVFPQ_ITERS = 2
IVFPQ_PROBE = 2


def _oracle() -> str:
    chain1, cfinal = _centroid_chain(IVFPQ_LISTS, IVFPQ_ITERS)
    chain2, bfinal = _codebook_chain(prefix="p", with_q=False)
    dims = f"range(1, {DIM + 1})"
    subdims = f"range(1, {SUBDIM + 1})"
    cdist = (
        f"list_sum(list_transform({dims}, "
        f"i -> (q.q[i] - {cfinal}.c[i]) * (q.q[i] - {cfinal}.c[i])))"
    )
    pdist = (
        f"list_sum(list_transform({subdims}, "
        f"i -> (s.sq[i] - {bfinal}.c[i]) * (s.sq[i] - {bfinal}.c[i])))"
    )
    return chain1 + chain2 + f"""
        , asg AS (
            SELECT vec_id, cl FROM (
                SELECT q.vec_id, {cfinal}.cl,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY {cdist}, {cfinal}.cl) AS rn
                FROM q CROSS JOIN {cfinal}
            ) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, cl FROM (
                SELECT q.vec_id, {cfinal}.cl,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY {cdist}, {cfinal}.cl) AS rn
                FROM q CROSS JOIN {cfinal}
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE rn <= {IVFPQ_PROBE}
        ),
        codes AS (
            SELECT vec_id, m, cw FROM (
                SELECT s.vec_id, s.m, {bfinal}.cw,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                           ORDER BY {pdist}, {bfinal}.cw) AS rn
                FROM psub s JOIN {bfinal} ON {bfinal}.m = s.m
            ) WHERE rn = 1
        ),
        adc AS (
            SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
                   SUM(list_sum(list_transform({subdims},
                       i -> (qs.sq[i] - b.c[i]) * (qs.sq[i] - b.c[i]))))::BIGINT
                       AS approx_d2
            FROM psub qs
            JOIN probe pr ON pr.query_id = qs.vec_id
            JOIN asg a ON a.cl = pr.cl
            JOIN codes c ON c.vec_id = a.vec_id AND c.m = qs.m
            JOIN {bfinal} b ON b.m = c.m AND b.cw = c.cw
            WHERE c.vec_id <> qs.vec_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_d2, rk FROM (
            SELECT query_id, neighbor_id, approx_d2,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY approx_d2 ASC, neighbor_id ASC) AS INTEGER) AS rk
            FROM adc
        ) WHERE rk <= {TOP_K}"""


@query(
    "ann_ivfpq_topk",
    oracle=_oracle(),
    doc=f"IVF-PQ composite ANN (the FAISS IVFPQ architecture): "
    f"{IVFPQ_LISTS}-list deterministic k-means coarse quantizer "
    f"({IVFPQ_ITERS} integer Lloyd rounds), queries probe their "
    f"{IVFPQ_PROBE} nearest lists, candidates scored in the compressed "
    f"PQ domain (M={M} 4-bit codes, exact-int64 ADC lookup tables, "
    "codebooks shared with ann_pq_topk via the memoized trainer). One "
    "narrow Arrow pass computes assignment + codes + masked ADC with "
    "batch-local top-k pruning — the corpus never shuffles. The DuckDB "
    "oracle replays coarse training, PQ training, encoding, probing, "
    "and search end to end.",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    # Heavy numpy scans read the FANNED cached corpus (same rows as the
    # trainer's unfanned copy; guide §2.5 — 1-3 scan partitions serialize
    # the ADC pass on a 32-core box, and batch-local top-k pruning is
    # partition-independent, so the result is identical).
    wq = quantized_corpus(spark, sf_dir)
    _, books = pq_train(spark, sf_dir)  # memoized; shared with ann_pq_*
    queries = wq.filter(F.col("vec_id") < N_QUERIES).collect()  # bounded: Q rows
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    # Probe sets: exact int64 L2 to the coarse centroids, ties to the
    # lowest list id (same ordering as the oracle's (dist, cl) window).
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (Q, L)
    probes = [
        frozenset(
            int(cl)
            for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:IVFPQ_PROBE]
        )
        for qi in range(len(qids))
    ]
    # ADC lookup tables (Q, M, K) — a few KB, broadcast by closure.
    qsub = _sub(qfull)
    lut = ((qsub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        marange = np.arange(M)[None, :]
        for pdf in it:
            if not len(pdf):
                continue
            mat = _batch_matrix(pdf)
            vids = pdf["vec_id"].to_numpy()
            coarse = _assign_np(mat, cents)  # (n,) inverted-list ids
            codes = _assign_sub(_sub(mat), books)  # (n, M) PQ codes
            out = {"query_id": [], "neighbor_id": [], "approx_d2": []}
            for qi in range(len(qids)):
                mask = np.isin(coarse, list(probes[qi])) & (vids != qids[qi])
                if not mask.any():
                    continue
                vd = vids[mask]
                d2q = lut[qi][marange, codes[mask]].sum(axis=1)
                order = np.lexsort((vd, d2q))[:TOP_K]  # batch-local top-k
                out["query_id"].extend([int(qids[qi])] * len(order))
                out["neighbor_id"].extend(int(v) for v in vd[order])
                out["approx_d2"].extend(int(v) for v in d2q[order])
            yield pd.DataFrame(out)

    cand = wq.mapInPandas(batches, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_d2", "rk")
    )


def _recall_oracle() -> str:
    from minispark_spark.operators.kmeans import QSCALE

    dims = f"range(1, {DIM + 1})"
    return f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS BIGINT)) AS q
            FROM embeddings
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT qq.vec_id AS query_id, v.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
                           list_sum(list_transform({dims},
                               i -> (qq.q[i] - v.q[i]) * (qq.q[i] - v.q[i]))),
                           v.vec_id) AS rn
                FROM qz qq JOIN qz v ON v.vec_id <> qq.vec_id
                WHERE qq.vec_id < {N_QUERIES}
            ) WHERE rn <= {TOP_K}
        ),
        ivfpq AS ({_oracle()})
        SELECT exact.query_id,
               COUNT(ivfpq.neighbor_id) AS n_hits,
               CAST(COUNT(ivfpq.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
        FROM exact LEFT JOIN ivfpq
          ON ivfpq.query_id = exact.query_id
         AND ivfpq.neighbor_id = exact.neighbor_id
        GROUP BY exact.query_id"""


@query(
    "ann_ivfpq_recall",
    oracle=_recall_oracle(),
    doc=f"Recall@{TOP_K} audit of the IVF-PQ composite against exact "
    "integer-L2 brute force — stacks BOTH approximation losses (probed "
    f"lists only + compressed-domain distances) into one number per "
    "query; compare with ann_pq_recall (compression loss alone) and "
    "ann_ivf_recall (pruning loss alone) to attribute a recall miss. "
    "Ground truth is one narrow scan with batch-local top-k pruning.",
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.pq import _exact_l2_topk

    wq = quantized_corpus(spark, sf_dir)
    queries = wq.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    exact = _exact_l2_topk(wq, qids, qfull)
    hits = ann_ivfpq_topk(spark, sf_dir).select(
        F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor")
    )
    return (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("p_neighbor").alias("n_hits"),
            (F.count("p_neighbor").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# --- Residual IVF-PQ (FAISS by_residual=true, the paper's actual recipe) ---
#
# PQ codebooks trained on r = vector − its coarse centroid: residuals
# concentrate near the origin, so the 16 codewords/subspace spend their
# precision on the (much smaller) within-list variation instead of the
# global spread — the reason FAISS defaults to residual encoding. The
# price is query-side: the ADC lookup table must be rebuilt per
# (query, probed list) from the query's OWN residual against that list
# (Q * nprobe tables instead of Q — still a few KB). Every quantity
# stays exact int64 (residual = integer subtraction), so the oracle
# replays coarse training, residual computation, residual-PQ training,
# encoding, probing, and per-list ADC bit-for-bit.


_RESIDUAL_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("q", ArrayType(LongType())),
        StructField("cluster", IntegerType()),
    ]
)


def _residual_frame(q: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, q=residual, cluster): integer residual of each vector
    against its assigned coarse centroid, in ONE vectorized Arrow pass
    (assignment + subtraction per batch). The join + per-row
    map-lookup + zip_with spelling this replaced shuffled the corpus
    on vec_id and paid an interpreted 64-lambda HOF per row just to
    subtract integers the batch kernel already holds (guide §2.4 /
    §4.2); same integers, equality pinned in tests/test_ann_kernels.py."""
    if cents.shape[0] == 0:
        # Empty corpus trains zero centroids: emit the (empty) frame
        # with the right schema directly.
        return q.select(
            "vec_id", "q", F.lit(0).cast("int").alias("cluster")
        ).where(F.lit(False))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = _batch_matrix(pdf)
            coarse = _assign_np(mat, cents)
            res = mat - cents[coarse]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "q": list(res),
                    "cluster": coarse.astype(np.int32),
                }
            )

    return q.mapInPandas(batches, schema=_RESIDUAL_SCHEMA)


def _residual_oracle() -> str:
    chain1, cfinal = _centroid_chain(IVFPQ_LISTS, IVFPQ_ITERS)
    dims = f"range(1, {DIM + 1})"
    subdims = f"range(1, {SUBDIM + 1})"
    cdist = (
        f"list_sum(list_transform({dims}, "
        f"i -> (q.q[i] - {cfinal}.c[i]) * (q.q[i] - {cfinal}.c[i])))"
    )
    resid = f"""
        , asg AS (
            SELECT vec_id, cl FROM (
                SELECT q.vec_id, {cfinal}.cl,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY {cdist}, {cfinal}.cl) AS rn
                FROM q CROSS JOIN {cfinal}
            ) WHERE rn = 1
        ),
        rq AS (
            SELECT q.vec_id,
                   list_transform({dims}, i -> q.q[i] - {cfinal}.c[i]) AS q
            FROM q JOIN asg ON asg.vec_id = q.vec_id
            JOIN {cfinal} ON {cfinal}.cl = asg.cl
        )"""
    chain2, bfinal = _codebook_chain(prefix="p", with_q=False, src="rq")
    pdist = (
        f"list_sum(list_transform({subdims}, "
        f"i -> (s.sq[i] - {bfinal}.c[i]) * (s.sq[i] - {bfinal}.c[i])))"
    )
    return chain1 + resid + chain2 + f"""
        , codes AS (
            SELECT vec_id, m, cw FROM (
                SELECT s.vec_id, s.m, {bfinal}.cw,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                           ORDER BY {pdist}, {bfinal}.cw) AS rn
                FROM psub s JOIN {bfinal} ON {bfinal}.m = s.m
            ) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, cl FROM (
                SELECT q.vec_id, {cfinal}.cl,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY {cdist}, {cfinal}.cl) AS rn
                FROM q CROSS JOIN {cfinal}
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE rn <= {IVFPQ_PROBE}
        ),
        qres AS (
            SELECT q.vec_id AS query_id, pr.cl, ms.m,
                   list_transform({subdims},
                       i -> q.q[ms.m * {SUBDIM} + i] - {cfinal}.c[ms.m * {SUBDIM} + i])
                       AS sq
            FROM q
            JOIN probe pr ON pr.query_id = q.vec_id
            JOIN {cfinal} ON {cfinal}.cl = pr.cl,
                 (SELECT unnest(range(0, {M})) AS m) ms
        ),
        adc AS (
            SELECT qr.query_id, c.vec_id AS neighbor_id,
                   SUM(list_sum(list_transform({subdims},
                       i -> (qr.sq[i] - b.c[i]) * (qr.sq[i] - b.c[i]))))::BIGINT
                       AS approx_d2
            FROM qres qr
            JOIN asg a ON a.cl = qr.cl
            JOIN codes c ON c.vec_id = a.vec_id AND c.m = qr.m
            JOIN {bfinal} b ON b.m = c.m AND b.cw = c.cw
            WHERE c.vec_id <> qr.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_d2, rk FROM (
            SELECT query_id, neighbor_id, approx_d2,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY approx_d2 ASC, neighbor_id ASC) AS INTEGER) AS rk
            FROM adc
        ) WHERE rk <= {TOP_K}"""


@query(
    "ann_ivfpq_residual_topk",
    oracle=_residual_oracle(),
    doc=f"Residual IVF-PQ (FAISS by_residual=true — Jégou et al.'s "
    "actual recipe): PQ codebooks trained on vector-minus-coarse-"
    "centroid residuals, so codewords spend their precision on within-"
    "list variation; the query rebuilds its ADC table per probed list "
    f"from its OWN residual against that list ({IVFPQ_PROBE} tables "
    "per query — a few KB). All-integer residuals keep the end-to-end "
    "oracle replay exact. Compare approx_d2 quality with ann_ivfpq_topk "
    "(raw-vector PQ) at identical index parameters.",
)
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    wq = quantized_corpus(spark, sf_dir)  # fanned: residual train + ADC scans
    rq = _residual_frame(wq, cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-residual"
    )
    queries = wq.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = [
        [int(cl) for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:IVFPQ_PROBE]]
        for qi in range(len(qids))
    ]
    # Per-(query, probed list) LUTs from the query's residual vs that list.
    luts: list[dict[int, np.ndarray]] = []
    for qi in range(len(qids)):
        per_list = {}
        for cl in probes[qi]:
            rs = _sub((qfull[qi] - cents[cl])[None, :])  # (1, M, SUBDIM)
            per_list[cl] = ((rs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)[0]
        luts.append(per_list)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        marange = np.arange(M)[None, :]
        for pdf in it:
            if not len(pdf):
                continue
            mat = _batch_matrix(pdf)
            vids = pdf["vec_id"].to_numpy()
            coarse = _assign_np(mat, cents)
            rcodes = _assign_sub(_sub(mat - cents[coarse]), books)  # residual codes
            out = {"query_id": [], "neighbor_id": [], "approx_d2": []}
            for qi in range(len(qids)):
                for cl in probes[qi]:
                    mask = (coarse == cl) & (vids != qids[qi])
                    if not mask.any():
                        continue
                    vd = vids[mask]
                    d2q = luts[qi][cl][marange, rcodes[mask]].sum(axis=1)
                    order = np.lexsort((vd, d2q))[:TOP_K]
                    out["query_id"].extend([int(qids[qi])] * len(order))
                    out["neighbor_id"].extend(int(v) for v in vd[order])
                    out["approx_d2"].extend(int(v) for v in d2q[order])
            yield pd.DataFrame(out)

    cand = wq.mapInPandas(batches, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_d2", "rk")
    )


def _residual_recall_oracle() -> str:
    from minispark_spark.operators.kmeans import QSCALE

    dims = f"range(1, {DIM + 1})"
    return f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS BIGINT)) AS q
            FROM embeddings
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT qq.vec_id AS query_id, v.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
                           list_sum(list_transform({dims},
                               i -> (qq.q[i] - v.q[i]) * (qq.q[i] - v.q[i]))),
                           v.vec_id) AS rn
                FROM qz qq JOIN qz v ON v.vec_id <> qq.vec_id
                WHERE qq.vec_id < {N_QUERIES}
            ) WHERE rn <= {TOP_K}
        ),
        rivfpq AS ({_residual_oracle()})
        SELECT exact.query_id,
               COUNT(rivfpq.neighbor_id) AS n_hits,
               CAST(COUNT(rivfpq.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
        FROM exact LEFT JOIN rivfpq
          ON rivfpq.query_id = exact.query_id
         AND rivfpq.neighbor_id = exact.neighbor_id
        GROUP BY exact.query_id"""


@query(
    "ann_ivfpq_residual_recall",
    oracle=_residual_recall_oracle(),
    doc=f"Recall@{TOP_K} of residual IVF-PQ vs exact ground truth — the "
    "third column of the approximation-loss ledger (ann_ivf_recall: "
    "pruning only; ann_pq_recall: compression only; ann_ivfpq_recall: "
    "both, raw-vector codes; this: both, residual codes). Residual "
    "codebooks should recover recall lost to raw-vector quantization "
    "at identical index parameters.",
)
def ann_ivfpq_residual_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.pq import _exact_l2_topk

    wq = quantized_corpus(spark, sf_dir)
    queries = wq.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    exact = _exact_l2_topk(wq, qids, qfull)
    hits = ann_ivfpq_residual_topk(spark, sf_dir).select(
        F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor")
    )
    return (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("p_neighbor").alias("n_hits"),
            (F.count("p_neighbor").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# --- Production-width IVF-PQ: residual codes at K=256 + exact re-rank -------
#
# The full FAISS "IVFADC+R" recipe at production codebook width
# (Jégou et al. §VI): coarse probe prunes WHICH lists are scanned,
# residual PQ at K=256 (1 byte/code) scores candidates in the
# compressed domain, ADC over-fetches top-R, and the R survivors are
# exact-re-ranked — same plan family as ann_pq_recall_k256 (pq.py:465)
# extended with the coarse stage, closing VERDICT r3 item 3 ("IVF-PQ
# still trains at K=16"). K=256 training is SQL-intractable to replay
# (the K=16 twins above keep the bit-exact end-to-end oracle), so the
# oracle is the established bound-check shape: exact ground truth
# replayed in SQL (exact_id_sum pins Spark's exact baseline
# cross-engine) + a measured per-query recall floor. The recall
# ceiling is IVF pruning itself: re-ranking makes probed candidates
# exact, so misses are exactly the true neighbors whose list was not
# probed.

IVFPQ_R_FETCH = 50  # ADC over-fetch width for the exact re-rank
IVFPQ_PROBE_K256 = 4  # production variant probes 4/8 lists: at nprobe=2
# the measured min per-query recall@5 was 0.2 at sf0.1 (IVF pruning,
# unrecoverable by re-rank) — tools/measure_ivfpq_k256.py ledger in
# BASELINE.md.
# Measured floor (tools/measure_ivfpq_k256.py, nprobe=4): min
# per-query recall@5 is 0.6 at every SF (sf0.001 mean 0.92 / sf0.01
# mean 0.94 / sf0.1 mean 0.80); floor set 1.5x below the min.
IVFPQ_RECALL_FLOOR_K256 = 0.4


def _ivfpq_adc_rerank(
    q: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    qids: np.ndarray,
    qfull: np.ndarray,
    probes: list[list[int]],
    r_fetch: int,
    qlabels: np.ndarray | None = None,
) -> DataFrame:
    """Residual-ADC top-``r_fetch`` over-fetch + exact integer-L2
    re-rank to top-k in ONE narrow corpus scan. Per batch and query:
    candidates from the probed lists are scored with the query's
    per-list residual LUT, the combined batch-local top-R survivors
    get exact distances attached in-scan (R*DIM multiplies), and the
    only exchange ships Q*R tiny rows to the final window — the
    _adc_rerank_topk shape (pq.py) with coarse probe masking and
    per-(query, list) LUTs on top.

    ``qlabels`` (optional) is the filtered-ANN mode: ``q`` must then
    carry a ``label`` column and a candidate is scored only when its
    label equals the query's — the predicate is applied INSIDE the
    probed lists, before any LUT lookup (the Faiss/Vespa filtered-ANN
    strategy). Cost per query drops to selectivity x probed fraction
    of the corpus; the known hazard (an over-selective predicate
    empties the probed lists) is bounded by the recall-floor oracle of
    the registry entry."""
    luts: list[dict[int, np.ndarray]] = []
    for qi in range(len(qids)):
        per_list = {}
        for cl in probes[qi]:
            rs = _sub((qfull[qi] - cents[cl])[None, :])  # (1, M, SUBDIM)
            per_list[cl] = ((rs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)[0]
        luts.append(per_list)

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_d2", LongType()),
            StructField("exact_d2", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        marange = np.arange(M)[None, :]
        for pdf in it:
            if not len(pdf):
                continue
            mat = _batch_matrix(pdf)
            vids = pdf["vec_id"].to_numpy()
            labels = pdf["label"].to_numpy() if qlabels is not None else None
            coarse = _assign_np(mat, cents)
            rcodes = _assign_sub(_sub(mat - cents[coarse]), books)
            # Batch-row index per vec_id, built ONCE per batch (it was
            # rebuilt per query — O(Q * n) dict churn for nothing).
            pos = {int(v): i for i, v in enumerate(vids)}
            qid_col, nbr_col, ad2_col, ed2_col = [], [], [], []
            for qi in range(len(qids)):
                vd_parts, d2_parts = [], []
                for cl in probes[qi]:
                    mask = (coarse == cl) & (vids != qids[qi])
                    if labels is not None:
                        mask &= labels == qlabels[qi]
                    if not mask.any():
                        continue
                    vd_parts.append(vids[mask])
                    d2_parts.append(luts[qi][cl][marange, rcodes[mask]].sum(axis=1))
                if not vd_parts:
                    continue
                vd = np.concatenate(vd_parts)
                d2q = np.concatenate(d2_parts)
                order = np.lexsort((vd, d2q))[:r_fetch]
                # Map surviving ids back to batch rows (vids are unique
                # within a batch but not sorted).
                sel = np.array([pos[int(v)] for v in vd[order]], dtype=np.int64)
                ed = ((mat[sel] - qfull[qi][None, :]) ** 2).sum(axis=1)
                qid_col.append(np.full(len(order), qids[qi], dtype=np.int64))
                nbr_col.append(vd[order])
                ad2_col.append(d2q[order])
                ed2_col.append(ed)
            if not qid_col:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qid_col),
                    "neighbor_id": np.concatenate(nbr_col),
                    "approx_d2": np.concatenate(ad2_col),
                    "exact_d2": np.concatenate(ed2_col),
                }
            )

    cand = q.mapInPandas(batches, schema=schema)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("exact_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("r_adc", F.row_number().over(w_adc))
        .filter(F.col("r_adc") <= r_fetch)
        .withColumn("rk", F.row_number().over(w_exact).cast("int"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "exact_d2", "rk")
    )


@query(
    "ann_ivfpq_recall_k256",
    oracle=_exact_topk_cte()
    + """
        SELECT query_id,
               CAST(SUM(neighbor_id) AS BIGINT) AS exact_id_sum,
               TRUE AS within_bound
        FROM exact
        GROUP BY query_id""",
    doc=f"Production-width IVF-PQ (full FAISS IVFADC+R): "
    f"{IVFPQ_LISTS}-list coarse quantizer probed at {IVFPQ_PROBE_K256}, "
    f"residual PQ codebooks at K={K_PROD} (1 byte/code), ADC "
    f"top-{IVFPQ_R_FETCH} over-fetch + exact integer re-rank — "
    "ann_pq_recall_k256's production recipe with the coarse stage "
    "composed in. Bound-check oracle (K=256 training is SQL-"
    "intractable; the K=16 twins keep the bit-exact replay): "
    "exact_id_sum pins Spark's exact ground truth cross-engine, and "
    f"per-query recall@{TOP_K} must clear the measured floor "
    f"{IVFPQ_RECALL_FLOOR_K256} (within_bound pinned TRUE). The "
    "residual re-rank makes probed candidates exact, so the recall "
    "ceiling is IVF pruning alone — compare ann_ivf_recall.",
)
def ann_ivfpq_recall_k256(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.pq import _exact_l2_topk

    _, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    wq = quantized_corpus(spark, sf_dir)  # fanned: residual train + ADC + exact
    rq = _residual_frame(wq, cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-res-k256", k=K_PROD
    )
    queries = wq.filter(F.col("vec_id") < N_QUERIES).collect()  # bounded: Q rows
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = [
        [
            int(cl)
            for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:IVFPQ_PROBE_K256]
        ]
        for qi in range(len(qids))
    ]
    exact = _exact_l2_topk(wq, qids, qfull)
    hits = _ivfpq_adc_rerank(wq, cents, books, qids, qfull, probes, IVFPQ_R_FETCH).select(
        F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor")
    )
    return (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum("neighbor_id").alias("exact_id_sum"),
            (
                F.count("p_neighbor").cast("double") / TOP_K
                >= F.lit(IVFPQ_RECALL_FLOOR_K256)
            ).alias("within_bound"),
        )
    )


# --- Filtered production IVF-PQ (predicate + K=256 + exact re-rank) ---------
#
# The RAG-serving configuration: every query carries a metadata predicate
# (tenant / language / ACL — here the embeddings ``label`` column) AND wants
# the production-width index (K=256 residual codebooks, coarse probing, ADC
# over-fetch, exact re-rank). Composes ann_ivf_filtered_topk's
# predicate-inside-probed-lists with ann_ivfpq_recall_k256's IVFADC+R recipe:
# a candidate must match the probed coarse list AND the predicate before a
# single LUT lookup happens, and the survivors are re-ranked exactly.
#
# Filtered-recall hazard: the predicate thins every probed list ~10x (10
# labels), so a fixed nprobe prunes MORE of the filtered ground truth than
# the unfiltered one — measured floor below (tools/measure_ivfpq_k256.py
# --filtered ledger in BASELINE.md); production raises nprobe with
# selectivity or falls back to the pre-filter scan (ann_filtered_topk) when
# the predicate is over-selective.

# nprobe raised 4 -> 6 versus the unfiltered K=256 entry: the measured
# probe curve under the ~10%-selective label predicate
# (tools/measure_ivfpq_k256.py --filtered, min/mean recall@5 at sf0.1)
# is nprobe=4: 0.20/0.82, nprobe=5: 0.40/0.90, nprobe=6: 0.60/0.92 —
# the quantified form of "raise nprobe with selectivity". At nprobe=6
# the index still scores only ~7.5% of the corpus (6/8 lists x 10%
# predicate selectivity).
IVFPQ_PROBE_FILTERED = 6
# Measured floor (nprobe=6): min per-query filtered recall@5 is 0.6 at
# every SF (sf0.001 mean 0.94 / sf0.01 mean 0.90 / sf0.1 mean 0.92);
# floor set 1.5x below the min, same discipline as
# IVFPQ_RECALL_FLOOR_K256.
IVFPQ_FILTERED_FLOOR_K256 = 0.4


def _labeled_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q, label) — the kmeans quantization expression plus the
    predicate column, one narrow scan, no join/shuffle."""
    from minispark_spark.operators.kmeans import QSCALE
    from minispark_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qcol = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QSCALE + F.lit(0.5)).cast("long")
    )
    # fan_out: the filtered exact-top-k and filtered-ADC scans over
    # this frame are CPU-bound numpy stages; the embeddings parquet
    # arrives in 1-3 byte-sized partitions at gate SFs (guide §2.5/§4;
    # no-op on an already-wide corpus scan).
    from minispark_spark.sources.tables import fan_out

    return fan_out(emb.select("vec_id", qcol.alias("q"), "label"))


def _exact_l2_topk_filtered(
    ql: DataFrame, qids: np.ndarray, qfull: np.ndarray, qlabels: np.ndarray
) -> DataFrame:
    """Exact int64 squared-L2 top-k per query UNDER the label predicate
    — the filtered ground truth (same scan shape as pq._exact_l2_topk)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = _batch_matrix(pdf)
            vids = pdf["vec_id"].to_numpy()
            labels = pdf["label"].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "approx_d2": []}
            for qi in range(len(qids)):
                mask = (vids != qids[qi]) & (labels == qlabels[qi])
                if not mask.any():
                    continue
                d2 = ((m[mask] - qfull[qi][None, :]) ** 2).sum(axis=1)
                vd = vids[mask]
                order = np.lexsort((vd, d2))[:TOP_K]
                out["query_id"].extend([int(qids[qi])] * len(order))
                out["neighbor_id"].extend(int(v) for v in vd[order])
                out["approx_d2"].extend(int(v) for v in d2[order])
            yield pd.DataFrame(out)

    cand = ql.mapInPandas(batches, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def _filtered_exact_oracle() -> str:
    from minispark_spark.operators.kmeans import QSCALE

    dims = f"range(1, {DIM + 1})"
    return f"""
        WITH qz AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS BIGINT)) AS q
            FROM embeddings
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT qq.vec_id AS query_id, v.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
                           list_sum(list_transform({dims},
                               i -> (qq.q[i] - v.q[i]) * (qq.q[i] - v.q[i]))),
                           v.vec_id) AS rn
                FROM qz qq JOIN qz v
                  ON v.vec_id <> qq.vec_id AND v.label = qq.label
                WHERE qq.vec_id < {N_QUERIES}
            ) WHERE rn <= {TOP_K}
        )
        SELECT query_id,
               CAST(SUM(neighbor_id) AS BIGINT) AS exact_id_sum,
               TRUE AS within_bound
        FROM exact
        GROUP BY query_id"""


@query(
    "ann_ivfpq_filtered_k256",
    oracle=_filtered_exact_oracle(),
    doc=f"Filtered production IVF-PQ (the RAG-serving config): "
    f"{IVFPQ_LISTS}-list coarse quantizer probed at "
    f"{IVFPQ_PROBE_FILTERED}, K={K_PROD} residual codebooks, the label "
    "predicate applied INSIDE the probed lists before any ADC lookup, "
    f"ADC top-{IVFPQ_R_FETCH} over-fetch + exact integer re-rank. "
    "Ground truth is the FILTERED exact top-k (exact L2 under the same "
    "predicate — what the user would get from a full filtered scan). "
    "Bound-check oracle (K=256 training is SQL-intractable): "
    "exact_id_sum pins Spark's filtered ground truth cross-engine; "
    f"per-query filtered recall@{TOP_K} must clear the measured floor "
    f"{IVFPQ_FILTERED_FLOOR_K256} (within_bound pinned TRUE). The "
    "hazard this floor guards: the ~10x-selective predicate thins every "
    "probed list, so IVF pruning costs MORE recall than unfiltered — "
    "production raises nprobe with selectivity or falls back to the "
    "pre-filter scan (ann_filtered_topk).",
)
def ann_ivfpq_filtered_k256(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    rq = _residual_frame(quantized_corpus(spark, sf_dir), cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-res-k256", k=K_PROD
    )
    ql = _labeled_quantized(spark, sf_dir)
    queries = ql.filter(F.col("vec_id") < N_QUERIES).collect()  # bounded: Q rows
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    qlabels = np.array([r["label"] for r in queries], dtype=np.int64)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = [
        [
            int(cl)
            for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[
                :IVFPQ_PROBE_FILTERED
            ]
        ]
        for qi in range(len(qids))
    ]
    exact = _exact_l2_topk_filtered(ql, qids, qfull, qlabels)
    hits = _ivfpq_adc_rerank(
        ql, cents, books, qids, qfull, probes, IVFPQ_R_FETCH, qlabels=qlabels
    ).select(F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor"))
    return (
        exact.join(
            hits,
            (F.col("p_query") == F.col("query_id"))
            & (F.col("p_neighbor") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum("neighbor_id").alias("exact_id_sum"),
            (
                F.count("p_neighbor").cast("double") / TOP_K
                >= F.lit(IVFPQ_FILTERED_FLOOR_K256)
            ).alias("within_bound"),
        )
    )


# Per-nprobe floors from the measured filtered probe curve
# (BASELINE.md round-5 filtered addendum; overall min/mean across the
# three SFs, floored at ~1/1.5 of the observed min):
#   nprobe=4 min 0.20 mean 0.82-0.84 | 5: 0.40 / 0.88-0.90 | 6: 0.60 / 0.90-0.94
FILTERED_CURVE_MIN_FLOORS = {4: 0.13, 5: 0.26, 6: 0.40}
FILTERED_CURVE_MEAN_FLOORS = {4: 0.54, 5: 0.58, 6: 0.60}


def _filtered_curve_oracle() -> str:
    from minispark_spark.operators.kmeans import QSCALE

    dims = f"range(1, {DIM + 1})"
    rows = "\n            UNION ALL\n            ".join(
        f"SELECT {p} AS n_probe" for p in sorted(FILTERED_CURVE_MIN_FLOORS)
    )
    return f"""
        WITH qz AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS BIGINT)) AS q
            FROM embeddings
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT qq.vec_id AS query_id, v.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY
                           list_sum(list_transform({dims},
                               i -> (qq.q[i] - v.q[i]) * (qq.q[i] - v.q[i]))),
                           v.vec_id) AS rn
                FROM qz qq JOIN qz v
                  ON v.vec_id <> qq.vec_id AND v.label = qq.label
                WHERE qq.vec_id < {N_QUERIES}
            ) WHERE rn <= {TOP_K}
        ),
        probes AS ({rows})
        SELECT n_probe,
               CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
               TRUE AS min_ok,
               TRUE AS mean_ok
        FROM probes
        ORDER BY n_probe"""


@query(
    "ann_ivfpq_filtered_probe_curve",
    oracle=_filtered_curve_oracle(),
    doc="Driver-visible form of the round-5 filtered probe-curve "
    "measurement (BASELINE.md): the filtered K=256 IVF-PQ runs at "
    f"nprobe={sorted(FILTERED_CURVE_MIN_FLOORS)} against the FILTERED "
    "exact ground truth, and per-nprobe min/mean recall must clear the "
    "measured floors (min 0.13/0.26/0.40, mean 0.54/0.58/0.60 — each "
    "~1/1.5 of the worst observation across SFs). This pins the curve "
    "SHAPE the hazard analysis rests on: the same predicate that is "
    "recall-safe at nprobe=6 collapses the floor at nprobe=4, so an "
    "operator reading this row knows the nprobe-vs-selectivity "
    "trade-off is still what BASELINE.md measured. n_exact is the "
    "SQL-replayed filtered ground-truth size; one coarse+PQ training "
    "is shared across all three searches (memoized).",
)
def ann_ivfpq_filtered_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cents = kmeans_fit(spark, sf_dir, IVFPQ_LISTS, IVFPQ_ITERS)
    rq = _residual_frame(quantized_corpus(spark, sf_dir), cents)
    _, books = pq_train(
        spark, sf_dir, qframe=rq.select("vec_id", "q"), tag="ivfpq-res-k256", k=K_PROD
    )
    ql = _labeled_quantized(spark, sf_dir)
    queries = ql.filter(F.col("vec_id") < N_QUERIES).collect()  # bounded: Q rows
    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qfull = np.array([r["q"] for r in queries], dtype=np.int64).reshape(len(queries), DIM)
    qlabels = np.array([r["label"] for r in queries], dtype=np.int64)
    cdist = ((qfull[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    exact = _exact_l2_topk_filtered(ql, qids, qfull, qlabels).cache()
    n_exact = exact.count()
    out = None
    for p in sorted(FILTERED_CURVE_MIN_FLOORS):
        probes = [
            [int(cl) for cl in np.lexsort((np.arange(cents.shape[0]), cdist[qi]))[:p]]
            for qi in range(len(qids))
        ]
        hits = _ivfpq_adc_rerank(
            ql, cents, books, qids, qfull, probes, IVFPQ_R_FETCH, qlabels=qlabels
        ).select(
            F.col("query_id").alias("p_query"), F.col("neighbor_id").alias("p_neighbor")
        )
        per_q = (
            exact.join(
                hits,
                (F.col("p_query") == F.col("query_id"))
                & (F.col("p_neighbor") == F.col("neighbor_id")),
                "left",
            )
            .groupBy("query_id")
            .agg((F.count("p_neighbor").cast("double") / TOP_K).alias("recall"))
        )
        one = per_q.agg(
            F.lit(p).alias("n_probe"),
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.coalesce(
                F.min("recall") >= F.lit(FILTERED_CURVE_MIN_FLOORS[p]), F.lit(True)
            ).alias("min_ok"),
            F.coalesce(
                F.avg("recall") >= F.lit(FILTERED_CURVE_MEAN_FLOORS[p]), F.lit(True)
            ).alias("mean_ok"),
        )
        out = one if out is None else out.unionByName(one)
    # No display orderBy: 3 rows, and the gate compare is
    # order-insensitive — a global Sort would be pure plan noise.
    return out

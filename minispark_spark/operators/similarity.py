"""Similarity search over the embeddings table (array<float>, 64-dim).

- ``ann_cosine_topk`` — brute-force top-k: broadcast the (small) query
  set against all candidates, rank per query. This is the exact
  baseline; at 100 TB the candidate scan is a single pass and the
  broadcast keeps it shuffle-free (one final top-k per query via
  window over the query partition).
- ``embedding_near_dup`` — all pairs above a cosine threshold.
  Quadratic self-join: correct at test scale, the motivation for the
  LSH/IVF variants planned next (bucketed candidates instead of the
  full cross product).

Dot products are JVM-side folds (functions/vectors.py), matched
bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import vectors
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

N_QUERIES = 10
TOP_K = 5
NEAR_DUP_COSINE = 0.35


@query(
    "ann_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {vectors.cosine_sql("q.qe", "c.embedding")} AS cosine
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    doc=f"Brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors: "
    "broadcast queries × full candidate scan → per-query window top-k.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    scored = q.join(emb, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        vectors.cosine(F.col("qe"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "embedding_near_dup",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {vectors.cosine_sql("a.embedding", "b.embedding")} AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {vectors.cosine_sql("a.embedding", "b.embedding")} >= {NEAR_DUP_COSINE}
    """,
    doc=f"Embedding near-duplicate pairs (cosine >= {NEAR_DUP_COSINE}) via "
    "self-join — exact baseline that LSH bucketing approximates at scale.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cos = vectors.cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


# --- Random-hyperplane LSH: the scale path for near-dup pairs --------------
#
# L tables x k sign-bits. Hyperplane weights are deterministic +-1 derived
# from (A_i * dim + B_i) % 97 < 48 — reproducible in DuckDB SQL, so the
# oracle verifies the ENTIRE pipeline (projection, bucketing, verification).

LSH_TABLES = 8
LSH_BITS = 4
_LSH_AB = [
    ((2_654_435_761 * (i + 3)) % 1_000_000_007 % 10_000 | 1, (40_503 * (i + 11)) % 9_973)
    for i in range(LSH_TABLES * LSH_BITS)
]


def _w_case_sql(i: int) -> str:
    a, b = _LSH_AB[i]
    return f"(CASE WHEN (j * {a} + {b}) % 97 < 48 THEN 1.0 ELSE -1.0 END)"


def _proj(emb, i: int):
    """Deterministic double fold: dot(embedding, hyperplane_i)."""
    a, b = _LSH_AB[i]

    def step(acc, j):
        w = F.when((j * a + b) % 97 < 48, F.lit(1.0)).otherwise(F.lit(-1.0))
        return acc + F.element_at(emb, j.cast("int")).cast("double") * w

    return F.aggregate(F.sequence(F.lit(1), F.size(emb)), F.lit(0.0), step)


def _proj_sql(emb_expr: str, i: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({emb_expr})+1), "
        f"j -> {emb_expr}[j]::DOUBLE * {_w_case_sql(i)})), (acc, x) -> acc + x)"
    )


def _bucket(emb, t: int):
    acc = F.lit(0).cast("long")
    for j in range(LSH_BITS):
        bit = F.when(_proj(emb, t * LSH_BITS + j) > 0, 1).otherwise(0)
        acc = acc * 2 + bit
    return acc


def _bucket_sql(emb_expr: str, t: int) -> str:
    acc = "0"
    for j in range(LSH_BITS):
        bit = f"(CASE WHEN {_proj_sql(emb_expr, t * LSH_BITS + j)} > 0 THEN 1 ELSE 0 END)"
        acc = f"(({acc}) * 2 + {bit})"
    return acc


_LSH_BUCKET_UNION_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, {_bucket_sql('embedding', t)} AS bucket FROM embeddings"
    for t in range(LSH_TABLES)
)


@query(
    "embedding_near_dup_lsh",
    oracle=f"""
        WITH buckets AS ({_LSH_BUCKET_UNION_SQL}),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM buckets a JOIN buckets b
              ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT c.vec_a, c.vec_b,
               {vectors.cosine_sql("ea.embedding", "eb.embedding")} AS cosine
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.vec_a
        JOIN embeddings eb ON eb.vec_id = c.vec_b
        WHERE {vectors.cosine_sql("ea.embedding", "eb.embedding")} >= {NEAR_DUP_COSINE}
    """,
    doc=f"Near-dup pairs via random-hyperplane LSH ({LSH_TABLES} tables x "
    f"{LSH_BITS} sign-bits) + exact cosine verification — the scale path "
    "that replaces the quadratic self-join: candidates come only from "
    "bucket collisions (one shuffle on (table, bucket)).",
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    emb.count()  # materialize: bucket build + two verify scans
    e = F.col("embedding")
    buckets = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket(e, t).alias("bucket"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.tbl", "tb.bucket")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    cos = vectors.cosine(F.col("ea.embedding"), F.col("eb.embedding"))
    return (
        cand.join(emb.alias("ea"), F.col("ea.vec_id") == F.col("vec_a"))
        .join(emb.alias("eb"), F.col("eb.vec_id") == F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


# --- IVF (inverted-file) ANN: the index-style scale path for top-k ---------
#
# Deterministic "training": the first N_CENTROIDS vectors act as coarse
# centroids (a real deployment would k-means; the plan shape is identical).
# Every vector is assigned to its nearest centroid (one broadcast pass);
# each query probes its N_PROBE nearest centroids and ranks exact cosine
# only within those inverted lists — candidate work drops from O(N) to
# O(N * nprobe / ncentroids) per query, and the assignment shuffle is the
# only wide dependency.

N_CENTROIDS = 16
N_PROBE = 4


@query(
    "ann_ivf_topk",
    oracle=f"""
        WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
                      FROM embeddings WHERE vec_id < {N_CENTROIDS}),
        assign AS (
            SELECT vec_id, cent_id FROM (
                SELECT e.vec_id, c.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY {vectors.cosine_sql("e.embedding", "c.cvec")} DESC, c.cent_id) AS ar
                FROM embeddings e CROSS JOIN cent c
            ) WHERE ar = 1
        ),
        probe AS (
            SELECT query_id, cent_id FROM (
                SELECT q.vec_id AS query_id, c.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY {vectors.cosine_sql("q.embedding", "c.cvec")} DESC, c.cent_id) AS pr
                FROM embeddings q CROSS JOIN cent c
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE pr <= {N_PROBE}
        ),
        scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   {vectors.cosine_sql("qe.embedding", "ne.embedding")} AS cosine
            FROM probe p
            JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
            JOIN embeddings qe ON qe.vec_id = p.query_id
            JOIN embeddings ne ON ne.vec_id = a.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rk FROM (
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """,
    doc=f"IVF ANN top-{TOP_K}: {N_CENTROIDS} coarse centroids (broadcast), "
    f"one assignment pass, queries probe {N_PROBE} lists — exact cosine "
    "only inside probed lists. Same output shape as ann_cosine_topk but "
    "per-query candidate work is nprobe/ncentroids of the corpus.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = F.broadcast(
        emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
        )
    )
    cos_c = vectors.cosine(F.col("embedding"), F.col("cvec"))

    aw = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    assign = (
        emb.join(cent)
        .select("vec_id", "cent_id", cos_c.alias("ccos"))
        .select("*", F.row_number().over(aw).alias("ar"))
        .filter(F.col("ar") == 1)
        .select("vec_id", "cent_id")
    )

    probe = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(cent)
        .select(F.col("vec_id").alias("query_id"), "cent_id", cos_c.alias("ccos"))
        .select(
            "*",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cent_id")))
            .alias("pr"),
        )
        .filter(F.col("pr") <= N_PROBE)
        .select("query_id", "cent_id")
    )

    cand = (
        F.broadcast(probe)
        .join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )

    scored = (
        cand.join(emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")), "query_id")
        .join(emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
              F.col("vec_id") == F.col("neighbor_id"))
        .select("query_id", "neighbor_id", vectors.cosine(F.col("qe"), F.col("ne")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )

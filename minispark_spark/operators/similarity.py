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
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id) AS rk
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

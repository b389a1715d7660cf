"""Streaming search serving: query micro-batches against a prepared
hybrid index.

The production shape of the retrieval stack: the corpus-side state
(BM25 postings + embedding norms) is built ONCE and kept cached — the
expensive, corpus-sized half — while queries arrive as a stream and
each micro-batch is scored statelessly against the cached index
(lexical leg + vector leg, fused by integer reciprocal-rank fusion).
The same pattern as the streaming near-dup probe (streaming/neardup.py:
static LSH index + stream-static probe) applied to search serving.

Scoring reuses the oracle-verified batch cores verbatim —
plans/text.py::bm25_score / RRF constants and the ann_cosine_topk
ranking shape — so the stream output is provably identical to the
hybrid_search_rrf registry query when fed the same queries
(tests/test_streaming_search.py, split across micro-batches).

Per-batch cost at 100 TB: query terms and query vectors broadcast
(bounded by batch size); the postings join and the candidate scan are
the only corpus-sized reads, both shuffle-free on the query side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minispark_spark.functions import vectors
from minispark_spark.plans.text import (
    BM25_Q_TERMS,
    HYBRID_TOP_K,
    RRF_K,
    RRF_SCALE,
    bm25_index,
    bm25_score,
)
from minispark_spark.functions import text

TOP_K_VEC = 5  # ann_cosine_topk's TOP_K


@dataclass
class SearchIndex:
    tf: DataFrame
    dl: DataFrame
    df: DataFrame
    stats: DataFrame
    emb: DataFrame  # (vec_id, embedding, nrm)


def build_search_index(docs: DataFrame, embeddings: DataFrame) -> SearchIndex:
    """Build + cache the corpus-side state (call once, serve many)."""
    tf, dl, df, stats = bm25_index(docs)
    emb = embeddings.select(
        "vec_id", "embedding", vectors.norm(F.col("embedding")).alias("nrm")
    )
    idx = SearchIndex(tf.cache(), dl.cache(), df.cache(), stats.cache(), emb.cache())
    for frame in (idx.tf, idx.dl, idx.df, idx.stats, idx.emb):
        frame.count()  # materialize before serving
    return idx


def score_query_batch(batch: DataFrame, index: SearchIndex) -> DataFrame:
    """Hybrid-score one (query_id, text, embedding) query frame against
    the index: BM25 leg + cosine leg + integer RRF fusion — identical
    math to the hybrid_search_rrf registry query."""
    q_terms = batch.select(
        "query_id",
        F.explode(
            F.array_distinct(F.slice(text.tokens(F.col("text")), 1, BM25_Q_TERMS))
        ).alias("tok"),
    )
    lex = bm25_score(q_terms, index.tf, index.dl, index.df, index.stats).select(
        F.col("query_id").alias("b_q"), F.col("doc_id").alias("b_c"), F.col("rk").alias("brk")
    )

    qv = batch.select(
        F.col("query_id").alias("a_q"),
        F.col("embedding").alias("qe"),
        vectors.norm(F.col("embedding")).alias("qn"),
    )
    cos = vectors.dot(F.col("qe"), F.col("embedding")) / F.nullif(
        F.col("qn") * F.col("nrm"), F.lit(0.0)
    )
    wv = Window.partitionBy("a_q").orderBy(F.col("cosine").desc(), F.col("a_c"))
    vec = (
        index.emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("a_q"))
        .select("a_q", F.col("vec_id").alias("a_c"), cos.alias("cosine"))
        .withColumn("ark", F.row_number().over(wv))
        .filter(F.col("ark") <= TOP_K_VEC)
    )

    u = lex.join(
        vec, (F.col("a_q") == F.col("b_q")) & (F.col("a_c") == F.col("b_c")), "full_outer"
    ).select(
        F.coalesce(F.col("b_q"), F.col("a_q")).alias("query_id"),
        F.coalesce(F.col("b_c"), F.col("a_c")).alias("cand_id"),
        (
            F.coalesce(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + brk)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + ark)"), F.lit(0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("cand_id"))
    return (
        u.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= HYBRID_TOP_K)
        .select(
            "query_id", "cand_id", F.col("rrf").cast("long").alias("rrf_score"), "rk"
        )
    )


def serve_queries_stream(queries: DataFrame, index: SearchIndex, sink) -> DataFrame:
    """Attach a foreachBatch hybrid scorer to a streaming query frame
    ((query_id, text, embedding) rows). ``sink(result_df, batch_id)``
    receives each micro-batch's scored top-k. Returns the writer, not
    a started query — callers pick trigger/checkpoint."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(score_query_batch(batch_df, index), batch_id)

    return queries.writeStream.foreachBatch(process)

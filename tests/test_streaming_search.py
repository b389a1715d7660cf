"""Streaming hybrid search serving vs its batch twin: the 10 registry
queries streamed in SEPARATE micro-batches (maxFilesPerTrigger=1)
against one cached index must reproduce hybrid_search_rrf exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.sources.tables import load_table
from minispark_spark.streaming.search import build_search_index, serve_queries_stream

_ensure_loaded()


def test_streaming_hybrid_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    index = build_search_index(docs, emb.select("vec_id", "embedding"))

    # The batch twin's queries: doc text + same-id embedding, id < 10.
    queries = (
        docs.filter(F.col("doc_id") < 10)
        .select(F.col("doc_id").alias("query_id"), "text")
        .join(
            emb.select(F.col("vec_id").alias("query_id"), "embedding"), "query_id"
        )
    )
    qdir = tmp_path / "queries"
    # Two files -> two micro-batches with maxFilesPerTrigger=1.
    rows = queries.collect()
    schema = queries.schema
    for i, chunk in enumerate((rows[:5], rows[5:])):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(qdir / f"f{i}")
        )
    import shutil

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(2):
        for f in (qdir / f"f{i}").glob("*.parquet"):
            shutil.copy(f, in_dir / f"{i}-{f.name}")

    got: dict[tuple, tuple] = {}
    batches: list[int] = []

    def sink(result, batch_id):
        batches.append(batch_id)
        for r in result.collect():
            got[(r["query_id"], r["cand_id"])] = (r["rrf_score"], r["rk"])

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(in_dir)
    )
    q = (
        serve_queries_stream(stream, index, sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {
        (r["query_id"], r["cand_id"]): (r["rrf_score"], r["rk"])
        for r in REGISTRY["hybrid_search_rrf"].fn(spark, sf_dir).collect()
    }
    assert len(batches) >= 2  # the queries really arrived in separate batches
    assert got == want

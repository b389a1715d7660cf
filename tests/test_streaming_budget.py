"""Streaming token-budget admission gate vs its batch twin: a stream
fed in the batch twin's deterministic hash order — split across TWO
micro-batches so the per-source consumed-token state must survive a
batch boundary (and a query restart) — produces the identical
(doc_id, n_tok, cum_before, keep) rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.functions import hashing
from minispark_spark.plans.quality import token_budget_frame
from minispark_spark.sources.tables import load_table
from minispark_spark.streaming.quality import token_budget_stream

BUDGET = 300


@pytest.fixture(scope="module")
def ordered_dir(spark, sf_dir, tmp_path_factory):
    """Docs written as two parquet files in global (hv, doc_id) order —
    the split point preserves per-source arrival order, so batch-twin
    hash order == stream arrival order."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            "text",
            hashing.poly_hash(F.col("doc_id").cast("string")).alias("hv"),
        )
        .orderBy("hv", "doc_id")
        .drop("hv")
        .collect()
    )
    base = tmp_path_factory.mktemp("budget_stream")
    half = len(docs) // 2
    for i, chunk in enumerate((docs[:half], docs[half:])):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(
            str(base / f"in{i}"), mode="overwrite"
        )
    return base


def test_token_budget_stream_matches_batch(spark, sf_dir, ordered_dir, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(str(ordered_dir / "in0")).schema

    import shutil

    got: dict[int, tuple] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["doc_id"]] = (r["source"], r["n_tok"], r["cum_before"], r["keep"])

    for i in range(2):  # one availableNow pass per file → 2 micro-batches
        for f in (ordered_dir / f"in{i}").glob("*.parquet"):
            shutil.copy(f, in_dir / f"{i}-{f.name}")
        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        q = (
            token_budget_stream(stream, BUDGET)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch = token_budget_frame(load_table(spark, sf_dir, "documents"), BUDGET)
    want = {
        r["doc_id"]: (r["source"], r["n_tok"], r["cum_before"], r["keep"])
        for r in batch.collect()
    }
    assert got == want
    assert any(v[3] for v in got.values()) and not all(v[3] for v in got.values())

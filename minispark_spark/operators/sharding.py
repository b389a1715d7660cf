"""Deterministic training-shard layout + verifiable manifest.

The last step of a 100 TB curation pipeline is materializing the corpus
as N fixed shards for a training data loader (the WebDataset /
tfrecord-manifest pattern). Three properties matter at scale and are
what this operator pins:

* **Deterministic assignment** — shard(doc) is a pure function of
  doc_id (poly_hash % N, the same cross-engine hash the train/val/test
  split uses), so re-runs, incremental batches, and different engines
  agree on placement; no rand(), no task-retry hazard.
* **Balance** — a hash spreads doc counts/tokens near-uniformly; the
  manifest exposes per-shard totals so imbalance is measurable, not
  assumed.
* **Verifiability** — each manifest row carries an order-insensitive
  content checksum (SUM of per-doc text poly_hashes; values < 2^30 so
  the int64 sum is exact up to ~10^9 docs per shard), letting a loader
  detect a corrupted or partially-written shard BEFORE a training run
  wastes cluster time on it.

Plan shape: one narrow scan + one shuffle on the shard id (the same
shuffle the physical write needs, so the manifest is free when
computed alongside ``write_shards``). No reference analogue (the
reference has no multi-file sink at all — its BlockFile sink is a
single file, SURVEY §2.5); extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.functions import hashing, text
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

N_SHARDS = 64


def with_shard(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Assign each doc its deterministic shard id."""
    return docs.withColumn(
        "shard",
        (hashing.poly_hash(F.col("doc_id").cast("string")) % n_shards).cast("int"),
    )


def _manifest_agg(sharded: DataFrame) -> DataFrame:
    """The single manifest definition — used for both the plan-side
    manifest and the written-data re-derivation so they cannot drift."""
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.sum(hashing.poly_hash(F.col("text"))).alias("content_checksum"),
    )


def shard_manifest(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """(shard, n_docs, total_tokens, total_chars, content_checksum)."""
    return _manifest_agg(with_shard(docs, n_shards))


def write_shards(
    docs: DataFrame, path: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Materialize the shard layout (one directory per shard id) and
    return the manifest of what was written. ``repartition("shard")``
    makes each shard exactly one file per shard directory — the shuffle
    is the same one the manifest aggregation needs."""
    sharded = with_shard(docs, n_shards).repartition(n_shards, "shard")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    # manifest FROM THE WRITTEN DATA — verifies the sink, not the plan
    return _manifest_agg(docs.sparkSession.read.parquet(path))


@query(
    "docs_training_shard_manifest",
    oracle=f"""
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM({text.token_count_sql("text")}) AS BIGINT) AS total_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM({hashing.poly_hash_sql("text")}) AS BIGINT) AS content_checksum
        FROM (
            SELECT text,
                   CAST({hashing.poly_hash_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS}
                        AS INTEGER) AS shard
            FROM documents
        )
        GROUP BY shard
    """,
    doc=f"Training-shard manifest: deterministic poly_hash(doc_id) % "
    f"{N_SHARDS} shard assignment with per-shard doc/token/char totals "
    "and an order-insensitive content checksum (sum of per-doc text "
    "hashes) — the verifiable-layout step a training loader checks "
    "before consuming a shard. One scan + one shuffle on the shard id.",
)
def docs_training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_manifest(load_table(spark, sf_dir, "documents"))

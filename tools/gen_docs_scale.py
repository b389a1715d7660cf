"""Scale up the documents/embeddings tables for dedup-family scale proofs.

Replicates sf0.1's documents R times (deterministically): replica k of a
doc appends a distinct suffix token ``repk`` (so replicas are NEAR-dups
— high-Jaccard pairs the LSH pipelines must bucket and verify, the
worst realistic case for dedup scaling) and its embedding is shifted by
a small per-replica constant (so SemDeDup's clusters densify the same
way). doc_ids/vec_ids offset by k * 10_000_000 to stay unique.

    python tools/gen_docs_scale.py 10 .local/docs10x
    python tools/bench_scale.py .local/docs10x dedup_minhash_lsh ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.session import get_spark
from minispark_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".local/docs10x"
    spark = get_spark("gen-docs-scale", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SRC, "documents")
    reps = spark.range(r).withColumnRenamed("id", "k")
    big_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("k") * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("k")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 5).alias("n_chars"),
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    shift = F.col("k").cast("float") * F.lit(0.001)
    big_emb = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("k") * 10_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: (x + shift).cast("float")).alias(
                "embedding"
            ),
            "label",
        )
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    nd = spark.read.parquet(f"{out}/documents.parquet").count()
    ne = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"wrote {out}: documents={nd} embeddings={ne}")


if __name__ == "__main__":
    main()

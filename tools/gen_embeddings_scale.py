"""Scale up the embeddings table for the vector-family scale proofs
(PCA scatter pass, filtered ANN): replicate sf0.1's embeddings R times
deterministically. Replica k gets fresh vec_ids (offset k * 10^7) and a
deterministic per-replica rotation of the label space (label+k mod 10)
so the filtered-ANN label selectivity stays ~1/10 instead of piling
every replica into the same label partition.

    python tools/gen_embeddings_scale.py 10 .local/embeddings10x
    python tools/bench_scale.py .local/embeddings10x embedding_pca_covariance
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
    out = sys.argv[2] if len(sys.argv) > 2 else ".local/embeddings10x"
    spark = get_spark("gen-embeddings-scale", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    reps = spark.range(r).withColumnRenamed("id", "k")
    emb = load_table(spark, SRC, "embeddings")
    big = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("k") * 10_000_000).alias("vec_id"),
        "embedding",
        ((F.col("label") + F.col("k")) % 10).cast("int").alias("label"),
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"wrote {out}: embeddings={big.count()}")
    spark.stop()


if __name__ == "__main__":
    main()

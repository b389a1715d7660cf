"""Host-skewed documents corpus for the web-family adversarial proof
(VERDICT r6 item #5): same 10x replication as gen_docs_scale, but the
``source`` column — which the web entries' synthesized URLs use as the
host — is remapped so ONE host carries 50% of all docs (replicas k < R/2
all become ``src1``). docs_url_canonicalize's canonical-key groupBy and
docs_host_mixture's host groupBy must absorb this without a straggler:
the canonical key still spreads the hot host over its 50 path variants,
and the host rollup's map-side combine reduces each partition to one
row per host before the exchange.

    python tools/gen_docs_skew.py 10 .local/docs10x_skew
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
    out = sys.argv[2] if len(sys.argv) > 2 else ".local/docs10x_skew"
    spark = get_spark("gen-docs-skew", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SRC, "documents")
    reps = spark.range(r).withColumnRenamed("id", "k")
    big_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("k") * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("k")).alias("text"),
            "lang",
            F.when(F.col("k") < r // 2, F.lit("src1"))
            .otherwise(F.col("source"))
            .alias("source"),
            (F.col("n_chars") + 5).alias("n_chars"),
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    dist = (
        spark.read.parquet(f"{out}/documents.parquet")
        .groupBy("source")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"wrote {out}: documents={n}; top hosts: {[(r['source'], r['count']) for r in dist]}")


if __name__ == "__main__":
    main()

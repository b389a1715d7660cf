"""End-to-end training-corpus curation demo.

The standard pipeline a data team runs before pretraining, composed
from the Corpus facade's oracle-verified primitives — every stage here
is ALSO a registry query the correctness gate checks against DuckDB:

    quality floor -> repetition gate -> exact dedup -> fuzzy dedup
    -> span scrub -> eval decontamination -> token-budget mixing
    -> per-source stats + one-row datasheet

Run:  python examples/curate.py [sf_dir]      (default sf0.001)

The composed pipeline stays ONE lazy Catalyst plan per output — the
filters still push down across stages, and nothing executes until the
final .show().
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.corpus import Corpus
from minispark_spark.session import get_spark
from minispark_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate-demo", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("source") == "src0")  # held-out eval set
    train = docs.filter(F.col("source") != "src0")

    curated = (
        Corpus(train)
        .filter_quality(0.3)        # heuristic quality floor
        .filter_repetition()        # Gopher-style repetition gate
        .dedup_exact()              # exact content dedup (hash, min-id wins)
        .dedup_fuzzy()              # MinHash+LSH near-dup clusters -> keep one
        .scrub_spans()              # remove duplicated 8-gram spans from text
        .decontaminate(eval_docs)   # drop docs sharing eval 8-grams
        .token_budget(300)          # "take ~300 tokens per source" mixing
    )

    print("== per-source survivors ==")
    curated.stats().orderBy("source").show(25, truncate=False)

    print("== corpus datasheet ==")
    curated.report().show(truncate=False)

    print("== sample of curated text ==")
    curated.df.select("doc_id", "source", "text").orderBy("doc_id").show(
        5, truncate=60
    )


if __name__ == "__main__":
    main()

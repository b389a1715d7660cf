"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one warm-up run of the flagship query (JIT + parquet
footer caches), then each headline query timed end-to-end (plan +
execute) into a noop sink — measuring engine work, not driver
row-materialization, mirroring the reference's own methodology
(reference examples/benchmark.py:51-68 measures execute-to-file).
The reference baseline is 0.707 s at sf=1 for q1 on 4 native workers
(BASELINE.md); we bench at sf0.1 by default.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_multi_key",
    "join_inner",
    "window_rank",
    "events_sessionize",
    "events_hourly_stats",
    "text_stats",
    "vocab_top_tokens",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    _ensure_loaded()
    spark = get_spark("bench", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: flagship query twice (JVM JIT, parquet footers, codegen cache).
    for _ in range(2):
        REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Steady-state per BASELINE.md: two runs per query, report the min
    # (first run pays Catalyst planning + codegen compilation once).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

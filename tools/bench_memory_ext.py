"""Memory/spill telemetry for the EXTENSION heavies (BASELINE.md
"extension memory ledger", round 5) — the same stage-delta ledger
tools/bench_memory.py keeps for the TPC-H heavies, pointed at the
dedup/graph/vector pipelines at adversarial scale:

* dedup_minhash_lsh + semantic_dedup on the 50k near-dup replica corpus
  (tools/gen_docs_scale.py 10 .local/docs10x — every replica is a
  high-Jaccard pair the pipeline must bucket AND verify)
* ann_ivfpq_recall_k256 on 100x embeddings
  (tools/gen_embeddings_scale.py 100 .local/embeddings100x)
* graph_components_star on an adversarial 65k-link chain (the
  O(log n)-rounds regime; built inline, no table needed)

Usage: python tools/bench_memory_ext.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.session import get_spark
from tools.bench_memory import _stages

DOCS10X = ".local/docs10x"
EMB100X = ".local/embeddings100x"
CHAIN_N = 65_536


def _measure(spark, base: str, label: str, thunk) -> dict:
    thunk()  # warm-up (builds caches/trainings once, like the TPC-H ledger)
    before = set(_stages(base))
    t0 = time.perf_counter()
    thunk()
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    new = [st for k, st in _stages(base).items() if k not in before]
    row = {
        "wall_s": round(wall, 2),
        "n_stages": len(new),
        "shuffle_read_mb": round(sum(s["shuffleReadBytes"] for s in new) / 1e6, 1),
        "shuffle_write_mb": round(sum(s["shuffleWriteBytes"] for s in new) / 1e6, 1),
        "memory_spill_mb": round(sum(s["memoryBytesSpilled"] for s in new) / 1e6, 1),
        "disk_spill_mb": round(sum(s["diskBytesSpilled"] for s in new) / 1e6, 1),
        "peak_stage_exec_mem_mb": round(
            max((s.get("peakExecutionMemory", 0) for s in new), default=0) / 1e6, 1
        ),
    }
    print(label, json.dumps(row), flush=True)
    return row


def main() -> None:
    _ensure_loaded()
    spark = get_spark("bench-memory-ext")  # UI on: serves the status API
    spark.sparkContext.setLogLevel("ERROR")
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    results = {}

    def registry_thunk(name: str, sf_dir: str):
        fn = REGISTRY[name].fn
        return lambda: fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name, sf_dir in [
        ("dedup_minhash_lsh", DOCS10X),
        ("semantic_dedup", DOCS10X),
        ("docs_nb_classify", DOCS10X),
        ("docs_quality_nb_filter", DOCS10X),
        ("docs_token_chi2_topk", DOCS10X),
        # round 6: the web-crawl curation family at 50k docs — the
        # canonical-dedup groupBy and blocklist broadcast join are the
        # only exchanges; strip/mixture must stay scan-shaped.
        ("docs_url_canonicalize", DOCS10X),
        ("docs_host_mixture", DOCS10X),
        ("docs_html_strip", DOCS10X),
        ("docs_url_blocklist_filter", DOCS10X),
        ("ann_ivfpq_recall_k256", EMB100X),
        ("ann_ivf_index_append", EMB100X),
    ]:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")) and not os.path.exists(
            os.path.join(sf_dir, "embeddings.parquet")
        ):
            print(f"skip {name}: {sf_dir} missing (run the gen tool first)")
            continue
        results[f"{name}@{sf_dir}"] = _measure(
            spark, base, f"{name}@{sf_dir}", registry_thunk(name, sf_dir)
        )

    # GD at 100x rows (TPC-H sf1 lineitem if generated): per-iteration
    # cost must stay three-longs-per-partition partial aggregates.
    sf1 = ".local/sf1"
    if os.path.exists(os.path.join(sf1, "lineitem.parquet")):
        results["stats_gd_linear_fit@sf1"] = _measure(
            spark, base, "stats_gd_linear_fit@sf1", registry_thunk("stats_gd_linear_fit", sf1)
        )
    else:
        print(f"skip stats_gd_linear_fit: {sf1} missing (tools/gen_sf1.py)")

    # Long-chain star CC: the worst topology (every round touches every
    # edge, O(log n) rounds), no table needed.
    from minispark_spark.operators.graph_api import star_connected_components

    e = spark.range(1, CHAIN_N).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))

    def chain_thunk():
        labels, rounds = star_connected_components(sym, max_rounds=40)
        n = labels.count()
        assert n == CHAIN_N, n

    results[f"graph_components_star@chain{CHAIN_N}"] = _measure(
        spark, base, f"graph_components_star@chain{CHAIN_N}", chain_thunk
    )

    print(json.dumps({"memory_ext": results}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Memory/spill telemetry for the heavy TPC-H queries (BASELINE.md
"memory-headroom ledger"): per query, total shuffle read/write bytes,
memory/disk spill bytes, and peak single-stage execution memory, read
from the Spark status REST API (stage deltas around each run). The
point is to MEASURE the 100x headroom story: a query whose working set
already spills at sf=10 on 128 GiB needs partition-count scaling at
100x, one that doesn't has headroom.

Usage: python tools/bench_memory.py [sf_dir] [q1 q5 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minispark_spark.registry import _ensure_loaded, REGISTRY
from minispark_spark.session import get_spark

HEAVIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q18_large_orders",
    "q21_waiting_orders",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def _stages(base: str) -> dict[int, dict]:
    out = {}
    for st in _api(base, "/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf10"
    names = sys.argv[2:] or HEAVIES
    _ensure_loaded()
    spark = get_spark("bench-memory")  # UI stays ON: it serves the API
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"
    results = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        before = set(_stages(base))
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.5)  # let the status store catch up
        stages = _stages(base)
        new = [st for k, st in stages.items() if k not in before]
        results[name] = {
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
        print(name, json.dumps(results[name]))
    print(json.dumps({"sf_dir": sf_dir, "memory": results}))
    spark.stop()


if __name__ == "__main__":
    main()

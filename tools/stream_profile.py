"""Profile the bounded streaming drains: per-micro-batch durationMs.

Usage: python tools/stream_profile.py <entry> [<entry> ...]

Runs each streaming registry entry once (bench ingested layout) and
prints every micro-batch's StreamingQueryProgress duration breakdown
(addBatch / getBatch / walCommit / commitOffsets / queryPlanning /
triggerExecution) plus state-store metrics — the guide §1 measurement
for where the drain's wall clock actually goes (task time vs fixed
per-batch latency).
"""

from __future__ import annotations

import json
import os
import sys
import time

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    _ensure_loaded()
    spark = get_spark("stream-profile", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import ingest

    sf_dir = ingest(spark, sf_dir)
    from pyspark.sql.streaming import StreamingQueryListener

    progresses: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())
    for name in names:
        progresses.clear()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        # listener delivery is async; give it a beat
        time.sleep(1.0)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(progresses)} progress events")
        tot: dict[str, int] = {}
        for p in progresses:
            d = p.get("durationMs", {})
            for k, v in d.items():
                tot[k] = tot.get(k, 0) + int(v)
            ops = [
                {
                    m: so.get(m)
                    for m in (
                        "operatorName",
                        "numRowsTotal",
                        "commitTimeMs",
                        "allUpdatesTimeMs",
                        "allRemovalsTimeMs",
                        "numShufflePartitions",
                    )
                }
                for so in p.get("stateOperators", [])
            ]
            print(
                f"  batch {p.get('batchId')}: rows_in={p.get('numInputRows')} "
                f"durations={d} state={ops}"
            )
        print(f"  TOTAL durationMs: {tot}")
    spark.stop()


if __name__ == "__main__":
    main()

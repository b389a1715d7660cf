"""End-to-end Structured Streaming demo: rate source → event synth →
windowed aggregation → incremental parquet sink.

    python -m minispark_spark.streaming.demo [seconds]

The reference has no streaming at all (SURVEY §1.1); this wires the
tested pipelines (pipelines.py) to a live unbounded source so the full
readStream → transform → writeStream path runs outside the test
harness. The rate source stands in for Kafka: swap
``format("rate")`` for ``format("kafka")`` + a JSON projection and
nothing downstream changes.
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minispark_spark.streaming.pipelines import (
    hourly_event_stats,
    user_running_totals,
    write_incremental_parquet,
)

RATE_ROWS_PER_SEC = 5000


def synth_events(rate: DataFrame) -> DataFrame:
    """Map the rate source's (timestamp, value) rows onto the events
    schema deterministically — value is a monotonic row id, so ids,
    users, types, and amounts are all pure functions of it."""
    v = F.col("value")
    return rate.select(
        v.alias("event_id"),
        (v % 100).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
            (v % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        ((v % 1000) / F.lit(10.0)).alias("value"),
    )


def main(duration_sec: int = 15) -> int:
    from minispark_spark.session import get_spark

    spark = get_spark("streaming-demo", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    events = synth_events(
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(RATE_ROWS_PER_SEC))
        .load()
    )

    out = tempfile.mkdtemp(prefix="stream_demo_")
    # Windowed aggregate → exactly-once parquet via foreachBatch.
    q1 = write_incremental_parquet(
        hourly_event_stats(events, watermark="10 seconds"),
        out_dir=f"{out}/stats",
        checkpoint_dir=f"{out}/ckpt",
        query_name="hourly-stats",
        trigger={"processingTime": "2 seconds"},
    )
    # Custom stateful operator (applyInPandasWithState) → memory sink.
    q2 = (
        user_running_totals(events)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .start()
    )

    # No processAllAvailable here: the rate source never drains, so it
    # would block forever. stop() finishes the in-flight micro-batch.
    time.sleep(duration_sec)
    for q in (q1, q2):
        q.stop()
        q.awaitTermination(30)

    stats = spark.read.parquet(f"{out}/stats")
    totals = spark.sql("SELECT * FROM running_totals")
    print(f"windowed stat rows written: {stats.count()} (under {out}/stats)")
    print(f"distinct users with running totals: {totals.select('user_id').distinct().count()}")
    totals.orderBy(F.col("n_events").desc()).show(5)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 15))

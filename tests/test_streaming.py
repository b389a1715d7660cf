"""Structured Streaming pipelines: file source → memory sink, checked
against their batch twins (same expressions, so results must agree
once the stream drains)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.sources.tables import load_table
from minispark_spark.streaming import pipelines


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory) -> str:
    """Re-write events as a clean µs-timestamp parquet dir usable as a
    file-stream source."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _run_stream_to_memory(spark, sdf, name: str) -> None:
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_hourly_stats_stream_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    _run_stream_to_memory(spark, pipelines.hourly_event_stats(stream), "hourly")

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    want = {(r["hour"], r["event_type"]): (r["n"], round(r["v"], 6)) for r in batch}
    assert got == want


def test_session_window_stream_runs(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    _run_stream_to_memory(spark, pipelines.session_windows(stream), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)

"""Structured Streaming pipelines over the events schema.

The reference has NO streaming at all (SURVEY §1.1); these are
extension operators. Each pipeline is the streaming twin of a batch
query in ``plans/events.py`` — same expressions, plus watermarking
for late data. Tested via file-source → memory-sink in
tests/test_streaming.py; in production the source becomes Kafka and
the sink a Delta/parquet table, with no change to the transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def hourly_event_stats(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums per event type with a
    watermark bounding state for late data (batch twin:
    plans/events.py::events_hourly_stats)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_user_activity(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Sliding 30-min windows (10-min slide) of per-user activity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "user_id", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows via the built-in session_window (stateful
    streaming sessionization; batch twin: plans/events.py::events_sessionize)."""
    return (
        events.withWatermark("ts", DEFAULT_WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, carried across micro-batches.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (per-key counters, custom session logic,
    online model state). State is partitioned by user_id — per-key state
    lives on whichever executor owns the key's shuffle partition, so the
    operator scales horizontally with no driver involvement.
    """
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state size is O(events per watermark window)
    instead of O(all history) — the streaming twin of dedup_exact.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchases_with_recent_click(
    events: DataFrame, window: str = "1 hour", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to same-user
    clicks from the preceding hour. Both sides are watermarked so the
    join state for a user expires once the watermark passes the
    interval — the streaming twin of events_range_join."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window}")),
    ).select("purchase_id", "p_user", "p_ts", "click_id", "c_ts")


def write_incremental_parquet(
    stats: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "incr",
    trigger: dict | None = None,
):
    """Incremental parquet sink via foreachBatch: each micro-batch's
    updated aggregate rows overwrite a batch-stamped subdirectory, with
    the checkpoint making re-delivery idempotent (a retried batch id
    overwrites its own directory — effectively exactly-once output).
    Returns the started StreamingQuery.

    ``trigger`` defaults to ``availableNow`` (drain the backlog and
    stop — batch-like, right for file sources and tests); pass e.g.
    ``{"processingTime": "2 seconds"}`` for a continuously running
    query over an unbounded source like rate/Kafka.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        stats.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each event with a (batch) dimension
    table. The static side is planned per micro-batch — Spark
    broadcasts it when small, so the stream side never shuffles; the
    standard pattern for attaching slowly-changing reference data
    (user profiles, geo lookups) to a live stream. No watermark is
    needed: stream-static inner joins are stateless."""
    return events.join(dim, on=key, how="inner")


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """``user_running_totals`` re-expressed on ``transformWithStateInPandas``
    — Spark 4's arbitrary-state API (successor of applyInPandasWithState:
    composable per-key state variables, timers, TTL; requires the
    RocksDB state store, which also gives incremental checkpointing and
    state that can exceed executor memory — the 100 TB stateful path).
    Output contract is identical to user_running_totals, so the tests
    hold both implementations to the same batch twin. NOTE: the state
    protocol requires the ``protobuf`` package (pyspark's optional
    extra); the test skips where it's absent.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [StructField("n", LongType()), StructField("v", DoubleType())]
            )
            self._totals = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, v = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._totals.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def apply_cdc_stream(
    changes: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
    query_name: str = "cdc-apply",
    trigger: dict | None = None,
):
    """Streaming CDC apply: each micro-batch of change rows is merged
    into the day-partitioned parquet table with
    ``sources.upsert.upsert_partitions`` (latest-wins on ``order_col``,
    dynamic partition overwrite — only partitions the batch touches are
    rewritten). The checkpoint makes redelivery idempotent: a replayed
    batch re-applies the same keys with the same order values, and
    latest-wins converges to the same table. This is the streaming half
    of the events_cdc_upsert pattern; per-batch cost scales with the
    batch's partition fan-in, not the table."""
    from minispark_spark.sources.upsert import upsert_partitions

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, table_path, key_cols, partition_col, order_col)

    return (
        changes.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def scd2_maintain_stream(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
):
    """Streaming SCD2 dimension maintenance: each micro-batch of change
    rows (user_id, event_id, value, ts) is merged into the CURRENT
    history snapshot with ``plans.pipeline.scd2_apply`` (untouched keys
    pass through, affected keys rebuild — backfill-safe), and the new
    history is published as the next snapshot version via the atomic
    pointer swap in ``sources/snapshots.py`` — concurrent readers only
    ever see a fully merged history, never a half-written one.
    Replay-safe end to end: scd2_apply dedupes on the immutable event
    key, so a redelivered batch converges to the same history, and an
    abandoned (crashed mid-publish) version dir is unreferenced debris
    the next vacuum sweeps. The batch/stream exactness contract is
    pinned in tests/test_streaming.py: draining N micro-batches must
    equal the one-shot batch rebuild row-for-row.
    """
    from minispark_spark.plans.pipeline import _scd2_build, scd2_apply
    from minispark_spark.sources import snapshots

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select("user_id", "event_id", "value", "ts")
        try:
            hist = snapshots.read_snapshot(batch_df.sparkSession, table_dir)
        except FileNotFoundError:
            new_hist = _scd2_build(rows)
        else:
            new_hist = scd2_apply(hist, rows)
        snapshots.publish_snapshot(new_hist, table_dir)

    return (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

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


def _run_stream_to_memory(spark, sdf, name: str, mode: str = "complete") -> None:
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
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


def test_stateful_running_totals_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        pipelines.user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update-mode memory sink may hold one row per user per micro-batch;
    # the LAST row per user is the final running total.
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM running_totals"
    ).collect()
    final = {}
    for r in rows:  # memory sink appends in batch order
        final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch}
    assert set(final) == set(want)
    for uid, (n, v) in want.items():
        gn, gv = final[uid]
        assert gn == n
        assert abs(gv - v) < 1e-6


def test_sliding_window_stream_runs(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    _run_stream_to_memory(spark, pipelines.sliding_user_activity(stream), "sliding")
    rows = spark.sql("SELECT * FROM sliding").collect()
    assert rows
    # every event lands in 3 overlapping 30-min/10-min-slide windows
    n_events = spark.read.parquet(events_stream_dir).count()
    assert sum(r["n_events"] for r in rows) == 3 * n_events


def test_dedup_stream_bounded_state(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        pipelines.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_stream").collect()[0]
    want = spark.read.parquet(events_stream_dir).select("event_id").distinct().count()
    assert got["n"] == got["d"] == want


def test_stream_stream_interval_join_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        pipelines.purchases_with_recent_click(stream)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT COUNT(*) AS n FROM ss_join").collect()[0]["n"]

    ev = spark.read.parquet(events_stream_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert got == want


def test_foreachbatch_incremental_sink(spark, events_stream_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("incr")
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = pipelines.write_incremental_parquet(
        pipelines.hourly_event_stats(stream),
        out_dir=str(base / "out"),
        checkpoint_dir=str(base / "ckpt"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(base / "out"))
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .count()
    )
    # last batch of an availableNow run carries the complete final stats
    assert out.select("hour", "event_type").distinct().count() == batch.count()


def test_demo_synth_events_schema_and_determinism(spark):
    from minispark_spark.streaming.demo import synth_events

    rate_like = spark.range(30).select(
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("timestamp"),
        F.col("id").alias("value"),
    )
    ev = synth_events(rate_like)
    assert [f.name for f in ev.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
    ]
    rows = {r.event_id: r for r in ev.collect()}
    assert rows[0].event_type == "click" and rows[1].event_type == "view"
    assert rows[2].event_type == "purchase" and rows[3].event_type == "click"
    assert rows[17].user_id == 17 and rows[17].value == 1.7


def test_stream_static_enrichment(spark, sf_dir, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    _run_stream_to_memory(
        spark, pipelines.enrich_with_dimension(stream, dim), "enriched", mode="append"
    )
    got = spark.sql("SELECT COUNT(*) AS n FROM enriched").collect()[0].n
    batch = load_table(spark, sf_dir, "events").join(dim, "user_id").count()
    assert got == batch


def test_running_totals_tws_matches_batch(spark, events_stream_dir):
    # transformWithState's state-server protocol speaks protobuf, which
    # this container lacks (no network, no pip) — skip there; the
    # pipeline itself is plain public API and runs wherever pyspark's
    # protobuf extra is installed.
    pytest.importorskip("google.protobuf")
    # transformWithStateInPandas needs the RocksDB state store provider.
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        schema = spark.read.parquet(events_stream_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_stream_dir)
        q = (
            pipelines.user_running_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("running_totals_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT user_id, n_events, total_value FROM running_totals_tws"
        ).collect()
        final = {}
        for r in rows:  # memory sink appends in batch order; last row wins
            final[r["user_id"]] = (r["n_events"], r["total_value"])
        batch = (
            spark.read.parquet(events_stream_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
            .collect()
        )
        want = {r["user_id"]: (r["n"], r["v"]) for r in batch}
        assert set(final) == set(want)
        for uid, (n, v) in want.items():
            gn, gv = final[uid]
            assert gn == n
            assert abs(gv - v) < 1e-6
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_streaming_cdc_apply_matches_batch_upsert(spark, events_stream_dir, tmp_path_factory):
    """Draining the events stream through apply_cdc_stream must land the
    same table as one batch latest-wins compaction over all events."""
    from pyspark.sql import Window

    base = tmp_path_factory.mktemp("cdc")
    table = str(base / "table")
    ckpt = str(base / "ckpt")
    schema = spark.read.parquet(events_stream_dir).schema
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(events_stream_dir)
        .select(
            "user_id",
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_id",
            "value",
        )
    )
    q = pipelines.apply_cdc_stream(
        changes, table, ckpt, ["user_id", "event_type", "day"], "day", "event_id"
    )
    q.awaitTermination(300)

    got = spark.read.parquet(table).select(
        "user_id", "event_type", F.col("day").cast("string").alias("day"), "event_id", "value"
    )
    ev = spark.read.parquet(events_stream_dir).select(
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id", "event_type", "day").orderBy(F.col("event_id").desc())
    want = ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_scd2_maintain_stream_matches_batch_rebuild(spark, sf_dir, tmp_path_factory):
    """Streaming SCD2 maintenance (foreachBatch scd2_apply + snapshot
    publish) over two micro-batches — the second containing rows that
    splice into the MIDDLE of users' histories — must equal the
    one-shot batch rebuild. Also proves replay idempotence by
    re-applying the last batch by hand."""
    from minispark_spark.plans.pipeline import _scd2_build, scd2_apply
    from minispark_spark.sources import snapshots

    base = tmp_path_factory.mktemp("scd2s")
    src_dir = str(base / "src")
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value", "ts")
    )
    # two files -> two micro-batches with maxFilesPerTrigger=1; the
    # odd-id file arrives SECOND, interleaving in ts (backfill)
    purchases.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{src_dir}/f=0"
    )
    purchases.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{src_dir}/f=1"
    )
    schema = purchases.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/f=*")
    )
    table_dir = str(base / "hist")
    q = pipelines.scd2_maintain_stream(stream, table_dir, str(base / "ckpt"))
    q.awaitTermination(120)
    assert snapshots.current_version(table_dir) >= 2  # one publish per batch

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    expected = canon(_scd2_build(purchases))
    got = canon(snapshots.read_snapshot(spark, table_dir))
    assert got == expected
    # replay: re-applying an already-merged batch changes nothing
    replay = scd2_apply(
        snapshots.read_snapshot(spark, table_dir),
        purchases.filter(F.col("event_id") % 2 == 1),
    )
    assert canon(replay) == expected


def test_watermark_drops_late_rows_and_accounts_them(spark, tmp_path_factory):
    """Late-data contract, measured: a row arriving behind the
    watermark is (a) excluded from the finalized window and (b) visible
    in numRowsDroppedByWatermark — the observability a production
    stream needs to prove it is not silently losing data. NB the
    watermark operative in batch N derives from data through batch
    N-1, so the advancing row and the late row sit two batches apart
    (the empirically-pinned one-batch lag)."""
    import json
    import time as _time

    base = tmp_path_factory.mktemp("late")
    src = str(base / "src")

    def ts_df(rows):
        return spark.createDataFrame(rows, "ts string, k string").select(
            F.col("ts").cast("timestamp"), "k"
        )

    files = [
        ts_df([("2024-01-01 10:05:00", "a"), ("2024-01-01 11:10:00", "a")]),
        ts_df([("2024-01-01 12:20:00", "b")]),  # watermark -> 11:50
        ts_df([("2024-01-01 12:25:00", "b")]),  # spacer: makes 11:50 operative
        ts_df([
            ("2024-01-01 10:30:00", "b"),  # 10:00 window end < 11:50 -> DROPPED
            ("2024-01-01 12:30:00", "b"),  # on time
        ]),
    ]
    for i, f in enumerate(files):
        f.coalesce(1).write.parquet(f"{src}/f={i}")
        _time.sleep(1.1)  # file-stream source orders batches by mtime

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f=*")
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = 0
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        for so in d.get("stateOperators", []):
            dropped += so.get("numRowsDroppedByWatermark", 0)
    assert dropped == 1, f"expected exactly the one late row dropped, got {dropped}"
    rows = {
        r["w"]["start"].hour: r["count"]
        for r in spark.sql("SELECT w, count FROM late_agg").collect()
    }
    # hour 10 finalized WITHOUT the late row; hour 12 never finalizes
    # (watermark stops at 12:00 < its end) so append never emits it
    assert rows == {10: 1, 11: 1}, rows


def test_stream_stream_left_outer_join_emits_unmatched_after_watermark(
    spark, tmp_path_factory
):
    """LEFT OUTER stream-stream join contract with a REAL watermark
    (stream_interval_join's gate entry pins the inner join under a
    beyond-span watermark; this pins the outer half): a click with no
    purchase in its 30-min window must emit a null-augmented row — but
    only AFTER the global watermark (the MIN across both sides' input
    watermarks, each lagging one batch) passes the end of its match
    window and evicts the buffered state. A matched click must emit
    exactly once, without nulls."""
    import time as _time

    base = tmp_path_factory.mktemp("ssoj")
    cdir, pdir = str(base / "clicks"), str(base / "purchases")

    def ts_df(rows):
        return spark.createDataFrame(rows, "ts string, user string").select(
            F.col("ts").cast("timestamp").alias("ts"), "user"
        )

    click_files = [
        ts_df([("2024-01-01 10:00:00", "u_match"), ("2024-01-01 10:00:00", "u_alone")]),
        ts_df([("2024-01-01 12:00:00", "c_adv1")]),  # advances clicks watermark
        ts_df([("2024-01-01 12:10:00", "c_adv2")]),
        ts_df([("2024-01-01 13:00:00", "c_adv3")]),
    ]
    purch_files = [
        ts_df([("2024-01-01 10:10:00", "u_match")]),  # inside u_match's window
        ts_df([("2024-01-01 12:00:00", "p_adv1")]),  # advances purchases watermark
        ts_df([("2024-01-01 12:10:00", "p_adv2")]),
        ts_df([("2024-01-01 13:00:00", "p_adv3")]),
    ]
    for i, (cf, pf) in enumerate(zip(click_files, purch_files)):
        cf.coalesce(1).write.parquet(f"{cdir}/f={i}")
        pf.coalesce(1).write.parquet(f"{pdir}/f={i}")
        _time.sleep(1.1)  # file-stream source orders batches by mtime

    def rd(d):
        return (
            spark.readStream.schema("ts timestamp, user string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f=*")
        )

    clicks = rd(cdir).select(
        F.col("user").alias("c_user"), F.col("ts").alias("c_ts")
    ).withWatermark("c_ts", "10 minutes")
    purchases = rd(pdir).select(
        F.col("user").alias("p_user"), F.col("ts").alias("p_ts")
    ).withWatermark("p_ts", "10 minutes")
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("interval 30 minutes")),
        "left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssoj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT c_user, p_user FROM ssoj_out").collect()
    matched = sorted(r.c_user for r in rows if r.p_user is not None)
    unmatched = sorted(r.c_user for r in rows if r.p_user is None)
    # exactly one real match, emitted once, with the right partner
    assert matched == ["u_match"]
    # the unmatched click's window (10:00 + 30 min) is far behind the
    # final global watermark (12:50), so its null row MUST have emitted
    assert "u_alone" in unmatched
    # and it emitted exactly once
    assert unmatched.count("u_alone") == 1

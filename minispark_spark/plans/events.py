"""Event-stream analytics (batch plans over the events table).

These are the batch twins of the Structured Streaming pipelines in
``minispark_spark.streaming`` — identical logical shapes (tumbling
windows, sessionization), which is the point: the streaming versions
reuse the same expressions with a watermark bolted on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

SESSION_GAP_MINUTES = 30


@query(
    "events_hourly_stats",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling hourly window stats per event type (batch twin of the "
    "streaming pipeline; values quantized to DECIMAL(28,10) for exact sums).",
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "events_sessionize",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR date_diff('second', LAG(ts) OVER w, ts) > {SESSION_GAP_MINUTES * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc=f"Gap-based sessionization ({SESSION_GAP_MINUTES}-min inactivity gap) "
    "via LAG + running-sum session ids — the batch shape of stateful "
    "streaming sessionization (applyInPandasWithState twin in streaming/).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MINUTES * 60
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > gap_s),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "events_pivot_by_type",
    oracle="""
        SELECT user_id,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
               CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
        FROM events
        GROUP BY user_id
    """,
    doc="True PIVOT (groupBy().pivot() with pinned values — pinning avoids "
    "the extra distinct-values job at scale); absent in reference.",
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


@query(
    "events_json_extract",
    oracle="""
        SELECT event_id,
               TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS k_value,
               event_type
        FROM events
        WHERE TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) > 50
    """,
    doc="Semi-structured JSON props extraction + typed filter "
    "(get_json_object; array/map/JSON are absent in the reference).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_cast: a non-numeric/missing k is NULL (filtered), not an
    # ANSI cast error; DuckDB TRY_CAST matches.
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return ev.select("event_id", k.alias("k_value"), "event_type").filter(F.col("k_value") > 50)


@query(
    "events_user_daily_pivot",
    oracle="""
        SELECT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        FROM events
        GROUP BY 1, 2
    """,
    doc="Per-user daily activity pivot via conditional aggregation.",
)
def events_user_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    def n_of(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(n_of("click"), n_of("view"), n_of("purchase"))


@query(
    "events_range_join",
    oracle="""
        SELECT p.event_id AS purchase_id, p.user_id,
               COUNT(c.cts) AS clicks_24h,
               CAST(MIN(date_diff('second', c.cts, p.ts)) AS BIGINT) AS min_gap_s
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts AS cts FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.cts > p.ts - INTERVAL 24 HOUR AND c.cts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
    doc="Range (interval) join: per purchase, clicks by the same user in "
    "the preceding 24h. Executes as an equi-shuffle on user_id with the "
    "time band as a post-join filter; at 100 TB you additionally bucket "
    "both sides by (user_id, day) so each band touches two buckets.",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    gap = F.col("ts").cast("long") - F.col("cts").cast("long")
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 24 HOURS"))
            & (F.col("cts") <= F.col("ts")),
            "left",
        )
        .groupBy(F.col("event_id").alias("purchase_id"), "user_id")
        .agg(
            F.count("cts").alias("clicks_24h"),
            F.min(gap).alias("min_gap_s"),
        )
    )


@query(
    "events_funnel",
    oracle="""
        WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
              FROM events e JOIN s ON s.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > s.s_ts
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s) AS n_signup,
               (SELECT COUNT(*) FROM c) AS n_click_after,
               (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
    doc="Ordered funnel: signup -> first later click -> first later "
    "purchase, counting users surviving each stage. Each stage is one "
    "aggregation plus a semi-structured join on user_id — the standard "
    "product-analytics funnel shape, linear in events.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .join(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .join(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


@query(
    "events_retention_cohorts",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7 AS INTEGER) AS week_offset
            FROM events e JOIN first_seen f ON f.user_id = e.user_id
        )
        SELECT cohort_week, week_offset, COUNT(*) AS n_users
        FROM activity
        GROUP BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention: users grouped by first-seen week, "
    "counted in each later active week. Two shuffles (first-seen agg, "
    "cohort-cell distinct+count); the canonical retention-matrix query.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    offset = (
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
    ).cast("int")
    activity = (
        ev.join(first_seen, "user_id")
        .select("user_id", "cohort_week", offset.alias("week_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "join_skew_salted",
    oracle="""
        SELECT c.c_nationkey AS nationkey,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
    doc="Skew-mitigated fact-to-dimension join: events.user_id is a "
    "pathologically low-cardinality key (~15 distinct users own ALL event "
    "rows), so a plain shuffle join lands each user's rows in one reducer. "
    "operators/skew.salted_join spreads each key across 16 salted shuffle "
    "partitions (deterministic xxhash64 salt — stable under task retry) "
    "while the dimension side is replicated 16x. The oracle is the plain "
    "join: salting is execution strategy, not semantics. No reference "
    "equivalent (its hash shuffle, tasks.py:358-365, has no skew handling).",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(ev, cust, key="user_id", salt_source="event_id", n_salt=16)
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "events_user_ema",
    oracle="""
        SELECT user_id,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> acc * 0.9 + x * 0.1) AS ema
        FROM events
        GROUP BY user_id
    """,
    doc="Per-user exponential moving average of event values in event-time "
    "order — a genuinely sequential per-group fold (each step depends on "
    "the previous), the shape SQL aggregates can't express and the "
    "reference has no surface for. One shuffle on user_id, the sort "
    "runs Spark-side (sortWithinPartitions — spillable JVM sort, not "
    "a pandas in-memory sort), and the Python fold streams the Arrow "
    "batches carrying only (current user, accumulator) across batch "
    "boundaries — peak Python memory is O(arrow batch), not "
    "O(partition). The oracle folds the same ordered list with "
    "list_reduce — identical left-to-right double ops, so results match "
    "bitwise. Group state is O(1).",
)
def events_user_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def ema_partition(batches):
        # Streaming per-batch fold: repartition("user_id") +
        # sortWithinPartitions guarantee every user's rows arrive
        # contiguously and in (ts, event_id) order, so only the open
        # (user, accumulator) pair crosses a batch boundary. The fold
        # order and op sequence match the pd.concat-whole-partition
        # version this replaced bit-for-bit; what changed is peak
        # memory (O(batch) vs O(partition)) and the sort's spill story
        # (JVM UnsafeSort vs pandas).
        prev = None
        acc = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            users: list[int] = []
            emas: list[float] = []
            for u, x in zip(pdf["user_id"].to_numpy(), pdf["value"].to_numpy()):
                if u != prev:
                    if prev is not None:
                        users.append(prev)
                        emas.append(acc)
                    prev, acc = u, float(x)
                else:
                    acc = acc * 0.9 + float(x) * 0.1
            if users:
                yield pd.DataFrame({"user_id": users, "ema": emas})
        if prev is not None:
            yield pd.DataFrame({"user_id": [prev], "ema": [acc]})

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(ema_partition, "user_id long, ema double")
    )


@query(
    "events_json_variant",
    oracle="""
        SELECT event_id,
               TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS k_value,
               event_type
        FROM events
        WHERE TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) > 50
    """,
    doc="The events_json_extract twin over Spark 4's VARIANT type: "
    "parse_json once into the binary variant encoding, then typed "
    "variant_get extraction. At scale variant beats per-path "
    "get_json_object string re-parsing (one parse, many paths) and is "
    "the open-format answer to semi-structured columns; pinned to the "
    "same oracle as the string-path version.",
)
def events_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_*: malformed JSON or a non-int k is NULL (filtered), not a
    # parse/cast error; the oracle guards with json_valid + TRY_CAST.
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return ev.select("event_id", k.alias("k_value"), "event_type").filter(F.col("k_value") > 50)


@query(
    "approx_distinct_rollup_hll",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_bound
        FROM events
        GROUP BY event_type
    """,
    doc="Mergeable-sketch rollup: per (event_type, day) HLL sketches "
    "(Apache DataSketches via hll_sketch_agg), then hll_union_agg "
    "rolls them up per event_type WITHOUT rescanning rows — the "
    "pre-aggregation pattern for distinct-count dashboards at 100 TB "
    "(store daily sketches, answer any date range by unioning a "
    "handful of fixed-size binaries). Bound-checking oracle: sketch "
    "internals differ across engines, so the unioned estimate is "
    "checked against the exact distinct count at 3 sigma (lgK=12 -> "
    "rsd about 1.63%, bound 5%), emitted as a boolean the oracle "
    "pins TRUE; exact_users is cross-engine-exact.",
)
def approx_distinct_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rollup = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        rollup.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users").cast("double") - F.col("exact_users").cast("double"))
                <= F.lit(0.05) * F.col("exact_users").cast("double")
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "events_session_window_native",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR date_diff('microsecond', LAG(ts) OVER w, ts)
                                > {SESSION_GAP_MINUTES} * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL {SESSION_GAP_MINUTES} MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    doc=f"Sessionization via Spark's NATIVE session_window aggregation "
    f"({SESSION_GAP_MINUTES}-min gap) — the streaming-capable form (the "
    "same expression works under readStream with a watermark, with "
    "Spark merging/expiring session state). Semantics differ subtly "
    "from the LAG-islands twin (events_sessionize): windows split when "
    "the gap EXCEEDS the threshold at MICROSECOND precision (an event "
    "landing exactly gap-after still merges), session_end "
    "last-event + gap; the oracle replays exactly that with "
    "date_diff('microsecond'). One shuffle on user_id.",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_seasonal_decompose",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   SUM(CAST(value AS DECIMAL(28,10))) AS v
            FROM events GROUP BY 1
        ),
        win AS (
            SELECT h, v,
                   SUM(v) OVER w AS s25,
                   COUNT(*) OVER w AS c25,
                   epoch(MAX(h) OVER w) - epoch(MIN(h) OVER w) AS span_s
            FROM hourly
            WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
        ),
        det AS (
            SELECT h, v, s25,
                   CASE WHEN c25 = 25 AND span_s = 86400
                        THEN 25 * v - s25 ELSE NULL END AS num25
            FROM win
        ),
        seas AS (
            SELECT EXTRACT(hour FROM h) AS hod,
                   SUM(num25) AS n_sum,
                   COUNT(num25) AS n_cnt
            FROM det GROUP BY 1
        )
        SELECT det.h AS ts_hour,
               CAST(det.v AS DOUBLE) AS total_value,
               CASE WHEN det.num25 IS NOT NULL
                    THEN CAST(det.s25 AS DOUBLE) / 25 END AS trend,
               CAST(seas.n_sum AS DOUBLE) / (25 * NULLIF(seas.n_cnt, 0)) AS seasonal,
               CASE WHEN det.num25 IS NOT NULL
                    THEN CAST(det.num25 * seas.n_cnt - seas.n_sum AS DOUBLE)
                         / (25 * NULLIF(seas.n_cnt, 0)) END AS residual
        FROM det JOIN seas ON seas.hod = EXTRACT(hour FROM det.h)
    """,
    doc="Classical seasonal decomposition of the hourly value series "
    "(STL-lite): trend = centered 25-hour moving average (NULL unless "
    "the window is complete AND gap-free — the span guard), seasonal = "
    "hour-of-day mean of the detrended series, residual = the rest. "
    "Bit-exact trick: detrended = (25*v - S)/25, so every aggregate "
    "sums exact DECIMALS (25*v - S is decimal) and each output is ONE "
    "IEEE division of exact numerators — no double summation "
    "order-dependence anywhere. The global time window runs over the "
    "HOURLY AGGREGATE, whose row count grows with the time span (8,760 "
    "rows/year), not the corpus — 100 TB of events still decompose "
    "over a tiny series; the heavy lifting is the map-side-combined "
    "hourly aggregation.",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.col("value").cast("decimal(28,10)")).alias("v")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    win = hourly.select(
        "h",
        "v",
        F.sum("v").over(w).alias("s25"),
        F.count(F.lit(1)).over(w).alias("c25"),
        (
            F.unix_timestamp(F.max("h").over(w)) - F.unix_timestamp(F.min("h").over(w))
        ).alias("span_s"),
    )
    det = win.select(
        "h",
        "v",
        "s25",
        F.when(
            (F.col("c25") == 25) & (F.col("span_s") == 86400),
            F.lit(25) * F.col("v") - F.col("s25"),
        ).alias("num25"),
    )
    seas = det.groupBy(F.hour("h").alias("hod")).agg(
        F.sum("num25").alias("n_sum"),
        F.count("num25").alias("n_cnt"),
    )
    return det.join(F.broadcast(seas), F.hour(det["h"]) == seas["hod"]).select(
        F.col("h").alias("ts_hour"),
        F.col("v").cast("double").alias("total_value"),
        F.when(
            F.col("num25").isNotNull(), F.col("s25").cast("double") / 25
        ).alias("trend"),
        (
            F.col("n_sum").cast("double")
            / (F.lit(25) * F.nullif(F.col("n_cnt"), F.lit(0)))
        ).alias("seasonal"),
        F.when(
            F.col("num25").isNotNull(),
            (F.col("num25") * F.col("n_cnt") - F.col("n_sum")).cast("double")
            / (F.lit(25) * F.nullif(F.col("n_cnt"), F.lit(0))),
        ).alias("residual"),
    )


@query(
    "events_attribution",
    oracle="""
        WITH p AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
              WHERE event_type = 'click'),
        touched AS (
            SELECT p.event_id AS purchase_id, p.value, c.click_id, c.cts,
                   COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                       ORDER BY c.cts, c.click_id) AS pos,
                   COUNT(*) OVER (PARTITION BY p.event_id) AS npos
            FROM p JOIN c
              ON c.user_id = p.user_id
             AND c.cts > p.ts - INTERVAL 24 HOUR AND c.cts <= p.ts
        )
        SELECT purchase_id, click_id,
               CAST(n_touches AS BIGINT) AS n_touches,
               value / n_touches AS linear_credit,
               pos = 1 AS is_first_touch,
               pos = npos AS is_last_touch
        FROM touched
    """,
    doc="Multi-touch attribution: every click by the purchaser in the "
    "24h before a purchase gets linear credit value/n_touches (one "
    "IEEE division of the stored double by an exact count — bit-exact "
    "cross-engine), plus deterministic first/last-touch flags "
    "(position ties broken by click id). The standard marketing-"
    "attribution primitive over the events_range_join shape: one "
    "equi-shuffle on user_id with the time band as a join residual; "
    "the credit windows partition by purchase_id only. Swap the credit "
    "expression for U-shaped/time-decay models on the same plan.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    touched = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("cts") <= F.col("ts")),
    )
    wn = Window.partitionBy("purchase_id")
    wp = Window.partitionBy("purchase_id").orderBy("cts", "click_id")
    return (
        touched.select(
            "purchase_id",
            "click_id",
            "value",
            F.count(F.lit(1)).over(wn).alias("n_touches"),
            F.row_number().over(wp).alias("pos"),
        )
        .select(
            "purchase_id",
            "click_id",
            F.col("n_touches").cast("long").alias("n_touches"),
            (F.col("value") / F.col("n_touches")).alias("linear_credit"),
            (F.col("pos") == 1).alias("is_first_touch"),
            (F.col("pos") == F.col("n_touches")).alias("is_last_touch"),
        )
    )


@query(
    "events_hll_overlap",
    oracle="""
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        per AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS t1, b.event_type AS t2
            FROM per a JOIN per b ON a.event_type < b.event_type
        ),
        uni AS (
            SELECT p.t1, p.t2, COUNT(DISTINCT d.user_id) AS exact_union
            FROM pairs p JOIN du d ON d.event_type IN (p.t1, p.t2)
            GROUP BY 1, 2
        ),
        inter AS (
            SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS c
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT u.t1, u.t2,
               pa.n AS exact_a,
               pb.n AS exact_b,
               u.exact_union,
               CAST(COALESCE(i.c, 0) AS BIGINT) AS exact_inter,
               TRUE AS within_bound
        FROM uni u
        JOIN per pa ON pa.event_type = u.t1
        JOIN per pb ON pb.event_type = u.t2
        LEFT JOIN inter i ON i.t1 = u.t1 AND i.t2 = u.t2
    """,
    doc="Sketch-composed audience overlap: |A∩B| for every event-type "
    "pair by HLL inclusion-exclusion (est_inter = est_a + est_b - "
    "est_union) — the mergeable-sketch answer to 'how many users do "
    "these two segments share' that never shuffles raw user ids per "
    "pair. At 100 TB the per-type HLL sketches are tiny pre-aggregated "
    "state (approx_distinct_rollup_hll's pattern) and every pairwise "
    "union is a sketch merge, not a data scan; only the exact columns "
    "here (needed to PHRASE the bound check) cost a distinct shuffle. "
    "Bound-checking oracle, same contract as approx_count_distinct_"
    "users: estimates legitimately differ across engines, so the "
    "estimate is attested by within_bound = |est_inter - exact_inter| "
    "<= 3*rsd*(exact_a + exact_b + exact_union) (triangle bound over "
    "three 3-sigma sketch errors), which the oracle pins TRUE.",
)
def events_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.02
    du = ev.select("event_type", "user_id").distinct()
    per = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_n"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("est_n"),
    )
    types = du.select("event_type").distinct()
    # Union membership per unordered pair: each (type, user) row fans
    # out to the (type, other) pairs it belongs to — k-1 copies of the
    # distinct-user table (k = |event types|, tiny), then ONE agg where
    # HLL dedups multiset membership for free; countDistinct exists
    # only to phrase the bound.
    memb = du.join(
        F.broadcast(types.withColumnRenamed("event_type", "other")),
        F.col("event_type") != F.col("other"),
    ).select(
        F.least("event_type", "other").alias("t1"),
        F.greatest("event_type", "other").alias("t2"),
        "user_id",
    )
    uni = memb.groupBy("t1", "t2").agg(
        F.countDistinct("user_id").alias("exact_union"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("est_union"),
    )
    a = du.select(F.col("event_type").alias("t1"), F.col("user_id").alias("ua"))
    b = du.select(F.col("event_type").alias("t2"), F.col("user_id").alias("ub"))
    inter = (
        a.join(b, (F.col("ua") == F.col("ub")) & (F.col("t1") < F.col("t2")))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    pa = per.select(
        F.col("event_type").alias("t1"),
        F.col("exact_n").alias("exact_a"),
        F.col("est_n").alias("est_a"),
    )
    pb = per.select(
        F.col("event_type").alias("t2"),
        F.col("exact_n").alias("exact_b"),
        F.col("est_n").alias("est_b"),
    )
    est_inter = (
        F.col("est_a").cast("double")
        + F.col("est_b").cast("double")
        - F.col("est_union").cast("double")
    )
    bound = F.lit(3 * rsd) * (
        F.col("exact_a").cast("double")
        + F.col("exact_b").cast("double")
        + F.col("exact_union").cast("double")
    )
    return (
        uni.join(pa, "t1")
        .join(pb, "t2")
        .join(inter, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "exact_a",
            "exact_b",
            "exact_union",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias("exact_inter"),
            (
                F.abs(est_inter - F.coalesce("exact_inter", F.lit(0)).cast("double"))
                <= bound
            ).alias("within_bound"),
        )
    )


@query(
    "events_hourly_gapfill_ffill",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS tv
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
            FROM hourly GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        )
        SELECT g.event_type, g.hour,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
               (h.n IS NULL) AS is_gap,
               last_value(h.tv IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS carried_value
        FROM grid g
        LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour
    """,
    doc="Gap fill + FORWARD FILL over a per-group hourly spine: "
    "sequence()/explode generates each event type's own min→max hour "
    "calendar, missing hours join as zero-count gap rows, and "
    "last(tv, ignorenulls) carries the last observed hourly total "
    "across the gap — the LOCF (last-observation-carried-forward) "
    "resample primitive orders_daily_gapfill's zero-fill doesn't "
    "cover. Scale shape: the spine is O(groups × hours) — domain-"
    "compressed metadata, never row-scale — the hourly agg is one "
    "shuffle with map-side combine, the spine join broadcasts, and the "
    "carry-forward window partitions by group over the compressed "
    "frame (no global sort). Decimal-state sums keep the carried "
    "values bit-exact across engines.",
)
def events_hourly_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("tv"),
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
            F.last("tv", ignorenulls=True).over(w).alias("carried_value"),
        )
    )


@query(
    "events_cusum_changepoint",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, COUNT(*) AS n_hours, SUM(cnt) AS total
            FROM hourly GROUP BY 1
        ),
        c AS (
            SELECT h.event_type, h.hour, h.cnt,
                   SUM(h.cnt * t.n_hours - t.total)
                       OVER (PARTITION BY h.event_type ORDER BY h.hour) AS cusum
            FROM hourly h JOIN tot t USING (event_type)
        ),
        m AS (SELECT event_type, MAX(ABS(cusum)) AS mx FROM c GROUP BY 1)
        SELECT c.event_type, c.hour, CAST(c.cnt AS BIGINT) AS cnt,
               CAST(c.cusum AS BIGINT) AS cusum,
               ABS(c.cusum) = m.mx AS is_change_point
        FROM c JOIN m USING (event_type)
    """,
    doc="CUSUM change-point detection over per-type hourly event counts "
    "(Page 1954): the cumulative sum of mean-centered counts peaks in "
    "magnitude at the most likely rate-shift hour. Scaled to all-integer "
    "arithmetic (cnt*n_hours - total instead of cnt - mean), so the "
    "running sum is order-exact across engines. The raw events shuffle "
    "once into (type, hour) cells; the window and argmax then run over "
    "the DOMAIN-COMPRESSED hourly frame (<= types x hours rows "
    "regardless of event volume — the same compression the Gini/TWAP "
    "family uses), partitioned by event_type so no global sort exists.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("cnt").alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    c = (
        hourly.join(tot, "event_type")
        .withColumn(
            "cusum",
            F.sum(F.col("cnt") * F.col("n_hours") - F.col("total")).over(w),
        )
    )
    m = c.groupBy("event_type").agg(F.max(F.abs(F.col("cusum"))).alias("mx"))
    return (
        c.join(m, "event_type")
        .select(
            "event_type",
            "hour",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("cusum").cast("long").alias("cusum"),
            (F.abs(F.col("cusum")) == F.col("mx")).alias("is_change_point"),
        )
    )


@query(
    "events_ab_lift",
    oracle="""
        WITH u AS (
            SELECT user_id, user_id % 2 AS arm,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
            FROM events GROUP BY 1, 2
        ),
        t AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                     CAST(COUNT(*) AS BIGINT) AS nu FROM u),
        s AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN u.c * t.nu > t.total THEN 1 ELSE 0 END)
                        AS BIGINT) AS conv
            FROM u, t GROUP BY arm
        )
        SELECT a.n AS n_a, b.n AS n_b, a.conv AS conv_a, b.conv AS conv_b,
               CAST(a.conv AS DOUBLE)/a.n AS rate_a,
               CAST(b.conv AS DOUBLE)/b.n AS rate_b,
               CAST(b.conv AS DOUBLE)/b.n - CAST(a.conv AS DOUBLE)/a.n AS lift,
               (CAST(b.conv AS DOUBLE)/b.n - CAST(a.conv AS DOUBLE)/a.n)
                 / nullif(sqrt((CAST(a.conv + b.conv AS DOUBLE)/(a.n + b.n))
                        * (1.0 - CAST(a.conv + b.conv AS DOUBLE)/(a.n + b.n))
                        * (1.0/a.n + 1.0/b.n)), 0.0) AS z_score
        FROM s a JOIN s b ON a.arm = 0 AND b.arm = 1
    """,
    doc="A/B experiment readout with a two-proportion z-test: users are "
    "assigned arms by user_id parity, 'conversion' is being an "
    "above-average purchaser — evaluated as the cross-multiplied "
    "integer c*n_users > total so the cohort definition is exact at "
    "any scale (no float mean). One map-combinable shuffle to per-user "
    "counts, a broadcast 1-row totals frame, then a 2-row arm "
    "aggregate; the z statistic is a fixed IEEE expression tree over "
    "exact integers (nullif-guarded sqrt denominator — a degenerate "
    "all-convert cohort yields NULL, not a divide error), so both "
    "engines agree bit-for-bit.",
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", (F.col("user_id") % 2).alias("arm")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c")
    )
    t = u.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nu"),
    )
    s = (
        u.crossJoin(F.broadcast(t))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("c") * F.col("nu") > F.col("total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("conv"),
        )
    )
    a = s.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = s.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(b))
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    lift = rate_b - rate_a
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = lift / F.nullif(
        F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return j.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        lift.alias("lift"),
        z.alias("z_score"),
    )


BURST_WINDOW_US = 86_400_000_000  # 24h sliding window
BURST_THRESHOLD = 7  # max events in any window before a user is flagged


@query(
    "events_burst_users",
    oracle=f"""
        WITH w AS (
            SELECT user_id,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                  RANGE BETWEEN {BURST_WINDOW_US} PRECEDING
                                  AND CURRENT ROW) AS c
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(c) AS BIGINT) AS max_burst
        FROM w GROUP BY user_id
        HAVING MAX(c) >= {BURST_THRESHOLD}
    """,
    doc="Bot/abuse burst detection: users whose event count inside ANY "
    f"sliding 24h window reaches {BURST_THRESHOLD} — the rate heuristic "
    "crawl pipelines use to drop automated traffic before training-data "
    "extraction. The sliding count is an exact RANGE-interval window on "
    "epoch microseconds PARTITIONED BY user (each user's events land in "
    "one partition — no global sort, same shape as "
    "window_rolling_interval), followed by a map-combinable per-user "
    "max. All integer counting: bit-exact cross-engine.",
)
def events_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-BURST_WINDOW_US, 0)
    )
    counted = ev.select("user_id", F.count(F.lit(1)).over(w).alias("c"))
    return (
        counted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("c").cast("long").alias("max_burst"),
        )
        .filter(F.col("max_burst") >= BURST_THRESHOLD)
    )


def _hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared domain-compressed series for the trend/randomness
    tests: hourly event counts over a gapless zero-filled calendar
    spine, keyed by an integer hour index. CACHED — the pairwise tests
    read it from memory, never re-scanning events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h")
    )
    return spine.join(hourly, "h", "left").select(
        F.expr("unix_micros(h) div 3600000000").alias("he"),
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )


ACF_MAX_LAG = 12


@query(
    "events_acf_hourly",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ),
        filled AS (
            SELECT epoch_us(s.h) // 3600000000 AS he,
                   COALESCE(hourly.c, 0) AS c
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
        p AS (
            SELECT l.lag, a.c AS x, f2.c AS y
            FROM filled a
            CROSS JOIN lags l
            JOIN filled f2 ON f2.he = a.he + l.lag
        ),
        s AS (
            SELECT lag, COUNT(*) AS m,
                   SUM(x * y) AS sxy, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM p GROUP BY lag
        )
        SELECT CAST(lag AS INTEGER) AS lag,
               CAST(m AS BIGINT) AS m,
               CAST(m * sxy - sx * sy AS DOUBLE)
               / nullif(sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 0.0) AS acf
        FROM s
    """,
    doc=f"Autocorrelation function of the hourly event-count series at "
    f"lags 1..{ACF_MAX_LAG} — the seasonality detector that picks the "
    "period for events_seasonal_decompose instead of assuming 24. The "
    "series is domain-compressed first (one groupBy to hours, then a "
    "complete spine with zero-filled gaps so silent hours count), so "
    "the lag self-join runs over a bounded frame (hours in range), "
    "never over raw events. Pearson r per lag via exact integer "
    "cross-multiplied sums; one double division and two sqrts at the "
    "end (IEEE-exact, oracle replays the identical sequence).",
)
def events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    return stats.acf(_hourly_series(spark, sf_dir), "he", "c", max_lag=ACF_MAX_LAG)



@query(
    "events_chi_square_independence",
    oracle="""
        WITH o AS (
            SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS o
            FROM events GROUP BY 1, 2
        ),
        rt AS (SELECT event_type, SUM(o) AS rt FROM o GROUP BY 1),
        ct AS (SELECT dow, SUM(o) AS ct FROM o GROUP BY 1),
        nn AS (SELECT SUM(o) AS n FROM o),
        cells AS (
            SELECT o.o,
                   CAST(rt.rt * ct.ct AS DOUBLE) / CAST(nn.n AS DOUBLE) AS e
            FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nn
        )
        SELECT CAST(SUM(CAST((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
                             AS DECIMAL(28,10))) AS DOUBLE) AS chi2,
               CAST(((SELECT COUNT(*) FROM rt) - 1)
                    * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
               CAST((SELECT n FROM nn) AS BIGINT) AS n
        FROM cells
    """,
    doc="Chi-square test of independence between event_type and "
    "day-of-week — the 'is traffic mix stable across the week' check of "
    "an events warehouse. One shuffle builds the contingency table "
    "(domain-compressed: types x 7 cells); row/column totals are "
    "re-aggregations of those cells, never of raw events; expected "
    "counts use exact integer rt*ct with one double division, and the "
    "per-cell contributions are quantized to DECIMAL before the final "
    "sum so cell order can't perturb bits. Output: (chi2, dof, n).",
)
def events_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.chi_square(
        ev.select("event_type", F.dayofweek(F.col("ts")).alias("dow")),
        "event_type",
        "dow",
    )



@query(
    "events_mann_kendall",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ),
        filled AS (
            SELECT epoch_us(s.h) // 3600000000 AS he,
                   COALESCE(hourly.c, 0) AS c
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        pairs AS (
            SELECT CASE WHEN j.c > i.c THEN 1 WHEN j.c < i.c THEN -1 ELSE 0 END AS sgn
            FROM filled i JOIN filled j ON j.he > i.he
        ),
        sstat AS (SELECT SUM(sgn) AS s FROM pairs),
        hh AS (SELECT COUNT(*) AS n FROM filled),
        ties AS (
            SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
            FROM (SELECT COUNT(*) AS t FROM filled GROUP BY c) g
            WHERE t > 1
        )
        SELECT CAST(hh.n AS BIGINT) AS n_hours,
               CAST(sstat.s AS BIGINT) AS s,
               CAST(hh.n * (hh.n - 1) * (2 * hh.n + 5) - ties.tie_term AS BIGINT)
                   AS var_num,
               CASE WHEN sstat.s > 0 THEN CAST(sstat.s - 1 AS DOUBLE)
                         / sqrt(CAST(hh.n * (hh.n - 1) * (2 * hh.n + 5) - ties.tie_term
                                     AS DOUBLE) / 18.0)
                    WHEN sstat.s < 0 THEN CAST(sstat.s + 1 AS DOUBLE)
                         / sqrt(CAST(hh.n * (hh.n - 1) * (2 * hh.n + 5) - ties.tie_term
                                     AS DOUBLE) / 18.0)
                    ELSE 0.0 END AS z
        FROM sstat CROSS JOIN hh CROSS JOIN ties
    """,
    doc="Mann-Kendall monotonic-trend test over the hourly event-count "
    "series (zero-filled calendar spine): S = sum of pairwise signs, "
    "tie-corrected variance, continuity-corrected z — the "
    "nonparametric 'is volume trending' answer that a linear fit gets "
    "wrong under outliers. Everything up to the final sqrt/division is "
    "EXACT integer arithmetic (S, the variance numerator, tie terms). "
    "The pairwise join runs over the domain-compressed hourly frame "
    "(hours-in-range rows, never raw events); a decade-long span would "
    "switch the grain to days, same plan.",
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    return stats.mann_kendall(_hourly_series(spark, sf_dir), "he", "c")



@query(
    "events_theilsen_trend",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ),
        filled AS (
            SELECT epoch_us(s.h) // 3600000000
                   - (SELECT min(epoch_us(h) // 3600000000) FROM spine) AS x,
                   COALESCE(hourly.c, 0) AS c
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        slopes AS (
            SELECT i.x AS ix, j.x AS jx,
                   CAST(j.c - i.c AS DOUBLE) / CAST(j.x - i.x AS DOUBLE) AS slope
            FROM filled i JOIN filled j ON j.x > i.x
        ),
        ranked AS (
            SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, ix, jx) AS rn,
                   COUNT(*) OVER () AS p
            FROM slopes
        ),
        med AS (SELECT slope AS m, p FROM ranked WHERE rn = (p + 1) // 2),
        resid AS (
            SELECT f.c - med.m * f.x AS r, f.x, med.m, med.p
            FROM filled f CROSS JOIN med
        ),
        rranked AS (
            SELECT r, m, p, ROW_NUMBER() OVER (ORDER BY r, x) AS rn,
                   COUNT(*) OVER () AS nh
            FROM resid
        )
        SELECT CAST(nh AS BIGINT) AS n_hours,
               CAST(p AS BIGINT) AS n_pairs,
               m AS slope,
               r AS intercept
        FROM rranked WHERE rn = (nh + 1) // 2
    """,
    doc="Theil-Sen robust trend of the hourly event-count series: slope "
    "= lower median of all pairwise slopes, intercept = lower median "
    "of the residuals c - slope*x — the outlier-immune line fit that "
    "pairs with events_mann_kendall's significance verdict (MK says "
    "WHETHER volume trends, Theil-Sen says HOW FAST). Each slope is "
    "one IEEE division of exact integer differences; medians are "
    "deterministic rank selections (ties broken by coordinates), so "
    "the oracle replays bit-for-bit. The pair frame is the domain-"
    "compressed hour spine squared — bounded by the time span (720h "
    "-> 260k pair rows), independent of raw event count; a decade-"
    "long span would switch the grain to days.",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    return stats.theil_sen(_hourly_series(spark, sf_dir), "he", "c")



@query(
    "events_ks_test",
    oracle="""
        WITH pts AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS m,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS a,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS b
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ),
        nn AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM pts),
        cum AS (
            SELECT m,
                   SUM(a) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS c1,
                   SUM(b) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS c2
            FROM pts
        ),
        gaps AS (
            SELECT m, abs(nn.n2 * cum.c1 - nn.n1 * cum.c2) AS d_num, nn.n1, nn.n2
            FROM cum CROSS JOIN nn
        )
        SELECT CAST(n1 AS BIGINT) AS n1,
               CAST(n2 AS BIGINT) AS n2,
               CAST(d_num AS BIGINT) AS d_num,
               CAST(m AS BIGINT) AS at_cents,
               CAST(d_num AS DOUBLE) / nullif(CAST(n1 * n2 AS DOUBLE), 0.0) AS d
        FROM gaps
        ORDER BY d_num DESC, m ASC
        LIMIT 1
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the value "
    "distributions of 'click' and 'purchase' events — the "
    "distribution-drift detector for A/B samples and pipeline "
    "regressions. EXACT throughout: values quantize to integer cents "
    "(the money discipline), the CDF gap at each point is the integer "
    "|n2*c1 - n1*c2| (cross-multiplied — no per-point division), the "
    "argmax is a deterministic (gap desc, cents asc) top-1, and only "
    "the reported D does one final double division. The cumulative "
    "window runs over the VALUE-DOMAIN-compressed frame (distinct "
    "cents, bounded by the price range — ~33k points at any event "
    "count), the same counting trick as the exact medians.",
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.ks_2sample(ev, "value", "event_type", "click", "purchase")



@query(
    "events_runs_test",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ),
        filled AS (
            SELECT epoch_us(s.h) // 3600000000 AS he,
                   COALESCE(hourly.c, 0) AS c
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        tot AS (SELECT COUNT(*) AS n, SUM(c) AS total FROM filled),
        lab AS (
            SELECT he, CASE WHEN c * tot.n > tot.total THEN 1 ELSE 0 END AS ab
            FROM filled CROSS JOIN tot
        ),
        flagged AS (
            SELECT ab, CASE WHEN LAG(ab) OVER (ORDER BY he) IS NULL
                                 OR ab <> LAG(ab) OVER (ORDER BY he)
                            THEN 1 ELSE 0 END AS new_run
            FROM lab
        ),
        agg AS (
            SELECT SUM(new_run) AS r, SUM(ab) AS n1, SUM(1 - ab) AS n2
            FROM flagged
        )
        SELECT CAST(n1 + n2 AS BIGINT) AS n_hours,
               CAST(n1 AS BIGINT) AS n_above,
               CAST(n2 AS BIGINT) AS n_below,
               CAST(r AS BIGINT) AS runs,
               (CAST(r AS DOUBLE)
                - (CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) + 1.0))
               / nullif(sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS DOUBLE)
                      / nullif(CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE), 0.0)), 0.0) AS z
        FROM agg
    """,
    doc="Wald-Wolfowitz runs test for randomness of the hourly "
    "event-count series: hours label above/below the exact mean via "
    "the cross-multiplied integer test c*n > total (no division), runs "
    "are LAG-islands over the hour spine, and the normal approximation "
    "z uses exact integer n1/n2/R with a fixed IEEE op sequence. Too "
    "FEW runs = clustering/regime shifts (the CUSUM/changepoint "
    "confirmation), too many = oscillation. Domain-compressed like the "
    "rest of the trend family: cost is hours-in-range, not events.",
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    return stats.runs_above_mean(_hourly_series(spark, sf_dir), "he", "c")


@query(
    "events_spearman_hourly",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS a,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS b
            FROM events GROUP BY 1
        ),
        bnd AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bnd
        ),
        filled AS (
            SELECT COALESCE(hourly.a, 0) AS a, COALESCE(hourly.b, 0) AS b
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        ranked AS (
            SELECT 2 * RANK() OVER (ORDER BY a)
                   + COUNT(*) OVER (PARTITION BY a) - 1 AS ra,
                   2 * RANK() OVER (ORDER BY b)
                   + COUNT(*) OVER (PARTITION BY b) - 1 AS rb
            FROM filled
        ),
        s AS (
            SELECT COUNT(*) AS m, SUM(ra * rb) AS sxy, SUM(ra) AS sx,
                   SUM(rb) AS sy, SUM(ra * ra) AS sxx, SUM(rb * rb) AS syy
            FROM ranked
        )
        SELECT CAST(m AS BIGINT) AS n,
               CAST(m * sxy - sx * sy AS DOUBLE)
               / nullif(sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 0.0) AS rho
        FROM s
    """,
    doc="Spearman rank correlation between the hourly click and "
    "purchase count series — the monotone-association check (do "
    "purchases follow clicks hour by hour?) that Pearson gets wrong on "
    "heavy tails. EXACT under ties: tie groups use the average rank "
    "represented as the integer 2*rank + t - 1 (Pearson is affine-"
    "invariant), so every sum is integer and only the final division/"
    "sqrts are floating point (stats.py::spearman). Both rank windows "
    "run over the domain-compressed hour spine.",
)
def events_spearman_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"),
    ).cache()
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h")
    )
    filled = spine.join(hourly, "h", "left").select(
        F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("b"),
    )
    return stats.spearman(filled, "a", "b")


@query(
    "events_ab_cuped",
    oracle="""
        WITH bnd AS (
            SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
            FROM events
        ),
        u AS (
            SELECT user_id % 2 AS arm,
                   SUM(CASE WHEN epoch_us(ts) < bnd.mid
                            THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS x,
                   SUM(CASE WHEN epoch_us(ts) >= bnd.mid
                            THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS y
            FROM events CROSS JOIN bnd
            GROUP BY user_id, arm
        ),
        g AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM u
        ),
        th AS (
            SELECT n, sx, sy,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS theta
            FROM g
        ),
        arms AS (
            SELECT arm, COUNT(*) AS n_arm, SUM(x) AS sx_arm, SUM(y) AS sy_arm
            FROM u GROUP BY arm
        )
        SELECT CAST(arm AS BIGINT) AS arm,
               CAST(n_arm AS BIGINT) AS n_users,
               CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE) / 100.0 AS mean_post,
               (CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
                - th.theta * (CAST(sx_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
                              - CAST(th.sx AS DOUBLE) / CAST(th.n AS DOUBLE)))
               / 100.0 AS adj_mean_post,
               th.theta AS theta
        FROM arms CROSS JOIN th
    """,
    doc="CUPED variance reduction for the A/B readout (Deng et al. "
    "2013): per user, pre-period and post-period spend in EXACT "
    "integer cents (split at the exact integer-microsecond midpoint of "
    "the observed range), theta fitted from pooled exact sufficient "
    "statistics (the stats_linear_fit pattern — one division), and "
    "per-arm adjusted means from a fixed IEEE op sequence. The "
    "adjustment typically cuts readout variance 30-60% when pre-period "
    "behavior predicts post-period behavior — fewer users for the same "
    "significance. One shuffle on user_id; everything after is "
    "re-aggregation of per-user rows.",
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bnd = F.broadcast(
        ev.agg(
            (
                (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2
            )
            .cast("long")
            .alias("mid")
        )
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    u = (
        ev.crossJoin(bnd)
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"))
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("mid"), cents).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("mid"), cents).otherwise(0)
            ).alias("y"),
        )
        .cache()  # one row per user — reused by the pooled and per-arm aggs
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,0)")).alias("sxx"),
    )
    theta = (
        (
            F.col("n").cast("decimal(12,0)") * F.col("sxy")
            - F.col("sx").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
        ).cast("double")
        / F.nullif(
            (
                F.col("n").cast("decimal(12,0)") * F.col("sxx")
                - F.col("sx").cast("decimal(19,0)") * F.col("sx").cast("decimal(19,0)")
            ).cast("double"),
            F.lit(0.0),
        )
    )
    th = F.broadcast(g.select("n", "sx", "sy", theta.alias("theta")))
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("x").alias("sx_arm"),
        F.sum("y").alias("sy_arm"),
    )
    mean_y = F.col("sy_arm").cast("double") / F.col("n_arm").cast("double")
    mean_x = F.col("sx_arm").cast("double") / F.col("n_arm").cast("double")
    gmean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    return arms.crossJoin(th).select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n_arm").cast("bigint").alias("n_users"),
        (mean_y / F.lit(100.0)).alias("mean_post"),
        ((mean_y - F.col("theta") * (mean_x - gmean_x)) / F.lit(100.0)).alias(
            "adj_mean_post"
        ),
        F.col("theta").alias("theta"),
    )


@query(
    "events_kendall_hourly",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS a,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS b
            FROM events GROUP BY 1
        ),
        bnd AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bnd
        ),
        filled AS (
            SELECT COALESCE(hourly.a, 0) AS a, COALESCE(hourly.b, 0) AS b
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        idx AS (
            SELECT a, b, ROW_NUMBER() OVER (ORDER BY a, b) AS i FROM filled
        ),
        sstat AS (
            SELECT SUM(CASE WHEN (j.a > i.a AND j.b > i.b)
                              OR (j.a < i.a AND j.b < i.b) THEN 1
                            WHEN (j.a > i.a AND j.b < i.b)
                              OR (j.a < i.a AND j.b > i.b) THEN -1
                            ELSE 0 END) AS s
            FROM idx i JOIN idx j ON j.i > i.i
        ),
        nn AS (SELECT COUNT(*) AS n FROM filled),
        ta AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ta2
               FROM (SELECT COUNT(*) AS t FROM filled GROUP BY a) g WHERE t > 1),
        tb AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tb2
               FROM (SELECT COUNT(*) AS t FROM filled GROUP BY b) g WHERE t > 1)
        SELECT CAST(nn.n AS BIGINT) AS n,
               CAST(sstat.s AS BIGINT) AS s,
               CAST(sstat.s AS DOUBLE)
               / nullif(sqrt(CAST(nn.n * (nn.n - 1) - ta.ta2 AS DOUBLE) / 2.0)
                        * sqrt(CAST(nn.n * (nn.n - 1) - tb.tb2 AS DOUBLE) / 2.0),
                        0.0) AS tau
        FROM sstat CROSS JOIN nn CROSS JOIN ta CROSS JOIN tb
    """,
    doc="Kendall's tau-b between the hourly click and purchase count "
    "series — the correlation trio's third member (Pearson: "
    "stats_correlation; Spearman: events_spearman_hourly), preferred "
    "when the series are short and tie-heavy. Concordant/discordant "
    "pair sums and both tie corrections are EXACT integers over the "
    "domain-compressed hour spine (stats.py::kendall_tau); the final "
    "tau is one division of two sqrts.",
)
def events_kendall_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"),
    ).cache()
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h")
    )
    filled = spine.join(hourly, "h", "left").select(
        F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("b"),
    )
    return stats.kendall_tau(filled, "a", "b")


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


@query(
    "events_holt_smoothing",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ),
        filled AS (
            SELECT epoch_us(s.h) // 3600000000 AS he,
                   COALESCE(hourly.c, 0) AS c
            FROM spine s LEFT JOIN hourly ON hourly.h = s.h
        ),
        st AS (
            SELECT COUNT(*) AS n,
                   list_reduce(
                       list_transform(list(CAST(c AS DOUBLE) ORDER BY he),
                                      y -> [y, 0.0::DOUBLE]),
                       (acc, x) -> [
                           {HOLT_ALPHA}::DOUBLE * x[1]
                           + (1.0::DOUBLE - {HOLT_ALPHA}::DOUBLE) * (acc[1] + acc[2]),
                           {HOLT_BETA}::DOUBLE * (({HOLT_ALPHA}::DOUBLE * x[1]
                               + (1.0::DOUBLE - {HOLT_ALPHA}::DOUBLE) * (acc[1] + acc[2]))
                               - acc[1])
                           + (1.0::DOUBLE - {HOLT_BETA}::DOUBLE) * acc[2]
                       ]) AS s
            FROM filled
            HAVING COUNT(*) > 0
        )
        SELECT CAST(n AS BIGINT) AS n_hours,
               s[1] AS level,
               s[2] AS trend,
               s[1] + s[2] AS forecast_next
        FROM st
    """,
    doc=f"Holt double-exponential smoothing (alpha={HOLT_ALPHA}, "
    f"beta={HOLT_BETA}) of the hourly event-count series — level + "
    "trend state, the one-step volume forecaster that EMA (no trend "
    "term) lags on ramps. A genuinely sequential fold: the Spark side "
    "runs one pandas loop over the bounded hour spine (ONE bounded "
    "group — the events_user_ema shape), the oracle replays the "
    "identical left-to-right recursion via list_reduce over a DOUBLE[] "
    "state vector. NOTE the struct-state fold is NOT used: DuckDB "
    "rebinds earlier struct fields mid-construction inside list_reduce "
    "lambdas (measured), so the state rides in a list, which is "
    "immutable during the step. Init l0=y0, b0=0 (fold seeds with the "
    "first element).",
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    series = _hourly_series(spark, sf_dir)

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("he").reset_index(drop=True)
        ys = pdf["c"].astype("float64").to_list()
        if not ys:
            return pd.DataFrame(
                {"n_hours": [], "level": [], "trend": [], "forecast_next": []}
            )
        lvl, tr = ys[0], 0.0
        for y in ys[1:]:
            nl = HOLT_ALPHA * y + (1.0 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (nl - lvl) + (1.0 - HOLT_BETA) * tr
            lvl = nl
        return pd.DataFrame(
            {
                "n_hours": [len(ys)],
                "level": [lvl],
                "trend": [tr],
                "forecast_next": [lvl + tr],
            }
        )

    return (
        series.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            holt, schema="n_hours long, level double, trend double, forecast_next double"
        )
    )


from minispark_spark.registry import REGISTRY as _REG  # noqa: E402


@query(
    "events_seasonal_outliers",
    oracle="""
        WITH base AS ({DECOMP}),
        r AS (
            SELECT ts_hour, residual FROM base WHERE residual IS NOT NULL
        ),
        rr AS (
            SELECT ts_hour, residual,
                   ROW_NUMBER() OVER (ORDER BY residual, ts_hour) AS rn,
                   COUNT(*) OVER () AS n
            FROM r
        ),
        med AS (SELECT residual AS m FROM rr WHERE rn = (n + 1) // 2),
        dev AS (
            SELECT ts_hour, residual, abs(residual - med.m) AS ad
            FROM r CROSS JOIN med
        ),
        dr AS (
            SELECT ts_hour, residual, ad,
                   ROW_NUMBER() OVER (ORDER BY ad, ts_hour) AS rn,
                   COUNT(*) OVER () AS n
            FROM dev
        ),
        mad AS (SELECT ad AS mad FROM dr WHERE rn = (n + 1) // 2)
        SELECT dev.ts_hour, dev.residual, dev.ad AS abs_dev, mad.mad
        FROM dev CROSS JOIN mad
        WHERE dev.ad > 3.0 * mad.mad
    """.replace("{DECOMP}", _REG["events_seasonal_decompose"].oracle),
    doc="Seasonality-aware anomaly detection: hours whose decomposition "
    "RESIDUAL (events_seasonal_decompose — trend and hour-of-day "
    "pattern already removed) deviates more than 3 robust MADs from "
    "the median residual. This catches the 3am spike a plain z-score "
    "misses (it would compare against the raw series, where 3am is "
    "always low) — the composition is the point. Medians are "
    "deterministic lower-median rank selections over the bounded "
    "hourly frame; every compared double is bit-identical cross-engine "
    "because the decomposition's outputs are single divisions of exact "
    "DECIMAL numerators.",
)
def events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = events_seasonal_decompose(spark, sf_dir)
    r = base.filter(F.col("residual").isNotNull()).select("ts_hour", "residual")
    rw = Window.orderBy("residual", "ts_hour")
    rr = r.select(
        "ts_hour",
        "residual",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = F.broadcast(
        rr.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2)).select(
            F.col("residual").alias("m")
        )
    )
    dev = r.crossJoin(med).select(
        "ts_hour", "residual", F.abs(F.col("residual") - F.col("m")).alias("ad")
    )
    dw = Window.orderBy("ad", "ts_hour")
    dr = dev.select(
        "ts_hour",
        "residual",
        "ad",
        F.row_number().over(dw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    mad = F.broadcast(
        dr.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2)).select(
            F.col("ad").alias("mad")
        )
    )
    return (
        dev.crossJoin(mad)
        .filter(F.col("ad") > 3.0 * F.col("mad"))
        .select("ts_hour", "residual", F.col("ad").alias("abs_dev"), "mad")
    )


@query(
    "events_mann_whitney",
    oracle="""
        WITH pts AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS m,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS a,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS b
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ),
        ranked AS (
            SELECT a, b, a + b AS t,
                   COALESCE(SUM(a + b) OVER (ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
            FROM pts
        ),
        agg AS (
            SELECT SUM(a) AS n1, SUM(b) AS n2,
                   SUM(a * (2 * prev + t + 1)) AS r1_x2,
                   SUM(t * t * t - t) AS tie3
            FROM ranked
        )
        SELECT CAST(n1 AS BIGINT) AS n1,
               CAST(n2 AS BIGINT) AS n2,
               CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
               (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
               / nullif(sqrt(CAST(n1 * n2 AS DOUBLE) * CAST(n1 + n2 + 1 AS DOUBLE) / 3.0
                             - CAST(n1 * n2 AS DOUBLE) * CAST(tie3 AS DOUBLE)
                               / nullif(3.0 * CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE), 0.0)),
                        0.0) AS z
        FROM agg
    """,
    doc="Mann-Whitney U (rank-sum) test between the click and purchase "
    "value distributions — the whole-ranking partner to events_ks_test "
    "(KS reacts to the worst CDF gap, U to consistent stochastic "
    "dominance). EXACT via the counting trick (stats.py::"
    "mann_whitney_u): cent-quantized values, ranks from cumulative "
    "counts over the value-domain-compressed frame, tie-averaged ranks "
    "carried DOUBLED so 2*U1 is an exact integer; the tie-corrected "
    "normal z does the only divisions/sqrt.",
)
def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.mann_whitney_u(ev, "value", "event_type", "click", "purchase")


_KW_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "events_kruskal_wallis",
    oracle="""
        WITH pts AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS m,
                   {CNTS}
            FROM events
            GROUP BY 1
        ),
        ranked AS (
            SELECT *, {TSUM} AS t,
                   COALESCE(SUM({TSUM}) OVER (ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
            FROM pts
        ),
        agg AS (
            SELECT {NS},
                   {RS},
                   SUM(t * t * t - t) AS tie3
            FROM ranked
        ),
        hcalc AS (
            SELECT *,
                   ({N_ALL}) AS n,
                   ({KCNT}) AS k_groups,
                   12.0 / (CAST(({N_ALL}) AS DOUBLE) * CAST(({N_ALL}) + 1 AS DOUBLE))
                   * ({TERMS})
                   - 3.0 * CAST(({N_ALL}) + 1 AS DOUBLE) AS h
            FROM agg
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(k_groups AS BIGINT) AS k_groups,
               h,
               h / nullif(1.0 - CAST(tie3 AS DOUBLE)
                          / nullif(CAST(n * n * n - n AS DOUBLE), 0.0), 0.0) AS h_tie_corrected
        FROM hcalc
    """.replace(
        "{CNTS}",
        ",\n                   ".join(
            f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS c{i}"
            for i, t in enumerate(_KW_TYPES)
        ),
    )
    .replace("{TSUM}", " + ".join(f"c{i}" for i in range(len(_KW_TYPES))))
    .replace("{NS}", ", ".join(f"SUM(c{i}) AS n{i}" for i in range(len(_KW_TYPES))))
    .replace(
        "{RS}",
        ", ".join(
            f"SUM(c{i} * (2 * prev + t + 1)) AS r{i}" for i in range(len(_KW_TYPES))
        ),
    )
    .replace("{N_ALL}", " + ".join(f"n{i}" for i in range(len(_KW_TYPES))))
    .replace(
        "{KCNT}",
        " + ".join(f"CASE WHEN n{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_KW_TYPES))),
    )
    .replace(
        "{TERMS}",
        " + ".join(
            f"(CASE WHEN n{i} > 0 THEN CAST(r{i} AS DOUBLE) * CAST(r{i} AS DOUBLE)"
            f" / (4.0 * CAST(n{i} AS DOUBLE)) ELSE 0.0 END)"
            for i in range(len(_KW_TYPES))
        ),
    ),
    doc="Kruskal-Wallis H test across ALL FIVE event types' value "
    "distributions — the nonparametric one-way ANOVA ('do any of these "
    "groups differ?') that chains into pairwise Mann-Whitney tests. "
    "Same counting machinery (stats doubled tie-averaged ranks over "
    "the cent-quantized value domain): every rank sum R_i is carried "
    "as the exact integer 2*R_i, group terms divide by 4*n_i at the "
    "end, and the 5-term sum is a FIXED left-associative chain of "
    "named columns identical in both engines — no float summation "
    "order ambiguity. Tie-corrected variant divides by the exact-"
    "integer-derived correction.",
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.kruskal_wallis(ev, "value", "event_type", _KW_TYPES)


@query(
    "events_friedman",
    oracle="""
        WITH ut AS (
            SELECT user_id AS blk, event_type AS g,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
                   COUNT(*) AS c
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
            GROUP BY 1, 2
        ),
        complete AS (
            SELECT blk FROM ut GROUP BY blk HAVING COUNT(*) = 5
        ),
        utc AS (SELECT ut.* FROM ut JOIN complete USING (blk)),
        cmp AS (
            SELECT a.blk, a.g,
                   SUM(CASE WHEN b.s * a.c < a.s * b.c THEN 1 ELSE 0 END) AS less,
                   SUM(CASE WHEN b.s * a.c = a.s * b.c THEN 1 ELSE 0 END) AS teq
            FROM utc a JOIN utc b ON b.blk = a.blk
            GROUP BY 1, 2
        ),
        pg AS (
            SELECT g, SUM(2 * less + teq + 1) AS r_x2 FROM cmp GROUP BY g
        ),
        wide AS (
            SELECT
                COALESCE(MAX(CASE WHEN g = 'click' THEN r_x2 END), 0) AS r_click,
                COALESCE(MAX(CASE WHEN g = 'view' THEN r_x2 END), 0) AS r_view,
                COALESCE(MAX(CASE WHEN g = 'purchase' THEN r_x2 END), 0) AS r_purchase,
                COALESCE(MAX(CASE WHEN g = 'signup' THEN r_x2 END), 0) AS r_signup,
                COALESCE(MAX(CASE WHEN g = 'error' THEN r_x2 END), 0) AS r_error
            FROM pg
        ),
        nb AS (SELECT COUNT(*) AS n FROM complete)
        SELECT CAST(nb.n AS BIGINT) AS n_blocks,
               CAST(5 AS BIGINT) AS k,
               12.0 / nullif(CAST(nb.n AS DOUBLE) * 5.0 * 6.0, 0.0)
               * (CAST(r_click AS DOUBLE) * CAST(r_click AS DOUBLE) / 4.0
                  + CAST(r_view AS DOUBLE) * CAST(r_view AS DOUBLE) / 4.0
                  + CAST(r_purchase AS DOUBLE) * CAST(r_purchase AS DOUBLE) / 4.0
                  + CAST(r_signup AS DOUBLE) * CAST(r_signup AS DOUBLE) / 4.0
                  + CAST(r_error AS DOUBLE) * CAST(r_error AS DOUBLE) / 4.0)
               - 3.0 * CAST(nb.n AS DOUBLE) * 6.0 AS chi2_f,
               (12.0 / nullif(CAST(nb.n AS DOUBLE) * 5.0 * 6.0, 0.0)
               * (CAST(r_click AS DOUBLE) * CAST(r_click AS DOUBLE) / 4.0
                  + CAST(r_view AS DOUBLE) * CAST(r_view AS DOUBLE) / 4.0
                  + CAST(r_purchase AS DOUBLE) * CAST(r_purchase AS DOUBLE) / 4.0
                  + CAST(r_signup AS DOUBLE) * CAST(r_signup AS DOUBLE) / 4.0
                  + CAST(r_error AS DOUBLE) * CAST(r_error AS DOUBLE) / 4.0)
               - 3.0 * CAST(nb.n AS DOUBLE) * 6.0)
               / nullif(CAST(nb.n AS DOUBLE) * 4.0, 0.0) AS kendalls_w
        FROM wide CROSS JOIN nb
    """,
    doc="Friedman test across the five event types with USERS as "
    "blocks (complete blocks only — users exhibiting all five types): "
    "does any type's per-user mean value rank consistently higher? "
    "The repeated-measures companion to events_kruskal_wallis — "
    "blocking by user removes between-user level differences KW "
    "conflates. Within each block, mean comparisons are exact integer "
    "cross-multiplications (sum_a*cnt_b vs sum_b*cnt_a — no division) "
    "and tie-averaged ranks are carried doubled; the chi-square and "
    "Kendall's W (inter-block agreement) do the only float ops over a "
    "fixed named-column chain (stats.py::friedman). Two shuffles: the "
    "(user,type) rollup and the k^2-per-user comparison join.",
)
def events_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.friedman(ev, "user_id", "event_type", "value", _KW_TYPES)


# --- Partition-pruned event-time twin (round 5) -----------------------------
#
# events_hourly_stats scans the WHOLE events table even for a bounded
# date range; this twin runs the identical aggregation over the
# date-partitioned ingest layout (sources/events_layout.py) with a
# one-week predicate, so the scan lists only the 7 matching
# event_date=... directories — PartitionFilters pruning, pinned by
# tests/test_plan_shapes.py. Shares the hourly-stats oracle shape with
# the date bound applied to ts (the partition column is derived from
# ts, so the two predicates are equivalent).

PRUNE_DATE_LO = "2024-01-08"
PRUNE_DATE_HI = "2024-01-14"


@query(
    "events_hourly_stats_pruned",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{PRUNE_DATE_LO}' AND DATE '{PRUNE_DATE_HI}'
        GROUP BY 1, 2
    """,
    doc="events_hourly_stats over ONE WEEK of a date-partitioned ingest "
    "layout (sources/events_layout.py): the event_date predicate becomes "
    "directory-level partition pruning — Spark lists only the 7 matching "
    "event_date= partitions; files outside the range are never opened "
    "(PartitionFilters, pinned in tests/test_plan_shapes.py). The "
    "100 TB shape: bounded-date queries over years of history scan "
    "days, not the archive. Oracle = the hourly-stats aggregation with "
    "the equivalent ts-date bound (event_date is derived from ts).",
)
def events_hourly_stats_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DateType, StructField, StructType

    from minispark_spark.sources.events_layout import ensure_events_partitioned

    path = ensure_events_partitioned(spark, sf_dir)
    # Explicit schema: an EMPTY events table writes a partitioned dir
    # with zero partition directories, where schema inference fails —
    # the schema is known (source columns + the event_date partition
    # column), so declare it and the empty layout reads as an empty
    # frame.
    # StructType.add MUTATES the DataFrame's cached schema object (two
    # layout entries in one session would stack duplicate event_date
    # columns — caught by the empty-corpus sweep); build a fresh one.
    schema = StructType(
        list(load_table(spark, sf_dir, "events").schema.fields)
        + [StructField("event_date", DateType())]
    )
    ev = spark.read.schema(schema).parquet(path).filter(
        F.col("event_date").between(PRUNE_DATE_LO, PRUNE_DATE_HI)
    )
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "events_campaign_dpp_rollup",
    oracle="""
        WITH labeled AS (
            SELECT CASE WHEN day(CAST(ts AS DATE)) IN (5, 6) THEN 'launch'
                        WHEN day(CAST(ts AS DATE)) IN (12, 13) THEN 'promo'
                        WHEN day(CAST(ts AS DATE)) IN (26, 27) THEN 'retarget'
                        ELSE 'off' END AS campaign,
                   event_type, user_id, value
            FROM events
        )
        SELECT campaign, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        FROM labeled
        WHERE campaign <> 'off'
        GROUP BY 1, 2
    """,
    doc="DYNAMIC partition pruning (the third scan-elision mechanism, "
    "after static PartitionFilters and Z-order row-group skipping): "
    "the date-partitioned events fact joins a FILE-BACKED campaign "
    "calendar dimension filtered to campaign days — the partition "
    "filter is only known at RUNTIME from the dim-side scan, so "
    "Catalyst plans dynamicpruningexpression(event_date IN "
    "dynamicpruning#N) on the fact scan (pinned in "
    "tests/test_plan_shapes.py) and lists only the ~6 matching "
    "event_date= directories after the broadcast completes. The "
    "100 TB shape: 'scan only holiday traffic' style queries prune "
    "via the dimension join without any literal date in the query. "
    "The calendar derives from the events table's own dates "
    "(sources/events_layout.py::ensure_campaign_calendar) so testdata "
    "regeneration cannot desynchronize it; it must be parquet-backed "
    "— a LocalRelation dim side plans NO pruning subquery (probed). "
    "Oracle = the equivalent row-local day-of-month CASE filter "
    "(joining the distinct-dates calendar back to facts is exactly "
    "that predicate).",
)
def events_campaign_dpp_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DateType, StructField, StructType

    from minispark_spark.sources.events_layout import (
        ensure_campaign_calendar,
        ensure_events_partitioned,
    )

    fact_path = ensure_events_partitioned(spark, sf_dir)
    cal_path = ensure_campaign_calendar(spark, sf_dir)
    # StructType.add MUTATES the DataFrame's cached schema object (two
    # layout entries in one session would stack duplicate event_date
    # columns — caught by the empty-corpus sweep); build a fresh one.
    schema = StructType(
        list(load_table(spark, sf_dir, "events").schema.fields)
        + [StructField("event_date", DateType())]
    )
    ev = spark.read.schema(schema).parquet(fact_path)
    cal = spark.read.parquet(cal_path).filter(F.col("campaign") != "off")
    return (
        ev.join(F.broadcast(cal), "event_date")
        .groupBy("campaign", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
    )

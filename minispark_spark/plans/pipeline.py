"""Training-data pipeline lifecycle queries.

Beyond-reference extension operators (build brief): the bookkeeping
half of a large-scale training-data pipeline — deterministic dataset
splits, change-data compaction (latest-wins upsert), SCD2 validity
intervals, one-pass data-quality profiling, and bigram language-model
statistics. Each is a single declarative plan (one shuffle where a
shuffle is semantically required, none otherwise) with an exact DuckDB
oracle.

No reference analogue (the reference has no pipeline surface at all,
SURVEY §2.4 absent-list); these follow the same registry contract as
plans/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import hashing, text
from minispark_spark.operators import ranking
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_CASE_SQL = """
    CASE WHEN {b} < 96 THEN 'train' WHEN {b} < 98 THEN 'val' ELSE 'test' END
"""


@query(
    "docs_train_split",
    oracle=f"""
        WITH bucketed AS (
            SELECT n_chars,
                   {hashing.poly_hash_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
            FROM documents
        )
        SELECT {_SPLIT_CASE_SQL.format(b="bucket")} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        FROM bucketed
        GROUP BY 1
    """,
    doc="Deterministic 96/2/2 train/val/test split: bucket = "
    "poly_hash(doc_id) % 100 (cross-engine exact, hashing.py). "
    "Hash-based assignment is the standard reproducible-split primitive: "
    "stable under re-runs, shards, and late-arriving data — unlike "
    "rand()-based sampling. One shuffle (the 3-group aggregate); the "
    "hash itself is a JVM-side fold, embarrassingly parallel at 100 TB.",
)
def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hashing.poly_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 96, F.lit("train")).when(bucket < 98, F.lit("val")).otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars_total"))
    )


# ---------------------------------------------------------------------------
# Latest-wins compaction (CDC upsert without a table format)
# ---------------------------------------------------------------------------


@query(
    "events_latest_per_user",
    oracle="""
        SELECT user_id, event_type, ts AS last_ts, value AS last_value,
               event_id AS last_event_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="Latest-wins compaction: newest event per (user, type), "
    "tie-broken by event_id so the result is deterministic. This is the "
    "MERGE/upsert primitive when no transactional table format is "
    "available: union snapshot + changelog, keep rn=1. One shuffle on "
    "the key; at 100 TB pre-bucketing the snapshot on user_id makes the "
    "recompaction exchange-free (sources/bucketing.py).",
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
            F.col("event_id").alias("last_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 validity intervals
# ---------------------------------------------------------------------------


@query(
    "events_scd2_intervals",
    oracle="""
        SELECT user_id, event_id, value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL) AS is_current
        FROM events
        WHERE event_type = 'purchase'
    """,
    doc="SCD Type-2 dimension build: each purchase event becomes a "
    "validity interval [ts, next ts) per user; the open interval is the "
    "current row. Pure window-lead — one shuffle on user_id, and the "
    "event_type filter is pushed into the parquet scan "
    "(test_plan_shapes pins pushdown for this family).",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


# ---------------------------------------------------------------------------
# One-pass data-quality profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _profile_col_sql(c: str) -> str:
    return f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_value,
               CAST(MAX({c}) AS DOUBLE) AS max_value
        FROM lineitem
    """


@query(
    "lineitem_profile",
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
    doc="Data-quality profile of the lineitem measures — row count, null "
    "count, distinct count, min/max per column — computed in ONE scan "
    "(a single wide aggregate, pivoted to long form driver-free with "
    "explode). The pre-ingest validation step of a training pipeline. "
    "The multi-column COUNT(DISTINCT) uses Catalyst's expand (4x row "
    "amplification pre-shuffle); at 100 TB swap n_distinct to "
    "approx_count_distinct to keep the expand out of the plan.",
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            F.min(c).cast("double").alias(f"{c}_min"),
            F.max(c).cast("double").alias(f"{c}_max"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}_nulls").alias("n_nulls"),
                F.col(f"{c}_distinct").alias("n_distinct"),
                F.col(f"{c}_min").alias("min_value"),
                F.col(f"{c}_max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# Bigram language-model statistics
# ---------------------------------------------------------------------------


@query(
    "docs_bigram_stats",
    oracle=f"""
        WITH toks AS (
            SELECT {text.tokens_sql("text")} AS t FROM documents
        ), big AS (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
        ), counted AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram
            FROM big GROUP BY w1, w2
        )
        SELECT w1, w2, n_bigram,
               CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_w1,
               CAST(n_bigram AS DOUBLE)
                   / CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS DOUBLE)
                   AS p_cond
        FROM counted
        WHERE n_bigram >= 3
    """,
    doc="Bigram LM statistics: count(w1,w2), count(w1*), and the "
    "conditional probability P(w2|w1) — the n-gram model / tokenizer-"
    "merge-scoring primitive over a corpus. Bigrams come from "
    "posexplode + window-lead (same shape as dedup's shingler: one "
    "shuffle on doc_id, all JVM-side); counting shuffles on (w1, w2) "
    "with map-side partial_count (pinned in test_plan_shapes), so the "
    "Zipf-head bigrams compress before the exchange; the per-w1 "
    "normalization window is a third, much smaller exchange over the "
    "already-aggregated rows. "
    "Division is a single IEEE op on exact integers, so bits match the "
    "oracle. The n_bigram >= 3 floor is applied before the window so "
    "rare-tail skew never reaches the normalization stage.",
)
def docs_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.posexplode(text.tokens(F.col("text"))).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        ex.select(F.col("w").alias("w1"), F.lead("w").over(wdoc).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    counted = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bigram"))
        .filter(F.col("n_bigram") >= 3)
    )
    ww1 = Window.partitionBy("w1")
    n_w1 = F.sum("n_bigram").over(ww1)
    return counted.select(
        "w1",
        "w2",
        "n_bigram",
        n_w1.alias("n_w1"),
        (F.col("n_bigram").cast("double") / n_w1.cast("double")).alias("p_cond"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@query(
    "customers_rfm_segments",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(MAX(o_orderdate) AS DATE) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS monetary
            FROM orders GROUP BY o_custkey
        ), ref AS (
            SELECT CAST(MAX(o_orderdate) AS DATE) AS ref_date FROM orders
        ), scored AS (
            SELECT o_custkey,
                   CAST(date_diff('day', last_order, ref_date) AS INTEGER)
                       AS recency_days,
                   n_orders, monetary
            FROM cust, ref
        )
        SELECT o_custkey, recency_days, n_orders, monetary,
               CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS INTEGER)
                   AS r_quartile,
               CAST(ntile(4) OVER (ORDER BY n_orders, o_custkey) AS INTEGER)
                   AS f_quartile,
               CAST(ntile(4) OVER (ORDER BY monetary, o_custkey) AS INTEGER)
                   AS m_quartile
        FROM scored
    """,
    doc="RFM segmentation: per-customer recency (days since last order, "
    "vs the corpus max date), frequency (order count), monetary (exact "
    "decimal-summed spend), each cut into quartiles. The reference date "
    "comes from a two-stage global MAX broadcast-cross-joined onto the "
    "per-customer aggregate (never a driver collect). Quartiles are "
    "EXACT ntile(4) semantics (ties broken by o_custkey, matching the "
    "oracle's window bit-for-bit) but computed via distributed ranking "
    "(operators/ranking.py): quantile cut-point buckets + bounded "
    "per-bucket count collect + partition-local row_number — no "
    "Exchange SinglePartition, no global sort, scales to 1.5 B "
    "customers unchanged. Pinned by test_plan_shapes.py::"
    "test_rfm_has_no_global_sort.",
)
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    ref = orders.agg(F.max(F.to_date("o_orderdate")).alias("ref_date"))
    scored = cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_date", "last_order").alias("recency_days"),
        "n_orders",
        "monetary",
    )
    dims = ["recency_days", "n_orders", "monetary"]
    # Cache the per-customer aggregate: the quantile pass, the joint
    # histogram collect, and the final plan would otherwise each re-run
    # the orders groupBy — 3 scans of the raw table instead of 1 (the
    # cached frame is one row per customer, far smaller than orders).
    scored = scored.cache()
    cuts = ranking.quantile_cuts(scored, dims)
    bucketed = scored
    for dim, bcol in zip(dims, ("_rb", "_fb", "_mb")):
        bucketed = bucketed.withColumn(bcol, ranking.bucket_expr(dim, cuts[dim]))
    # ONE bounded collect covers all three dimensions: the joint bucket
    # histogram has ≤ n_buckets^3 rows (≤ 32k) regardless of data size;
    # marginalize driver-side.
    joint = bucketed.groupBy("_rb", "_fb", "_mb").count().collect()
    marginals: dict[str, dict[int, int]] = {"_rb": {}, "_fb": {}, "_mb": {}}
    for row in joint:
        for bcol in marginals:
            marginals[bcol][row[bcol]] = marginals[bcol].get(row[bcol], 0) + row["count"]
    out = bucketed
    for dim, bcol, qcol in (
        ("recency_days", "_rb", "r_quartile"),
        ("n_orders", "_fb", "f_quartile"),
        ("monetary", "_mb", "m_quartile"),
    ):
        out = ranking.ntile_over_buckets(
            out, 4, dim, ["o_custkey"], bcol, marginals[bcol], qcol
        )
    return out.select(
        "o_custkey", "recency_days", "n_orders", "monetary",
        "r_quartile", "f_quartile", "m_quartile",
    )


# ---------------------------------------------------------------------------
# Deterministic quality-weighted sampling
# ---------------------------------------------------------------------------


@query(
    "docs_weighted_sample",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   {hashing.poly_hash_sql("CAST(doc_id AS VARCHAR)")} % 10000 AS draw,
                   {text.quality_score_sql("text")} AS quality
            FROM documents
        )
        SELECT doc_id, quality, CAST(draw AS BIGINT) AS draw
        FROM scored
        WHERE CAST(draw AS DOUBLE) < quality * 10000.0
    """,
    doc="Quality-weighted importance sampling: keep each document with "
    "probability equal to its quality score, using poly_hash(doc_id) % "
    "10000 as the uniform variate — deterministic and reproducible "
    "(re-runs, shards, and incremental batches agree), unlike rand(). "
    "The standard corpus up/down-sampling primitive before training. "
    "Shuffle-free: a pure per-row filter, embarrassingly parallel at "
    "100 TB; the same draw column with a different threshold column "
    "gives temperature-style source re-weighting.",
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    draw = hashing.poly_hash(F.col("doc_id").cast("string")) % 10000
    quality = text.quality_score(F.col("text"))
    return (
        docs.select(
            "doc_id",
            quality.alias("quality"),
            draw.alias("draw"),
        )
        .filter(F.col("draw").cast("double") < F.col("quality") * 10000.0)
    )


# ---------------------------------------------------------------------------
# OLS linear fit from exact sufficient statistics
# ---------------------------------------------------------------------------

_LINFIT_ORACLE = """
    WITH obs AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(28,8)) * 100000000 AS BIGINT) AS ys
        FROM events
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(ys) AS BIGINT) AS sy,
               CAST(SUM(x * ys) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM obs GROUP BY event_type
    )
    SELECT event_type, n,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) / 100000000.0
               AS slope,
           (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100000000.0
             - (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) / 100000000.0)
               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               AS intercept
    FROM stats
"""


@query(
    "stats_linear_fit",
    oracle=_LINFIT_ORACLE,
    doc="Per-event-type OLS regression of value against hour-of-day, "
    "computed from sufficient statistics: the five sums (n, Sx, Sy, "
    "Sxy, Sxx) are EXACT integers (value quantized to a 1e-8 grid via "
    "decimal, like every money aggregate here), accumulated in one "
    "partial+final aggregate — order-insensitive by construction. The "
    "slope/intercept formulas then run on those exact integers with an "
    "identical IEEE expression tree in both engines, so results match "
    "bit-for-bit. This map-side-combinable sufficient-statistics shape "
    "is THE distributed pattern for fitting anything linear at 100 TB "
    "(one shuffle of five longs per group, regardless of row count).",
)
def stats_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("long")
    ys = (F.col("value").cast("decimal(28,8)") * 100000000).cast("long")
    stats = (
        events.select("event_type", x.alias("x"), ys.alias("ys"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("ys").alias("sy"),
            F.sum(F.col("x") * F.col("ys")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    # nullif: zero x-spread (all observations in one hour) has an
    # undefined slope (NULL), not a divide-by-zero crash.
    slope = (
        (nd * sxyd - sxd * syd) / F.nullif(nd * sxxd - sxd * sxd, F.lit(0.0))
    ) / 100000000.0
    intercept = (syd / nd) / 100000000.0 - slope * (sxd / nd)
    return stats.select(
        "event_type", "n", slope.alias("slope"), intercept.alias("intercept")
    )


# ---------------------------------------------------------------------------
# Distributed gradient descent (the iterative-optimizer pattern)
# ---------------------------------------------------------------------------

_GD_ITERS = 3
_GD_K = 1024  # lr = 1 / (n * K); stable while avg(x^2) < 2K (see doc)


def gd_linear_fit_frame(
    data: DataFrame, iters: int = _GD_ITERS, k: int = _GD_K
) -> DataFrame:
    """Fit y ~ w0 + w1*x by batch gradient descent on an (x, y) BIGINT
    frame — the broadcast-weights / map-side-partial-gradient pattern.

    All-integer fixed point: weights are BIGINTs, the update is
    ``w -= g DIV (n*k)`` (truncated division — Spark ``DIV`` and
    DuckDB ``//`` both truncate toward zero, verified incl. negatives),
    so every iterate is exact and cross-engine bit-identical. Each
    iteration is ONE map-side-combined partial aggregate (three longs)
    plus a 1-row broadcast — per-iteration shuffle volume is constant
    in the row count, the same scale shape as PageRank's rank
    broadcast. Gradient sums are BIGINT (safe to ~1e18; at 1e11-row
    corpora widen to DECIMAL(38,0), the DSIR note). SSE tracking sums
    DECIMAL(38,0) squares exactly; the emitted sse_* columns are the
    exact sums DIV 2^20 as BIGINT — never doubles, whose rounding
    above 2^53 differs between engines (the sf0.1 1-ulp finding).
    """
    spark = data.sparkSession

    def resid(w0: int | None, w1: int | None):
        return (
            F.lit(w0).cast("long") + F.lit(w1).cast("long") * F.col("x") - F.col("y")
        )

    def sse(w0: int, w1: int, name: str) -> DataFrame:
        r = resid(w0, w1)
        sq = r.cast("decimal(19,0)") * r.cast("decimal(19,0)")
        return data.agg(F.sum(sq).alias(name))

    # Each iterate is collected as two Python ints and re-lifted as
    # literals, so the logical plan stays CONSTANT per iteration (one
    # map-side-combined partial agg over `data`) instead of doubling —
    # the iterate frame was previously cross-joined into itself twice
    # per step, growing analysis/codegen cost ~2^iters and relying on
    # Spark's broadcast-exchange reuse to cap runtime. Collecting a
    # 1-row frame per round is the same driver-side pattern as the
    # converged-PageRank rank broadcast; arithmetic stays all-integer
    # so the collected iterate is exact and cross-engine bit-identical.
    w0, w1 = 0, 0
    for _ in range(iters):
        g = (
            data.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(resid(w0, w1)).alias("g0"),
                F.sum(F.col("x") * resid(w0, w1)).alias("g1"),
            )
            .select(
                (
                    F.lit(w0).cast("long")
                    - F.expr(f"g0 DIV NULLIF(n * {k}, 0)")
                ).alias("w0"),
                (
                    F.lit(w1).cast("long")
                    - F.expr(f"g1 DIV NULLIF(n * {k}, 0)")
                ).alias("w1"),
            )
            .collect()[0]
        )
        w0, w1 = g["w0"], g["w1"]
        if w0 is None or w1 is None:
            # Empty input: gradient sums are NULL and the iterate is
            # NULL-absorbing — further rounds can't change it.
            w0 = w1 = None
            break
    wf = spark.range(1).select(
        F.lit(w0).cast("long").alias("w0"), F.lit(w1).cast("long").alias("w1")
    )
    nf = data.agg(F.count(F.lit(1)).alias("n"))
    # SSE columns are emitted as EXACT integers scaled into int64 range
    # (DIV 2^20, ~"mega-squared-cents"): the exact sum (~2.2e19 at
    # sf0.1) exceeds 2^53, and integer->double conversion above that is
    # rounded DIFFERENTLY by the two engines (found at sf0.1: a 1-ulp
    # sse_start mismatch was the full gate's only red row). improved
    # still compares the UNSCALED exact sums.
    return (
        wf.crossJoin(F.broadcast(nf))
        .crossJoin(F.broadcast(sse(0, 0, "s_start")))
        .crossJoin(F.broadcast(sse(w0, w1, "s_end")))
        .select(
            "w0",
            "w1",
            "n",
            F.expr("CAST(s_start DIV 1048576 AS BIGINT)").alias("sse_start"),
            F.expr("CAST(s_end DIV 1048576 AS BIGINT)").alias("sse_end"),
            (F.col("s_end") < F.col("s_start")).alias("improved"),
        )
    )


def _gd_oracle() -> str:
    cents_y = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    ctes = [
        "data AS MATERIALIZED (SELECT CAST(l_quantity AS BIGINT) AS x, "
        f"{cents_y} AS y FROM lineitem)",
        "w0s AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1)",
    ]
    prev = "w0s"
    for i in range(1, _GD_ITERS + 1):
        # MATERIALIZED is load-bearing: each level is referenced twice
        # (gradient + carry) — inlining would expand 2^iters scans.
        ctes.append(
            f"g{i}s AS MATERIALIZED (SELECT COUNT(*) AS n, "
            "SUM(w0 + w1*x - y) AS g0, SUM(x*(w0 + w1*x - y)) AS g1 "
            f"FROM data CROSS JOIN {prev})"
        )
        ctes.append(
            f"w{i}s AS MATERIALIZED (SELECT "
            f"CAST(w.w0 - g.g0 // NULLIF(g.n * {_GD_K}, 0) AS BIGINT) AS w0, "
            f"CAST(w.w1 - g.g1 // NULLIF(g.n * {_GD_K}, 0) AS BIGINT) AS w1 "
            f"FROM g{i}s g CROSS JOIN {prev} w)"
        )
        prev = f"w{i}s"
    sse = (
        "SELECT SUM(CAST(w0 + w1*x - y AS HUGEINT) * (w0 + w1*x - y)) "
        "AS {name} FROM data CROSS JOIN {wf}"
    )
    ctes.append("sse0 AS (" + sse.format(name="s_start", wf="w0s") + ")")
    ctes.append("sse_f AS (" + sse.format(name="s_end", wf=prev) + ")")
    ctes.append("nf AS (SELECT COUNT(*) AS n FROM data)")
    # Exact scaled-BIGINT SSE (see gd_linear_fit_frame: hugeint->double
    # rounding above 2^53 is engine-dependent); improved compares the
    # unscaled hugeints.
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT w.w0, w.w1, nf.n,
               CAST(s0.s_start // 1048576 AS BIGINT) AS sse_start,
               CAST(sf.s_end // 1048576 AS BIGINT) AS sse_end,
               sf.s_end < s0.s_start AS improved
        FROM {prev} w CROSS JOIN nf CROSS JOIN sse0 s0 CROSS JOIN sse_f sf
    """
    )


@query(
    "stats_gd_linear_fit",
    oracle=_gd_oracle(),
    doc=f"Distributed batch GRADIENT DESCENT ({_GD_ITERS} iterations) "
    "fitting extendedprice-cents against quantity on lineitem — the "
    "iterative-optimizer pattern that complements stats_linear_fit's "
    "closed form: per iteration ONE map-side-combined partial "
    "aggregate (n, g0, g1 — three longs) and a 1-row broadcast weight "
    "frame, so shuffle volume per step is constant in the corpus size "
    "(the PageRank broadcast shape, applied to model fitting). "
    f"All-integer fixed point: update w -= g DIV (n*{_GD_K}) uses "
    "truncated division, identical in Spark (DIV) and DuckDB (//) "
    "including negatives, so every iterate is bit-exact; the oracle "
    "is the materialized-per-level unrolled CTE chain (the CC-oracle "
    f"lesson). lr = 1/(n*{_GD_K}) is stable while avg(x^2) < "
    f"{2 * _GD_K} (lineitem's avg(quantity^2) is ~855, contraction "
    "factor ~0.17/step along the slope); the output carries "
    "(sse_start, sse_end, improved) so the gate also checks descent, "
    "not just parity. tests/test_gd.py pins convergence toward the "
    "closed-form slope on a hand corpus.",
)
def stats_gd_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.functions import money

    li = load_table(spark, sf_dir, "lineitem")
    data = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        money.cents("l_extendedprice").alias("y"),
    )
    return gd_linear_fit_frame(data)


# ---------------------------------------------------------------------------
# End-to-end corpus curation (composed pipeline)
# ---------------------------------------------------------------------------

_CURATION_MIN_QUALITY = 0.5


@query(
    "docs_corpus_curation",
    oracle=f"""
        WITH train AS (
            SELECT doc_id, source, text FROM documents WHERE source <> 'src0'
        ),
        q AS (
            SELECT doc_id, source, text,
                   {text.quality_score_sql("text")} AS quality
            FROM train
            WHERE {text.quality_score_sql("text")} >= {_CURATION_MIN_QUALITY}
        ),
        fp AS (
            SELECT doc_id, source, text, quality,
                   {hashing.poly_hash_sql("text")} AS fp
            FROM q
        ),
        keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
        dedup AS (
            SELECT f.* FROM fp f JOIN keep k
            ON f.fp = k.fp AND f.doc_id = k.doc_id
        ),
        ev AS (
            SELECT DISTINCT unnest({hashing.shingle_hashes_sql("text", 8)}) AS sh
            FROM documents WHERE source = 'src0'
        ),
        contam AS (
            SELECT DISTINCT d.doc_id
            FROM (SELECT doc_id,
                         unnest({hashing.shingle_hashes_sql("text", 8)}) AS sh
                  FROM dedup) d
            JOIN ev ON ev.sh = d.sh
        ),
        clean AS (
            SELECT * FROM dedup
            WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM({text.token_count_sql("text")}) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
                   AS avg_quality
        FROM clean GROUP BY source
    """,
    doc="The whole curation pass a training-data pipeline runs before "
    "tokenization, composed as ONE declarative plan: quality filter "
    "(heuristic score >= 0.5, pushed to the scan) -> exact dedup (keep "
    "the min doc_id per content fingerprint: one shuffle on the 8-byte "
    "hash, join-back co-partitioned on the same key so Catalyst reuses "
    "the exchange) -> eval-set decontamination (hashed 8-gram shingles; "
    "the eval side is small by construction and broadcast, the corpus "
    "side probes map-side with zero extra shuffle; left_anti drops "
    "contaminated docs) -> per-source corpus stats. Every stage is the "
    "already-oracled primitive (text_stats / dedup_exact / "
    "docs_decontaminate) chained end-to-end; at 100 TB the plan's only "
    "wide ops are the fingerprint groupBy+join (one exchange) and the "
    "final tiny agg. Decimal-summed quality keeps the average bit-exact "
    "cross-engine.",
)
def docs_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.plans.text import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    quality = text.quality_score(F.col("text"))
    q = train.withColumn("quality", quality).filter(
        F.col("quality") >= _CURATION_MIN_QUALITY
    )
    fp = q.withColumn("fp", hashing.poly_hash(F.col("text")))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = fp.join(keep, ["fp", "doc_id"])
    ev = (
        _doc_shingles(spark, docs.filter(F.col("source") == "src0"))
        .select("sh")
        .distinct()
    )
    # Shingle the quality-filtered docs (q), NOT the deduped frame: the
    # contaminated id set is only ever intersected with deduped by the
    # anti-join below, so probing the superset q yields the identical
    # result while cutting the second execution of the whole
    # fp-groupBy+join dedup subtree out of this branch (guide §1.2 —
    # don't compute things you throw away; dups are a small minority of
    # q, so the extra shingled docs cost far less than the dedup
    # pipeline they replace).
    contaminated = (
        _doc_shingles(spark, q.select("doc_id", "text"))
        .join(F.broadcast(ev), "sh")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).cast("long").alias("total_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Temperature-style source mixture sampling
# ---------------------------------------------------------------------------

_MIX_C = 300.0  # rate_s = min(1, C / sqrt(source_tokens)); literal constant
_MIX_MOD = 1_000_000


@query(
    "docs_temperature_mixture",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST({text.token_count_sql("text")} AS BIGINT) AS n_tok,
                   {hashing.poly_hash_sql("CAST(doc_id AS VARCHAR)")} % {_MIX_MOD}
                       AS draw
            FROM documents
        ),
        src AS (
            SELECT source, SUM(n_tok) AS src_tokens FROM toks GROUP BY source
        ),
        rated AS (
            SELECT source, src_tokens,
                   LEAST(1.0, {_MIX_C} / sqrt(CAST(src_tokens AS DOUBLE))) AS rate
            FROM src
        )
        SELECT t.source,
               CAST(r.src_tokens AS BIGINT) AS src_tokens,
               r.rate,
               CAST(COUNT(CASE WHEN CAST(t.draw AS DOUBLE) < r.rate * {_MIX_MOD}.0
                          THEN 1 END) AS BIGINT) AS n_selected,
               CAST(COALESCE(SUM(CASE WHEN CAST(t.draw AS DOUBLE) < r.rate * {_MIX_MOD}.0
                          THEN t.n_tok END), 0) AS BIGINT) AS selected_tokens
        FROM toks t JOIN rated r USING (source)
        GROUP BY 1, 2, 3
    """,
    doc="Temperature-style source mixing: each source is down-sampled at "
    "rate min(1, C/sqrt(source_tokens)) — big sources shrink toward "
    "sqrt scaling (temperature 0.5), small sources pass through — the "
    "standard data-recipe primitive for balancing a crawl-dominated "
    "corpus before training. Selection reuses the deterministic "
    "poly_hash(doc_id) draw (reproducible across re-runs, shards, and "
    "incremental batches), and the per-source rate is a pure function "
    "of that source's exact integer token count, so both engines "
    "compute identical rates (no cross-source float normalizer whose "
    "summation order could flip a boundary). Plan: one token-count "
    "scan, one small source aggregate broadcast back, one pure filter "
    "— two shuffles total at any scale.",
)
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        text.token_count(F.col("text")).cast("long").alias("n_tok"),
        (hashing.poly_hash(F.col("doc_id").cast("string")) % _MIX_MOD).alias("draw"),
    )
    src = toks.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    rated = src.select(
        "source",
        "src_tokens",
        F.least(
            F.lit(1.0), F.lit(_MIX_C) / F.sqrt(F.col("src_tokens").cast("double"))
        ).alias("rate"),
    )
    picked = F.col("draw").cast("double") < F.col("rate") * F.lit(float(_MIX_MOD))
    return (
        toks.join(F.broadcast(rated), "source")
        .groupBy("source", "src_tokens", "rate")
        .agg(
            F.count(F.when(picked, 1)).alias("n_selected"),
            F.coalesce(F.sum(F.when(picked, F.col("n_tok"))), F.lit(0))
            .cast("long")
            .alias("selected_tokens"),
        )
        .select("source",
                F.col("src_tokens").cast("long").alias("src_tokens"),
                "rate", "n_selected", "selected_tokens")
    )


def _scd2_build(rows: DataFrame) -> DataFrame:
    """(user_id, event_id, value, ts) -> SCD2 validity intervals."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return rows.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply(history: DataFrame, batch: DataFrame) -> DataFrame:
    """Incrementally MERGE a new change batch into existing SCD2
    history: keys untouched by the batch pass through verbatim
    (anti-join — their files are never rewritten in a partitioned
    table); for affected keys the intervals are rebuilt from their
    existing rows plus the batch (correct even for out-of-order /
    backfill arrivals, which may splice into the MIDDLE of an
    existing key's history). Cost scales with the affected keys'
    history, not the table. The exactness contract: apply(build(A), B)
    must be row-identical to build(A ∪ B) — pinned by the
    events_scd2_apply oracle being the full-rebuild SQL."""
    affected = batch.select("user_id").distinct()
    untouched = history.join(affected, "user_id", "left_anti")
    affected_rows = (
        history.join(affected, "user_id", "left_semi")
        .select("user_id", "event_id", "value", F.col("valid_from").alias("ts"))
        .unionByName(batch.select("user_id", "event_id", "value", "ts"))
        # replay idempotence: a redelivered batch's rows already sit in
        # the history; change rows are immutable, so dropping duplicate
        # event_ids makes apply(apply(H, B), B) == apply(H, B)
        .dropDuplicates(["user_id", "event_id"])
    )
    return untouched.unionByName(_scd2_build(affected_rows))


@query(
    "events_scd2_apply",
    oracle="""
        SELECT user_id, event_id, value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL) AS is_current
        FROM events
        WHERE event_type = 'purchase'
    """,
    doc="Incremental SCD2 MERGE: build history from half the purchase "
    "stream (even event_ids), then scd2_apply the other half — "
    "including implicit BACKFILL rows that land mid-history for a "
    "user. Untouched keys pass through by anti-join; affected keys "
    "rebuild from existing rows + batch. The oracle is the FULL "
    "rebuild over all purchases: incremental apply must equal batch "
    "rebuild row-for-row, the materialized-view-maintenance "
    "correctness contract.",
)
def events_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", "ts"
    )
    history = _scd2_build(purchases.filter(F.col("event_id") % 2 == 0))
    batch = purchases.filter(F.col("event_id") % 2 == 1)
    return scd2_apply(history, batch)


@query(
    "customers_survival_km",
    oracle="""
        WITH r AS (
            SELECT o_custkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        ),
        mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
        durs AS (
            SELECT f.o_custkey,
                   CAST(floor(date_diff('day', f.o_orderdate,
                        COALESCE(s.o_orderdate, mx.mxd)) / 7.0) AS BIGINT) AS w,
                   CASE WHEN s.o_custkey IS NULL THEN 0 ELSE 1 END AS ev
            FROM r f
            LEFT JOIN r s ON s.o_custkey = f.o_custkey AND s.rn = 2
            CROSS JOIN mx
            WHERE f.rn = 1
        ),
        wk AS (
            SELECT w, SUM(ev) AS d, SUM(1 - ev) AS c FROM durs GROUP BY w
        ),
        tot AS (SELECT SUM(d + c) AS n FROM wk),
        risk AS (
            SELECT w, d, c,
                   tot.n - COALESCE(SUM(d + c) OVER (ORDER BY w
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_risk
            FROM wk CROSS JOIN tot
        ),
        fac AS (
            SELECT w, d, c, n_risk,
                   CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
            FROM risk
        )
        SELECT a.w AS week,
               CAST(a.n_risk AS BIGINT) AS n_risk,
               CAST(a.d AS BIGINT) AS d_events,
               CAST(a.c AS BIGINT) AS c_censored,
               list_reduce(list_prepend(1.0::DOUBLE, list(b.f ORDER BY b.w)),
                           (acc, x) -> acc * x) AS survival
        FROM fac a JOIN fac b ON b.w <= a.w
        GROUP BY a.w, a.n_risk, a.d, a.c
    """,
    doc="Kaplan-Meier survival curve for customer repeat purchase: per "
    "customer, weeks from first to second order (right-censored at the "
    "table's max date for one-time buyers), then the product-limit "
    "estimator S(t) = prod (1 - d_i/n_i) over the WEEK-compressed "
    "duration domain. Risk sets and event counts are exact integers "
    "from one cumulative window over the bounded week frame; each "
    "factor is one IEEE division and the survival chain is a "
    "deterministic left-to-right float fold — numpy cumprod over ONE "
    "bounded group on the Spark side, list_reduce replay per week in "
    "the oracle (the events_user_ema technique). The heavy part (first/"
    "second order per customer) is one shuffle on custkey.",
)
def customers_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    )
    firsts = r.filter(F.col("rn") == 1).select(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d0")
    )
    seconds = r.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("d1")
    )
    mx = F.broadcast(orders.agg(F.max("o_orderdate").alias("mxd")))
    durs = (
        firsts.join(seconds, firsts.ck == seconds.ck2, "left")
        .crossJoin(mx)
        .select(
            F.floor(
                F.datediff(F.coalesce(F.col("d1"), F.col("mxd")), F.col("d0")) / 7
            )
            .cast("long")
            .alias("w"),
            F.when(F.col("ck2").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    wk = durs.groupBy("w").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    tot = F.broadcast(wk.agg(F.sum(F.col("d") + F.col("c")).alias("n")))
    cw = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, -1)
    risk = wk.crossJoin(tot).select(
        "w",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(cw), F.lit(0))
        ).alias("n_risk"),
    )
    fac = risk.select(
        "w",
        "d",
        "c",
        "n_risk",
        (
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ).alias("f"),
    )

    def cumprod(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("w").reset_index(drop=True)
        # Sequential prefix products == the oracle's left-to-right
        # list_reduce fold, bit-for-bit (numpy cumprod is sequential).
        pdf["survival"] = np.cumprod(pdf["f"].to_numpy())
        return pdf[["w", "n_risk", "d", "c", "survival"]]

    out = fac.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(
        cumprod, schema="w long, n_risk long, d long, c long, survival double"
    )
    return out.select(
        F.col("w").alias("week"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("d_events"),
        F.col("c").cast("bigint").alias("c_censored"),
        "survival",
    )

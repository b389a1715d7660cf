"""Data-quality constraint auditing + exact quantiles + snapshot diff.

Pipeline-governance primitives beyond the reference surface (the
reference has no quality/validation layer — SURVEY.md §2.4 absent
list). Modeled on the public Deequ/Great-Expectations contract: a
declarative set of constraints evaluated in ONE scan, each emitting
(check, violations, total, passed).

Determinism: every metric is integer-count arithmetic; `passed` is an
integer comparison. The exact-quantile query returns actual data
values (never interpolated), reproduced in the oracle by an explicit
row_number() rank.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.operators.selection import exact_quantiles_frame
from minispark_spark.registry import query
from minispark_spark.sources.tables import fan_out, load_table


@query(
    "lineitem_quality_audit",
    oracle="""
        WITH m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS null_flag,
                   CAST(COUNT(*) - COUNT(DISTINCT ROW(l_orderkey, l_linenumber)) AS BIGINT) AS dup_key,
                   CAST(COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_qty,
                   CAST(COALESCE(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS neg_price,
                   CAST(COALESCE(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                                   OR l_linestatus NOT IN ('O', 'F') THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_enum,
                   CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_disc
            FROM lineitem
        )
        SELECT c.check_name, c.violations, m.n AS total, c.violations = 0 AS passed
        FROM m, LATERAL (VALUES
            ('completeness_returnflag', m.null_flag),
            ('unique_orderkey_linenumber', m.dup_key),
            ('range_quantity_1_50', m.bad_qty),
            ('nonnegative_extendedprice', m.neg_price),
            ('enum_flag_status', m.bad_enum),
            ('range_discount_0_1', m.bad_disc)
        ) AS c(check_name, violations)
    """,
    doc="Deequ-style declarative data-quality audit: six constraints "
    "(completeness, composite-key uniqueness, numeric ranges, enum "
    "membership) evaluated in ONE scan of lineitem — a single "
    "partial+final aggregate computes every violation counter, then a "
    "constant-width stack() unpivots to (check, violations, total, "
    "passed) rows. The uniqueness check genuinely fires on this data "
    "(composite key is non-unique), so the audit is verified to "
    "detect, not just pass. At 100 TB this is one narrow scan with a "
    "6-counter aggregate state — no per-check rescans, and the "
    "COUNT(DISTINCT) is the only shuffle (Spark plans it as a "
    "two-stage distinct-aggregate on the two int key columns).",
)
def lineitem_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # coalesce: SUM over an empty table is NULL in both engines; the
    # audit should report 0 violations (passed) on an empty table
    flag01 = lambda c: F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).cast("long")  # noqa: E731
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).cast("long").alias("null_flag"),
        # multi-arg countDistinct: the distinct shuffle carries two
        # ints, not a concat string — ~3x lighter rows at 60M+ scale
        (
            F.count(F.lit(1))
            - F.countDistinct("l_orderkey", "l_linenumber")
        ).cast("long").alias("dup_key"),
        flag01((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("bad_qty"),
        flag01(F.col("l_extendedprice") < 0).alias("neg_price"),
        flag01(
            ~F.col("l_returnflag").isin("A", "N", "R")
            | ~F.col("l_linestatus").isin("O", "F")
        ).alias("bad_enum"),
        flag01((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("bad_disc"),
    )
    return m.select(
        F.expr(
            "stack(6, "
            "'completeness_returnflag', null_flag, "
            "'unique_orderkey_linenumber', dup_key, "
            "'range_quantity_1_50', bad_qty, "
            "'nonnegative_extendedprice', neg_price, "
            "'enum_flag_status', bad_enum, "
            "'range_discount_0_1', bad_disc) AS (check_name, violations)"
        ),
        F.col("n").alias("total"),
    ).withColumn("passed", F.col("violations") == 0)


@query(
    "orders_exact_quantiles",
    oracle="""
        WITH ranked AS (
            SELECT o_totalprice AS v,
                   row_number() OVER (ORDER BY o_totalprice) AS rn,
                   COUNT(*) OVER () AS n
            FROM orders
            WHERE o_totalprice IS NOT NULL
        )
        SELECT CAST(q AS DOUBLE) AS q, v AS value
        FROM (VALUES (0.25), (0.5), (0.75), (0.99)) AS qs(q)
        JOIN ranked ON rn = CAST(floor((n - 1) * q) AS BIGINT) + 1
    """,
    doc="EXACT discrete quantiles (p25/p50/p75/p99 of o_totalprice) "
    "with NO global sort: iterative histogram quickselect "
    "(operators/selection.py) — COUNT/MIN/MAX pass, equi-width bucket "
    "histogram (<=1024 rows of metadata to the driver), descend into "
    "the rank-bearing bucket, finish with TakeOrderedAndProject over "
    "the <=20k-row remainder. At 100 TB: O(log_1024) narrow scans and "
    "zero data shuffle, vs approx_percentile's error or ORDER BY's "
    "full-shuffle sort. quantile_disc semantics (rank = "
    "floor((n-1)*q)+1, actual data value, never interpolated) so the "
    "oracle reproduces it with an explicit row_number rank.",
)
def orders_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return exact_quantiles_frame(orders, "o_totalprice", [0.25, 0.5, 0.75, 0.99])


from minispark_spark.sources.sidecache import build_lock as _build_lock
from minispark_spark.sources.sidecache import side_dir as _side_dir


def _snapdiff_table(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Build (once per testdata mtime) the two-version snapshot table
    the diff/history queries share; returns (table_dir, v1, v2)."""
    from minispark_spark.sources.snapshots import publish_snapshot

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table_dir = _side_dir("/tmp/minispark_snapdiff", sf_dir, "orders")
    stamp = table_dir + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "orders.parquet")))
    with _build_lock(table_dir):
        if os.path.exists(stamp):
            meta = json.load(open(stamp))
            if meta.get("mtime") == src_mtime:
                return table_dir, meta["v1"], meta["v2"]
        import shutil

        shutil.rmtree(table_dir, ignore_errors=True)
        v1 = publish_snapshot(orders.where(F.col("o_orderkey") % 10 < 8), table_dir)
        v2 = publish_snapshot(
            orders.where(F.col("o_orderkey") % 10 >= 2).withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2).otherwise(
                    F.col("o_totalprice")
                ),
            ),
            table_dir,
        )
        with open(stamp, "w") as f:
            json.dump({"mtime": src_mtime, "v1": v1, "v2": v2}, f)
        return table_dir, v1, v2



@query(
    "snapshot_diff_orders",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 < 8
        ),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 10 >= 2
        ),
        d AS (
            SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
                   CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                        WHEN v2.o_orderkey IS NULL THEN 'removed'
                        WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        )
        SELECT change, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
        FROM d WHERE change <> 'unchanged'
        GROUP BY change
    """,
    doc="Snapshot version diff (the lakehouse 'table_changes' / "
    "time-travel diff contract): publish two snapshot versions of an "
    "orders slice via sources/snapshots.py (atomic pointer-swap "
    "manifests), then sources/snapshots.snapshot_diff full-outer-joins "
    "old vs new on the key and classifies each row "
    "added/removed/changed via IS DISTINCT FROM on the compare "
    "columns. Output aggregates to (change, n, key_sum) — key_sum "
    "pins exact membership, not just counts. One key-partitioned "
    "shuffle join at any scale; the doubled price is *2 (IEEE-exact). "
    "Oracle replays both slices and the diff in SQL.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.snapshots import snapshot_diff

    table_dir, v1, v2 = _snapdiff_table(spark, sf_dir)
    d = snapshot_diff(spark, table_dir, v1, v2, key_cols=["o_orderkey"])
    return (
        d.where(F.col("change") != "unchanged")
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@query(
    "events_median_by_type",
    oracle="""
        WITH counts AS (
            SELECT event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            WHERE value IS NOT NULL
            GROUP BY event_type, cents
        ),
        cum AS (
            SELECT event_type, cents, n,
                   CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cum_n,
                   CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
            FROM counts
        )
        SELECT event_type, CAST(MIN(total) AS BIGINT) AS n,
               MIN(cents) / 100.0 AS median_value
        FROM cum
        WHERE cum_n >= CAST(floor((total - 1) / 2) AS BIGINT) + 1
        GROUP BY event_type
    """,
    doc="Per-group EXACT median by counting (the scale-correct shape "
    "for LOW-cardinality groups, where a per-group window sort would "
    "make one giant partition per group): quantize to cents, "
    "groupBy (group, cents) -> counts — compressing the data to the "
    "bounded value DOMAIN — then a cumulative-count window over the "
    "tiny compressed frame picks the first value whose running count "
    "reaches the discrete-median rank. At 100 TB the only full-data "
    "pass is the partial+final count aggregate; the window sees "
    "|groups| x |distinct cents| rows. Complements "
    "orders_exact_quantiles (global quickselect, unbounded domain).",
)
def events_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    counts = (
        events.where(F.col("value").isNotNull())
        .groupBy(F.col("event_type"), cents.alias("cents"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = Window.partitionBy("event_type").orderBy("cents")
    w_all = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "cents",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_all).alias("total"),
    )
    k = F.floor((F.col("total") - 1) / 2).cast("long") + 1
    return (
        cum.where(F.col("cum_n") >= k)
        .groupBy("event_type")
        .agg(
            F.min("total").cast("long").alias("n"),
            (F.min("cents") / 100.0).alias("median_value"),
        )
    )


@query(
    "events_gdpr_delete",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, value,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
            FROM events
        ),
        md AS (SELECT MIN(day) AS d FROM ev)
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM ev, md
        WHERE user_id % 97 <> 0 AND day <> md.d
        GROUP BY day
    """,
    doc="Right-to-be-forgotten DELETE on a day-partitioned parquet "
    "table (sources/upsert.delete_partitioned): erase a user "
    "blocklist (user_id % 97 = 0) AND one entire day. Partitions "
    "containing matches are discovered from a tiny distinct, ONLY "
    "those are rewritten (untouched days never read or written), and "
    "the all-deleted day's directory is physically dropped through "
    "the FileSystem API — dynamic partition overwrite alone would "
    "silently leave its old files. The surviving table, re-read and "
    "aggregated per day, must match DuckDB applying the same "
    "deletion predicate to the original events. At 100 TB the cost "
    "is the delete's partition footprint, not the table scan.",
)
def events_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from minispark_spark.sources.upsert import delete_partitioned

    dest = _side_dir("/tmp/minispark_gdpr", sf_dir, "events")
    stamp = dest + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    with _build_lock(dest):
        if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
            ev = load_table(spark, sf_dir, "events").select(
                "user_id",
                "event_id",
                "value",
                F.date_format(
                    F.date_trunc("day", F.col("ts")), "yyyy-MM-dd"
                ).alias("day"),
            )
            shutil.rmtree(dest, ignore_errors=True)
            ev.write.mode("overwrite").partitionBy("day").parquet(dest)
            min_day = ev.agg(F.min("day")).first()[0]
            if min_day is not None:
                delete_partitioned(
                    spark,
                    dest,
                    "day",
                    (F.col("user_id") % 97 == 0) | (F.col("day") == min_day),
                )
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    has_parts = os.path.isdir(dest) and any(
        x.startswith("day=") for x in os.listdir(dest)
    )
    if not has_parts:
        # empty input, or every partition deleted: a partitioned dir
        # with zero part-dirs has no schema to infer — return the
        # empty result literally (matches the oracle's zero rows)
        return spark.createDataFrame([], "day string, n long, users long, cents long")
    return (
        spark.read.parquet(dest)
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("long").alias("cents"),
        )
    )


@query(
    "snapshot_schema_evolution",
    oracle="""
        SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 1
    """,
    doc="Schema-evolution history read (the lakehouse 'add column' "
    "contract): snapshot v1 is written WITHOUT o_orderstatus, v2 adds "
    "it; reading the full history unions the versions by NAME with "
    "missing columns null-filled (unionByName allowMissingColumns — "
    "positional union would silently misalign). Old rows surface the "
    "new column as NULL, exactly as Delta/Iceberg column-add "
    "semantics. Pure metadata operation at any scale: no rewrite of "
    "v1's files, each version dir keeps its own physical schema.",
)
def snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.snapshots import publish_snapshot, read_snapshot

    orders = load_table(spark, sf_dir, "orders")
    table_dir = _side_dir("/tmp/minispark_snapevo", sf_dir, "orders")
    stamp = table_dir + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "orders.parquet")))
    versions = None
    with _build_lock(table_dir):
        if os.path.exists(stamp):
            meta = json.load(open(stamp))
            if meta.get("mtime") == src_mtime:
                versions = (meta["v1"], meta["v2"])
        if versions is None:
            import shutil

            shutil.rmtree(table_dir, ignore_errors=True)
            v1 = publish_snapshot(
                orders.where(F.col("o_orderkey") % 2 == 0).select(
                    "o_orderkey", "o_totalprice"
                ),
                table_dir,
            )
            v2 = publish_snapshot(
                orders.where(F.col("o_orderkey") % 2 == 1).select(
                    "o_orderkey", "o_totalprice", "o_orderstatus"
                ),
                table_dir,
            )
            with open(stamp, "w") as f:
                json.dump({"mtime": src_mtime, "v1": v1, "v2": v2}, f)
            versions = (v1, v2)
    old = read_snapshot(spark, table_dir, versions[0])
    new = read_snapshot(spark, table_dir, versions[1])
    return old.unionByName(new, allowMissingColumns=True)


@query(
    "string_functions_coverage",
    oracle="""
        SELECT event_id,
               upper(event_type) AS up,
               lpad(event_type, 12, '*') AS padded,
               translate(event_type, 'aeiou', 'AEIOU') AS vowels_up,
               CAST(strpos(event_type, 'a') AS INTEGER) AS pos_a,
               left(event_type, 3) AS l3,
               right(event_type, 3) AS r3,
               reverse(event_type) AS rev,
               repeat(event_type, 2) AS doubled,
               md5(event_type) AS digest,
               regexp_extract(event_type, '([a-z]+)', 1) AS first_word,
               concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tagged
        FROM events
    """,
    doc="Scalar string-function surface parity (upper/lpad/translate/"
    "strpos/left/right/reverse/repeat/md5/regexp_extract/concat_ws), "
    "each verified cross-engine including the no-match conventions "
    "(strpos=0, regexp_extract=''). All JVM-side whole-stage-codegen "
    "expressions — per-row narrow, zero shuffles at any scale.",
)
def string_functions_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("up"),
        F.lpad("event_type", 12, "*").alias("padded"),
        F.translate("event_type", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("event_type", "a").alias("pos_a"),
        F.expr("left(event_type, 3)").alias("l3"),
        F.expr("right(event_type, 3)").alias("r3"),
        F.reverse("event_type").alias("rev"),
        F.repeat("event_type", 2).alias("doubled"),
        F.md5("event_type").alias("digest"),
        F.regexp_extract("event_type", "([a-z]+)", 1).alias("first_word"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("tagged"),
    )


@query(
    "datetime_functions_coverage",
    oracle="""
        SELECT event_id,
               CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
               CAST(weekofyear(ts) AS INTEGER) AS woy,
               CAST(quarter(ts) AS INTEGER) AS qtr,
               last_day(ts) AS month_end,
               CAST(date_diff('day', date_trunc('year', ts), ts) AS INTEGER) AS day_of_year_offset,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
               CAST(ts + INTERVAL 90 DAY AS TIMESTAMP) AS plus_90d,
               strftime(ts, '%Y-%m') AS ym
        FROM events
    """,
    doc="Datetime-function surface parity (dayofweek/weekofyear/"
    "quarter/last_day/datediff/date_trunc week/interval add/"
    "date_format), pinned against DuckDB's differing conventions — "
    "its dayofweek is 0-based Sunday (Spark's is 1-based), its "
    "date_diff takes (unit, start, end). Narrow codegen expressions, "
    "no shuffles.",
)
def datetime_functions_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.dayofweek("ts").alias("dow"),
        F.weekofyear("ts").alias("woy"),
        F.quarter("ts").alias("qtr"),
        F.last_day("ts").alias("month_end"),
        F.datediff(F.col("ts"), F.date_trunc("year", F.col("ts"))).alias(
            "day_of_year_offset"
        ),
        F.date_trunc("week", F.col("ts")).alias("week_start"),
        (F.col("ts") + F.expr("INTERVAL 90 DAYS")).alias("plus_90d"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
    )


@query(
    "orders_equidepth_buckets",
    oracle="""
        WITH ranked AS (
            SELECT o_totalprice AS v,
                   row_number() OVER (ORDER BY o_totalprice) AS rn,
                   COUNT(*) OVER () AS n
            FROM orders
            WHERE o_totalprice IS NOT NULL
        ),
        cuts AS (
            SELECT ranked.v AS cut
            FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS q(i)
            JOIN ranked ON rn = CAST(floor((n - 1) * i / 8.0) AS BIGINT) + 1
        ),
        b AS (
            SELECT r.v,
                   (SELECT COUNT(*) FROM cuts c WHERE c.cut < r.v) AS bucket
            FROM ranked r
        )
        SELECT CAST(bucket AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(v) AS lo, MAX(v) AS hi
        FROM b
        GROUP BY bucket
    """,
    doc="EXACT equi-depth histogram (8 buckets over o_totalprice): the "
    "range-partitioner boundary computation repartitionByRange only "
    "ESTIMATES by reservoir sampling, done exactly — 7 discrete-"
    "quantile cut points from the histogram quickselect "
    "(operators/selection.py, bounded driver metadata), then one "
    "counting pass with bucket = number of cuts strictly below the "
    "value (ties at a cut deterministically fall low). Rank positions "
    "use division by 8 (a power of two — IEEE-exact on integers), so "
    "both engines pick identical cut rows. The per-bucket (n, lo, hi) "
    "output is exactly the skew diagnosis a 100 TB range-partitioned "
    "write needs before committing to a layout.",
)
def orders_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.selection import exact_quantiles_frame

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(F.col("o_totalprice").alias("v")).where(
        F.col("v").isNotNull()
    )
    qs = [i / 8.0 for i in range(1, 8)]
    cut_rows = exact_quantiles_frame(orders, "o_totalprice", qs).collect()
    if not cut_rows:
        return spark.createDataFrame([], "bucket int, n long, lo double, hi double")
    cuts = [r["value"] for r in sorted(cut_rows, key=lambda r: r["q"])]
    cuts_arr = F.array(*[F.lit(float(c)) for c in cuts])
    bucket = F.size(F.filter(cuts_arr, lambda c: c < F.col("v")))
    return (
        base.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@query(
    "docs_weighted_median_by_lang",
    oracle="""
        WITH counts AS (
            SELECT lang, n_chars,
                   CAST(SUM(n_chars) AS BIGINT) AS w
            FROM documents
            WHERE n_chars IS NOT NULL
            GROUP BY lang, n_chars
        ),
        cum AS (
            SELECT lang, n_chars, w,
                   CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS cum_w,
                   CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS total_w
            FROM counts
        )
        SELECT lang,
               CAST(MIN(total_w) AS BIGINT) AS total_weight,
               CAST(MIN(n_chars) AS BIGINT) AS weighted_median_chars
        FROM cum
        WHERE 2 * cum_w >= total_w
        GROUP BY lang
    """,
    doc="Per-group WEIGHTED median by counting (weight = n_chars — the "
    "token-budget view: the document length at which half the "
    "corpus's characters sit in shorter docs). Same scale shape as "
    "events_median_by_type: groupBy (group, value) compresses to the "
    "value domain, integer cumulative-weight window over the tiny "
    "compressed frame; the median test is 2*cum >= total in pure "
    "integers (no halving division, no float). The weighted quantile "
    "is what data-mixing budgeters actually need — an unweighted "
    "median over docs misstates where the TOKENS are.",
)
def docs_weighted_median_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.where(F.col("n_chars").isNotNull())
        .groupBy("lang", "n_chars")
        .agg(F.sum("n_chars").cast("long").alias("w"))
    )
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = counts.select(
        "lang",
        "n_chars",
        F.sum("w").over(w_cum).alias("cum_w"),
        F.sum("w").over(w_all).alias("total_w"),
    )
    return (
        cum.where(2 * F.col("cum_w") >= F.col("total_w"))
        .groupBy("lang")
        .agg(
            F.min("total_w").cast("long").alias("total_weight"),
            F.min("n_chars").cast("long").alias("weighted_median_chars"),
        )
    )


@query(
    "orders_cdf_normalize",
    oracle="""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders
            WHERE o_totalprice IS NOT NULL
        )
        SELECT o_orderkey, cents,
               cume_dist() OVER (ORDER BY cents) AS cdf
        FROM o
    """,
    doc="Quantile (CDF) feature transform: each order's price mapped to "
    "its empirical cumulative fraction — the rank-based normalization "
    "feature pipelines use when values are heavy-tailed. NO global "
    "sort/window: counting on the quantized value domain (groupBy "
    "cents -> counts -> cumulative window over the tiny compressed "
    "frame, same shape as the counting median) and one value-domain "
    "join maps every row to cum_n/total. cume_dist ties resolve to "
    "the full tied mass in both engines; the single division is "
    "IEEE-exact, so even the doubles hash-match.",
)
def orders_cdf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    counts = o.groupBy("cents").agg(F.count(F.lit(1)).alias("n"))
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    # the single-partition window runs over the COMPRESSED value
    # domain (distinct cents), not the rows — bounded at any SF
    cum = counts.select(
        "cents",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    return o.join(cum, "cents").select(
        "o_orderkey",
        "cents",
        (F.col("cum_n").cast("double") / F.col("total")).alias("cdf"),
    )


@query(
    "events_mad_outliers",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
            WHERE value IS NOT NULL
        ),
        med AS (
            SELECT event_type, cents,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cum_n,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
            FROM (SELECT event_type, cents, COUNT(*) AS cnt FROM ev GROUP BY 1, 2)
        ),
        m1 AS (
            SELECT event_type, MIN(cents) AS med_cents
            FROM med WHERE 2 * cum_n >= total GROUP BY event_type
        ),
        dev AS (
            SELECT ev.event_type, ev.event_id, ev.cents,
                   abs(ev.cents - m1.med_cents) AS adev
            FROM ev JOIN m1 USING (event_type)
        ),
        mad_cum AS (
            SELECT event_type, adev,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY adev) AS BIGINT) AS cum_n,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
            FROM (SELECT event_type, adev, COUNT(*) AS cnt FROM dev GROUP BY 1, 2)
        ),
        m2 AS (
            SELECT event_type, MIN(adev) AS mad_cents
            FROM mad_cum WHERE 2 * cum_n >= total GROUP BY event_type
        )
        SELECT d.event_type, d.event_id, d.cents,
               m1.med_cents, m2.mad_cents
        FROM dev d JOIN m1 USING (event_type) JOIN m2 USING (event_type)
        WHERE d.adev > 10 * m2.mad_cents
    """,
    doc="Robust outlier detection by median absolute deviation: "
    "per-type median (counting, as events_median_by_type), absolute "
    "deviations, then the MEDIAN of deviations (second counting "
    "pass); flag rows deviating > 10x MAD. Unlike the z-score twin "
    "(events_zscore_outliers), a single extreme value cannot inflate "
    "the threshold and mask its peers — the standard robust-statistics "
    "argument, and everything stays integer cents so both engines "
    "agree exactly. Scale shape: two counting aggregates + two "
    "broadcast-sized per-group medians joined back; no per-row "
    "windows.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    ev = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )

    def counting_median(rows: DataFrame, val: str, out: str) -> DataFrame:
        counts = rows.groupBy("event_type", val).agg(F.count(F.lit(1)).alias("cnt"))
        w_cum = Window.partitionBy("event_type").orderBy(val)
        w_all = Window.partitionBy("event_type")
        cum = counts.select(
            "event_type",
            val,
            F.sum("cnt").over(w_cum).alias("cum_n"),
            F.sum("cnt").over(w_all).alias("total"),
        )
        return (
            cum.where(2 * F.col("cum_n") >= F.col("total"))
            .groupBy("event_type")
            .agg(F.min(val).alias(out))
        )

    m1 = counting_median(ev, "cents", "med_cents")
    dev = ev.join(m1, "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    m2 = counting_median(dev, "adev", "mad_cents")
    return (
        dev.join(m2, "event_type")
        .where(F.col("adev") > 10 * F.col("mad_cents"))
        .select("event_type", "event_id", "cents", "med_cents", "mad_cents")
    )


@query(
    "lineitem_integrity_checksum",
    oracle="""
        WITH rows_c AS (
            SELECT l_returnflag,
                   ('0x' || substr(md5(
                       l_orderkey || '|' || l_linenumber || '|' ||
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) || '|' ||
                       l_returnflag
                   ), 1, 15))::BIGINT AS h
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(bit_xor(h) AS BIGINT) AS checksum
        FROM rows_c
        GROUP BY l_returnflag
    """,
    doc="Order-independent table integrity checksum (the replica-"
    "verification / migration-audit primitive: compare two copies of "
    "a table WITHOUT moving either): canonical per-row string (ints "
    "and quantized cents only — float rendering is not cross-engine "
    "stable), md5, top 60 bits as an integer, XOR-aggregated per "
    "group. XOR is commutative/associative, so partition order, "
    "partitioning, and engine are all irrelevant — demonstrated "
    "literally by DuckDB computing the identical checksum. One "
    "narrow scan + a 3-group aggregate at any scale; a single "
    "flipped row flips the checksum with probability 1 - 2^-60.",
)
def lineitem_integrity_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"),
        F.col("l_returnflag"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    return (
        li.select(F.col("l_returnflag"), h.alias("h"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )
    )


@query(
    "snapshot_history",
    oracle="""
        SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum, FALSE AS is_current
        FROM orders WHERE o_orderkey % 10 < 8
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT), TRUE
        FROM orders WHERE o_orderkey % 10 >= 2
    """,
    doc="Snapshot-history metadata table (Iceberg's `snapshots` / "
    "Delta's DESCRIBE HISTORY contract): one row per retained version "
    "with row count, key checksum, and the committed-pointer flag — "
    "built by scanning each immutable version dir of the same "
    "two-version table the diff query publishes. The oracle replays "
    "both versions' defining predicates. Listing versions is a "
    "metadata read; the per-version aggregate is one scan of that "
    "version only.",
)
def snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.snapshots import (
        _versions,
        current_version,
        read_snapshot,
    )

    table_dir, _, _ = _snapdiff_table(spark, sf_dir)
    cur = current_version(table_dir)
    out = None
    for v in _versions(table_dir):
        one = read_snapshot(spark, table_dir, v).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        ).select(
            F.lit(v).alias("version"),
            "n",
            "key_sum",
            F.lit(v == cur).alias("is_current"),
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "events_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    doc="Markov transition matrix over per-user event sequences "
    "(the sequence-model prep twin of docs_bigram_stats): window lead "
    "per user ordered by (ts, event_id — the deterministic tie-break) "
    "pairs each event with its successor, then a transition-count "
    "aggregate. One shuffle on user_id for the window, one "
    "partial+final count on the (from, to) key; the matrix itself is "
    "|types|^2 rows at any scale.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_top_paths",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        paths AS (
            SELECT user_id,
                   MAX(CASE WHEN rn = 1 THEN event_type END) || ' > ' ||
                   MAX(CASE WHEN rn = 2 THEN event_type END) || ' > ' ||
                   MAX(CASE WHEN rn = 3 THEN event_type END) AS path
            FROM ranked
            WHERE rn <= 3
            GROUP BY user_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM paths
        WHERE path IS NOT NULL
        GROUP BY path
    """,
    doc="Top onboarding paths (Sankey / funnel-discovery input): each "
    "user's first three events — deterministic (ts, event_id) order — "
    "concatenated into a path string, counted across users. Users "
    "with fewer than 3 events drop out via NULL concat, identically "
    "in both engines. The per-user window ranks only each user's "
    "rows (partition-local top-3, no global sort); everything after "
    "is a two-level count.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 3)
    step = lambda i: F.max(F.when(F.col("rn") == i, F.col("event_type")))  # noqa: E731
    paths = ranked.groupBy("user_id").agg(
        F.concat(step(1), F.lit(" > "), step(2), F.lit(" > "), step(3)).alias("path")
    )
    return (
        paths.where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "customers_linkage_scores",
    oracle="""
        WITH c AS (
            SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                   substr(c_name, 1, 16) AS blk
            FROM customer
        ),
        pairs AS (
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
                        THEN 1 ELSE 0 END AS agr_name,
                   CASE WHEN a.c_nationkey = b.c_nationkey
                        THEN 1 ELSE 0 END AS agr_nation,
                   CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN 1 ELSE 0 END AS agr_segment
            FROM c a JOIN c b
              ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        )
        SELECT cust_a, cust_b, agr_name, agr_nation, agr_segment,
               CAST(
                   (CASE WHEN agr_name = 1 THEN CAST(950 AS BIGINT) ELSE 50 END) *
                   (CASE WHEN agr_nation = 1 THEN 900 ELSE 100 END) *
                   (CASE WHEN agr_segment = 1 THEN 800 ELSE 200 END)
               AS BIGINT) AS m_num,
               CAST(
                   (CASE WHEN agr_name = 1 THEN CAST(10 AS BIGINT) ELSE 990 END) *
                   (CASE WHEN agr_nation = 1 THEN 40 ELSE 960 END) *
                   (CASE WHEN agr_segment = 1 THEN 200 ELSE 800 END)
               AS BIGINT) AS u_num,
               (CASE WHEN agr_name = 1 THEN CAST(950 AS BIGINT) ELSE 50 END) *
               (CASE WHEN agr_nation = 1 THEN 900 ELSE 100 END) *
               (CASE WHEN agr_segment = 1 THEN 800 ELSE 200 END)
               >= 1000 *
               (CASE WHEN agr_name = 1 THEN CAST(10 AS BIGINT) ELSE 990 END) *
               (CASE WHEN agr_nation = 1 THEN 40 ELSE 960 END) *
               (CASE WHEN agr_segment = 1 THEN 200 ELSE 800 END) AS is_match
        FROM pairs
    """,
    doc="Fellegi-Sunter probabilistic record-linkage scoring over the "
    "blocked candidate pairs (same 16-char block as "
    "customers_fuzzy_match): three field comparators (name edit "
    "distance <= 1, nation, segment), each contributing its m- or "
    "u-probability to the match odds. All probabilities are "
    "per-mille INTEGERS, the likelihood ratio stays an exact "
    "integer fraction (m_num/u_num), and the classification "
    "threshold (odds >= 1000) is a cross-multiplied integer "
    "comparison — the standard FS log-weight sum done without a "
    "single float or log. Block key bounds the quadratic exactly as "
    "in the Levenshtein query; the oracle replays scoring bit-free.",
)
def customers_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: same single-task-probe fix as customers_fuzzy_match —
    # the broadcast block join's parallelism is the probe scan's
    # partition count (1 byte-sized partition at gate SFs) while each
    # probe row pays a Levenshtein per block pair (guide §2.5/§2.6).
    c = fan_out(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            F.substring("c_name", 1, 16).alias("blk"),
        )
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("cust_a"),
        F.col("b.c_custkey").alias("cust_b"),
        (F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .cast("int")
        .alias("agr_name"),
        (F.col("a.c_nationkey") == F.col("b.c_nationkey")).cast("int").alias("agr_nation"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        .cast("int")
        .alias("agr_segment"),
    )
    term = lambda agr, m1, m0: F.when(F.col(agr) == 1, F.lit(m1)).otherwise(F.lit(m0)).cast("long")  # noqa: E731
    m_num = term("agr_name", 950, 50) * term("agr_nation", 900, 100) * term("agr_segment", 800, 200)
    u_num = term("agr_name", 10, 990) * term("agr_nation", 40, 960) * term("agr_segment", 200, 800)
    return pairs.select(
        "cust_a",
        "cust_b",
        "agr_name",
        "agr_nation",
        "agr_segment",
        m_num.cast("long").alias("m_num"),
        u_num.cast("long").alias("u_num"),
        (m_num >= F.lit(1000).cast("long") * u_num).alias("is_match"),
    )


@query(
    "events_twap_by_type",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS dur_us
            FROM events
            WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        )
        SELECT event_type,
               CAST(COUNT(dur_us) AS BIGINT) AS n_intervals,
               CAST(SUM(dur_us) AS BIGINT) AS total_us,
               CAST(CAST(SUM(CAST(cents AS DECIMAL(38, 0)) * dur_us) AS DOUBLE)
                    / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS DOUBLE) AS twap
        FROM seq
        WHERE dur_us IS NOT NULL AND dur_us > 0
        GROUP BY event_type
    """,
    doc="Time-weighted average price/value per event type (the TWAP "
    "every market/telemetry pipeline needs — a plain mean over-weights "
    "bursts): each observation holds until the next one (window lead "
    "on the deterministic (ts, event_id) order), weight = interval "
    "microseconds. Products are exact integers (cents x us < 2^60), "
    "summed in DECIMAL(38) so no overflow and no float-order "
    "sensitivity; the final twap is two exact decimal->double "
    "conversions and two IEEE divisions — bit-identical cross-engine. "
    "One shuffle on event_type for the window, then partial+final agg.",
)
def events_twap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dur_us"),
    )
    agg = (
        seq.where(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("event_type")
        .agg(
            F.count("dur_us").alias("n_intervals"),
            F.sum("dur_us").cast("long").alias("total_us"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double")
                / 100.0
            ).alias("twap"),
        )
    )
    return agg


@query(
    "customers_pareto_revenue",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT o_custkey, cents,
                   CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS INTEGER) AS decile
            FROM rev
        ),
        per AS (
            SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents
            FROM tiled GROUP BY decile
        )
        SELECT decile, n_customers, revenue_cents,
               CAST(CAST(SUM(revenue_cents) OVER (ORDER BY decile) AS BIGINT) AS DOUBLE)
                   / nullif(CAST(CAST(SUM(revenue_cents) OVER () AS BIGINT) AS DOUBLE), 0.0)
                   AS cum_share
        FROM per
    """,
    doc="Pareto revenue concentration (the 80/20 report): customers "
    "ranked into revenue deciles, with each decile's cumulative share "
    "of total revenue. The only full-data pass is the per-customer "
    "aggregate; the decile is EXACT ntile semantics computed the "
    "RFM way (operators/ranking.py: approx-quantile buckets + bounded "
    "bucket-count collect + bucket-local rank + offset — no global "
    "sort even over the aggregate), and the final cumulative window "
    "runs over exactly 10 rows. Integer cents throughout; the share "
    "is one exact-int-to-double division.",
)
def customers_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from minispark_spark.operators import ranking

    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        # ntile orders by cents DESC; rank machinery sorts ASC, so rank
        # on the negated value (exact for integers)
        .withColumn("neg_cents", -F.col("cents"))
    )
    rev = rev.cache()
    cuts = ranking.quantile_cuts(rev, ["neg_cents"])
    bucketed = rev.withColumn("_b", ranking.bucket_expr("neg_cents", cuts["neg_cents"]))
    counts = {r["_b"]: r["count"] for r in bucketed.groupBy("_b").count().collect()}
    if not counts:
        return spark.createDataFrame(
            [], "decile int, n_customers long, revenue_cents long, cum_share double"
        )
    tiled = ranking.ntile_over_buckets(
        bucketed, 10, "neg_cents", ["o_custkey"], "_b", counts, "decile"
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return per.select(
        "decile",
        "n_customers",
        "revenue_cents",
        (
            F.sum("revenue_cents").over(w_cum).cast("long").cast("double")
            / F.nullif(
                F.sum("revenue_cents").over(w_all).cast("long").cast("double"),
                F.lit(0.0),
            )
        ).alias("cum_share"),
    )


@query(
    "events_peak_concurrency",
    oracle="""
        WITH iv AS (
            SELECT event_type, epoch_us(ts) AS s,
                   epoch_us(ts) + 300000000 AS e
            FROM events
        ),
        pts AS (
            SELECT event_type, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, e AS t, -1 AS delta FROM iv
        ),
        swept AS (
            SELECT event_type,
                   CAST(SUM(delta) OVER (PARTITION BY event_type
                       ORDER BY t, delta) AS BIGINT) AS live
            FROM pts
        )
        SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak_concurrency
        FROM swept GROUP BY event_type
    """,
    doc="Peak concurrency by sweep-line: each event opens a 5-minute "
    "activity window [ts, ts+5m); +1/-1 boundary points, cumulative "
    "sum in time order, max of the running level — the 'how many "
    "sessions were live at the worst moment' capacity question. "
    "Half-open semantics come free from the tie order (delta ASC puts "
    "the -1 of an interval ending at t before the +1 starting at t). "
    "Integer epoch-microseconds throughout. The per-type window "
    "partitions the sweep; for a single global stream at 100 TB, "
    "pre-aggregate boundary points per (type, t) first — the same "
    "value-domain compression as the counting medians.",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    s = F.unix_micros("ts")
    iv = events.select("event_type", s.alias("s"), (s + 300_000_000).alias("e"))
    pts = iv.select("event_type", F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = pts.select("event_type", F.sum("delta").over(w).cast("long").alias("live"))
    return swept.groupBy("event_type").agg(
        F.max("live").cast("long").alias("peak_concurrency")
    )


@query(
    "events_dau_wau_stickiness",
    oracle="""
        WITH days AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                   user_id
            FROM events
        ),
        dau AS (
            SELECT week, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM days GROUP BY week, day
        ),
        wau AS (
            SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM days GROUP BY week
        )
        SELECT d.week, d.day, d.dau, w.wau,
               CAST(d.dau AS DOUBLE) / w.wau AS stickiness
        FROM dau d JOIN wau w ON w.week = d.week
    """,
    doc="DAU/WAU stickiness (the engagement ratio product teams track): "
    "distinct daily actives over distinct weekly actives, per day. "
    "Two distinct-aggregates at different grains over one scan's "
    "projection, joined on the week key (broadcast-size: one row per "
    "week); the ratio is one exact division. At 100 TB swap the "
    "distincts for mergeable HLL sketches (approx_distinct_rollup_hll "
    "shows that path) — the query shape is identical.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "user_id",
    )
    dau = days.groupBy("week", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    wau = days.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "week").select(
        "week",
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@query(
    "customers_cohort_ltv",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        enriched AS (
            SELECT f.cohort,
                   CAST((year(o.o_orderdate) - year(f.cohort)) * 12
                        + (month(o.o_orderdate) - month(f.cohort)) AS INTEGER) AS months_since,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        )
        SELECT cohort, months_since,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               CAST(SUM(SUM(cents)) OVER (
                   PARTITION BY cohort ORDER BY months_since) AS BIGINT)
                   AS cum_revenue_cents
        FROM enriched
        GROUP BY cohort, months_since
    """,
    doc="Cohort lifetime value: customers grouped by first-order month, "
    "revenue tracked by months-since-acquisition with a cumulative LTV "
    "curve per cohort — the revenue twin of events_retention_cohorts. "
    "The first-order frame is one aggregate (small: one row per "
    "customer), joined back and re-aggregated to the (cohort, month) "
    "grid; the cumulative window runs over that tiny grid. Month "
    "arithmetic is integer (year*12+month deltas), revenue integer "
    "cents.",
)
def customers_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    enriched = orders.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        ).cast("int").alias("months_since"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    per = enriched.groupBy("cohort", "months_since").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "cohort",
        "months_since",
        "n_orders",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long").alias("cum_revenue_cents"),
    )


@query(
    "suppliers_market_concentration",
    oracle="""
        WITH rev AS (
            SELECT s.s_nationkey,
                   l.l_suppkey,
                   CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey
        )
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(CAST(SUM(CAST(cents AS DECIMAL(38, 0)) * cents) AS DOUBLE)
                    / (CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
                       * CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)) AS DOUBLE) AS hhi
        FROM rev
        GROUP BY s_nationkey
    """,
    doc="Supplier market concentration per nation (Herfindahl-"
    "Hirschman index): sum of squared revenue shares, computed as "
    "SUM(cents^2)/SUM(cents)^2 so every aggregate is an exact integer "
    "(squares in DECIMAL(38) — no float-order sensitivity) and the "
    "HHI is exact-int-to-double conversions plus one multiply and one "
    "divide, bit-identical cross-engine. HHI -> 1 means one supplier "
    "owns the nation; -> 1/n means even split. Two partial+final "
    "aggregates, shuffles on (nation, supplier) then nation.",
)
def suppliers_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    total = F.sum("cents").cast("long")
    return rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        total.alias("total_cents"),
        (
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast("double")
            / (total.cast("double") * total.cast("double"))
        ).alias("hhi"),
    )


@query(
    "events_user_gini",
    oracle="""
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY user_id
        ),
        freq AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS f
            FROM per_user GROUP BY x
        ),
        cum AS (
            SELECT x, f,
                   CAST(COALESCE(SUM(f) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
            FROM freq
        )
        SELECT CAST(SUM(f) AS BIGINT) AS n_users,
               CAST(SUM(f * x) AS BIGINT) AS n_events,
               CAST(
                   CAST(CAST(SUM(x * (2 * f * p + f * (f + 1))) AS BIGINT)
                        - (CAST(SUM(f) AS BIGINT) + 1) * CAST(SUM(f * x) AS BIGINT) AS DOUBLE)
                   / nullif(CAST(SUM(f) AS DOUBLE) * CAST(SUM(f * x) AS DOUBLE), 0.0)
               AS DOUBLE) AS gini
        FROM cum
    """,
    doc="Gini coefficient of per-user event counts (traffic "
    "inequality — the 'do 1% of users generate 90% of events' "
    "number): the sorted-rank formula G = (2*sum(i*x_i) - (n+1)*S) / "
    "(n*S) evaluated WITHOUT any per-row ranking — group to the "
    "count-value DOMAIN, and for value x with frequency f at "
    "cumulative offset p, sum(i*x_i) over its tied block is "
    "x*(f*p + f(f+1)/2), an exact integer (f(f+1)/2 is always "
    "integral). One cumulative window over the tiny compressed "
    "frequency frame; the final G is one exact-int division. The "
    "inequality complement of customers_pareto_revenue and the HHI.",
)
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    freq = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    cum = freq.select(
        "x", "f", F.coalesce(F.sum("f").over(w), F.lit(0)).alias("p")
    )
    n = F.sum("f").cast("long")
    s = F.sum(F.col("f") * F.col("x")).cast("long")
    # numerator term uses 2fp + f(f+1) so every product and SUM stays
    # an exact INTEGER (no /2 drifting the sum through doubles)
    num2 = F.sum(
        F.col("x") * (2 * F.col("f") * F.col("p") + F.col("f") * (F.col("f") + 1))
    ).cast("long")
    return cum.agg(
        n.alias("n_users"),
        s.alias("n_events"),
        (
            (num2 - (n + 1) * s).cast("double")
            / F.nullif(n.cast("double") * s.cast("double"), F.lit(0.0))
        ).alias("gini"),
    )


@query(
    "orders_interarrival_median",
    oracle="""
        WITH gaps AS (
            SELECT o_orderpriority,
                   CAST(date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS BIGINT) AS gap_days
            FROM orders
        ),
        counts AS (
            SELECT o_orderpriority, gap_days, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM gaps WHERE gap_days IS NOT NULL
            GROUP BY o_orderpriority, gap_days
        ),
        cum AS (
            SELECT o_orderpriority, gap_days,
                   CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority
                       ORDER BY gap_days) AS BIGINT) AS cum_n,
                   CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
            FROM counts
        )
        SELECT o_orderpriority,
               CAST(MIN(total) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_days) AS BIGINT) AS median_gap_days
        FROM cum
        WHERE 2 * cum_n >= total
        GROUP BY o_orderpriority
    """,
    doc="Median inter-arrival time (days between a customer's "
    "consecutive orders) per order priority — the repeat-purchase "
    "cadence metric. Per-customer lag window (deterministic (date, "
    "key) order) produces integer day gaps; the per-priority median "
    "uses the counting pattern (compress to the gap-day DOMAIN, "
    "integer 2*cum >= total test). Gaps attribute to the LATER "
    "order's priority, identically in both engines.",
)
def orders_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    counts = gaps.groupBy("o_orderpriority", "gap_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.partitionBy("o_orderpriority").orderBy("gap_days")
    w_all = Window.partitionBy("o_orderpriority")
    cum = counts.select(
        "o_orderpriority",
        "gap_days",
        F.sum("cnt").over(w_cum).alias("cum_n"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        cum.where(2 * F.col("cum_n") >= F.col("total"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("total").cast("long").alias("n_gaps"),
            F.min("gap_days").cast("long").alias("median_gap_days"),
        )
    )


@query(
    "events_funnel_time_to_convert",
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
              GROUP BY e.user_id),
        gaps AS (
            SELECT 'signup_to_click' AS step,
                   CAST(epoch_us(c.c_ts) - epoch_us(s.s_ts) AS BIGINT) AS gap_us
            FROM c JOIN s ON s.user_id = c.user_id
            UNION ALL
            SELECT 'click_to_purchase',
                   CAST(epoch_us(p.p_ts) - epoch_us(c.c_ts) AS BIGINT)
            FROM p JOIN c ON c.user_id = p.user_id
        ),
        counts AS (
            SELECT step, gap_us, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM gaps GROUP BY step, gap_us
        ),
        cum AS (
            SELECT step, gap_us,
                   CAST(SUM(cnt) OVER (PARTITION BY step ORDER BY gap_us) AS BIGINT) AS cum_n,
                   CAST(SUM(cnt) OVER (PARTITION BY step) AS BIGINT) AS total
            FROM counts
        )
        SELECT step, CAST(MIN(total) AS BIGINT) AS n_users,
               CAST(MIN(gap_us) AS BIGINT) AS median_gap_us
        FROM cum WHERE 2 * cum_n >= total
        GROUP BY step
    """,
    doc="Time-to-convert distribution for the ordered funnel (same "
    "stage definitions as events_funnel): per surviving user, the "
    "microsecond gap from signup to first later click, and click to "
    "first later purchase; the median per step via the counting "
    "pattern. 'How long does conversion take' is the question the "
    "bare funnel counts can't answer. Stage frames are per-user "
    "aggregates (tiny); gaps are exact integer microseconds.",
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
    g1 = c.join(s, "user_id").select(
        F.lit("signup_to_click").alias("step"),
        (F.unix_micros("c_ts") - F.unix_micros("s_ts")).alias("gap_us"),
    )
    g2 = p.join(c, "user_id").select(
        F.lit("click_to_purchase").alias("step"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    counts = g1.unionByName(g2).groupBy("step", "gap_us").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.partitionBy("step").orderBy("gap_us")
    w_all = Window.partitionBy("step")
    cum = counts.select(
        "step",
        "gap_us",
        F.sum("cnt").over(w_cum).alias("cum_n"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        cum.where(2 * F.col("cum_n") >= F.col("total"))
        .groupBy("step")
        .agg(
            F.min("total").cast("long").alias("n_users"),
            F.min("gap_us").cast("long").alias("median_gap_us"),
        )
    )


# log10(1 + 1/d) for d = 1..9, as repr-roundtrip literals — the SAME
# literal text is parsed by both engines, so the doubles are identical.
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}


@query(
    "orders_benford_audit",
    oracle=f"""
        WITH p(digit, p) AS (VALUES
            {",".join(f"({d}, {v})" for d, v in _BENFORD_P.items())}
        ),
        cents AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice > 0
        ),
        obs AS (
            SELECT CAST(left(CAST(cents AS VARCHAR), 1) AS INTEGER) AS digit,
                   COUNT(*) AS obs
            FROM cents GROUP BY 1
        ),
        nn AS (SELECT SUM(obs) AS n FROM obs)
        SELECT p.digit,
               CAST(COALESCE(obs.obs, 0) AS BIGINT) AS obs,
               CAST(nn.n AS DOUBLE) * p.p AS expected,
               (CAST(COALESCE(obs.obs, 0) AS DOUBLE) - CAST(nn.n AS DOUBLE) * p.p)
               * (CAST(COALESCE(obs.obs, 0) AS DOUBLE) - CAST(nn.n AS DOUBLE) * p.p)
               / (CAST(nn.n AS DOUBLE) * p.p) AS contrib
        FROM p LEFT JOIN obs USING (digit) CROSS JOIN nn
    """,
    doc="Benford's-law first-digit audit of o_totalprice — the classic "
    "fabricated-data / unit-mixup detector for financial columns. "
    "Digits come from EXACT integer cents (the money quantization, "
    "functions/money.py) via string head, never from log10 (not "
    "correctly-rounded cross-engine); expected frequencies are "
    "repr-roundtrip double literals shared with the oracle. One "
    "shuffle to 9 digit cells; per-digit chi-square contributions are "
    "emitted as rows (no float summation) — SUM(contrib) vs the "
    "chi2(8) critical value is the caller's verdict. TPC-H prices are "
    "uniform-ish, so this view SHOWS the violation (huge contribs) "
    "rather than assuming conformance.",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.functions import money

    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(money.cents("o_totalprice").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    probs = spark.createDataFrame(
        [(d, float(v)) for d, v in _BENFORD_P.items()], "digit int, p double"
    )
    nn = F.broadcast(obs.agg(F.sum("obs").alias("n")))
    o = F.coalesce(F.col("obs"), F.lit(0)).cast("double")
    e = F.col("n").cast("double") * F.col("p")
    return (
        probs.join(F.broadcast(obs), "digit", "left")
        .crossJoin(nn)
        .select(
            "digit",
            F.coalesce(F.col("obs"), F.lit(0)).cast("bigint").alias("obs"),
            e.alias("expected"),
            ((o - e) * (o - e) / e).alias("contrib"),
        )
    )


@query(
    "referential_integrity_audit",
    oracle="""
        SELECT 'lineitem.l_orderkey -> orders' AS fk,
               (SELECT COUNT(*) FROM lineitem) AS n_rows,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem.l_suppkey -> supplier',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                  WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'lineitem.l_partkey -> part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p
                                  WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
    """,
    doc="Cross-table referential-integrity audit: orphan counts for the "
    "five core FK edges of the schema (lineitem->orders/supplier/part, "
    "orders->customer, customer->nation) — the first thing a data "
    "platform checks after every load. Each edge is ONE left-anti join "
    "counted: the fact side shuffles on its FK once and the small "
    "dimension sides broadcast; at 100 TB the orders edge is the only "
    "real shuffle and it's the same co-partitioning the bucketed "
    "layout (sources/bucketing.py) already provides. Zero orphans on "
    "healthy TPC-H data — the audit's value is the day it isn't.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(fk: str, fact, key_col: str, dim, dim_key: str) -> DataFrame:
        # ONE scan of the fact side per edge: a left join against the
        # DISTINCT dimension keys (distinct => the join is 1:<=1, so
        # fact cardinality is preserved) yields both counts from one
        # aggregate — the old anti-join + separate total-count spelling
        # scanned every fact table twice per edge (guide §1.2: don't
        # compute things twice; lineitem was read 6x across its 3 edges).
        hit = dim.select(F.col(dim_key).alias(key_col)).distinct().withColumn(
            "_hit", F.lit(1)
        )
        return (
            fact.join(hit, key_col, "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(F.col("_hit").isNull(), 1)).alias("n_orphans"),
            )
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    out = edge("lineitem.l_orderkey -> orders", li.select(F.col("l_orderkey")), "l_orderkey", orders, "o_orderkey")
    out = out.unionByName(
        edge("orders.o_custkey -> customer", orders.select("o_custkey"), "o_custkey", cust, "c_custkey")
    )
    out = out.unionByName(
        edge("lineitem.l_suppkey -> supplier", li.select("l_suppkey"), "l_suppkey", supp, "s_suppkey")
    )
    out = out.unionByName(
        edge("lineitem.l_partkey -> part", li.select("l_partkey"), "l_partkey", part, "p_partkey")
    )
    out = out.unionByName(
        edge("customer.c_nationkey -> nation", cust.select("c_nationkey"), "c_nationkey", nation, "n_nationkey")
    )
    return out

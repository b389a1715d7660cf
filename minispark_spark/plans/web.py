"""Web-crawl curation operators: URL canonicalization, host-mixture
governance, HTML boilerplate stripping.

A 100 TB pretraining corpus starts as a crawl, and the first pipeline
stages are URL-level: canonicalize (a page is fetched under dozens of
URL spellings — tracking params, fragments, www/port variants), dedup
by canonical URL (far cheaper than any content dedup and always run
first), audit the host mixture (a handful of boilerplate-heavy hosts
can dominate a crawl — the Gopher/C4 reports both lead with per-host
shares), and strip HTML down to text before any quality scoring.

The testdata has no URL or HTML column, so each entry SYNTHESIZES the
raw form deterministically from (source, doc_id) with integer-mod
variants — the same trick the multimodal gates use (text -> pixels ->
codec): the operator under test is the normalizer/stripper, and the
DuckDB oracle replays the synthesis + normalization from the same
columns, verifying every rule cross-engine byte-for-byte.

Scale: every entry is a zero-shuffle scan except the canonical-dedup
group (one map-side-combined groupBy on the canonical-URL key — the
exact-dedup shape) and the host mixture (groupBy on ~#hosts keys plus
a broadcast 1-row total). No UDFs anywhere: the normalizers are
regexp/replace chains that stay inside whole-stage codegen, which is
what makes them viable at crawl scale (reference has no web operators
at all — this family is part of the training-data extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

# --- deterministic raw-URL synthesis (shared by the three entries) ---------
#
# host spelling varies by doc_id % 4 (mixed case, www, default port),
# tracking/query params by doc_id % 3, fragment by doc_id % 2; the path
# key doc_id % 50 makes distinct doc_ids collide on the SAME canonical
# URL, so canonical dedup has real duplicate groups to find.

_URL_SQL = """
    'https://' ||
    CASE doc_id % 4
        WHEN 0 THEN 'WWW.' || source || '.example.com'
        WHEN 1 THEN source || '.Example.COM'
        WHEN 2 THEN 'www.' || source || '.example.com:443'
        ELSE source || '.example.com'
    END
    || '/a/' || CAST(doc_id % 50 AS VARCHAR)
    || CASE doc_id % 3
        WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
        WHEN 1 THEN '?ref=2'
        ELSE ''
    END
    || CASE doc_id % 2 WHEN 0 THEN '#top' ELSE '' END
"""


def _raw_url_col():
    host = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("WWW."), F.col("source"), F.lit(".example.com")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("source"), F.lit(".Example.COM")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("www."), F.col("source"), F.lit(".example.com:443")))
        .otherwise(F.concat(F.col("source"), F.lit(".example.com")))
    )
    params = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&utm_campaign=x"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?ref=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(F.col("doc_id") % 2 == 0, F.lit("#top")).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/a/"),
        (F.col("doc_id") % 50).cast("string"),
        params,
        frag,
    )


# Canonicalization rules, applied in order (documented limitation: the
# utm-strip pattern assumes utm params are not FOLLOWED by kept params
# — i.e. '?utm_x=1&ref=2' would leave a dangling '&ref=2'; a production
# canonicalizer sorts+rebuilds the query string, which needs no regex
# backreferences either, but the rule chain here is what the synthesized
# variants exercise):
#   1. strip fragment          (#... to end)
#   2. lowercase               (scheme+host+path are case-normalized;
#                               the synthesized path/query are already
#                               lowercase so this is exactly host-folding)
#   3. strip default port      (:443 before the path)
#   4. strip leading www.
#   5. strip utm_* tracking params (incl. a leading '?' left empty)


def _canon_col(url):
    u = F.regexp_replace(url, "#.*$", "")
    u = F.lower(u)
    u = F.replace(u, F.lit(":443/"), F.lit("/"))
    u = F.replace(u, F.lit("://www."), F.lit("://"))
    u = F.regexp_replace(u, r"[?&]utm_[a-z]+=[a-z0-9]*", "")
    return u


_CANON_SQL = """
    regexp_replace(
        replace(replace(
            lower(regexp_replace({url}, '#.*$', '')),
            ':443/', '/'), '://www.', '://'),
        '[?&]utm_[a-z]+=[a-z0-9]*', '', 'g')
"""


@query(
    "docs_url_canonicalize",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, {_URL_SQL} AS raw_url FROM documents
        ),
        c AS (
            SELECT doc_id, raw_url,
                   {_CANON_SQL.format(url="raw_url")} AS canon_url
            FROM u
        ),
        firsts AS (
            SELECT canon_url, MIN(doc_id) AS first_doc,
                   COUNT(*) AS n_variants
            FROM c GROUP BY canon_url
        )
        SELECT c.doc_id, c.raw_url, c.canon_url,
               c.doc_id <> f.first_doc AS is_dup,
               CAST(f.n_variants AS BIGINT) AS n_variants
        FROM c JOIN firsts f USING (canon_url)
    """,
    doc="URL canonicalization + canonical-URL dedup, the first stage of "
    "any crawl pipeline: raw URLs (synthesized with mixed-case hosts, "
    "www/:443 variants, utm_* tracking params, fragments) are "
    "normalized by a 5-rule regexp/replace chain, and each doc is "
    "flagged dup if an earlier doc_id canonicalizes to the same URL. "
    "Plan: zero-UDF codegen'd string chain; one map-side-combined "
    "groupBy on the canonical key (min doc_id + count) and an equi-"
    "join back — the exact-dedup shape, shuffle keyed on the canonical "
    "URL hash. At crawl scale the groupBy key would be a 128-bit URL "
    "hash; the gate keys on the string so the oracle stays byte-exact.",
)
def docs_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id",
        _raw_url_col().alias("raw_url"),
    ).withColumn("canon_url", _canon_col(F.col("raw_url")))
    firsts = c.groupBy("canon_url").agg(
        F.min("doc_id").alias("first_doc"),
        F.count(F.lit(1)).alias("n_variants"),
    )
    return c.join(firsts, "canon_url").select(
        "doc_id",
        "raw_url",
        "canon_url",
        (F.col("doc_id") != F.col("first_doc")).alias("is_dup"),
        F.col("n_variants").cast("long").alias("n_variants"),
    )


_DOMINANT_PPM = 80_000  # flag hosts holding > 8% of corpus chars


@query(
    "docs_host_mixture",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, n_chars,
                   regexp_extract({_CANON_SQL.format(url=_URL_SQL)},
                                  '://([^/]+)/', 1) AS host
            FROM documents
        ),
        h AS (
            SELECT host, COUNT(*) AS n_docs, SUM(n_chars) AS chars
            FROM u GROUP BY host
        ),
        t AS (SELECT SUM(chars) AS total FROM h)
        SELECT host,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(chars AS BIGINT) AS n_chars,
               CAST(chars * 1000000 // total AS BIGINT) AS share_ppm,
               chars * 1000000 // total > {_DOMINANT_PPM} AS is_dominant
        FROM h CROSS JOIN t
    """,
    doc="Host-mixture governance report: per canonical host, doc count, "
    "char volume, corpus share (exact integer ppm), and a domination "
    f"flag (> {_DOMINANT_PPM / 10_000:.0f}% of corpus chars) — the "
    "crawl-audit table that catches a boilerplate-heavy host taking "
    "over the mixture (C4/Gopher both gate on per-host shares). Plan: "
    "one map-side-combined groupBy on the host (cardinality = #hosts, "
    "tiny), then a broadcast 1-row total cross-join; integer "
    "cross-multiplied shares, no doubles until none are needed.",
)
def docs_host_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "n_chars",
        F.regexp_extract(_canon_col(_raw_url_col()), "://([^/]+)/", 1).alias(
            "host"
        ),
    )
    h = u.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    t = h.agg(F.sum("chars").alias("total"))
    # DIV: exact integer division matching DuckDB's `//` (a floored
    # DOUBLE `/` can flip the last bit when the quotient is near-integer)
    share = F.expr("chars * 1000000 DIV total")
    return h.crossJoin(F.broadcast(t)).select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("chars").cast("long").alias("n_chars"),
        share.cast("long").alias("share_ppm"),
        (share > _DOMINANT_PPM).alias("is_dominant"),
    )


# --- URL blocklist filter ---------------------------------------------------
#
# UT1/adult-blocklist-style URL filtering: a (host, path-prefix) rule
# table gates URLs before fetch/ingest. The rule table is tiny (even
# UT1 is ~4M rows — broadcastable) and data-sized work is one pass.

_BLOCK_RULES = [
    (1, "src3.example.com", "/a/1"),  # prefix: blocks /a/1, /a/10../a/19
    (2, "src7.example.com", "/a/"),  # whole host
    (3, "src12.example.com", "/a/3"),
]

_BLOCK_RULES_SQL = ", ".join(
    f"({rid}, '{host}', '{pfx}')" for rid, host, pfx in _BLOCK_RULES
)


@query(
    "docs_url_blocklist_filter",
    oracle=f"""
        WITH u AS (
            SELECT doc_id,
                   {_CANON_SQL.format(url=_URL_SQL)} AS canon_url
            FROM documents
        ),
        p AS (
            SELECT doc_id, canon_url,
                   regexp_extract(canon_url, '://([^/]+)/', 1) AS host,
                   regexp_replace(regexp_extract(canon_url, '://[^/]+(/.*)$', 1),
                                  '\\?.*$', '') AS path
            FROM u
        ),
        r(rule_id, host, prefix) AS (VALUES {_BLOCK_RULES_SQL})
        SELECT p.doc_id, p.canon_url,
               MIN(r.rule_id) IS NOT NULL AS blocked,
               CAST(MIN(r.rule_id) AS INTEGER) AS rule_id
        FROM p LEFT JOIN r
          ON p.host = r.host AND starts_with(p.path, r.prefix)
        GROUP BY p.doc_id, p.canon_url
    """,
    doc="URL blocklist filtering (the UT1-style fetch/ingest gate): "
    "canonical URLs are matched against a (host, path-prefix) rule "
    "table; a URL matching any rule is blocked and tagged with the "
    "lowest matching rule id. Plan: the rule table is a broadcast "
    "dimension (even production blocklists are a few million rows), so "
    "the join is a BroadcastHashJoin on the host with the prefix test "
    "as a residual condition — one data pass, zero data-sized shuffle "
    "(the per-doc MIN groupBy keys on doc_id, which the scan already "
    "distributes evenly).",
)
def docs_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", _canon_col(_raw_url_col()).alias("canon_url"))
        .withColumn(
            "host", F.regexp_extract(F.col("canon_url"), "://([^/]+)/", 1)
        )
        .withColumn(
            "path",
            F.regexp_replace(
                F.regexp_extract(F.col("canon_url"), "://[^/]+(/.*)$", 1),
                r"\?.*$",
                "",
            ),
        )
    )
    rules = spark.createDataFrame(
        _BLOCK_RULES, "rule_id int, rhost string, prefix string"
    )
    j = p.join(
        F.broadcast(rules),
        (F.col("host") == F.col("rhost"))
        & F.expr("startswith(path, prefix)"),
        "left",
    )
    return j.groupBy("doc_id", "canon_url").agg(
        F.min("rule_id").isNotNull().alias("blocked"),
        F.min("rule_id").cast("int").alias("rule_id"),
    )


# --- HTML boilerplate strip -------------------------------------------------

_HTML_SQL = """
    '<html><head><title>' || source || '</title>'
    || '<style>p{color:red}</style>'
    || '<script>var x = "1 < 2";</script></head>'
    || '<body><p>' || text || '</p>'
    || '<footer>(c) ' || source || ' &amp; co</footer></body></html>'
"""


def _html_col():
    return F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit("</title><style>p{color:red}</style>"),
        F.lit('<script>var x = "1 < 2";</script></head><body><p>'),
        F.col("text"),
        F.lit("</p><footer>(c) "),
        F.col("source"),
        F.lit(" &amp; co</footer></body></html>"),
    )


def _strip_col(h):
    # script/style first (their CONTENT goes, not just the tags — and a
    # '<' inside script text must not derail the tag stripper), then all
    # tags, then entity decode, then whitespace collapse.
    s = F.regexp_replace(h, r"<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    s = F.replace(s, F.lit("&amp;"), F.lit("&"))
    s = F.replace(s, F.lit("&lt;"), F.lit("<"))
    s = F.replace(s, F.lit("&gt;"), F.lit(">"))
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


_STRIP_SQL = """
    trim(regexp_replace(
        replace(replace(replace(
            regexp_replace(
                regexp_replace(
                    regexp_replace({h}, '<script[^>]*>.*?</script>', ' ', 'g'),
                    '<style[^>]*>.*?</style>', ' ', 'g'),
                '<[^>]+>', ' ', 'g'),
            '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        ' +', ' ', 'g'))
"""


@query(
    "docs_html_strip",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, {_HTML_SQL} AS html FROM documents
        ),
        s AS (
            SELECT doc_id, html,
                   {_STRIP_SQL.format(h="html")} AS clean_text
            FROM h
        )
        SELECT doc_id,
               CAST(length(html) AS BIGINT) AS n_raw_chars,
               CAST(length(clean_text) AS BIGINT) AS n_clean_chars,
               CAST((length(html) - length(clean_text)) * 1000000
                    // length(html) AS BIGINT) AS boilerplate_ppm,
               clean_text
        FROM s
    """,
    doc="HTML -> text extraction (the pre-quality-scoring stage of every "
    "crawl pipeline): script/style blocks removed WITH their content "
    "(a '<' inside script text must not derail the tag stripper), all "
    "tags stripped, core entities decoded, whitespace collapsed; emits "
    "the cleaned text plus an exact integer boilerplate ratio (ppm). "
    "The HTML is synthesized deterministically from (source, text) so "
    "the DuckDB oracle replays synthesis + strip byte-for-byte — the "
    "multimodal-gate pattern applied to markup. Plan: zero-shuffle "
    "scan, the whole chain is codegen'd regexp/replace (no UDF), which "
    "is the difference between this running at crawl scale or not.",
)
def docs_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", _html_col().alias("html"))
    s = h.withColumn("clean_text", _strip_col(F.col("html")))
    bp = F.expr(
        "(length(html) - length(clean_text)) * 1000000 DIV length(html)"
    )
    return s.select(
        "doc_id",
        F.length("html").cast("long").alias("n_raw_chars"),
        F.length("clean_text").cast("long").alias("n_clean_chars"),
        bp.cast("long").alias("boilerplate_ppm"),
        "clean_text",
    )


# --- Streaming crawl-frontier gate ------------------------------------------


def frontier_gate_plan(src: DataFrame) -> DataFrame:
    """The frontier gate's pre-sink chain — shared by the streaming
    entry and the plan linter (batch frames plan the same canonicalize
    projection + exchange-on-key dedup)."""
    return src.select(_canon_col(_raw_url_col()).alias("canon_url")).dropDuplicates(
        ["canon_url"]
    )


@query(
    "stream_url_frontier_gate",
    oracle=f"""
        SELECT DISTINCT {_CANON_SQL.format(url=_URL_SQL)} AS canon_url
        FROM documents
    """,
    doc="Streaming crawl-frontier dedup: incoming docs (4-micro-batch "
    "bounded file stream, the crawl feed) are canonicalized IN-STREAM "
    "(the same 5-rule codegen'd chain as docs_url_canonicalize — "
    "expression work composes with streaming state untouched) and "
    "passed through dropDuplicates on the DERIVED canonical key, so "
    "each canonical URL crosses the gate exactly once no matter how "
    "many raw spellings arrive or how batches split. Output is the "
    "set of distinct canonical URLs (which doc carries each first is "
    "arrival-order-dependent and deliberately not emitted), equal to "
    "batch DISTINCT. State is one row per distinct canonical URL — "
    "the crawl-frontier 'seen set', sized by unique pages, not by "
    "crawl volume; production ages it with a watermark on fetch time.",
)
def stream_url_frontier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.streaming.bounded import (
        _docs_stream_src,
        _drain_to_memory,
        _read_stream,
    )

    src = _docs_stream_src(spark, sf_dir)
    gated = frontier_gate_plan(_read_stream(spark, src))
    return _drain_to_memory("stream_url_frontier_gate", sf_dir, gated, "append")


@query(
    "docs_url_canon_content_audit",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, md5(text) AS th,
                   {_CANON_SQL.format(url=_URL_SQL)} AS canon_url
            FROM documents
        )
        SELECT canon_url,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT th) AS BIGINT) AS n_distinct_texts,
               COUNT(DISTINCT th) > 1 AS over_merge
        FROM c GROUP BY canon_url
    """,
    doc="Canonical-dedup safety audit (the measured-approximation-loss "
    "pattern applied to URL dedup): canonicalization ASSERTS that all "
    "URL spellings of one canonical target serve the same page — if a "
    "canonical group contains more than one distinct text (md5), "
    "keeping one representative would DISCARD distinct content (the "
    "over-merge hazard: an aggressive normalizer that strips a "
    "load-bearing query param collapses different pages). Per group: "
    "doc count, distinct-text count, over_merge flag — the table a "
    "production pipeline reviews before enabling canonical dedup at "
    "all. Plan: one map-side-combined groupBy on the canonical key; "
    "the distinct-count runs on 128-bit text hashes, never the texts.",
)
def docs_url_canon_content_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        F.md5(F.encode(F.col("text"), "utf-8")).alias("th"),
        _canon_col(_raw_url_col()).alias("canon_url"),
    )
    return c.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("th").cast("long").alias("n_distinct_texts"),
        (F.countDistinct("th") > 1).alias("over_merge"),
    )

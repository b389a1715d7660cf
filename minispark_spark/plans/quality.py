"""Corpus-quality and pipeline-diagnostics queries.

Training-data curation primitives beyond the reference surface (the
reference has no text pipeline at all — SURVEY.md §2.4 absent list):
Gopher-style repetition filters, lexical-diversity scoring, cross-doc
repeated-n-gram detection (Lee et al. 2021 "Deduplicating Training
Data Makes Language Models Better" — the n-gram-level complement of
document-level MinHash dedup), join-key skew diagnostics, and
incremental (mergeable partial-aggregate) rollup maintenance.

Determinism: every metric is integer-count arithmetic plus at most one
IEEE division — no ln()/pow() (not correctly-rounded cross-engine, see
tfidf_top_terms), so Spark and the DuckDB oracle agree bit-for-bit.

Scale notes per query in the docstrings; none of these collect to the
driver, and the only shuffles are on (doc_id, gram) / shingle / key —
the natural partitioning keys at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

_TOKS = r"string_split_regex(trim(text), '\s+')"


def _ngram_rows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, n_tokens, g): one row per word n-gram occurrence.

    posexplode-free: a single transform(sequence(...)) generates the
    gram list JVM-side; explode fans out. Narrow until the groupBy.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    joined = " || ' ' || ".join(f"element_at(toks, i + {j})" for j in range(n))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.explode(
                # Guard: sequence(1, 0) is DESCENDING in Spark (never
                # empty), so short docs must yield array() explicitly.
                F.expr(
                    f"CASE WHEN size(toks) >= {n} THEN "
                    f"transform(sequence(1, size(toks) - {n - 1}), i -> {joined}) "
                    f"ELSE array() END"
                )
            ).alias("g"),
        )
    )


def _ngram_rows_sql(n: int) -> str:
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
        SELECT doc_id, len(toks) AS n_tokens,
               unnest(list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                      i -> {joined})) AS g
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    """


@query(
    "docs_repetition_filter",
    oracle=f"""
        WITH base AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
        bg AS ({_ngram_rows_sql(2)}),
        bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bs AS (SELECT doc_id, MAX(c) AS top_bigram_count,
                      SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_bigram_occ
               FROM bc GROUP BY 1),
        tg AS ({_ngram_rows_sql(3)}),
        tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
        ts AS (SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_trigram_occ
               FROM tc GROUP BY 1)
        SELECT base.doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(2 * COALESCE(top_bigram_count, 0) AS DOUBLE) / n_tokens
                   AS top_bigram_frac,
               CAST(2 * COALESCE(dup_bigram_occ, 0) AS DOUBLE) / n_tokens
                   AS dup_bigram_frac,
               CAST(3 * COALESCE(dup_trigram_occ, 0) AS DOUBLE) / n_tokens
                   AS dup_trigram_frac,
               (CAST(2 * COALESCE(top_bigram_count, 0) AS DOUBLE) / n_tokens <= 0.10
                AND CAST(3 * COALESCE(dup_trigram_occ, 0) AS DOUBLE) / n_tokens <= 0.05)
                   AS keep
        FROM base
        LEFT JOIN bs USING (doc_id)
        LEFT JOIN ts USING (doc_id)
    """,
    doc="Gopher-style repetition filter (Rae et al. 2021 §A1.1): fraction "
    "of tokens inside the most frequent bigram, inside any duplicated "
    "bigram, and inside any duplicated trigram; keep-flag thresholds "
    "(0.10 / 0.05) mirror the published recipe's shape. Two shuffles, "
    "both on (doc_id, gram) — doc-local keys, so at 100 TB every "
    "aggregation is map-side-combinable and skew-free (no gram is "
    "global state). Docs too short for a gram survive via LEFT JOIN "
    "with zero counts.",
)
def docs_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens")
    )
    bc = _ngram_rows(docs, 2).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    bs = bc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_bigram_occ"),
    )
    tc = _ngram_rows(docs, 3).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    ts = tc.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_trigram_occ")
    )
    top_frac = (
        F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("double") * 2 / F.col("n_tokens")
    )
    dup_bi = F.coalesce(F.col("dup_bigram_occ"), F.lit(0)).cast("double") * 2 / F.col("n_tokens")
    dup_tri = F.coalesce(F.col("dup_trigram_occ"), F.lit(0)).cast("double") * 3 / F.col("n_tokens")
    return (
        base.join(bs, "doc_id", "left")
        .join(ts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_bigram_frac"),
            dup_bi.alias("dup_bigram_frac"),
            dup_tri.alias("dup_trigram_frac"),
            ((top_frac <= 0.10) & (dup_tri <= 0.05)).alias("keep"),
        )
    )


@query(
    "docs_lexical_diversity",
    oracle=f"""
        WITH tc AS (
            SELECT doc_id, unnest(toks) AS tok
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        g AS (SELECT doc_id, tok, COUNT(*) AS c FROM tc GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio,
               CAST(SUM(c * (c - 1)) AS DOUBLE) / (SUM(c) * (SUM(c) - 1))
                   AS simpson_repetition,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS hapax_frac
        FROM g
        GROUP BY doc_id
        HAVING SUM(c) > 1
    """,
    doc="Lexical-diversity quality scores: type/token ratio, Simpson "
    "repetition index sum(c*(c-1))/(n*(n-1)) (the probability two "
    "random token draws collide — an entropy substitute that needs no "
    "ln(), so it is cross-engine bit-exact), and hapax fraction. One "
    "shuffle on (doc_id, token); all-integer sums then single IEEE "
    "divisions.",
)
def docs_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = docs.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    g = tc.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    n_types = F.count(F.lit(1))
    return (
        g.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_tokens"),
            n_types.cast("long").alias("n_types"),
            (n_types.cast("double") / n).alias("type_token_ratio"),
            (
                F.sum(F.col("c") * (F.col("c") - 1)).cast("double") / (n * (n - F.lit(1)))
            ).alias("simpson_repetition"),
            (
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double") / n_types
            ).alias("hapax_frac"),
        )
        .filter(F.col("n_tokens") > 1)
    )


@query(
    "docs_duplicate_ngram_spans",
    oracle=r"""
        WITH sh AS (
            SELECT doc_id, unnest((SELECT list_distinct(list_transform(range(1, greatest(len(hs)-7, 0)+1), i -> ((((((((((((((hs[i]) * 1000003 + hs[i+1]) % 1000000007) * 1000003 + hs[i+2]) % 1000000007) * 1000003 + hs[i+3]) % 1000000007) * 1000003 + hs[i+4]) % 1000000007) * 1000003 + hs[i+5]) % 1000000007) * 1000003 + hs[i+6]) % 1000000007) * 1000003 + hs[i+7]) % 1000000007)) FROM (SELECT list_transform(string_split_regex(trim(text), '\s+'), t -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs) _th)) AS sh FROM documents
        ),
        c AS (SELECT sh, COUNT(*) AS nd FROM sh GROUP BY 1)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS shared_frac
        FROM sh JOIN c USING (sh)
        GROUP BY doc_id
    """,
    doc="Cross-document repeated-n-gram detection (Lee et al. 2021): for "
    "each doc, how many of its distinct word-8-gram shingles also occur "
    "in at least one other document — the n-gram-level dedup signal that "
    "catches boilerplate MinHash document-level dedup misses. Shingles "
    "are rolling polynomial hashes (8 bytes each, computed once per "
    "token — see docs_decontaminate); the per-shingle occurrence count "
    "is a window over one shingle-hash exchange (the hash is "
    "near-uniform by construction), so the plan has no skewed or "
    "global stage at 100 TB.",
)
def docs_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.plans.text import _doc_shingles

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(spark, docs)
    # Per-shingle occurrence count as a window over ONE
    # shingle-partitioned exchange (guide §2.4): the previous
    # groupBy + count-back join shuffled sh into the aggregate and
    # again as the probe side for the same per-row nd value.
    n_shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        sh.withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_shared.cast("long").alias("n_shared"),
            (n_shared.cast("double") / F.count(F.lit(1))).alias("shared_frac"),
        )
    )


@query(
    "skew_key_profile",
    oracle="""
        WITH c AS (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
        s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                     CAST(COUNT(*) AS BIGINT) AS n_keys,
                     CAST(MAX(cnt) AS BIGINT) AS max_key_rows
              FROM c)
        SELECT key, CAST(cnt AS BIGINT) AS cnt, total_rows, n_keys, max_key_rows,
               CAST(max_key_rows * n_keys AS DOUBLE) / total_rows AS skew_factor
        FROM c CROSS JOIN s
        ORDER BY cnt DESC, key ASC
        LIMIT 10
    """,
    doc="Join-key skew diagnostics — the profiling pass run before "
    "choosing a salted-join strategy (operators/skew.py): per-key row "
    "counts for the 10 heaviest orders.o_custkey values plus corpus-wide "
    "skew factor max*keys/total. One shuffle on the key; the global "
    "stats frame is one broadcast row; top-10 is TakeOrderedAndProject "
    "(per-partition heaps + driver merge), never a global sort.",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    s = c.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
    )
    return (
        c.join(F.broadcast(s))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            "total_rows",
            "n_keys",
            "max_key_rows",
            (
                (F.col("max_key_rows") * F.col("n_keys")).cast("double") / F.col("total_rows")
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


_CUTOFF = "2024-01-21"


@query(
    "events_incremental_rollup",
    oracle="""
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Incremental rollup maintenance (mergeable partial aggregates): "
    "the 'historic' slice (ts < 2024-01-21) is aggregated once into "
    "day/type partials — standing in for a persisted materialized "
    "rollup — and the 'new arrivals' slice is aggregated separately and "
    "MERGED (sum-of-sums, count-of-counts, min-of-mins) without "
    "rescanning history. At 100 TB this is the difference between "
    "re-reading the table daily and touching only the new partition; "
    "the oracle proves merged partials equal a full recompute exactly "
    "(DECIMAL-exact sums, so merge order cannot perturb bits).",
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    historic = partials(events.filter(F.col("ts") < cutoff))
    arrivals = partials(events.filter(F.col("ts") >= cutoff))
    return (
        historic.unionByName(arrivals)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").cast("double").alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


CHUNK = 64
STRIDE = 48


@query(
    "docs_chunk_overlap",
    oracle=rf"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        c AS (
            SELECT doc_id, toks, len(toks) AS n,
                   unnest(range(0, 1 + CAST(ceil(greatest(len(toks) - {CHUNK}, 0)
                       / {STRIDE}.0) AS BIGINT))) AS chunk_idx
            FROM t
        )
        SELECT doc_id,
               CAST(chunk_idx AS INTEGER) AS chunk_idx,
               CAST(chunk_idx * {STRIDE} + 1 AS BIGINT) AS start_pos,
               CAST(LEAST({CHUNK}, n - chunk_idx * {STRIDE}) AS BIGINT) AS chunk_len,
               array_to_string(list_slice(toks, chunk_idx * {STRIDE} + 1,
                   chunk_idx * {STRIDE} + LEAST({CHUNK}, n - chunk_idx * {STRIDE})), ' ')
                   AS chunk_text
        FROM c
    """,
    doc=f"Overlapping-window chunking ({CHUNK}-token chunks, stride "
    f"{STRIDE} = {CHUNK - STRIDE}-token overlap): the doc -> training-"
    "window / RAG-passage fan-out. Chunk starts come from one "
    "transform(sequence(...)) per row — a narrow generate, no shuffle "
    "at all; each chunk is an array_join over a slice of the one "
    "tokenization. 100 TB of docs chunk in a single embarrassingly "
    "parallel pass.",
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_overlap(load_table(spark, sf_dir, "documents"), CHUNK, STRIDE)


def chunk_overlap(docs: DataFrame, chunk: int = CHUNK, stride: int = STRIDE) -> DataFrame:
    """Overlapping token-window chunking of any (doc_id, text) frame —
    the reusable core of docs_chunk_overlap (also the corpus-facade
    chunking primitive). Zero-shuffle narrow generate."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    c = t.select(
        "doc_id", "toks", "n",
        F.explode(
            F.expr(f"sequence(0, CAST(ceil(greatest(n - {chunk}, 0) / {stride}.0) AS BIGINT))")
        ).alias("chunk_idx"),
    )
    chunk_len = F.least(F.lit(chunk).cast("long"), F.col("n") - F.col("chunk_idx") * stride)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * stride + 1).cast("long").alias("start_pos"),
        chunk_len.cast("long").alias("chunk_len"),
        F.array_join(
            F.slice(F.col("toks"), (F.col("chunk_idx") * stride + 1).cast("int"),
                    chunk_len.cast("int")),
            " ",
        ).alias("chunk_text"),
    )


@query(
    "docs_lm_fluency",
    oracle=rf"""
        WITH ex AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
                 LATERAL (SELECT unnest(range(1, len(t))) AS i)
        ),
        counted AS (
            SELECT w1, w2, COUNT(*) AS c_big FROM ex GROUP BY 1, 2
        ),
        ctx AS (
            SELECT w1, w2, c_big, SUM(c_big) OVER (PARTITION BY w1) AS n_w1
            FROM counted
        )
        SELECT ex.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM((1000000000 * ctx.c_big) // ctx.n_w1) AS DOUBLE)
                   / (COUNT(*) * 1000000000.0) AS avg_cond_prob
        FROM ex JOIN ctx ON ctx.w1 = ex.w1 AND ctx.w2 = ex.w2
        GROUP BY ex.doc_id
    """,
    doc="Per-document LM-fluency proxy: the corpus bigram model's average "
    "conditional probability P(w_i | w_(i-1)) over the doc's own bigrams "
    "— a perplexity-style quality score with NO ln() (each conditional "
    "probability is quantized to an exact integer (1e9*c)/n via integer "
    "division, so the sum is order-independent and cross-engine "
    "bit-exact). Shuffles: bigram counting on (w1,w2) with map-side "
    "combine, the per-context window over already-aggregated rows, one "
    "scoring join back on (w1,w2), and the final per-doc aggregation — "
    "all on high-cardinality keys.",
)
def docs_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = ex.select(
        "doc_id", F.col("w").alias("w1"), F.lead("w").over(wdoc).alias("w2")
    ).filter(F.col("w2").isNotNull())
    counted = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    ctx = counted.withColumn("n_w1", F.sum("c_big").over(Window.partitionBy("w1")))
    scored = big.join(ctx, ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.expr("(1000000000 * c_big) DIV n_w1")).cast("double")
            / (F.count(F.lit(1)) * F.lit(1_000_000_000.0))
        ).alias("avg_cond_prob"),
    )


@query(
    "docs_shuffle_rank",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   list_reduce(list_prepend(0::BIGINT, list_transform(string_split(CAST(doc_id AS VARCHAR), ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
            FROM documents
        )
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT)
                   AS shuffle_pos
        FROM h
    """,
    doc="Deterministic global training-order shuffle: every doc gets a "
    "pseudo-random but reproducible position (rank of its id hash) — "
    "the 'shuffle 100 TB for training without a global sort' step. "
    "Distributed ranking (operators/ranking.py): approx-quantile hash "
    "cut-points -> pure row-local bucket assignment -> bounded "
    "per-bucket count collect -> partition-local row_number + literal "
    "offsets. No Exchange SinglePartition anywhere; the oracle is the "
    "naive global ROW_NUMBER.",
)
def docs_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from minispark_spark.functions import hashing
    from minispark_spark.operators import ranking

    docs = load_table(spark, sf_dir, "documents")
    # Cache the hashed frame: quantile pass + offsets collect + final
    # plan each read it (3 hash scans otherwise). One narrow row/doc.
    h = docs.select(
        "doc_id", hashing.poly_hash(F.col("doc_id").cast("string")).alias("hv")
    ).cache()
    cuts = ranking.quantile_cuts(h, ["hv"])
    b = h.withColumn("_b", ranking.bucket_expr("hv", cuts["hv"]))
    offsets, _total = ranking.bucket_weight_offsets(b, "_b")
    w = Window.partitionBy("_b").orderBy("hv", "doc_id")
    return b.select(
        "doc_id",
        (
            F.row_number().over(w) - 1 + ranking.offset_expr("_b", offsets)
        )
        .cast("long")
        .alias("shuffle_pos"),
    )


@query(
    "corpus_report",
    oracle=rf"""
        WITH base AS (
            SELECT doc_id, text, lang, source,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tok
            FROM documents
        ),
        top_lang AS (
            SELECT lang FROM base GROUP BY lang
            ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
               CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE)
                   / nullif(COUNT(*), 0) AS exact_dup_rate,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               (SELECT lang FROM top_lang) AS top_lang,
               CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
               CAST(MAX(n_tok) AS BIGINT) AS max_tokens
        FROM base
    """,
    doc="One-row corpus datasheet: doc/token totals, exact-duplicate "
    "rate, language and source cardinalities, dominant language "
    "(count-desc, name-asc tie-break), token-length extremes — the "
    "report card a curation pipeline publishes with every release. "
    "One global aggregate (partial-combined) plus a tiny top-1 "
    "language subquery; the distinct-text count is the only wide "
    "state and would swap to approx_count_distinct at 100 TB (the "
    "exact form here is the oracle-checkable one).",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_report_frame(load_table(spark, sf_dir, "documents"))


def corpus_report_frame(docs: DataFrame) -> DataFrame:
    """One-row datasheet over any (doc_id, text, lang, source) frame —
    the reusable core of corpus_report (also Corpus.report())."""
    base = docs.select(
        "doc_id", "text", "lang", "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    top_lang = F.broadcast(
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    n = F.count(F.lit(1))
    nd = F.countDistinct("text")
    return (
        base.agg(
            n.cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            nd.cast("long").alias("n_distinct_texts"),
            # nullif + left join below: an EMPTY corpus still reports its
            # one datasheet row (zero counts, NULL rate/lang) in both
            # engines, matching the oracle's scalar subquery semantics.
            (
                (n - nd).cast("double") / F.nullif(n.cast("double"), F.lit(0.0))
            ).alias("exact_dup_rate"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("n_tok").cast("long").alias("min_tokens"),
            F.max("n_tok").cast("long").alias("max_tokens"),
        )
        .join(top_lang, how="left")
        .select(
            "n_docs", "total_tokens", "n_distinct_texts", "exact_dup_rate",
            "n_langs", "n_sources", "top_lang", "min_tokens", "max_tokens",
        )
    )


QUOTA_PER_SOURCE = 20


@query(
    "docs_quota_sample",
    oracle=rf"""
        SELECT doc_id, source, CAST(pick AS BIGINT) AS pick
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY list_reduce(list_prepend(0::BIGINT, list_transform(string_split(CAST(doc_id AS VARCHAR), ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc * 31 + x) % 1000000007), doc_id) AS pick
            FROM documents
        )
        WHERE pick <= {QUOTA_PER_SOURCE}
    """,
    doc=f"Exact-quota stratified sampling: exactly {QUOTA_PER_SOURCE} "
    "docs per source, chosen by deterministic hash order — the "
    "build-an-eval-set primitive where per-stratum counts must be "
    "exact (rate-based sampling like docs_stratified_sample only hits "
    "quotas in expectation). The window partitions by source, so the "
    "sort is stratum-local — never a global sort; at 100 TB a skewed "
    "stratum would first pre-filter by a hash-rate bound (keep ~2x "
    "quota) before ranking.",
)
def docs_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from minispark_spark.functions import hashing

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hashing.poly_hash(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("long").alias("pick"))
        .filter(F.col("pick") <= QUOTA_PER_SOURCE)
    )


DSIR_BUCKETS = 128
DSIR_QP = 1_000_000_000  # probability quantization scale


@query(
    "docs_dsir_select",
    oracle=rf"""
        WITH occ AS (
            SELECT doc_id, lang,
                   (unnest(list_transform(
                        range(1, greatest(len(hs) - 1, 0) + 1),
                        i -> (hs[i] * 1000003 + hs[i + 1]) % 1000000007)))
                       % {DSIR_BUCKETS} AS b
            FROM (
                SELECT doc_id, lang,
                       list_transform({_TOKS},
                           t -> list_reduce(list_prepend(0::BIGINT,
                                    list_transform(string_split(t, ''),
                                        c -> ascii(c)::BIGINT)),
                                (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
                FROM documents
            )
        ),
        src AS (SELECT b, COUNT(*) AS cs FROM occ GROUP BY 1),
        tgt AS (SELECT b, COUNT(*) AS ct FROM occ WHERE lang = 'en' GROUP BY 1),
        tot AS (SELECT COUNT(*) AS ts,
                       COUNT(*) FILTER (WHERE lang = 'en') AS tt
                FROM occ),
        qt AS (
            SELECT src.b,
                   ({DSIR_QP} * (COALESCE(tgt.ct, 0) + 1)) // (tot.tt + {DSIR_BUCKETS})
                 - ({DSIR_QP} * (src.cs + 1)) // (tot.ts + {DSIR_BUCKETS}) AS w
            FROM src LEFT JOIN tgt USING (b), tot
        ),
        sc AS (SELECT occ.doc_id, SUM(qt.w) AS score
               FROM occ JOIN qt USING (b) GROUP BY 1),
        ranked AS (
            SELECT d.doc_id, d.lang, COALESCE(sc.score, 0) AS score,
                   ROW_NUMBER() OVER (ORDER BY COALESCE(sc.score, 0), d.doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        )
        SELECT doc_id, lang, CAST(score AS BIGINT) AS dsir_score,
               rn > n - n // 4 AS keep
        FROM ranked
    """,
    doc=f"DSIR-shaped data selection (Xie et al. 2023 'Data Selection "
    f"for Language Models via Importance Resampling'): each document is "
    f"featurized as hashed word-bigram counts ({DSIR_BUCKETS} buckets, "
    "the cross-engine polynomial hash), a target distribution (lang = "
    "'en' docs) is contrasted against the raw-corpus distribution, and "
    "each doc scores the sum over its bigrams of the per-bucket "
    "(target - source) quantized probability weight with add-1 "
    "smoothing; the top quarter by score is selected. The published "
    "recipe weighs log p_t/p_s; ln() is not correctly-rounded "
    "cross-engine (registry contract), so the weight is the exact-"
    f"integer quantized probability DIFFERENCE ((QP*(c+1)) DIV (tot+B), "
    "QP=1e9) — same feature space, same target-vs-raw contrast, "
    "bit-exact in both engines (at petabyte bucket counts drop QP to "
    "1e6 or widen to int128 to keep QP*(c+1) in range). Shuffles: "
    "bucket counting (128 keys, map-side combined), per-doc scoring on "
    "doc_id; the keep-quartile is the distributed exact-rank "
    "decomposition (operators/ranking.py) — approx-quantile buckets + "
    "bounded offset collect + bucket-local sorts, never a global sort.",
)
def docs_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flags = dsir_select_frame(docs, F.col("lang") == "en")
    return (
        docs.select("doc_id", "lang")
        .join(flags, "doc_id")
        .select("doc_id", "lang", "dsir_score", "keep")
    )


def dsir_select_frame(docs: DataFrame, target) -> DataFrame:
    """(doc_id, dsir_score, keep): DSIR-shaped selection flags for every
    row of ``docs`` (needs doc_id + text columns); ``target`` is the
    boolean Column defining the target distribution. See
    docs_dsir_select for semantics and scale notes."""
    from minispark_spark.functions import hashing
    from minispark_spark.operators import ranking

    from pyspark.sql import Window

    # Bigram buckets from COMBINED per-token hashes (each token hashed
    # ONCE — the _shingled trick): the per-bigram-string fold cost 54 s
    # at 500k docs (25M bigrams x ~12 chars x ~1 us/lambda); this shape
    # hashes 13M tokens once and combines with one window lead.
    toks_pos = docs.select(
        "doc_id",
        target.alias("is_t"),
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    hashed = toks_pos.select(
        "doc_id", "is_t", "pos", hashing.poly_hash(F.col("tok")).alias("h")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        hashed.select(
            "doc_id",
            "is_t",
            ((F.col("h") * hashing.COMBINE_BASE + F.lead("h", 1).over(wd)) % hashing.MOD)
            .alias("bh"),
        )
        .filter(F.col("bh").isNotNull())
    )
    occ = big.select("doc_id", "is_t", (F.col("bh") % DSIR_BUCKETS).alias("b"))
    # ONE bucket-level aggregate carries source count, target count, AND
    # (via a second agg over the 128-row result) both corpus totals —
    # the separate src/tgt/tot frames each re-ran the whole
    # tokenize+window occ pipeline, 4 executions of the heavy subtree
    # for what is one map-side-combined groupBy (guide §2.3). ct is 0
    # (not NULL) for target-empty buckets; coalesce(ct, 0) keeps the
    # weight expression identical either way.
    bc = occ.groupBy("b").agg(
        F.count(F.lit(1)).alias("cs"),
        F.count(F.when(F.col("is_t"), 1)).alias("ct"),
    )
    tot = bc.agg(
        F.sum("cs").alias("ts"),
        F.sum("ct").alias("tt"),
    )
    qt = (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.expr(
                f"({DSIR_QP} * (coalesce(ct, 0) + 1)) DIV (tt + {DSIR_BUCKETS})"
                f" - ({DSIR_QP} * (cs + 1)) DIV (ts + {DSIR_BUCKETS})"
            ).alias("w"),
        )
    )
    # qt is ≤ DSIR_BUCKETS rows — broadcast explicitly so the bigram
    # frame is never shuffled by bucket (guide §3.1: estimates after
    # aggregates are unreliable; the hint is free insurance).
    sc = occ.join(F.broadcast(qt), "b").groupBy("doc_id").agg(F.sum("w").alias("score"))
    base = (
        docs.select("doc_id")
        .join(sc, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("score"), F.lit(0)).alias("score"))
        # Cache the scored frame: the quantile pass, the offsets
        # collect, and the final plan all read it — without the cache
        # each would re-run the whole n-gram scoring pipeline (the
        # customers_rfm_segments pattern).
        .cache()
    )
    # Distributed exact global rank (ascending by (score, doc_id)):
    # keep = the top quarter, i.e. rank > n - n//4.
    cuts = ranking.quantile_cuts(base, ["score"])["score"]
    bucketed = base.withColumn("_bk", ranking.bucket_expr("score", cuts))
    offsets, total = ranking.bucket_weight_offsets(bucketed, "_bk")
    from pyspark.sql import Window

    w = Window.partitionBy("_bk").orderBy("score", "doc_id")
    rank = F.row_number().over(w) + ranking.offset_expr("_bk", offsets)
    keep_n = total // 4
    return bucketed.select(
        "doc_id",
        F.col("score").cast("long").alias("dsir_score"),
        (rank > F.lit(total - keep_n)).alias("keep"),
    )


TOKEN_BUDGET_PER_SOURCE = 300


@query(
    "docs_token_budget_mixture",
    oracle=rf"""
        SELECT doc_id, source, n_tok, cum_before,
               cum_before < {TOKEN_BUDGET_PER_SOURCE} AS keep
        FROM (
            SELECT doc_id, source, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
                       ORDER BY hv, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_before
            FROM (
                SELECT doc_id, source,
                       CAST(len({_TOKS}) AS BIGINT) AS n_tok,
                       list_reduce(list_prepend(0::BIGINT,
                           list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                               c -> ascii(c)::BIGINT)),
                           (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
                FROM documents
            )
        )
    """,
    doc=f"Token-budget mixture sampling: every data-mixing recipe "
    "(Llama/GPT-style domain weighting) is ultimately 'take N tokens "
    f"from each source'; this fills a {TOKEN_BUDGET_PER_SOURCE}-token "
    "budget per source greedily in deterministic hash order (keep while "
    "the tokens BEFORE the doc are under budget, so the boundary doc "
    "that crosses the line is still taken — exact budget cuts belong to "
    "sequence packing, docs_sequence_packing). The running sum is a "
    "stratum-local window (partition by source) — never a global sort; "
    "at 100 TB a skewed source would pre-filter by a hash-rate bound "
    "first, exactly like docs_quota_sample. Complements "
    "docs_temperature_mixture (rate-based, in expectation) with an "
    "exact-token-count contract.",
)
def docs_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_frame(
        load_table(spark, sf_dir, "documents"), TOKEN_BUDGET_PER_SOURCE
    )


def token_budget_frame(docs: DataFrame, budget: int) -> DataFrame:
    """(doc_id, source, n_tok, cum_before, keep): greedy per-source
    token-budget fill in deterministic hash order. See
    docs_token_budget_mixture for semantics and scale notes."""
    from pyspark.sql import Window

    from minispark_spark.functions import hashing

    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
        hashing.poly_hash(F.col("doc_id").cast("string")).alias("hv"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_before"),
    ).withColumn("keep", F.col("cum_before") < budget)


def _rolling8_sql() -> str:
    """DuckDB rolling 8-gram combine over token-hash list ``hs`` at
    start ``i`` — identical fold to the Spark lead-window combine."""
    from minispark_spark.functions.hashing import COMBINE_BASE, MOD

    acc = "hs[i]"
    for j in range(1, 8):
        acc = f"(({acc}) * {COMBINE_BASE} + hs[i+{j}]) % {MOD}"
    return acc


@query(
    "docs_span_scrub",
    oracle=rf"""
        WITH sh AS (
            SELECT doc_id, i AS start, {_rolling8_sql()} AS sh
            FROM (SELECT doc_id,
                         list_transform({_TOKS},
                             t -> list_reduce(list_prepend(0::BIGINT,
                                      list_transform(string_split(t, ''),
                                          c -> ascii(c)::BIGINT)),
                                  (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
                  FROM documents),
                 LATERAL (SELECT unnest(range(1, greatest(len(hs) - 7, 0) + 1)) AS i)
        ),
        c AS (SELECT sh, COUNT(*) AS nd FROM sh GROUP BY 1),
        dup AS (SELECT doc_id, start FROM sh JOIN c USING (sh) WHERE nd >= 2),
        cov AS (SELECT DISTINCT doc_id, start + j AS pos
                FROM dup, LATERAL (SELECT unnest(range(0, 8)) AS j)),
        t AS (
            SELECT doc_id, i AS pos, toks[i] AS tok
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents),
                 LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)
        ),
        kept AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
            FROM t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.pos = t.pos
            WHERE cov.pos IS NULL
            GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST(len({_TOKS}) - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed,
               COALESCE(kept.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN kept ON kept.doc_id = d.doc_id
    """,
    doc="Span-level exact dedup scrub (Lee et al. 2021, ExactSubstr): "
    "any word-8-gram occurring more than once ANYWHERE in the corpus "
    "(cross-doc or within-doc) marks its 8 tokens for removal; the "
    "query emits the scrubbed text with every marked token dropped — "
    "the destructive complement of docs_duplicate_ngram_spans (which "
    "only counts). We scrub every occurrence (the published recipe "
    "keeps one; that is a min-rank-per-shingle refinement on the same "
    "plan). Shingles are rolling polynomial hashes over per-token "
    "hashes — each token hashed once, occurrences keep their start "
    "position (no distinct). Shuffles: one shingle-hash exchange for "
    "the windowed occurrence count (near-uniform hash), coverage "
    "anti-join and "
    "text reassembly on doc_id; reassembly sorts WITHIN a doc only "
    "(array_sort of (pos, tok) structs after a doc_id groupBy) — no "
    "global sort anywhere at 100 TB.",
)
def docs_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_scrub_frame(load_table(spark, sf_dir, "documents"))


def span_scrub_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text): duplicated word-8-gram
    spans scrubbed from every doc. See docs_span_scrub for semantics
    and scale notes."""
    from pyspark.sql import Window

    from minispark_spark.functions import hashing

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    hashed = toks.select("doc_id", "pos", hashing.poly_hash(F.col("tok")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    acc = F.col("h")
    for j in range(1, 8):
        acc = (acc * hashing.COMBINE_BASE + F.lead("h", j).over(w)) % hashing.MOD
    sh = hashed.select("doc_id", F.col("pos").alias("start"), acc.alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    # Occurrence count as a window over the ONE shingle-partitioned
    # exchange instead of groupBy + count-back join: the join spelling
    # shuffled sh twice (once into the aggregate, once as the probe
    # side) for the same rows (guide §2.4 — two operations keyed the
    # same way share one exchange). Hot-shingle skew exposure is
    # unchanged: the probe side of the join was already partitioned by
    # sh.
    dup = (
        sh.withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .filter(F.col("nd") >= 2)
        .select("doc_id", "start")
    )
    cov = dup.select(
        "doc_id", F.explode(F.sequence(F.col("start"), F.col("start") + 7)).alias("pos")
    ).distinct()
    kept = toks.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("clean_text"),
    )
    base = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long").alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


K_ANONYMITY = 5


@query(
    "docs_k_anonymity",
    oracle=f"""
        WITH g AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_size
            FROM documents GROUP BY 1, 2
        ),
        t AS (SELECT CAST(SUM(group_size) AS BIGINT) AS n_total FROM g)
        SELECT lang, source, group_size,
               group_size < {K_ANONYMITY} AS at_risk,
               CAST(group_size AS DOUBLE) / n_total AS frac_of_corpus
        FROM g CROSS JOIN t
    """,
    doc=f"k-anonymity audit (k={K_ANONYMITY}) over the (lang, source) "
    "quasi-identifier: any equivalence class smaller than k can "
    "re-identify its members when joined with an external dataset — "
    "the release-risk check run alongside PII masking "
    "(pii_mask_digits) before publishing a corpus. One map-side-"
    "combined groupBy on the quasi-identifier, a one-row broadcast "
    "totals frame; generalizes to any identifier tuple. At 100 TB the "
    "class count is bounded by the identifier domain, not the corpus.",
)
def docs_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    t = g.agg(F.sum("group_size").cast("long").alias("n_total"))
    return g.join(F.broadcast(t)).select(
        "lang",
        "source",
        "group_size",
        (F.col("group_size") < K_ANONYMITY).alias("at_risk"),
        (F.col("group_size").cast("double") / F.col("n_total")).alias("frac_of_corpus"),
    )


@query(
    "docs_c4_line_dedup",
    oracle="""
        WITH sent AS (
            SELECT doc_id, CAST(idx - 1 AS INTEGER) AS sentence_idx,
                   trim(s) AS sentence
            FROM (
                SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s,
                       generate_subscripts(string_split_regex(text, '[.!?]+'), 1)
                           AS idx
                FROM documents
            )
            WHERE trim(s) <> ''
        ),
        flagged AS (
            SELECT doc_id, sentence_idx, sentence,
                   ROW_NUMBER() OVER (
                       PARTITION BY sentence ORDER BY doc_id, sentence_idx
                   ) = 1 AS keep
            FROM sent
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_sentences,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(COUNT(*) - SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               COALESCE(string_agg(CASE WHEN keep THEN sentence END, '. '
                                   ORDER BY sentence_idx), '') AS cleaned_text
        FROM flagged
        GROUP BY doc_id
    """,
    doc="C4-style destructive cross-document line dedup (Raffel et al. "
    "2020: drop every repeated line, keeping one occurrence corpus-"
    "wide): docs split into sentences, the FIRST occurrence of each "
    "distinct sentence (min (doc_id, idx)) survives, every other copy "
    "is scrubbed, and the doc text is re-assembled in original order "
    "with kept/dropped counts. The destructive line-level complement "
    "of docs_duplicate_ngram_spans (which only detects). Plan: the "
    "first-occurrence pick is min(struct(doc_id, idx)) under a "
    "map-side-combined groupBy on the sentence — NOT a row_number "
    "window, so a boilerplate line repeated 10M times partial-"
    "aggregates to one row per map task instead of landing in one "
    "window partition; the count-back equi-join on the sentence key "
    "leaves skewed probe rows to AQE. Production keys the shuffle on "
    "a 128-bit sentence hash; the oracle keys on the text itself so "
    "the comparison stays byte-exact.",
)
def docs_c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sent = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias(
                "sentence_idx", "s"
            ),
        )
        .select("doc_id", "sentence_idx", F.trim("s").alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    firsts = sent.groupBy("sentence").agg(
        F.min(F.struct("doc_id", "sentence_idx")).alias("f")
    )
    flagged = sent.join(firsts, "sentence").withColumn(
        "keep",
        (F.col("doc_id") == F.col("f.doc_id"))
        & (F.col("sentence_idx") == F.col("f.sentence_idx")),
    )
    kept = F.sum(F.col("keep").cast("long"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        kept.alias("n_kept"),
        (F.count(F.lit(1)) - kept).cast("long").alias("n_dropped"),
        F.concat_ws(
            ". ",
            F.expr(
                "transform(filter(array_sort(collect_list("
                "struct(sentence_idx, keep, sentence))), x -> x.keep),"
                " x -> x.sentence)"
            ),
        ).alias("cleaned_text"),
    )


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


@query(
    "docs_gopher_quality",
    oracle=rf"""
        WITH m AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS toks,
                 string_split(text, chr(10)) AS lines,
                 length(text) - length(replace(text, '#', '')) AS n_hash,
                 (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                      AS BIGINT) AS total_chars,
                 CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                      AS BIGINT) AS alpha_words,
                 CAST(len(list_filter(toks, t -> list_contains(
                      [{", ".join(f"'{w}'" for w in _GOPHER_STOPS)}], lower(t))))
                      AS BIGINT) AS stop_hits,
                 CAST(n_hash + n_ell AS BIGINT) AS n_symbols,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))
                      AS BIGINT) AS bullet_lines,
                 CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$')))
                      AS BIGINT) AS ellipsis_lines
          FROM m
        )
        SELECT doc_id, n_words,
               CAST(total_chars AS DOUBLE) / n_words AS mean_word_len,
               CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
               CAST(alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
               CAST(bullet_lines AS DOUBLE) / n_lines AS bullet_line_frac,
               CAST(ellipsis_lines AS DOUBLE) / n_lines AS ellipsis_line_frac,
               stop_hits,
               (n_words BETWEEN 50 AND 100000
                AND total_chars >= 3 * n_words AND total_chars <= 10 * n_words
                AND 10 * n_symbols <= n_words
                AND 10 * bullet_lines <= 9 * n_lines
                AND 10 * ellipsis_lines <= 3 * n_lines
                AND 5 * alpha_words >= 4 * n_words
                AND stop_hits >= 2) AS keep
        FROM s
    """,
    doc="Full Gopher quality rule set (Rae et al. 2021 §A1.1): word-count "
    "bounds [50, 100k], mean word length [3, 10], symbol-to-word ratio "
    "('#' + '...') <= 0.1, bullet-started lines <= 90%, ellipsis-ended "
    "lines <= 30%, >= 80% of words containing an alphabetic character, "
    "and >= 2 hits on the 8-word English stop list. Every threshold is "
    "evaluated as an integer cross-multiplied comparison (no float "
    "compares), so Spark and DuckDB agree bit-for-bit; the reported "
    "fractions are single IEEE divisions of exact integers. Pure "
    "row-local projection — zero shuffles, trivially parallel at "
    "100 TB, and all counting runs JVM-side via array lambdas "
    "(no Python UDF).",
)
def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_gopher_metrics(docs).select("doc_id", *GOPHER_METRIC_COLS)


GOPHER_METRIC_COLS = (
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "alpha_word_frac",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "stop_hits",
    "keep",
)

_GOPHER_HELPER_COLS = (
    "_toks", "_lines", "_n_hash", "_n_ell",
    "_total_chars", "_alpha_words", "_n_symbols",
    "_n_lines", "_bullet_lines", "_ellipsis_lines",
)


def with_gopher_metrics(docs: DataFrame) -> DataFrame:
    """``docs`` + the eight Gopher metric/keep columns (row-local, zero
    shuffles; all counting is JVM array lambdas). Shared by the
    registry query and the Corpus facade — ONE definition of the rules.
    """
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)
    d = (
        docs.withColumn("_toks", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("_lines", F.split(F.col("text"), "\n"))
        .withColumn(
            "_n_hash", F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        )
        .withColumn(
            "_n_ell",
            F.expr("(length(text) - length(replace(text, '...', ''))) div 3"),
        )
        .withColumn("n_words", F.size("_toks").cast("long"))
        .withColumn(
            "_total_chars", F.expr("aggregate(_toks, 0L, (a, t) -> a + length(t))")
        )
        .withColumn(
            "_alpha_words",
            F.expr(r"size(filter(_toks, t -> t rlike '[A-Za-z]'))").cast("long"),
        )
        .withColumn(
            "stop_hits",
            F.expr(
                f"size(filter(_toks, t -> array_contains(array({stops}), lower(t))))"
            ).cast("long"),
        )
        .withColumn("_n_symbols", (F.col("_n_hash") + F.col("_n_ell")).cast("long"))
        .withColumn("_n_lines", F.size("_lines").cast("long"))
        .withColumn(
            "_bullet_lines",
            F.expr(r"size(filter(_lines, l -> l rlike '^\\s*[-*•]'))").cast("long"),
        )
        .withColumn(
            "_ellipsis_lines",
            F.expr(r"size(filter(_lines, l -> l rlike '\\.\\.\\.\\s*$'))").cast("long"),
        )
    )
    nw = F.col("n_words")
    nl = F.col("_n_lines")
    return (
        d.withColumn("mean_word_len", F.col("_total_chars").cast("double") / nw)
        .withColumn("symbol_ratio", F.col("_n_symbols").cast("double") / nw)
        .withColumn("alpha_word_frac", F.col("_alpha_words").cast("double") / nw)
        .withColumn("bullet_line_frac", F.col("_bullet_lines").cast("double") / nl)
        .withColumn("ellipsis_line_frac", F.col("_ellipsis_lines").cast("double") / nl)
        .withColumn(
            "keep",
            nw.between(50, 100000)
            & (F.col("_total_chars") >= 3 * nw)
            & (F.col("_total_chars") <= 10 * nw)
            & (10 * F.col("_n_symbols") <= nw)
            & (10 * F.col("_bullet_lines") <= 9 * nl)
            & (10 * F.col("_ellipsis_lines") <= 3 * nl)
            & (5 * F.col("_alpha_words") >= 4 * nw)
            & (F.col("stop_hits") >= 2),
        )
        .drop(*_GOPHER_HELPER_COLS)
    )

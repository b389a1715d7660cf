"""Text-analysis queries over the documents table.

Large-scale training-data-pipeline primitives (not in the reference —
these extend the engine per the build brief): token counting, quality
scoring, language ID, document fingerprinting, corpus vocabulary
stats. All are narrow projections/aggregations of built-in-function
expressions — no Python in the hot path, no unnecessary shuffles
(only the vocab query shuffles, on the token key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import hashing, text
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table


@query(
    "text_stats",
    oracle=f"""
        SELECT doc_id,
               CAST({text.token_count_sql("text")} AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_measured,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                   / {text.token_count_sql("text")} AS mean_token_len,
               {text.quality_score_sql("text")} AS quality
        FROM documents
    """,
    doc="Per-document token count, char count, mean token length, quality score.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("double")
    return docs.select(
        "doc_id",
        text.token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars_measured"),
        (n_alpha / text.token_count(t)).alias("mean_token_len"),
        text.quality_score(t).alias("quality"),
    )


@query(
    "lang_id",
    oracle=f"""
        SELECT doc_id, lang AS labeled_lang,
               {text.predict_lang_sql("text")} AS predicted_lang
        FROM documents
    """,
    doc="Stopword-heuristic language ID vs the labeled lang column.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text.predict_lang(F.col("text")).alias("predicted_lang"),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
        SELECT doc_id, {hashing.poly_hash_sql("text")} AS fingerprint
        FROM documents
    """,
    doc="Rolling polynomial-hash document fingerprint (cross-engine exact; "
    "hashing.py). The production path would use xxhash64 — same plan shape.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", hashing.poly_hash(F.col("text")).alias("fingerprint"))


@query(
    "vocab_top_tokens",
    oracle=f"""
        SELECT tok, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest({text.tokens_sql("text")}) AS tok FROM documents)
        GROUP BY tok
        ORDER BY freq DESC, tok
        LIMIT 25
    """,
    doc="Corpus vocabulary: top-25 tokens by frequency (explode → shuffle on "
    "token key → count; the canonical map-reduce word count).",
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(25)
    )


@query(
    "docs_quality_by_lang",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CAST({text.token_count_sql("text")} AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST({text.quality_score_sql("text")} AS DECIMAL(18,9))) AS DOUBLE)
                   / COUNT(*) AS avg_quality
        FROM documents
        GROUP BY lang
    """,
    doc="Quality rollup by language label. Double quality scores are quantized "
    "to DECIMAL(18,9) before SUM so addition order can't perturb bits.",
)
def docs_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(t).cast("bigint")).alias("total_tokens"),
        (F.sum(text.quality_score(t).cast("decimal(18,9)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_quality"
        ),
    )


@query(
    "bpe_token_stats",
    oracle=f"""
        SELECT doc_id,
               CAST({text.bpe_token_count_sql("text")} AS INTEGER) AS n_bpe_tokens,
               CAST({text.token_count_sql("text")} AS INTEGER) AS n_ws_tokens,
               CAST({text.bpe_token_count_sql("text")} AS DOUBLE)
                   / {text.token_count_sql("text")} AS bpe_per_word
        FROM documents
    """,
    doc="BPE-ish subword token counting (letter/digit/punct runs with "
    "optional leading space) next to whitespace counts — the "
    "tokens-per-word ratio is the standard pre-training corpus stat.",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        text.bpe_token_count(t).alias("n_bpe_tokens"),
        text.token_count(t).alias("n_ws_tokens"),
        (text.bpe_token_count(t).cast("double") / text.token_count(t)).alias("bpe_per_word"),
    )


SAMPLE_PCT = 20


@query(
    "docs_stratified_sample",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {hashing.poly_hash_sql("text")} % 100 < {SAMPLE_PCT}
    """,
    doc=f"Deterministic {SAMPLE_PCT}% stratified sample: membership is a "
    "pure function of content hash, so the sample is reproducible across "
    "runs/engines/cluster sizes and composes with incremental data "
    "(unlike rand()-based sampling). The per-language stratification is "
    "inherent: hash buckets are unbiased within every stratum.",
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        hashing.poly_hash(F.col("text")) % 100 < SAMPLE_PCT
    ).select("doc_id", "lang")


@query(
    "tfidf_top_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({text.tokens_sql("text")}) AS tok FROM documents
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, tok, tf, df,
               CAST(tf AS DOUBLE) * n_docs / df AS tf_rarity
        FROM tf JOIN df USING (tok) CROSS JOIN n
        WHERE doc_id < 50
    """,
    doc="TF-IDF-style term weighting (log-free rarity variant tf*N/df so "
    "both engines agree bit-for-bit; ln() is not correctly-rounded "
    "cross-engine). Two shuffles: (doc,term) counts and term document "
    "frequency; the 1-row corpus count broadcasts.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df_, "tok")
        .join(F.broadcast(n))
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id", "tok", "tf", "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias("tf_rarity"),
        )
    )


@query(
    "docs_sentences",
    oracle="""
        SELECT doc_id,
               CAST(idx - 1 AS INTEGER) AS sentence_idx,
               trim(s) AS sentence,
               CAST(length(trim(s)) AS INTEGER) AS n_chars
        FROM (
            SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s,
                   generate_subscripts(string_split_regex(text, '[.!?]+'), 1) AS idx
            FROM documents
        )
        WHERE trim(s) <> ''
    """,
    doc="Sentence segmentation: one row per sentence via posexplode over "
    "a regex split — the doc -> unit fan-out every text pipeline starts "
    "with (chunking for training windows, per-sentence scoring). Narrow "
    "generate, no shuffle.",
)
def docs_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("sentence_idx", "s"),
        )
        .select(
            "doc_id",
            "sentence_idx",
            F.trim(F.col("s")).alias("sentence"),
            F.length(F.trim(F.col("s"))).alias("n_chars"),
        )
        .filter(F.col("sentence") != "")
    )


# Count-min sketch parameters: CMS_D independent hash rows x CMS_W
# buckets = 2048 counters total, regardless of vocabulary size.
CMS_D = 4
CMS_W = 512


def _cms_oracle() -> str:
    from minispark_spark.functions.hashing import minhash_perm_sql, poly_hash_sql

    pairs = "\n            UNION ALL ".join(
        f"SELECT tok, cnt, {i} AS row_i, ({minhash_perm_sql('h', i)}) % {CMS_W} AS bucket FROM hashed"
        for i in range(CMS_D)
    )
    return f"""
        WITH tok_counts AS (
            SELECT tok, COUNT(*) AS cnt
            FROM (SELECT unnest({text.tokens_sql("text")}) AS tok FROM documents)
            GROUP BY tok
        ),
        hashed AS (
            SELECT tok, cnt, {poly_hash_sql("tok")} AS h FROM tok_counts
        ),
        pairs AS (
            {pairs}
        ),
        sketch AS (
            SELECT row_i, bucket, CAST(SUM(cnt) AS BIGINT) AS bucket_count
            FROM pairs GROUP BY row_i, bucket
        )
        SELECT p.tok,
               CAST(p.cnt AS BIGINT) AS exact_count,
               CAST(MIN(s.bucket_count) AS BIGINT) AS est_count
        FROM pairs p JOIN sketch s ON p.row_i = s.row_i AND p.bucket = s.bucket
        GROUP BY p.tok, p.cnt
        ORDER BY est_count DESC, tok
        LIMIT 100
    """


@query(
    "heavy_hitters_cms",
    oracle=_cms_oracle(),
    doc="Heavy hitters via a count-min sketch (d=4 rows x w=512 buckets, "
    "deterministic cross-engine polynomial hashes). The sketch is a "
    "fixed-size groupBy — map-side partial aggregation collapses every "
    "partition to <= d*w counters, so the shuffle is O(d*w) no matter how "
    "many tokens or executors (the point of a sketch at 100 TB). Estimates "
    "come from broadcasting the tiny sketch back against candidate keys; "
    "exact_count is included so the overestimate bias is visible.",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.functions.hashing import minhash_perm, poly_hash

    docs = load_table(spark, sf_dir, "documents")
    tok_counts = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hashed = tok_counts.withColumn("h", poly_hash(F.col("tok")))
    pairs = hashed.select(
        "tok",
        "cnt",
        F.posexplode(
            F.array(*[minhash_perm(F.col("h"), i) % CMS_W for i in range(CMS_D)])
        ).alias("row_i", "bucket"),
    )
    sketch = pairs.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("bucket_count"))
    return (
        pairs.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("bucket_count").alias("est_count"))
        .select(
            "tok",
            F.col("cnt").cast("long").alias("exact_count"),
            F.col("est_count").cast("long").alias("est_count"),
        )
        .orderBy(F.col("est_count").desc(), "tok")
        .limit(100)
    )


def _doc_shingles(spark: SparkSession, docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, sh): distinct rolling-hash word n-grams of ``docs``.
    Filter the input BEFORE calling: a source predicate cannot push
    through the per-doc window, but it pushes into the scan here."""
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    hashed = toks.select("doc_id", "pos", hashing.poly_hash(F.col("tok")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    b, p = hashing.COMBINE_BASE, hashing.MOD
    acc = F.col("h")
    for j in range(1, n):
        acc = (acc * b + F.lead("h", j).over(w)) % p
    return (
        hashed.select("doc_id", acc.alias("sh"))
        .filter(F.col("sh").isNotNull())
        .distinct()
    )


@query(
    "docs_decontaminate",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, source,
                   unnest({hashing.shingle_hashes_sql("text", 8)}) AS sh
            FROM documents
        ),
        ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
        SELECT s.doc_id, COUNT(DISTINCT s.sh) AS n_shared_ngrams
        FROM sh s JOIN ev ON ev.sh = s.sh
        WHERE s.source <> 'src0'
        GROUP BY 1
    """,
    doc="Train/eval decontamination: flag training docs (source <> 'src0') "
    "sharing any word-8-gram with the held-out eval set (source = 'src0') — "
    "the standard benchmark-contamination check run before training. "
    "Shingles are rolling polynomial hashes (int64), not strings: each "
    "token is hashed ONCE (posexplode + 7 window leads — string 8-gram "
    "materialization measured 19x slower at sf0.1), and the probe join "
    "ships 8 bytes per shingle. Both engines hash identically, so "
    "hashed-shingle overlap is deterministic. The eval shingle set is "
    "small by construction and broadcasts: the (huge) training side is "
    "probed map-side with zero shuffle; only the per-doc count aggregates.",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Each side shingles only its own rows: the source predicate sits
    # below posexplode/window, so it reaches the parquet scan — the eval
    # side reads ~1/20th of the table and the training side never
    # computes eval shingles.
    ev = (
        _doc_shingles(spark, docs.filter(F.col("source") == "src0"))
        .select("sh")
        .distinct()
    )
    train = _doc_shingles(spark, docs.filter(F.col("source") != "src0"))
    return (
        train.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("sh")).alias("n_shared_ngrams"))
    )


@query(
    "docs_sequence_packing",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS off
            FROM t
        )
        SELECT CAST(FLOOR(off / 256.0) AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        FROM c
        GROUP BY 1
    """,
    doc="Sequence packing for training: assign each document to a 256-token "
    "pack by its exclusive running token offset in doc_id order (documents "
    "straddle pack boundaries — continuous packing), then summarize packs. "
    "Deterministic global packing needs a total order, but NOT a global "
    "sort: shards are doc_id-range buckets (operators/ranking.py), each "
    "shard's base offset is the prefix sum of lower shards' token totals "
    "(one bounded collect), and the running sum inside each shard is a "
    "partition-local window — two fully-parallel passes, no Exchange "
    "SinglePartition.",
)
def docs_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


def pack_sequences(docs: DataFrame, budget: int = 256) -> DataFrame:
    """Continuous sequence packing of any (doc_id, text) frame into
    ``budget``-token packs — the reusable core of docs_sequence_packing
    (also the corpus-facade packing primitive). Distributed ranking:
    doc_id-range shards + bounded offset collect, no global sort."""
    from pyspark.sql import Window

    from minispark_spark.operators import ranking

    # Cache the per-doc token counts: the quantile pass, the offsets
    # collect, and the final plan each read this frame — uncached, each
    # re-tokenizes the corpus (3 full text passes per query). One
    # (doc_id, long) row per doc.
    t = docs.select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n_tok")
    ).cache()
    cuts = ranking.quantile_cuts(t, ["doc_id"])
    b = t.withColumn("_b", ranking.bucket_expr("doc_id", cuts["doc_id"]))
    offsets, _total = ranking.bucket_weight_offsets(b, "_b", "n_tok")
    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = b.select(
        "n_tok",
        (
            F.coalesce(F.sum("n_tok").over(w), F.lit(0))
            + ranking.offset_expr("_b", offsets)
        )
        .cast("long")
        .alias("off"),
    )
    return (
        c.select(
            "n_tok", F.floor(F.col("off") / float(budget)).cast("long").alias("pack_id")
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
    )


_SENTENCES_ORACLE = """
        SELECT doc_id,
               CAST(idx - 1 AS INTEGER) AS sentence_idx,
               trim(s) AS sentence,
               CAST(length(trim(s)) AS INTEGER) AS n_chars
        FROM (
            SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s,
                   generate_subscripts(string_split_regex(text, '[.!?]+'), 1) AS idx
            FROM documents
        )
        WHERE trim(s) <> ''
    """


@query(
    "docs_sentences_udtf",
    oracle=_SENTENCES_ORACLE,
    doc="The docs_sentences fan-out expressed as a Python UDTF called "
    "via LATERAL in SQL (functions/udtfs.py) — pinned to the exact "
    "output of the built-in posexplode path so the two stay "
    "interchangeable; demonstrates the row->rows table-function API "
    "the reference lacks entirely (reference parser.py:365-378 rejects "
    "all function calls).",
)
def docs_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM udtf_docs, LATERAL split_sentences(text) s
        """
    )


@query(
    "lang_confusion",
    oracle=f"""
        WITH p AS (
            SELECT lang AS labeled_lang,
                   {text.predict_lang_sql("text")} AS predicted_lang
            FROM documents
        ),
        t AS (SELECT labeled_lang, COUNT(*) AS n_labeled FROM p GROUP BY 1)
        SELECT p.labeled_lang, p.predicted_lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_labeled) AS frac_of_labeled
        FROM p JOIN t USING (labeled_lang)
        GROUP BY p.labeled_lang, p.predicted_lang
    """,
    doc="Language-ID confusion matrix: counts and per-label fractions of "
    "(labeled, predicted) pairs — the accuracy report for the stopword "
    "heuristic classifier (lang_id). Two small aggregations on the "
    "label keys; the per-label totals ride along in the same shuffle.",
)
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        F.col("lang").alias("labeled_lang"),
        text.predict_lang(F.col("text")).alias("predicted_lang"),
    )
    t = p.groupBy("labeled_lang").agg(F.count(F.lit(1)).alias("n_labeled"))
    return (
        p.join(t, "labeled_lang")
        .groupBy("labeled_lang", "predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.count(F.lit(1)).cast("double") / F.any_value("n_labeled")
            ).alias("frac_of_labeled"),
        )
    )


BM25_N_QUERIES = 10
BM25_Q_TERMS = 3
BM25_TOP_K = 10
# k1=1.2, b=0.75 in 100-fixed-point; idf surrogate in 1e6 fixed-point.
_BM25_K1_100 = 120
_BM25_B_100 = 75


@query(
    "docs_bm25_topk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({text.tokens_sql("text")}) AS tok FROM documents
        ),
        tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   (CAST(SUM(dl) AS BIGINT) * 100) // COUNT(*) AS av100
            FROM dl
        ),
        q AS (
            SELECT doc_id AS query_id, unnest(qt) AS tok
            FROM (SELECT doc_id,
                         list_distinct(({text.tokens_sql("text")})[1:{BM25_Q_TERMS}]) AS qt
                  FROM documents WHERE doc_id < {BM25_N_QUERIES})
        ),
        contrib AS (
            SELECT q.query_id, tf.doc_id,
                   (
                     ((tf.tf * {_BM25_K1_100 + 100} * 10000)
                      // (tf.tf * 100
                          + ({_BM25_K1_100} * ((100 - {_BM25_B_100})
                              + ({_BM25_B_100} * dl.dl * 100) // stats.av100)) // 100))
                     * ((1000000 * (stats.n_docs - df.df + 1)) // (df.df + 1))
                   ) AS c
            FROM q
            JOIN tf ON tf.tok = q.tok
            JOIN dl ON dl.doc_id = tf.doc_id
            JOIN df ON df.tok = q.tok
            CROSS JOIN stats
        )
        SELECT query_id, doc_id, score, rk FROM (
            SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY SUM(c) DESC, doc_id) AS INTEGER) AS rk
            FROM contrib GROUP BY query_id, doc_id
        ) WHERE rk <= {BM25_TOP_K}
    """,
    doc=f"BM25-shaped lexical retrieval: top-{BM25_TOP_K} docs per query "
    f"(queries = first {BM25_Q_TERMS} distinct tokens of docs "
    f"0..{BM25_N_QUERIES - 1}) under the BM25 term-saturation formula "
    "(k1=1.2, b=0.75 length normalization) with an ln-free integer idf "
    "surrogate (1e6*(N-df+1)) DIV (df+1) — monotone in the true idf, so "
    "rankings keep BM25's character while every operation is exact "
    "integer multiply/DIV, bit-identical cross-engine (registry "
    "contract; ln() is not correctly rounded). The lexical complement "
    "of the ANN family — hybrid search is this ∪ ann_cosine_topk. "
    "Shuffles: tf/dl/df aggregations on doc-local or near-uniform term "
    "keys with map-side combine; query terms and the one-row corpus "
    "stats broadcast; the final top-k windows partition by query_id. "
    "At petabyte N drop the 1e6 idf scale to keep products in int64.",
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = (
        docs.filter(F.col("doc_id") < BM25_N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice(text.tokens(F.col("text")), 1, BM25_Q_TERMS))
            ).alias("tok"),
        )
    )
    return bm25_score(q, *bm25_index(docs))


def bm25_index(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, dl, df, stats) postings frames for any (doc_id, text)
    corpus — the prepared state a search service keeps warm
    (streaming/search.py serves query micro-batches against one build).

    Everything derives from ONE tokenize subtree: tf is the postings
    frame, dl = SUM(tf) per doc (identical to counting the token
    stream — a doc's length IS the sum of its term frequencies), df
    and stats fold from tf/dl. The old spelling built dl from the raw
    token stream, so the corpus tokenize + explode executed once per
    derived frame (4x per query); with every frame rooted at the SAME
    tf aggregate, runtime exchange reuse runs it once (guide §2.4 —
    an explicit .cache() was tried and measured SLOWER at gate SF:
    the cache write cost more than the reuse it duplicated; serving
    deployments cache explicitly via build_search_index instead)."""
    toks = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("(CAST(SUM(dl) AS BIGINT) * 100) DIV COUNT(*)").alias("av100"),
    )
    return tf, dl, df, stats


def bm25_score(
    q: DataFrame,
    tf: DataFrame,
    dl: DataFrame,
    df: DataFrame,
    stats: DataFrame,
    top_k: int = BM25_TOP_K,
) -> DataFrame:
    """(query_id, doc_id, score, rk) for a (query_id, tok) query frame
    against a bm25_index — the docs_bm25_topk scoring tail."""
    contrib = (
        F.broadcast(q)
        .join(tf, "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(df.join(F.broadcast(q.select("tok").distinct()), "tok")), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"((tf * {_BM25_K1_100 + 100} * 10000)"
                f" DIV (tf * 100"
                f"      + ({_BM25_K1_100} * ((100 - {_BM25_B_100})"
                f"          + ({_BM25_B_100} * dl * 100) DIV av100)) DIV 100))"
                f" * ((1000000 * (n_docs - df + 1)) DIV (df + 1))"
            ).alias("c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("long").alias("score"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "doc_id", "score", "rk")
    )


RRF_K = 60
RRF_SCALE = 1_000_000
HYBRID_TOP_K = 10


def _hybrid_oracle() -> str:
    import minispark_spark.operators.similarity  # noqa: F401  (registers ann_cosine_topk)
    from minispark_spark.registry import REGISTRY

    bm25 = REGISTRY["docs_bm25_topk"].oracle
    ann = REGISTRY["ann_cosine_topk"].oracle
    return f"""
        WITH b AS ({bm25}),
        a AS ({ann}),
        u AS (
            SELECT COALESCE(b.query_id, a.query_id) AS query_id,
                   COALESCE(b.doc_id, a.neighbor_id) AS cand_id,
                   COALESCE({RRF_SCALE} // ({RRF_K} + b.rk), 0)
                 + COALESCE({RRF_SCALE} // ({RRF_K} + a.rk), 0) AS rrf
            FROM b FULL OUTER JOIN a
              ON a.query_id = b.query_id AND a.neighbor_id = b.doc_id
        )
        SELECT query_id, cand_id, CAST(rrf AS BIGINT) AS rrf_score,
               CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT query_id, cand_id, rrf,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rrf DESC, cand_id) AS rk
            FROM u
        ) WHERE rk <= {HYBRID_TOP_K}
    """


@query(
    "hybrid_search_rrf",
    oracle=_hybrid_oracle(),
    doc=f"Hybrid search via reciprocal-rank fusion (Cormack et al. "
    f"2009): the BM25-shaped lexical top-k and the exact-cosine vector "
    f"top-k (same query ids — doc_id and vec_id share the id space) "
    f"fused by RRF = sum over systems of {RRF_SCALE} DIV ({RRF_K} + "
    "rank) — integer division, so the fusion is bit-exact cross-engine "
    "with no floats at all. This is the standard production retrieval "
    "stack (sparse ∪ dense → fuse); both legs are already-verified "
    "registry queries, and the fusion is one full-outer join on "
    "(query, candidate) plus a per-query window — tiny frames at any "
    "corpus size (k rows per query per system).",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators.similarity import ann_cosine_topk

    b = docs_bm25_topk(spark, sf_dir).select(
        F.col("query_id").alias("b_q"), F.col("doc_id").alias("b_c"), F.col("rk").alias("brk")
    )
    a = ann_cosine_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_q"),
        F.col("neighbor_id").alias("a_c"),
        F.col("rk").alias("ark"),
    )
    u = b.join(
        a, (F.col("a_q") == F.col("b_q")) & (F.col("a_c") == F.col("b_c")), "full_outer"
    ).select(
        F.coalesce(F.col("b_q"), F.col("a_q")).alias("query_id"),
        F.coalesce(F.col("b_c"), F.col("a_c")).alias("cand_id"),
        (
            F.coalesce(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + brk)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + ark)"), F.lit(0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("cand_id"))
    return (
        u.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= HYBRID_TOP_K)
        .select(
            "query_id",
            "cand_id",
            F.col("rrf").cast("long").alias("rrf_score"),
            "rk",
        )
    )


@query(
    "docs_readability",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
                   len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0))
                   AS flesch,
               0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               + 11.8 * (CAST(n_syllables AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0))
               - 15.59 AS fk_grade
        FROM m
    """,
    doc="Flesch reading ease + Flesch-Kincaid grade per document — the "
    "readability scorer that complements the Gopher rules in a quality "
    "pipeline (e.g. keep 30 <= flesch <= 90 for training text). "
    "Counts are regex-exact integers (non-space runs for words, "
    "[.!?]+ groups for sentences floored at 1, vowel-group runs as "
    "the syllable heuristic — the textstat convention); the scores "
    "are a fixed IEEE sequence over repr-literal coefficients, so the "
    "oracle matches bit-for-bit. Row-local, zero shuffles, and the "
    "scan reads only (doc_id, text).",
)
def docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_readability(docs.select("doc_id", "text"))


def with_readability(df: DataFrame) -> DataFrame:
    """Readability columns over ANY (doc_id, text, ...) frame — the
    docs_readability core, shared with Corpus.readability. Row-local,
    zero shuffles."""
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0)))
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
    )
    m = df.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sentences.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.nullif(
        F.col("n_words").cast("double"), F.lit(0.0)
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("flesch"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fk_grade"),
    )

"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003).

The MOSS algorithm: hash every word 3-gram, slide a window of W
consecutive shingle hashes over the document, keep the minimum of each
window. The selected set is a position-robust fingerprint — any shared
substring of length >= W+2 words GUARANTEES a shared fingerprint
(the winnowing guarantee), unlike MinHash which is probabilistic.
Used for plagiarism/code-clone detection and substring-level
training-data dedup (the exact-match complement of
docs_duplicate_ngram_spans).

Scale shape: fingerprint selection is one narrow pass per doc (token
hash + two window functions, all partitioned by doc_id — no global
sort); cross-doc matching groups by fingerprint and expands i<j pairs
JVM-side (functions/pairs.py), with hot fingerprints (> CAP docs —
boilerplate phrases) dropped exactly like the prefix filter drops hot
shingles. Everything is exact integer arithmetic on the repo's
cross-engine polynomial hash, so DuckDB replays it bit-for-bit.

No reference analogue (reference has no text pipeline — SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import hashing
from minispark_spark.functions.pairs import sorted_pair_structs
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

WINNOW_W = 4  # window: W consecutive shingle hashes
WINNOW_CAP = 64  # fingerprints in more docs than this are boilerplate
WINNOW_MIN_SHARED = 2  # pairs must share >= this many fingerprints


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): the distinct winnowing-selected shingle hashes per
    document. Docs with fewer than W shingles contribute their single
    global min (the standard short-document degenerate case)."""
    b, p = hashing.COMBINE_BASE, hashing.MOD
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    hashed = toks.select("doc_id", "pos", hashing.poly_hash(F.col("tok")).alias("h"))
    wo = Window.partitionBy("doc_id").orderBy("pos")
    sh = ((F.col("h") * b + F.lead("h", 1).over(wo)) % p * b + F.lead("h", 2).over(wo)) % p
    shing = hashed.select("doc_id", "pos", sh.alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    wd = Window.partitionBy("doc_id")
    wmin = wo.rowsBetween(0, WINNOW_W - 1)
    x = shing.select(
        "doc_id",
        F.count(F.lit(1)).over(wd).alias("n"),
        F.min("sh").over(wmin).alias("wmin"),
        F.min("sh").over(wd).alias("gmin"),
        F.row_number().over(wo).alias("rn"),
    )
    # ONE pass, no union: a union of two filters over the same windowed
    # subtree executed the token-explode + window chain TWICE (Spark
    # does not CSE across union branches — guide §2.4 repeated
    # subtrees, the round-7 sweep's miss). The short-doc branch
    # (n < W: emit the single global min) is equivalent to keeping the
    # rn == 1 row with fp = min-over-partition — same rows as the old
    # groupBy-min, computed in the same window pass as n.
    fp = F.when(F.col("n") >= WINNOW_W, F.col("wmin")).otherwise(F.col("gmin"))
    keep = F.when(
        F.col("n") >= WINNOW_W, F.col("rn") <= F.col("n") - WINNOW_W + 1
    ).otherwise(F.col("rn") == 1)
    return x.filter(keep).select("doc_id", fp.alias("fp")).distinct()


def _fps_sql() -> str:
    b, p, w = hashing.COMBINE_BASE, hashing.MOD, WINNOW_W
    return f"""
        th AS (SELECT doc_id, {hashing.token_hashes_sql('text')} AS th
               FROM documents),
        shl AS (SELECT doc_id,
                      list_transform(range(1, greatest(len(th)-2, 0) + 1),
                          i -> ((th[i]*{b} + th[i+1]) % {p} * {b} + th[i+2]) % {p})
                          AS hs
                FROM th),
        fpl AS (SELECT doc_id,
                      CASE WHEN len(hs) >= {w} THEN
                           list_distinct(list_transform(range(1, len(hs) - {w} + 2),
                               i -> list_aggregate(hs[i:i+{w}-1], 'min')))
                           WHEN len(hs) >= 1 THEN [list_aggregate(hs, 'min')]
                           ELSE [] END AS fps
               FROM shl),
        f AS (SELECT doc_id, unnest(fps) AS fp FROM fpl)
    """


@query(
    "docs_winnow_fingerprints",
    oracle=f"""
        WITH {_fps_sql()}
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
               MIN(fp) AS min_fp, MAX(fp) AS max_fp,
               CAST(SUM(fp) AS BIGINT) AS fp_sum
        FROM f GROUP BY doc_id
    """,
    doc=f"Per-document winnowing fingerprint summary (W={WINNOW_W} over "
    "word-3-gram polynomial hashes): count, min/max, and checksum of "
    "the selected set — the density diagnostic run before building a "
    "fingerprint index. One narrow pass per doc (windows partitioned "
    "by doc_id), one map-combinable aggregate; the oracle replays "
    "hashing, sliding-window selection, and dedup from the raw text.",
)
def docs_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_fingerprints(docs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        F.sum("fp").alias("fp_sum"),
    )


@query(
    "docs_winnow_match",
    oracle=f"""
        WITH {_fps_sql()},
        g AS (SELECT fp, COUNT(*) AS c FROM f GROUP BY fp),
        keep AS (SELECT fp FROM g WHERE c BETWEEN 2 AND {WINNOW_CAP}),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS shared
            FROM f a
            JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
            JOIN keep k ON k.fp = a.fp
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= {WINNOW_MIN_SHARED}
    """,
    doc="Cross-document fingerprint matching: document pairs sharing >= "
    f"{WINNOW_MIN_SHARED} winnowing fingerprints — deterministic "
    "substring-overlap candidates (the winnowing guarantee: a shared "
    f"run of >= {WINNOW_W + 2} words always shares a fingerprint), vs "
    "MinHash's probabilistic whole-doc similarity. Fingerprints in > "
    f"{WINNOW_CAP} docs are dropped as boilerplate (dormant at gate "
    "SFs — max observed 8 — and the exact guard the prefix filter "
    "applies to hot shingles, bounding pair expansion at crawl scale). "
    "One shuffle groups postings per fingerprint; pairs expand "
    "JVM-side from grouped arrays (functions/pairs.py).",
)
def docs_winnow_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_match_pairs(docs)


def winnow_match_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared) fingerprint-sharing pairs of any
    (doc_id, text) frame — the docs_winnow_match core, shared with the
    Corpus facade (equivalence pinned in test_corpus.py)."""
    fps = winnow_fingerprints(docs)
    groups = fps.groupBy("fp").agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
    kept = groups.filter((F.size("ids") >= 2) & (F.size("ids") <= WINNOW_CAP))
    return (
        kept.select(F.explode(sorted_pair_structs("ids", "doc_a", "doc_b")).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
    )

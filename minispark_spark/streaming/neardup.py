"""Streaming near-duplicate detection against a static corpus.

The online half of the MinHash+LSH dedup family (operators/dedup.py):
documents arrive as a stream (crawl output, ingestion queue) and each
must be checked against an already-indexed corpus before admission —
the standard "is this new page a near-dup of anything we already
have?" gate in a training-data pipeline.

Streaming-native design (NOT a foreachBatch re-run of the batch job):

* The corpus is indexed ONCE (``build_neardup_index``): per-doc
  shingle sets and banded MinHash buckets, both plain cached
  DataFrames.
* Per-document signatures on the stream are computed **per row**
  (Arrow-batched ``mapInPandas``, no window, no aggregation) — the
  batch path's groupBy-over-exploded-shingles is replaced by a
  row-local numpy fold, because a streaming groupBy would need
  watermark state for what is conceptually a pure map. Hash parity
  with the JVM/DuckDB implementations is bit-exact and pinned by
  tests.
* Candidate generation and verification are **stateless stream-static
  joins** (append mode, no watermark, no state store): explode the 4
  band hashes, join the static bucket table, join the static shingle
  sets, compute exact Jaccard JVM-side (``array_intersect``), filter.

At scale each micro-batch therefore costs: one narrow Python pass over
the new docs + two broadcast-able joins against the (static, cached)
index — no shuffle of the corpus, ever. A pair that collides in
multiple bands surfaces once per band; sinks dedup per micro-batch
with ``dropDuplicates`` in ``foreachBatch`` (batch-local, stateless) —
kept out of the stream plan so no unbounded state is needed.

No reference analogue (the reference has no streaming at all,
SURVEY §2.4); extends the build brief's dedup family to streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from minispark_spark.functions.hashing import BASE, COMBINE_BASE, MINHASH_PERMS, MOD
from minispark_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERMS,
    ROWS_PER_BAND,
    _band_hash,
    _minhash_sig_exprs,
    shingled_docs,
)
from minispark_spark.sources.tables import load_table

SHINGLE_N = 3

_SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shingles", ArrayType(LongType())),
        *[StructField(f"band{b}", LongType()) for b in range(N_BANDS)],
    ]
)


def _py_poly_hash(s: str) -> int:
    """Python twin of hashing.poly_hash (bit-exact; pinned by tests)."""
    acc = 0
    for ch in s:
        acc = (acc * BASE + ord(ch)) % MOD
    return acc


def _py_shingles(text: str, n: int = SHINGLE_N) -> list[int]:
    """Distinct word n-gram shingle hashes — the row-local twin of
    operators/dedup._shingled (posexplode + window lead there; a plain
    fold here, since a stream row owns all its tokens)."""
    toks = text.strip().split()
    hs = [_py_poly_hash(t) for t in toks]
    out = []
    for i in range(len(hs) - n + 1):
        acc = hs[i]
        for j in range(1, n):
            acc = (acc * COMBINE_BASE + hs[i + j]) % MOD
        out.append(acc)
    return sorted(set(out))


def _py_bands(shingles: list[int]) -> list[int | None]:
    if not shingles:
        return [None] * N_BANDS
    mins = [
        min((sh * a + b) % MOD for sh in shingles) for a, b in MINHASH_PERMS[:N_PERMS]
    ]
    bands = []
    for b in range(N_BANDS):
        acc = mins[b * ROWS_PER_BAND]
        for j in range(1, ROWS_PER_BAND):
            acc = (acc * BASE + mins[b * ROWS_PER_BAND + j]) % MOD
        bands.append(acc)
    return bands


def stream_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles, band0..bandN): row-local shingle + MinHash
    band computation via Arrow-batched ``mapInPandas`` — valid on a
    streaming DataFrame because nothing aggregates across rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in _SIG_SCHEMA.fields}
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                shingles = _py_shingles(txt or "")
                bands = _py_bands(shingles)
                rows["doc_id"].append(doc_id)
                rows["shingles"].append(shingles)
                for b in range(N_BANDS):
                    rows[f"band{b}"].append(bands[b])
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(batches, schema=_SIG_SCHEMA)


def build_neardup_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Index the corpus once: (buckets, shingle_sets), both cached.

    buckets: (band, bucket, corpus_doc_id) — the LSH probe target.
    shingle_sets: (corpus_doc_id, corpus_shingles array<long>, n) —
    the verification side. Exactly the batch pipeline's intermediate
    shapes (operators/dedup.py:226), persisted for reuse across every
    micro-batch instead of recomputed per query.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = shingled_docs(docs)
    sigs = sh.groupBy("doc_id").agg(*_minhash_sig_exprs())
    buckets = (
        sigs.select(
            "doc_id",
            *[_band_hash(b).alias(f"band{b}") for b in range(N_BANDS)],
        )
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket")
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select("corpus_doc_id", "bb.band", "bb.bucket")
        .cache()
    )
    shingle_sets = (
        sh.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("sh")).alias("corpus_shingles"))
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            "corpus_shingles",
            F.size("corpus_shingles").alias("corpus_n"),
        )
        .cache()
    )
    return buckets, shingle_sets


def near_dup_stream(
    docs: DataFrame, buckets: DataFrame, shingle_sets: DataFrame
) -> DataFrame:
    """(doc_id, corpus_doc_id, jaccard) for every stream doc whose
    exact Jaccard vs an LSH-candidate corpus doc clears the threshold.

    Stateless: two stream-static joins + row-local expressions; runs in
    append mode with no watermark. May emit one row per colliding band
    for the same pair — dedup in the sink (``foreachBatch`` +
    ``dropDuplicates``), never in the stream plan.
    """
    sigs = stream_signatures(docs)
    exploded = sigs.select(
        "doc_id",
        "shingles",
        F.size("shingles").alias("n"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", "n", "bb.band", "bb.bucket")
    cand = exploded.join(buckets, ["band", "bucket"]).join(
        shingle_sets, "corpus_doc_id"
    )
    inter = F.size(F.array_intersect("shingles", "corpus_shingles"))
    jac = inter.cast("double") / (F.col("n") + F.col("corpus_n") - inter)
    return (
        cand.filter(F.col("doc_id") != F.col("corpus_doc_id"))
        .select("doc_id", "corpus_doc_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def build_neardup_index_from_docs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``build_neardup_index`` over an explicit (doc_id, text) frame."""
    sh = shingled_docs(docs)
    sigs = sh.groupBy("doc_id").agg(*_minhash_sig_exprs())
    buckets = (
        sigs.select(
            "doc_id",
            *[_band_hash(b).alias(f"band{b}") for b in range(N_BANDS)],
        )
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket")
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select("corpus_doc_id", "bb.band", "bb.bucket")
        .cache()
    )
    shingle_sets = (
        sh.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("sh")).alias("corpus_shingles"))
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            "corpus_shingles",
            F.size("corpus_shingles").alias("corpus_n"),
        )
        .cache()
    )
    return buckets, shingle_sets


# --- Registry entry: the batch twin of the streaming probe ------------------
#
# Same code path the stream runs (row-local mapInPandas signatures +
# the two index joins), driven as a batch query so the driver's DuckDB
# oracle verifies the Python-side hash fold cross-engine. The split is
# deterministic: corpus = doc_id % 5 != 0, incoming = doc_id % 5 == 0.

from minispark_spark.operators.dedup import (  # noqa: E402
    _SHINGLED_SQL,
    _SIG_SQL,
    _band_hash_sql,
)
from minispark_spark.registry import query as _query  # noqa: E402

_NDS_BANDS_SQL = ", ".join(f"({_band_hash_sql(b)}) AS band{b}" for b in range(N_BANDS))


def _nds_bucket_union(src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, band{b} AS bucket FROM {src}"
        for b in range(N_BANDS)
    )


@_query(
    "neardup_incoming_probe",
    oracle=f"""
        WITH sh AS ({_SHINGLED_SQL}),
        corp_sh AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
        inc_sh  AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
        corp_sigs AS (
            SELECT doc_id, {_NDS_BANDS_SQL}
            FROM (SELECT doc_id, {_SIG_SQL} FROM corp_sh GROUP BY doc_id)
        ),
        inc_sigs AS (
            SELECT doc_id, {_NDS_BANDS_SQL}
            FROM (SELECT doc_id, {_SIG_SQL} FROM inc_sh GROUP BY doc_id)
        ),
        corp_b AS ({_nds_bucket_union("corp_sigs")}),
        inc_b  AS ({_nds_bucket_union("inc_sigs")}),
        cand AS (
            SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS corpus_doc_id
            FROM inc_b i JOIN corp_b c
              ON i.band = c.band AND i.bucket = c.bucket
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        verified AS (
            SELECT c.doc_id, c.corpus_doc_id, COUNT(s2.sh) AS i
            FROM cand c
            JOIN inc_sh s1 ON s1.doc_id = c.doc_id
            LEFT JOIN corp_sh s2
              ON s2.doc_id = c.corpus_doc_id AND s2.sh = s1.sh
            GROUP BY 1, 2
        )
        SELECT v.doc_id, v.corpus_doc_id,
               CAST(v.i AS DOUBLE) / (si.n + sc.n - v.i) AS jaccard
        FROM verified v
        JOIN sizes si ON si.doc_id = v.doc_id
        JOIN sizes sc ON sc.doc_id = v.corpus_doc_id
        WHERE CAST(v.i AS DOUBLE) / (si.n + sc.n - v.i) >= {JACCARD_THRESHOLD}
    """,
    doc="Batch twin of the STREAMING near-dup gate (near_dup_stream): "
    "incoming docs (doc_id % 5 = 0) probe the indexed corpus (the rest) "
    "through the identical code path the stream runs — row-local "
    "Arrow-batched Python MinHash signatures (no window, no groupBy on "
    "the probe side) + two stateless index joins + exact-Jaccard "
    "verification. The oracle replays signatures, banding, candidate "
    "join, and verification in DuckDB, so the Python hash fold is "
    "pinned cross-engine; test_streaming_neardup.py separately pins "
    "stream-vs-batch equality. At scale each micro-batch is one narrow "
    "Python pass + joins against the cached static index — the corpus "
    "is never reshuffled.",
)
def neardup_incoming_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0).repartition(
        spark.sparkContext.defaultParallelism
    )
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    buckets, shingle_sets = build_neardup_index_from_docs(corpus)
    return near_dup_stream(incoming, buckets, shingle_sets).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )

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
    """``build_neardup_index`` over an explicit (doc_id, text) frame.

    ONE per-doc aggregate feeds both index sides (round 8, guide §2.4):
    signatures and shingle sets come out of the same groupBy over the
    shingled frame, cached and materialized eagerly once — the old
    two-independent-caches spelling re-ran the whole shingle pipeline
    (token explode + window + per-doc aggregate) once per side."""
    sh = shingled_docs(docs)
    sigs = (
        sh.groupBy("doc_id")
        .agg(
            *_minhash_sig_exprs(),
            F.array_sort(F.collect_set("sh")).alias("corpus_shingles"),
        )
        .cache()
    )
    sigs.count()  # materialize once — the probe's single action would
    # otherwise race the two index-side scans into a double compute
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
    )
    shingle_sets = sigs.select(
        F.col("doc_id").alias("corpus_doc_id"),
        "corpus_shingles",
        F.size("corpus_shingles").alias("corpus_n"),
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


# --- Incremental index maintenance (append WITHOUT corpus recompute) --------
#
# The production dedup-at-ingest contract: the LSH index is a PERSISTED
# table (postings + shingle sets as parquet), and a new document batch is
# admitted by (1) computing signatures for the NEW docs only, (2) appending
# them as new files under the index root, (3) atomically publishing a new
# manifest listing the applied batches — the Iceberg append shape: data
# files are immutable, commits are manifest swaps, readers always see a
# complete version. The already-indexed corpus is never re-read, never
# re-shingled, never re-shuffled: appending B docs to an N-doc index costs
# O(B), not O(N + B).
#
# Idempotence (the restart contract): every append carries a batch_id; a
# batch already in the manifest is a no-op, so a crashed-and-replayed
# ingest job (or a speculative retry) cannot double-insert postings. An
# interrupted append leaves orphan files but no manifest pointing at them
# — readers never observe partial state. Publication is a single
# os.replace of the _CURRENT pointer under the sidecache flock.

import json as _json
import os as _os


def _index_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Uncached (postings, shingle_sets) for a (doc_id, text) frame —
    the unit of both the initial build and every incremental append."""
    sh = shingled_docs(docs)
    sigs = sh.groupBy("doc_id").agg(*_minhash_sig_exprs())
    postings = (
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
    )
    shingle_sets = (
        sh.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("sh")).alias("corpus_shingles"))
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            "corpus_shingles",
            F.size("corpus_shingles").alias("corpus_n"),
        )
    )
    return postings, shingle_sets


def _read_current_manifest(index_dir: str) -> dict:
    """Current manifest: ``applied`` is the REPLAY LEDGER (every batch_id
    ever committed — never shrinks, so a replayed batch stays a no-op
    even after its files were compacted away), ``live`` is the list of
    batch directories a reader unions (compaction rewrites this)."""
    cur = _os.path.join(index_dir, "_CURRENT")
    if not _os.path.exists(cur):
        return {"version": 0, "applied": [], "live": []}
    with open(cur) as fh:
        version = int(fh.read().strip())
    with open(_os.path.join(index_dir, "manifests", f"v{version}.json")) as fh:
        m = _json.load(fh)
    m.setdefault("live", list(m["applied"]))
    return m


def _publish_manifest(index_dir: str, manifest: dict) -> None:
    """Write manifests/v<k>.json, then atomically swing _CURRENT to it.
    A reader either sees the old pointer or the new one — never a
    partially-written manifest (the json is fully written and fsynced
    before the pointer moves)."""
    mdir = _os.path.join(index_dir, "manifests")
    _os.makedirs(mdir, exist_ok=True)
    path = _os.path.join(mdir, f"v{manifest['version']}.json")
    with open(path, "w") as fh:
        _json.dump(manifest, fh)
        fh.flush()
        _os.fsync(fh.fileno())
    tmp = _os.path.join(index_dir, "_CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(manifest["version"]))
        fh.flush()
        _os.fsync(fh.fileno())
    _os.replace(tmp, _os.path.join(index_dir, "_CURRENT"))


# The manifest protocol is index-agnostic (applied replay ledger + live
# file list + atomic _CURRENT swing); the IVF vector index
# (operators/vecindex.py) commits through the same functions.
read_current_manifest = _read_current_manifest
publish_manifest = _publish_manifest


def _append_neardup_index_unlocked(
    index_dir: str, docs: DataFrame, batch_id: str
) -> bool:
    """Lock-free append body — caller must already hold the index's
    build_lock (flock does NOT nest within a process: re-acquiring it
    from a foreachBatch sink while the orchestrating builder holds it
    would deadlock the stream)."""
    manifest = _read_current_manifest(index_dir)
    if batch_id in manifest["applied"]:
        return False
    postings, shingle_sets = _index_frames(docs)
    pdir = _os.path.join(index_dir, "postings", f"batch={batch_id}")
    sdir = _os.path.join(index_dir, "shingles", f"batch={batch_id}")
    postings.write.mode("overwrite").parquet(pdir)
    shingle_sets.write.mode("overwrite").parquet(sdir)
    _publish_manifest(
        index_dir,
        {
            "version": manifest["version"] + 1,
            "applied": manifest["applied"] + [batch_id],
            "live": manifest["live"] + [batch_id],
        },
    )
    return True


def append_neardup_index(
    spark: SparkSession, index_dir: str, docs: DataFrame, batch_id: str
) -> bool:
    """Append one document batch to the persisted LSH index; returns
    True if applied, False if ``batch_id`` was already in the manifest
    (the idempotent-replay no-op). Only the NEW docs are shingled and
    hashed; existing index files are untouched."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        return _append_neardup_index_unlocked(index_dir, docs, batch_id)


def load_neardup_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, shingle_sets) for the CURRENT published version —
    the union of the LIVE batch directories (immutable files; compaction
    replaces many live dirs with one without touching the replay
    ledger). Same shapes as build_neardup_index, so near_dup_stream
    probes it unchanged."""
    manifest = _read_current_manifest(index_dir)
    if not manifest["live"]:
        raise ValueError(f"near-dup index at {index_dir} has no published batches")
    pdirs = [
        _os.path.join(index_dir, "postings", f"batch={b}") for b in manifest["live"]
    ]
    sdirs = [
        _os.path.join(index_dir, "shingles", f"batch={b}") for b in manifest["live"]
    ]
    return spark.read.parquet(*pdirs), spark.read.parquet(*sdirs)


def compact_neardup_index(spark: SparkSession, index_dir: str) -> bool:
    """Rewrite the live batch directories into ONE compacted pair and
    publish a manifest whose ``live`` list is just the compacted batch —
    the Iceberg rewrite-data-files shape. The ``applied`` replay ledger
    is carried over UNCHANGED, so a replayed pre-compaction batch_id is
    still a no-op (the critical append/compact interaction). Old files
    become orphans (unreferenced by any current manifest); a vacuum by
    age is the production companion, not done here. Returns False when
    there is nothing to compact (<= 1 live dir)."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = _read_current_manifest(index_dir)
        if len(manifest["live"]) <= 1:
            return False
        postings, shingle_sets = load_neardup_index(spark, index_dir)
        new_version = manifest["version"] + 1
        cid = f"compact-v{new_version}"
        pdir = _os.path.join(index_dir, "postings", f"batch={cid}")
        sdir = _os.path.join(index_dir, "shingles", f"batch={cid}")
        postings.coalesce(1).write.mode("overwrite").parquet(pdir)
        shingle_sets.coalesce(1).write.mode("overwrite").parquet(sdir)
        _publish_manifest(
            index_dir,
            {
                "version": new_version,
                "applied": manifest["applied"],
                "live": [cid],
            },
        )
        return True


def _ensure_incremental_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the gate's two-batch incremental index for ``sf_dir``
    (base = doc_id%5 in (1,2), delta = doc_id%5 in (3,4)), idempotently,
    keyed to the source mtime; replays the delta append to exercise the
    restart no-op on every run."""
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    index_dir = side_dir("/tmp/minispark_neardup_index", sf_dir, "lsh")
    stamp = index_dir + ".stamp"
    src_mtime = str(
        _os.path.getmtime(_os.path.join(sf_dir, "documents.parquet"))
    )
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            _os.makedirs(index_dir, exist_ok=True)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 == 1).unionByName(
        docs.filter(F.col("doc_id") % 5 == 2)
    )
    delta = docs.filter((F.col("doc_id") % 5 == 3) | (F.col("doc_id") % 5 == 4))
    append_neardup_index(spark, index_dir, base, batch_id="base")
    append_neardup_index(spark, index_dir, delta, batch_id="delta-1")
    # Restart replay: the same batch_id again MUST be a manifest no-op.
    replay = append_neardup_index(spark, index_dir, delta, batch_id="delta-1")
    assert replay is False, "idempotent replay inserted duplicate postings"
    return index_dir


@_query(
    "neardup_index_append",
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
    doc="Incremental dedup-index maintenance (the dedup-at-ingest "
    "production contract): the LSH index is PERSISTED parquet "
    "(postings + shingle sets) built from a base batch (doc_id%5 in "
    "1,2), then a second batch (doc_id%5 in 3,4) is APPENDED — only "
    "the new docs are shingled/hashed, existing files untouched, "
    "commit = atomic manifest swap (the Iceberg append shape), replay "
    "of an applied batch_id is a no-op (asserted in-gate on every "
    "run). Incoming docs (doc_id%5=0) then probe the published index. "
    "The DuckDB oracle is a FULL REBUILD over the unioned corpus — "
    "hash-matching it proves append-then-probe == rebuild-then-probe "
    "(the events_scd2_apply equivalence pattern). Appending B docs to "
    "an N-doc index costs O(B), not O(N+B).",
)
def neardup_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = _ensure_incremental_index(spark, sf_dir)
    buckets, shingle_sets = load_neardup_index(spark, index_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    return near_dup_stream(incoming, buckets, shingle_sets).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )


# --- Streaming index ingest: foreachBatch -> append_neardup_index -----------
#
# The full dedup-at-ingest loop: corpus documents arrive as a REAL
# micro-batch stream and each batch is appended to the persisted LSH
# index through the manifest-committed append path. Exactly-once falls
# out of composing the two idempotence layers: Structured Streaming
# replays an interrupted batch with the SAME batch_id, and
# append_neardup_index no-ops on an already-applied batch_id — so a
# crash between index write and checkpoint commit cannot double-insert
# postings (the classic foreachBatch at-least-once hole, closed by the
# manifest).


def _docs_stream_src(spark: SparkSession, sf_dir: str) -> str:
    """Corpus docs (doc_id % 5 != 0) as a 4-file parquet dir usable as
    a file-stream source (cached per sf_dir + source mtime)."""
    import os

    from minispark_spark.sources.sidecache import build_lock, side_dir

    dest = side_dir("/tmp/minispark_streamsrc", sf_dir, "docs_corpus4")
    stamp = dest + ".stamp"
    mt = str(os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
    with build_lock(dest):
        if not (os.path.exists(stamp) and open(stamp).read() == mt):
            docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            docs.filter(F.col("doc_id") % 5 != 0).repartition(4).write.mode(
                "overwrite"
            ).parquet(dest)
            with open(stamp, "w") as fh:
                fh.write(mt)
    return dest


@_query(
    "stream_neardup_index_ingest",
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
    doc="STREAMING dedup-index ingest, driver-visible: corpus docs "
    "stream in 4 real micro-batches (maxFilesPerTrigger=1) through "
    "foreachBatch -> append_neardup_index, each batch committed as an "
    "atomic manifest version keyed by the streaming batch_id — so a "
    "replayed batch (the foreachBatch at-least-once hole) is a "
    "manifest no-op and the index is exactly-once by construction. "
    "Incoming docs then probe the streamed-in index; the DuckDB "
    "oracle is the FULL REBUILD over the whole corpus, so "
    "hash-matching proves streamed incremental ingest == one-shot "
    "rebuild. Per batch the cost is O(batch docs): signatures for new "
    "docs only, two parquet appends, one manifest swap.",
)
def stream_neardup_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    src = _docs_stream_src(spark, sf_dir)
    index_dir = side_dir("/tmp/minispark_neardup_stream_index", sf_dir, "lsh")
    ckpt = side_dir("/tmp/minispark_neardup_stream_index", sf_dir, "ckpt")
    stamp = index_dir + ".stamp"
    mt = str(os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
    with build_lock(index_dir):
        if not (os.path.exists(stamp) and open(stamp).read() == mt):
            # Fresh checkpoint with the fresh index (the r3 lesson:
            # never reuse a checkpoint against a rebuilt sink).
            shutil.rmtree(index_dir, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
            os.makedirs(index_dir, exist_ok=True)
            schema = spark.read.parquet(src).schema
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )

            def sink(batch_df: DataFrame, batch_id: int) -> None:
                # Unlocked variant: this whole drain runs under the
                # index's build_lock (held by the enclosing with-block);
                # flock does not nest within a process.
                _append_neardup_index_unlocked(index_dir, batch_df, f"b{batch_id}")

            q = (
                sdf.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .queryName(
                    "stream_neardup_ingest_"
                    + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            n_batches = len(q.recentProgress)
            applied = _read_current_manifest(index_dir)["applied"]
            # Every executed micro-batch must have committed exactly one
            # manifest version. Multi-batch exercise on real data is
            # pinned separately (tests/test_streaming_neardup.py) — a
            # degenerate corpus (empty/one-file source) legitimately
            # drains in <=1 batch.
            assert len(applied) == n_batches, (
                f"manifest {applied} out of step with {n_batches} batches"
            )
            with open(stamp, "w") as fh:
                fh.write(mt)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    if not _read_current_manifest(index_dir)["applied"]:
        # Empty corpus -> zero batches -> nothing published: the probe
        # result is the empty frame with the oracle schema.
        return spark.createDataFrame(
            [], "doc_id long, corpus_doc_id long, jaccard double"
        )
    buckets, shingle_sets = load_neardup_index(spark, index_dir)
    return near_dup_stream(incoming, buckets, shingle_sets).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )


@_query(
    "neardup_index_compact",
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
    doc="Dedup-index COMPACTION (the Iceberg rewrite-data-files shape): "
    "after the base+delta appends, the live batch directories are "
    "rewritten into one compacted pair and the manifest's live list is "
    "swapped to it, while the applied replay ledger carries over "
    "unchanged — asserted in-gate: a replayed pre-compaction batch_id "
    "is STILL a no-op after compaction, and re-compacting a single "
    "live dir is a no-op. Probing the compacted index must hash-match "
    "the full-rebuild DuckDB oracle, proving compaction preserved the "
    "index contents exactly. Old files become unreferenced orphans "
    "(vacuum-by-age is the production companion). At 100 TB this is "
    "what keeps reader file counts O(1) instead of O(ingested "
    "batches).",
)
def neardup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    index_dir = side_dir("/tmp/minispark_neardup_compact", sf_dir, "lsh")
    stamp = index_dir + ".stamp"
    src_mtime = str(_os.path.getmtime(_os.path.join(sf_dir, "documents.parquet")))
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            _os.makedirs(index_dir, exist_ok=True)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 == 1).unionByName(
        docs.filter(F.col("doc_id") % 5 == 2)
    )
    delta = docs.filter((F.col("doc_id") % 5 == 3) | (F.col("doc_id") % 5 == 4))
    append_neardup_index(spark, index_dir, base, batch_id="base")
    append_neardup_index(spark, index_dir, delta, batch_id="delta-1")
    compact_neardup_index(spark, index_dir)
    m = _read_current_manifest(index_dir)
    # Replay ledger survives compaction (the critical interaction):
    assert m["applied"] == ["base", "delta-1"], m
    assert len(m["live"]) == 1 and m["live"][0].startswith("compact-"), m
    replay = append_neardup_index(spark, index_dir, delta, batch_id="delta-1")
    assert replay is False, "replayed batch re-applied after compaction"
    assert compact_neardup_index(spark, index_dir) is False  # single live dir
    buckets, shingle_sets = load_neardup_index(spark, index_dir)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    return near_dup_stream(incoming, buckets, shingle_sets).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )


def vacuum_neardup_index(index_dir: str) -> list[str]:
    """Delete batch directories not referenced by the CURRENT
    manifest's live list (compaction orphans) and manifests older than
    the current version; returns the removed batch ids. Safe by
    construction: replay protection reads the ``applied`` ledger in the
    manifest, never the files, so deleting a replayed batch's orphaned
    files cannot re-open the replay hole. Production would add an age
    threshold to preserve time-travel; the gate index keeps none."""
    import shutil

    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = _read_current_manifest(index_dir)
        live = set(manifest["live"])
        removed = []
        for sub in ("postings", "shingles"):
            root = _os.path.join(index_dir, sub)
            if not _os.path.isdir(root):
                continue
            for d in _os.listdir(root):
                if d.startswith("batch=") and d.split("=", 1)[1] not in live:
                    shutil.rmtree(_os.path.join(root, d))
                    removed.append(d.split("=", 1)[1])
        mdir = _os.path.join(index_dir, "manifests")
        if _os.path.isdir(mdir):
            for m in _os.listdir(mdir):
                if m != f"v{manifest['version']}.json":
                    _os.remove(_os.path.join(mdir, m))
        return sorted(set(removed))


# --- Compliance DELETE for the dedup index ----------------------------------

NDS_DELETE_MOD, NDS_DELETE_REM = 100, 3  # gate: forget doc_id % 100 == 3


def delete_from_neardup_index(
    spark: SparkSession, index_dir: str, predicate, op_id: str
) -> bool:
    """Physically erase all index state for docs matching ``predicate``
    (over ``corpus_doc_id``) — postings AND shingle sets — rewriting
    ONLY the live segment pairs that contain matches (the
    ann_ivf_index_delete shape on the dedup index). ``op_id`` joins the
    applied replay ledger; old files become vacuum-able orphans."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = _read_current_manifest(index_dir)
        if op_id in manifest["applied"]:
            return False
        new_version = manifest["version"] + 1
        new_live = []
        for b in manifest["live"]:
            pdir = _os.path.join(index_dir, "postings", f"batch={b}")
            sdir = _os.path.join(index_dir, "shingles", f"batch={b}")
            post = spark.read.parquet(pdir)
            # A segment is skippable only when NEITHER file matches:
            # today a batch's postings and shingles doc-sets coincide,
            # but that invariant is a write-path accident — a future
            # doc with shingles-but-no-postings rows would otherwise
            # leave its shingle set behind (a forgotten-doc leak in a
            # compliance delete). Probe both files before skipping.
            if (
                post.filter(predicate).limit(1).count() == 0
                and spark.read.parquet(sdir).filter(predicate).limit(1).count()
                == 0
            ):
                new_live.append(b)
                continue
            nb = f"{b}-del{new_version}"
            post.filter(~predicate).write.mode("overwrite").parquet(
                _os.path.join(index_dir, "postings", f"batch={nb}")
            )
            spark.read.parquet(sdir).filter(~predicate).write.mode(
                "overwrite"
            ).parquet(_os.path.join(index_dir, "shingles", f"batch={nb}"))
            new_live.append(nb)
        _publish_manifest(
            index_dir,
            {
                "version": new_version,
                "applied": manifest["applied"] + [op_id],
                "live": new_live,
            },
        )
        return True


@_query(
    "neardup_index_delete",
    oracle=f"""
        WITH sh AS ({_SHINGLED_SQL}),
        corp_sh AS (
            SELECT * FROM sh
            WHERE doc_id % 5 <> 0
              AND NOT (doc_id % {NDS_DELETE_MOD} = {NDS_DELETE_REM})
        ),
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
    doc="Dedup-index compliance DELETE (right-to-be-forgotten): every "
    f"posting and shingle set of docs with doc_id % {NDS_DELETE_MOD} "
    f"== {NDS_DELETE_REM} is physically erased from a copy of the "
    "two-batch incremental index — only segment pairs CONTAINING "
    "matches are rewritten; the delete op joins the replay ledger "
    "(replay asserted a no-op in-gate); old files are vacuum-able "
    "orphans (vacuum_neardup_index). Incoming docs then probe the "
    "post-delete index; the oracle is a full rebuild over the corpus "
    "MINUS the forgotten docs — a forgotten doc can never again "
    "surface as anyone's near-duplicate, and nothing else changes. "
    "Shingle sets are erased too: the index must not retain ANY "
    "derived content of a forgotten document.",
)
def neardup_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    src_dir = _ensure_incremental_index(spark, sf_dir)
    index_dir = side_dir("/tmp/minispark_neardup_index", sf_dir, "lsh-deleted")
    stamp = index_dir + ".stamp"
    src_mtime = str(
        _os.path.getmtime(_os.path.join(sf_dir, "documents.parquet"))
    )
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            shutil.copytree(src_dir, index_dir)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    pred = F.col("corpus_doc_id") % NDS_DELETE_MOD == NDS_DELETE_REM
    delete_from_neardup_index(spark, index_dir, pred, op_id="forget-1")
    replay = delete_from_neardup_index(spark, index_dir, pred, op_id="forget-1")
    assert replay is False, "replayed delete was not a manifest no-op"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    buckets, shingle_sets = load_neardup_index(spark, index_dir)
    return near_dup_stream(incoming, buckets, shingle_sets).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )

"""Incremental IVF vector-index maintenance — the ANN sibling of the
persisted LSH dedup index (streaming/neardup.py): the vector-DB ingest
contract. An IVF index (coarse centroids + per-list postings) is
PERSISTED parquet; new vector batches are APPENDED in O(batch) — assign
each new vector to its nearest EXISTING centroid and write one new
postings file — with commit-by-manifest (atomic _CURRENT swing, replay
ledger) shared verbatim with the dedup index.

The load-bearing property: centroids are FIXED at index creation
(here the deterministic first-K-base-vectors convention of
ann_ivf_topk; production periodically retrains + rebuilds via the
compaction path, exactly like FAISS/Milvus segment merges). Because
list assignment depends only on (vector, centroids), an appended index
is BIT-IDENTICAL to a full rebuild over the unioned corpus — which is
exactly what the DuckDB oracle computes (the neardup_index_append /
events_scd2_apply equivalence pattern).

Scale shape: appending B vectors to an N-vector index costs one
B x K broadcast-centroid assignment pass and one parquet write —
never touches the N existing postings. Search reads only the probed
lists (union of live batch files, semi-joined on cent_id).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import vectors
from minispark_spark.operators.kmeans import IVF_K
from minispark_spark.operators.similarity import N_PROBE, TOP_K
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table
from minispark_spark.streaming.neardup import publish_manifest, read_current_manifest

# Gate query set: the incoming split's first vectors (vec_id % 5 == 0,
# vec_id < 50 -> ids 0,5,...,45 = 10 queries), disjoint from the
# indexed corpus so every neighbor comes from the index.
QUERY_MAX_ID = 50


def _nv(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", "embedding", vectors.norm(F.col("embedding")).alias("nrm")
    )


def _load_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_os.path.join(index_dir, "centroids"))


def _assign(batch_nv: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cent_id, embedding, nrm): nearest-centroid list
    assignment by cosine, ties to the lowest cent_id — depends only on
    the (fixed) centroid set, which is what makes append == rebuild."""
    ccos = vectors.dot(F.col("embedding"), F.col("cvec")) / F.nullif(
        F.col("nrm") * F.col("cnrm"), F.lit(0.0)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    return (
        batch_nv.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "nrm", "cent_id", ccos.alias("ccos"))
        .withColumn("ar", F.row_number().over(w))
        .filter(F.col("ar") == 1)
        .select("vec_id", "cent_id", "embedding", "nrm")
    )


def create_ivf_index(
    spark: SparkSession, index_dir: str, base: DataFrame, batch_id: str = "base"
) -> None:
    """Create the index: centroids = first IVF_K base vectors by vec_id
    (persisted; never changed by appends), plus the base postings batch
    committed through the manifest."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = read_current_manifest(index_dir)
        if batch_id in manifest["applied"]:
            return
        base_nv = _nv(base)
        # cent_id = rank of the seed vector; the window runs over the
        # already-LIMITed IVF_K-row frame (bounded, never corpus-sized).
        cw = Window.orderBy("vec_id")
        cent = (
            base_nv.orderBy("vec_id")
            .limit(IVF_K)
            .select(
                (F.row_number().over(cw) - 1).cast("int").alias("cent_id"),
                F.col("embedding").alias("cvec"),
                F.col("nrm").alias("cnrm"),
            )
        )
        cent.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(index_dir, "centroids")
        )
        postings = _assign(base_nv, _load_centroids(spark, index_dir))
        postings.write.mode("overwrite").parquet(
            _os.path.join(index_dir, "postings", f"batch={batch_id}")
        )
        publish_manifest(
            index_dir,
            {
                "version": manifest["version"] + 1,
                "applied": manifest["applied"] + [batch_id],
                "live": manifest["live"] + [batch_id],
            },
        )


def _append_ivf_index_unlocked(
    spark: SparkSession, index_dir: str, batch: DataFrame, batch_id: str
) -> bool:
    """Lock-free append body — caller must already hold the index's
    build_lock (flock does NOT nest within a process; a foreachBatch
    sink re-acquiring the orchestrator's lock would deadlock the
    stream — the dedup-index lesson)."""
    manifest = read_current_manifest(index_dir)
    if batch_id in manifest["applied"]:
        return False
    postings = _assign(_nv(batch), _load_centroids(spark, index_dir))
    postings.write.mode("overwrite").parquet(
        _os.path.join(index_dir, "postings", f"batch={batch_id}")
    )
    publish_manifest(
        index_dir,
        {
            "version": manifest["version"] + 1,
            "applied": manifest["applied"] + [batch_id],
            "live": manifest["live"] + [batch_id],
        },
    )
    return True


def append_ivf_index(
    spark: SparkSession, index_dir: str, batch: DataFrame, batch_id: str
) -> bool:
    """Append one vector batch: assign against the FIXED persisted
    centroids, write one postings file, swing the manifest. Returns
    False (no-op) when ``batch_id`` is already in the replay ledger."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        return _append_ivf_index_unlocked(spark, index_dir, batch, batch_id)


def _init_ivf_index_unlocked(index_dir: str, train_nv: DataFrame) -> None:
    """Persist the fixed centroid set (first IVF_K train vectors by
    vec_id) and record 'init' in the replay ledger WITHOUT publishing
    any postings — the FAISS train-before-add step used by the
    streaming ingest path. Caller holds the build_lock."""
    manifest = read_current_manifest(index_dir)
    if "init" in manifest["applied"]:
        return
    cw = Window.orderBy("vec_id")
    cent = (
        train_nv.orderBy("vec_id")
        .limit(IVF_K)
        .select(
            (F.row_number().over(cw) - 1).cast("int").alias("cent_id"),
            F.col("embedding").alias("cvec"),
            F.col("nrm").alias("cnrm"),
        )
    )
    cent.coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(index_dir, "centroids")
    )
    publish_manifest(
        index_dir,
        {
            "version": manifest["version"] + 1,
            "applied": manifest["applied"] + ["init"],
            "live": manifest["live"],
        },
    )


def load_ivf_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    manifest = read_current_manifest(index_dir)
    if not manifest["live"]:
        raise ValueError(f"IVF index at {index_dir} has no published batches")
    dirs = [
        _os.path.join(index_dir, "postings", f"batch={b}") for b in manifest["live"]
    ]
    return spark.read.parquet(*dirs)


def ivf_index_search(
    spark: SparkSession, index_dir: str, queries: DataFrame
) -> DataFrame:
    """Top-k cosine search of the published index: probe N_PROBE lists
    per query, exact cosine inside the probed lists only."""
    cent = F.broadcast(_load_centroids(spark, index_dir))
    qnv = _nv(queries)
    ccos = vectors.dot(F.col("embedding"), F.col("cvec")) / F.nullif(
        F.col("nrm") * F.col("cnrm"), F.lit(0.0)
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    probe = (
        qnv.crossJoin(cent)
        .select(F.col("vec_id").alias("query_id"), "cent_id", ccos.alias("ccos"))
        .withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= N_PROBE)
        .select("query_id", "cent_id")
    )
    postings = load_ivf_postings(spark, index_dir)
    qe = qnv.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = vectors.dot(F.col("q_emb"), F.col("embedding")) / F.nullif(
        F.col("q_nrm") * F.col("nrm"), F.lit(0.0)
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(probe)
        .join(postings, "cent_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rk") <= TOP_K)
    )


def compact_ivf_index(spark: SparkSession, index_dir: str) -> bool:
    """Rewrite all live postings batches into ONE compacted file and
    publish a manifest whose live list is just the compacted batch —
    the FAISS/Milvus segment-merge shape, identical to the dedup
    index's compaction. The ``applied`` replay ledger is carried over
    UNCHANGED so a replayed pre-compaction batch_id stays a no-op.
    (Centroid RETRAINING would slot in here in production — retrain,
    reassign while rewriting, publish — same commit shape; the gate
    keeps centroids fixed so the rebuild oracle stays exact.)
    Returns False when there is nothing to compact (<= 1 live batch)."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = read_current_manifest(index_dir)
        if len(manifest["live"]) <= 1:
            return False
        postings = load_ivf_postings(spark, index_dir)
        new_version = manifest["version"] + 1
        cid = f"compact-v{new_version}"
        postings.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(index_dir, "postings", f"batch={cid}")
        )
        publish_manifest(
            index_dir,
            {
                "version": new_version,
                "applied": manifest["applied"],
                "live": [cid],
            },
        )
        return True


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Gate fixture: create from base (vec_id%5 in 1,2), append delta
    (vec_id%5 in 3,4), replay the delta append to assert the no-op —
    keyed to the source mtime like the dedup-index fixture."""
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    index_dir = side_dir("/tmp/minispark_ivf_index", sf_dir, "ivf")
    stamp = index_dir + ".stamp"
    src_mtime = str(_os.path.getmtime(_os.path.join(sf_dir, "embeddings.parquet")))
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            _os.makedirs(index_dir, exist_ok=True)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter((F.col("vec_id") % 5 == 1) | (F.col("vec_id") % 5 == 2))
    delta = emb.filter((F.col("vec_id") % 5 == 3) | (F.col("vec_id") % 5 == 4))
    create_ivf_index(spark, index_dir, base, batch_id="base")
    append_ivf_index(spark, index_dir, delta, batch_id="delta-1")
    replay = append_ivf_index(spark, index_dir, delta, batch_id="delta-1")
    assert replay is False, "idempotent replay inserted duplicate postings"
    return index_dir


_NRM = vectors.norm_sql("embedding")
_DOT_QC = vectors.dot_sql("q.embedding", "c.cvec")
_DOT_QN = vectors.dot_sql("qe.embedding", "ne.embedding")


# The full-rebuild search oracle: shared by the append, compact, AND
# streaming-ingest gates — each must hash-match a from-scratch rebuild
# over the unioned corpus (manifest surgery / batching must never
# change search results). ``cent_src`` picks which split seeds the
# fixed centroids (the batch gates train on the base batch; the stream
# gate trains on the whole corpus split before ingest begins, the
# FAISS train-then-add order).
def _rebuild_oracle_sql(cent_src: str, corpus_where: str = "") -> str:
    return f"""
        WITH nv AS MATERIALIZED (
            SELECT vec_id, embedding, {_NRM} AS nrm FROM embeddings
        ),
        base AS (SELECT * FROM nv WHERE vec_id % 5 IN (1, 2)),
        corpus AS (SELECT * FROM nv
                   WHERE vec_id % 5 IN (1, 2, 3, 4){corpus_where}),
        cent AS MATERIALIZED (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                       AS cent_id,
                   embedding AS cvec, nrm AS cnrm
            FROM {cent_src} ORDER BY vec_id LIMIT {IVF_K}
        ),
        assign AS (
            SELECT vec_id, cent_id, embedding, nrm FROM (
                SELECT q.vec_id, c.cent_id, q.embedding, q.nrm,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           {_DOT_QC} / nullif(q.nrm * c.cnrm, 0.0) DESC,
                           c.cent_id) AS ar
                FROM corpus q CROSS JOIN cent c
            ) WHERE ar = 1
        ),
        probe AS (
            SELECT query_id, cent_id FROM (
                SELECT q.vec_id AS query_id, c.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           {_DOT_QC} / nullif(q.nrm * c.cnrm, 0.0) DESC,
                           c.cent_id) AS pr
                FROM (SELECT * FROM nv
                      WHERE vec_id % 5 = 0 AND vec_id < {QUERY_MAX_ID}) q
                CROSS JOIN cent c
            ) WHERE pr <= {N_PROBE}
        ),
        scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   {_DOT_QN} / nullif(qe.nrm * ne.nrm, 0.0) AS cosine
            FROM probe p
            JOIN assign a ON a.cent_id = p.cent_id
            JOIN nv qe ON qe.vec_id = p.query_id
            JOIN nv ne ON ne.vec_id = a.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rk FROM (
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


_REBUILD_ORACLE = _rebuild_oracle_sql("base")


@query(
    "ann_ivf_index_append",
    oracle=_REBUILD_ORACLE,
    doc="Incremental IVF vector-index maintenance (the vector-DB "
    "ingest contract; FAISS/Milvus segment model): a persisted IVF "
    f"index (centroids = first {IVF_K} base vectors, fixed at "
    "creation) is built from the base batch (vec_id%5 in 1,2), a "
    "second batch (vec_id%5 in 3,4) is APPENDED in O(batch) — one "
    "broadcast-centroid assignment pass + one new postings file, "
    "existing files untouched, commit = the dedup index's atomic "
    "manifest swap with the replay ledger (replayed batch_id no-ops, "
    "asserted in-gate every run). Incoming queries (vec_id%5=0, "
    f"id<{QUERY_MAX_ID}) probe {N_PROBE} of {IVF_K} lists with exact "
    "cosine re-rank. The DuckDB oracle is a FULL REBUILD over the "
    "unioned corpus — hash-matching proves append-then-search == "
    "rebuild-then-search, which holds because list assignment depends "
    "only on the fixed centroid set. Production retrains centroids "
    "periodically via compact/rebuild, exactly like the dedup index's "
    "compaction path.",
)
def ann_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = _ensure_ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < QUERY_MAX_ID)
    )
    return ivf_index_search(spark, index_dir, queries)


@query(
    "ann_ivf_index_compact",
    oracle=_REBUILD_ORACLE,
    doc="IVF index COMPACTION (segment merge): the append gate's "
    "two-batch index is rewritten into ONE postings file, the manifest "
    "live list shrinks to the compacted batch while the applied replay "
    "ledger is carried UNCHANGED — then a replay of the pre-compaction "
    "delta batch is asserted to still no-op (the critical append/"
    "compact interaction, same as the dedup index) and search runs "
    "against the compacted index. The oracle is the SAME full-rebuild "
    "SQL as ann_ivf_index_append: manifest surgery must never change "
    "search results. Production slots centroid retraining into this "
    "rewrite (retrain, reassign, publish — same commit shape).",
)
def ann_ivf_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    src_dir = _ensure_ivf_index(spark, sf_dir)
    # Compact a COPY so the append gate's two-batch fixture stays
    # intact for its own entry (both share the mtime stamp discipline).
    index_dir = side_dir("/tmp/minispark_ivf_index", sf_dir, "ivf-compacted")
    stamp = index_dir + ".stamp"
    src_mtime = str(_os.path.getmtime(_os.path.join(sf_dir, "embeddings.parquet")))
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            shutil.copytree(src_dir, index_dir)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    compact_ivf_index(spark, index_dir)
    # Post-compaction replay of an already-applied batch must no-op.
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    delta = emb.filter((F.col("vec_id") % 5 == 3) | (F.col("vec_id") % 5 == 4))
    replay = append_ivf_index(spark, index_dir, delta, batch_id="delta-1")
    assert replay is False, "compaction dropped the replay ledger"
    queries = emb.filter(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < QUERY_MAX_ID)
    )
    return ivf_index_search(spark, index_dir, queries)


def _emb_stream_src(spark: SparkSession, sf_dir: str) -> str:
    """Corpus vectors (vec_id % 5 != 0) as a 4-file parquet dir usable
    as a file-stream source (cached per sf_dir + source mtime)."""
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    dest = side_dir("/tmp/minispark_streamsrc", sf_dir, "emb_corpus4")
    stamp = dest + ".stamp"
    mt = str(_os.path.getmtime(_os.path.join(sf_dir, "embeddings.parquet")))
    with build_lock(dest):
        if not (_os.path.exists(stamp) and open(stamp).read() == mt):
            shutil.rmtree(dest, ignore_errors=True)
            emb = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "embedding"
            )
            emb.filter(F.col("vec_id") % 5 != 0).repartition(4).write.mode(
                "overwrite"
            ).parquet(dest)
            with open(stamp, "w") as fh:
                fh.write(mt)
    return dest


@query(
    "stream_ivf_index_ingest",
    oracle=_rebuild_oracle_sql("corpus"),
    doc="STREAMING vector-index ingest: the corpus vectors stream in "
    "4 real micro-batches (maxFilesPerTrigger=1) through foreachBatch "
    "-> the IVF append path, each batch committed as an atomic "
    "manifest version keyed by the streaming batch_id — replayed "
    "batches no-op, so the index is exactly-once by composition (the "
    "dedup-index streaming contract, applied to vectors). Centroids "
    f"are trained BEFORE ingest begins (first {IVF_K} corpus vectors "
    "— the FAISS train-then-add order), so batch boundaries cannot "
    "affect list assignment and the DuckDB full-rebuild oracle "
    "hash-matches regardless of how the stream happened to batch. "
    "Incoming queries then probe the streamed-in index. Per batch "
    "the cost is O(batch vectors): one broadcast-centroid assignment "
    "pass and one postings file.",
)
def stream_ivf_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    src = _emb_stream_src(spark, sf_dir)
    index_dir = side_dir("/tmp/minispark_ivf_stream_index", sf_dir, "ivf")
    ckpt = side_dir("/tmp/minispark_ivf_stream_index", sf_dir, "ckpt")
    stamp = index_dir + ".stamp"
    mt = str(_os.path.getmtime(_os.path.join(sf_dir, "embeddings.parquet")))
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == mt):
            # Fresh checkpoint with the fresh index (the checkpoint-reuse
            # data-loss lesson: a stale checkpoint marks every source
            # file committed and the rebuilt sink stays empty).
            shutil.rmtree(index_dir, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
            _os.makedirs(index_dir, exist_ok=True)
            emb = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "embedding"
            )
            _init_ivf_index_unlocked(
                index_dir, _nv(emb.filter(F.col("vec_id") % 5 != 0))
            )
            schema = spark.read.parquet(src).schema
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )

            def sink(batch_df: DataFrame, batch_id: int) -> None:
                # Unlocked: the drain runs under the enclosing
                # build_lock; flock does not nest within a process.
                _append_ivf_index_unlocked(
                    spark, index_dir, batch_df, f"b{batch_id}"
                )

            q = (
                sdf.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .queryName(
                    "stream_ivf_ingest_"
                    + hashlib.sha1(_os.path.abspath(sf_dir).encode()).hexdigest()[:8]
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            applied = read_current_manifest(index_dir)["applied"]
            # Exactly-once shape, checked against the manifest's OWN
            # replay ledger: "init" plus one "b{batchId}" entry per
            # executed micro-batch, consecutive from 0. Deliberately
            # NOT len(q.recentProgress): that is a bounded buffer
            # (spark.sql.streaming.numRecentProgressUpdates, default
            # 100) whose event count is version-sensitive — a source
            # with >100 files or an extra idle progress event would
            # trip a length compare spuriously.
            batch_ids = sorted(
                int(a[1:]) for a in applied if a != "init"
            )
            assert "init" in applied and batch_ids == list(
                range(len(batch_ids))
            ), f"manifest replay ledger out of step: {applied}"
            with open(stamp, "w") as fh:
                fh.write(mt)
    if not read_current_manifest(index_dir)["live"]:
        # Empty corpus -> zero streamed batches -> nothing published.
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int"
        )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < QUERY_MAX_ID)
    )
    return ivf_index_search(spark, index_dir, queries)


# --- Compliance DELETE (right-to-be-forgotten for vectors) ------------------

DELETE_MOD, DELETE_REM = 100, 57  # gate predicate: forget vec_id % 100 == 57


def delete_from_ivf_index(
    spark: SparkSession, index_dir: str, predicate, op_id: str
) -> bool:
    """Physically erase all postings rows matching ``predicate`` — the
    vector-store right-to-be-forgotten primitive (the index sibling of
    sources/upsert.delete_partitioned). Only live batch files that
    CONTAIN matching rows are rewritten (cost scales with the delete's
    segment footprint, not the index); untouched batches keep their
    files. Commit = one manifest swing whose live list points at the
    rewritten names; ``op_id`` joins the applied replay ledger so a
    replayed delete no-ops. Old files become vacuum-able orphans.

    GDPR nuance, stated plainly: this index's creation convention
    stores RAW seed vectors as centroids, so erasing a vector that
    seeded a centroid would additionally require centroid re-train +
    full rebuild (the compact path); production pairs deletion with
    k-means-AGGREGATE centroids (ann_ivf_trained_topk's trainer),
    where no raw member vector is retained. The gate predicate
    targets non-seed ids."""
    from minispark_spark.sources.sidecache import build_lock

    with build_lock(index_dir):
        manifest = read_current_manifest(index_dir)
        if op_id in manifest["applied"]:
            return False
        new_version = manifest["version"] + 1
        new_live = []
        for b in manifest["live"]:
            pdir = _os.path.join(index_dir, "postings", f"batch={b}")
            df = spark.read.parquet(pdir)
            if df.filter(predicate).limit(1).count() == 0:
                new_live.append(b)  # segment untouched
                continue
            nb = f"{b}-del{new_version}"
            df.filter(~predicate).write.mode("overwrite").parquet(
                _os.path.join(index_dir, "postings", f"batch={nb}")
            )
            new_live.append(nb)
        publish_manifest(
            index_dir,
            {
                "version": new_version,
                "applied": manifest["applied"] + [op_id],
                "live": new_live,
            },
        )
        return True


@query(
    "ann_ivf_index_delete",
    oracle=_rebuild_oracle_sql(
        "base", f" AND NOT (vec_id % {DELETE_MOD} = {DELETE_REM})"
    ),
    doc="Vector-index compliance DELETE: the append gate's index is "
    f"copied, every posting with vec_id % {DELETE_MOD} == {DELETE_REM} "
    "is physically erased (only segments CONTAINING matches are "
    "rewritten; untouched batch files are not read twice or written), "
    "the delete op joins the replay ledger (replay asserted a no-op "
    "in-gate), and search runs against the post-delete index. Oracle "
    "= full rebuild over the corpus MINUS the erased vectors with the "
    "ORIGINAL centroids — proving deletion changes exactly the erased "
    "rows' contribution and nothing else. The raw-seed-centroid GDPR "
    "nuance is documented on delete_from_ivf_index: production pairs "
    "this with k-means-aggregate centroids or triggers re-train + "
    "rebuild when a seed itself must be erased.",
)
def ann_ivf_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from minispark_spark.sources.sidecache import build_lock, side_dir

    src_dir = _ensure_ivf_index(spark, sf_dir)
    index_dir = side_dir("/tmp/minispark_ivf_index", sf_dir, "ivf-deleted")
    stamp = index_dir + ".stamp"
    src_mtime = str(_os.path.getmtime(_os.path.join(sf_dir, "embeddings.parquet")))
    with build_lock(index_dir):
        if not (_os.path.exists(stamp) and open(stamp).read() == src_mtime):
            shutil.rmtree(index_dir, ignore_errors=True)
            shutil.copytree(src_dir, index_dir)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    pred = F.col("vec_id") % DELETE_MOD == DELETE_REM
    delete_from_ivf_index(spark, index_dir, pred, op_id="forget-1")
    replay = delete_from_ivf_index(spark, index_dir, pred, op_id="forget-1")
    assert replay is False, "replayed delete was not a manifest no-op"
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < QUERY_MAX_ID)
    )
    return ivf_index_search(spark, index_dir, queries)

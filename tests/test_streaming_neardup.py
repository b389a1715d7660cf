"""Streaming near-dup detection: hash parity of the row-local Python
signature path vs the JVM batch path, and the stream-static LSH probe
vs its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.operators.dedup import (
    N_BANDS,
    _band_hash,
    _minhash_sig_exprs,
    shingled_docs,
)
from minispark_spark.sources.tables import load_table
from minispark_spark.streaming import neardup


@pytest.fixture(scope="module")
def docs_split(spark, sf_dir, tmp_path_factory):
    """Corpus (doc_id % 5 != 0) indexed; holdout (doc_id % 5 == 0)
    written as a parquet dir usable as a file-stream source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_dir = str(tmp_path_factory.mktemp("neardup") / "corpus")
    stream_dir = str(tmp_path_factory.mktemp("neardup") / "incoming")
    docs.filter(F.col("doc_id") % 5 != 0).write.mode("overwrite").parquet(
        f"{corpus_dir}/documents.parquet"
    )
    docs.filter(F.col("doc_id") % 5 == 0).coalesce(2).write.mode(
        "overwrite"
    ).parquet(stream_dir)
    return corpus_dir, stream_dir


def test_python_signature_parity_with_jvm(spark, sf_dir):
    """The stream path's row-local Python shingle/minhash/band fold must
    reproduce the JVM batch pipeline (posexplode + window + groupBy)
    bit-for-bit — two independent implementations of the same hashes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    docs = spark.createDataFrame(docs.collect(), docs.schema)  # pin the limit
    sh = shingled_docs(docs)
    jvm_sigs = sh.groupBy("doc_id").agg(*_minhash_sig_exprs())
    jvm_bands = {
        r["doc_id"]: tuple(r[f"b{b}"] for b in range(N_BANDS))
        for r in jvm_sigs.select(
            "doc_id", *[_band_hash(b).alias(f"b{b}") for b in range(N_BANDS)]
        ).collect()
    }
    jvm_shingles = {
        r["doc_id"]: sorted(r["shs"])
        for r in sh.groupBy("doc_id").agg(F.collect_set("sh").alias("shs")).collect()
    }

    py = neardup.stream_signatures(docs).collect()
    assert len(py) == 40
    checked = 0
    for r in py:
        if r["doc_id"] not in jvm_bands:  # <3 tokens: JVM side emits no row
            assert r["shingles"] == []
            continue
        assert sorted(r["shingles"]) == jvm_shingles[r["doc_id"]]
        assert tuple(r[f"band{b}"] for b in range(N_BANDS)) == jvm_bands[r["doc_id"]]
        checked += 1
    assert checked >= 30


def _batch_twin(spark, corpus_dir, stream_dir):
    buckets, shingle_sets = neardup.build_neardup_index(spark, corpus_dir)
    incoming = spark.read.parquet(stream_dir)
    out = neardup.near_dup_stream(incoming, buckets, shingle_sets)
    return {
        (r["doc_id"], r["corpus_doc_id"]): round(r["jaccard"], 9)
        for r in out.dropDuplicates(["doc_id", "corpus_doc_id"]).collect()
    }


def test_stream_matches_batch_twin(spark, docs_split):
    corpus_dir, stream_dir = docs_split
    buckets, shingle_sets = neardup.build_neardup_index(spark, corpus_dir)
    schema = spark.read.parquet(stream_dir).schema
    incoming = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # several micro-batches
        .parquet(stream_dir)
    )
    sdf = neardup.near_dup_stream(incoming, buckets, shingle_sets)

    seen: dict[tuple, float] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.dropDuplicates(["doc_id", "corpus_doc_id"]).collect():
            seen[(r["doc_id"], r["corpus_doc_id"])] = round(r["jaccard"], 9)

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = _batch_twin(spark, corpus_dir, stream_dir)
    assert seen == want
    # sanity: the synthetic corpus contains actual near-dups, so the
    # gate must fire (otherwise this test proves nothing)
    assert len(seen) > 0
    assert all(0.8 <= j <= 1.0 for j in seen.values())


# --- Streaming quality gate (streaming/quality.py) -------------------------


def test_quality_stream_matches_batch(spark, sf_dir, tmp_path):
    """The row-local repetition gate run as an actual stream must emit
    exactly the batch query's rows (same metrics, same keep flags)."""
    from minispark_spark.registry import REGISTRY
    from minispark_spark.streaming import quality as squality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream_dir = str(tmp_path / "incoming")
    docs.coalesce(3).write.mode("overwrite").parquet(stream_dir)

    schema = spark.read.parquet(stream_dir).schema
    incoming = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    sdf = squality.repetition_metrics_rowlocal(incoming)

    seen = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen[r["doc_id"]] = (
                r["n_tokens"], r["top_bigram_frac"], r["dup_bigram_frac"],
                r["dup_trigram_frac"], r["keep"],
            )

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {
        r["doc_id"]: (
            r["n_tokens"], r["top_bigram_frac"], r["dup_bigram_frac"],
            r["dup_trigram_frac"], r["keep"],
        )
        for r in REGISTRY["docs_repetition_filter"].fn(spark, sf_dir).collect()
    }
    assert seen == want  # bit-exact, not approximate
    assert any(not v[4] for v in seen.values())  # the gate actually drops docs
    assert any(v[4] for v in seen.values())


def test_chunking_works_mid_stream(spark, sf_dir, tmp_path):
    """chunk_overlap is a narrow generate (no window, no aggregate), so
    the SAME code path that batch-chunks a corpus legally chunks a
    stream — each arriving doc fans out to its training windows with no
    watermark or state. Stream output must equal the batch query."""
    from minispark_spark.plans.quality import chunk_overlap
    from minispark_spark.registry import REGISTRY

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream_dir = str(tmp_path / "incoming")
    docs.coalesce(3).write.mode("overwrite").parquet(stream_dir)

    schema = spark.read.parquet(stream_dir).schema
    incoming = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    sdf = chunk_overlap(incoming)

    seen = set()

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen.add(tuple(r))

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {tuple(r) for r in REGISTRY["docs_chunk_overlap"].fn(spark, sf_dir).collect()}
    assert seen == want
    assert len(seen) > 500


def test_index_append_idempotent_and_atomic(spark, tmp_path):
    """The persisted-index append contract: replaying an applied
    batch_id is a manifest no-op (no duplicate postings), each commit
    is an atomic version bump, and a reader before any publish fails
    loudly rather than seeing partial state."""
    import pytest as _pytest

    idx = str(tmp_path / "idx")
    with _pytest.raises(ValueError):
        neardup.load_neardup_index(spark, idx)

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(3, "alpha beta gamma delta zeta")], "doc_id long, text string"
    )
    assert neardup.append_neardup_index(spark, idx, base, "base") is True
    assert neardup.append_neardup_index(spark, idx, delta, "d1") is True
    p1, s1 = neardup.load_neardup_index(spark, idx)
    n_post, n_sets = p1.count(), s1.count()
    # replay: no-op, nothing changes
    assert neardup.append_neardup_index(spark, idx, delta, "d1") is False
    p2, s2 = neardup.load_neardup_index(spark, idx)
    assert (p2.count(), s2.count()) == (n_post, n_sets)
    assert neardup._read_current_manifest(idx) == {
        "version": 2,
        "applied": ["base", "d1"],
        "live": ["base", "d1"],
    }
    assert n_sets == 3

    # Compaction: many live dirs -> one, identical contents, replay
    # ledger untouched so a replayed pre-compaction batch stays a no-op.
    before_p = {tuple(r) for r in p2.collect()}
    before_s = {(r["corpus_doc_id"], tuple(r["corpus_shingles"]), r["corpus_n"]) for r in s2.collect()}
    assert neardup.compact_neardup_index(spark, idx) is True
    m = neardup._read_current_manifest(idx)
    assert m["applied"] == ["base", "d1"] and m["live"] == ["compact-v3"]
    p3, s3 = neardup.load_neardup_index(spark, idx)
    assert {tuple(r) for r in p3.collect()} == before_p
    assert {
        (r["corpus_doc_id"], tuple(r["corpus_shingles"]), r["corpus_n"])
        for r in s3.collect()
    } == before_s
    assert neardup.append_neardup_index(spark, idx, delta, "d1") is False  # replay
    assert neardup.compact_neardup_index(spark, idx) is False  # 1 live dir: no-op


def test_index_append_equals_full_rebuild(spark, sf_dir):
    """Append-then-probe == rebuild-then-probe: the incrementally
    maintained index and a one-shot index over the unioned corpus give
    identical probe results (the verdict's scd2-apply equivalence
    pattern, checked Spark-vs-Spark here; the registry oracle checks
    the same thing Spark-vs-DuckDB)."""
    from minispark_spark.registry import REGISTRY

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    buckets, sets = neardup.build_neardup_index_from_docs(corpus)
    rebuilt = {
        tuple(r)
        for r in neardup.near_dup_stream(incoming, buckets, sets)
        .dropDuplicates(["doc_id", "corpus_doc_id"])
        .collect()
    }
    incremental = {
        tuple(r) for r in REGISTRY["neardup_index_append"].fn(spark, sf_dir).collect()
    }
    assert incremental == rebuilt
    assert len(incremental) > 0


def test_stream_index_ingest_multi_batch_and_matches_rebuild(spark, sf_dir):
    """On real data the streamed index ingest must have committed one
    manifest version per micro-batch, MORE than one batch deep (the
    4-file source forces >= 2 triggers), and the probe result equals
    the batch rebuild — the streamed sibling of the append-path
    equivalence test."""
    import os

    from minispark_spark.registry import REGISTRY
    from minispark_spark.sources.sidecache import side_dir

    got = {
        tuple(r)
        for r in REGISTRY["stream_neardup_index_ingest"].fn(spark, sf_dir).collect()
    }
    idx = side_dir("/tmp/minispark_neardup_stream_index", sf_dir, "lsh")
    manifest = neardup._read_current_manifest(idx)
    assert len(manifest["applied"]) >= 2, manifest
    assert manifest["version"] == len(manifest["applied"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    buckets, sets = neardup.build_neardup_index_from_docs(
        docs.filter(F.col("doc_id") % 5 != 0)
    )
    rebuilt = {
        tuple(r)
        for r in neardup.near_dup_stream(
            docs.filter(F.col("doc_id") % 5 == 0), buckets, sets
        )
        .dropDuplicates(["doc_id", "corpus_doc_id"])
        .collect()
    }
    assert got == rebuilt and len(got) > 0


def test_index_vacuum_removes_only_orphans(spark, tmp_path):
    """After compaction, vacuum deletes the orphaned pre-compaction
    batch dirs and stale manifests; the live index still loads with
    identical contents and a replayed old batch_id remains a no-op
    (replay protection lives in the manifest ledger, not the files)."""
    import os

    idx = str(tmp_path / "idx")
    a = spark.createDataFrame([(1, "aa bb cc dd ee")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "ff gg hh ii jj")], "doc_id long, text string")
    neardup.append_neardup_index(spark, idx, a, "a")
    neardup.append_neardup_index(spark, idx, b, "b")
    assert neardup.compact_neardup_index(spark, idx) is True
    before = {tuple(r) for r in neardup.load_neardup_index(spark, idx)[0].collect()}
    removed = neardup.vacuum_neardup_index(idx)
    assert removed == ["a", "b"]
    assert sorted(os.listdir(os.path.join(idx, "postings"))) == ["batch=compact-v3"]
    assert os.listdir(os.path.join(idx, "manifests")) == ["v3.json"]
    after = {tuple(r) for r in neardup.load_neardup_index(spark, idx)[0].collect()}
    assert after == before
    assert neardup.append_neardup_index(spark, idx, a, "a") is False  # still a no-op
    assert neardup.vacuum_neardup_index(idx) == []  # idempotent


def test_delete_rewrites_shingles_only_segments(spark, tmp_path):
    """Compliance-delete regression (r5 ADVICE): a segment whose
    POSTINGS happen to contain no matching rows can still hold the
    forgotten doc's SHINGLE sets (the postings/shingles doc-set
    coincidence is a write-path accident, not a contract). The delete
    must probe both files before skipping a segment — otherwise the
    forgotten doc's derived content survives in the shingles file."""
    idx = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    assert neardup.append_neardup_index(spark, idx, base, "base") is True

    # Simulate the shingles-but-no-postings doc: rewrite the batch's
    # postings WITHOUT doc 2, leaving its shingle sets in place.
    import os

    pdir = os.path.join(idx, "postings", "batch=base")
    kept = spark.read.parquet(pdir).filter(F.col("corpus_doc_id") != 2)
    tmp_out = os.path.join(idx, "postings", "batch=base-tmp")
    kept.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    import shutil

    shutil.rmtree(pdir)
    os.replace(tmp_out, pdir)
    p, s = neardup.load_neardup_index(spark, idx)
    assert p.filter(F.col("corpus_doc_id") == 2).count() == 0
    assert s.filter(F.col("corpus_doc_id") == 2).count() == 1

    # Forget doc 2: no postings match, but the shingles probe must
    # force the rewrite.
    assert neardup.delete_from_neardup_index(
        spark, idx, F.col("corpus_doc_id") == 2, "forget-2"
    )
    p2, s2 = neardup.load_neardup_index(spark, idx)
    assert s2.filter(F.col("corpus_doc_id") == 2).count() == 0, (
        "forgotten doc's shingle sets survived a postings-only probe"
    )
    assert p2.filter(F.col("corpus_doc_id") == 1).count() > 0  # others intact
    assert s2.filter(F.col("corpus_doc_id") == 1).count() == 1
    # Replay is a no-op.
    assert not neardup.delete_from_neardup_index(
        spark, idx, F.col("corpus_doc_id") == 2, "forget-2"
    )

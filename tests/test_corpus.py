"""Corpus facade: every method must reproduce its oracle-verified
registry twin — the facade adds composition, never new semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from minispark_spark.corpus import Corpus
from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.sources.tables import load_table

_ensure_loaded()


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_chunks_match_registry(spark, sf_dir):
    got = sorted(
        tuple(r) for r in Corpus(_docs(spark, sf_dir)).chunks().collect()
    )
    want = sorted(
        tuple(r) for r in REGISTRY["docs_chunk_overlap"].fn(spark, sf_dir).collect()
    )
    assert got == want


def test_filter_repetition_matches_batch_keep_set(spark, sf_dir):
    kept = {
        r["doc_id"]
        for r in Corpus(_docs(spark, sf_dir)).filter_repetition().df.collect()
    }
    want = {
        r["doc_id"]
        for r in REGISTRY["docs_repetition_filter"].fn(spark, sf_dir).collect()
        if r["keep"]
    }
    assert kept == want
    assert 0 < len(kept) < 500


def test_composed_curation_matches_registry_pipeline(spark, sf_dir):
    from minispark_spark.plans.pipeline import _CURATION_MIN_QUALITY

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("source") != "src0")
    eval_docs = docs.filter(F.col("source") == "src0")
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["avg_quality"])
        for r in (
            Corpus(train)
            .filter_quality(_CURATION_MIN_QUALITY)
            .dedup_exact()
            .decontaminate(eval_docs)
            .stats()
            .collect()
        )
    }
    want = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["avg_quality"])
        for r in REGISTRY["docs_corpus_curation"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_fuzzy_matches_registry_pipeline(spark, sf_dir):
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"])
        for r in Corpus(_docs(spark, sf_dir)).dedup_fuzzy().stats().collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["total_tokens"])
        for r in REGISTRY["docs_fuzzy_dedup_curation"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_temperature_sample_matches_registry_counts(spark, sf_dir):
    sampled = Corpus(_docs(spark, sf_dir)).temperature_sample()
    got = {
        r["source"]: r["n"]
        for r in sampled.df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r["source"]: r["n_selected"]
        for r in REGISTRY["docs_temperature_mixture"].fn(spark, sf_dir).collect()
        if r["n_selected"] > 0
    }
    assert got == want


def test_composed_pipeline_is_one_plan(spark, sf_dir):
    """Chained facade stages fuse into a single Catalyst plan with no
    cartesian product and no single-partition exchange."""
    out = (
        Corpus(_docs(spark, sf_dir))
        .filter_quality(0.2)
        .dedup_exact()
        .stats()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan

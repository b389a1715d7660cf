"""Hyperplane-LSH bucket guard (the embedding twin of the simhash
guard): replica-dense corpora pile near-identical vectors into the
same sign buckets and the pair expansion goes quadratic — measured
8.7M raw pairs from 20k vectors (BASELINE.md). The guard must bound
that in code while normal corpora keep the exact unguarded candidate
set."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from minispark_spark.operators.similarity import (
    EMB_LSH_BUCKET_CAP,
    LSH_DIM,
    _lsh_buckets_udf,
    embedding_lsh_oversized_buckets,
    lsh_candidate_pairs_guarded,
)


def _nv(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    return df


def _buckets(nv):
    return nv.select(
        "vec_id",
        F.posexplode(_lsh_buckets_udf(F.col("embedding"))).alias("tbl", "bucket"),
    )


def _rand_vecs(n, seed=7):
    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(LSH_DIM)] for _ in range(n)]


def _connected(pairs, nodes):
    parent = {x: x for x in nodes}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return len({find(x) for x in nodes})


def test_guard_dormant_matches_unguarded_candidates(spark):
    """Below the cap the guard must change NOTHING: candidates equal
    the unguarded (corpus-sized cap) set, and no bucket is flagged."""
    nv = _nv(spark, _rand_vecs(200)).cache()
    got = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs_guarded(nv, _buckets(nv)).collect()
    }
    want = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs_guarded(nv, _buckets(nv), cap=10**9).collect()
    }
    assert got == want
    assert embedding_lsh_oversized_buckets(nv).count() == 0


def test_guard_caps_replica_flood_linear_and_connected(spark):
    """The adversarial shape: one vector replicated far past the cap.
    All replicas share every table's bucket, so unguarded expansion is
    ~n^2/2 pairs; the guard must emit linear output that still connects
    the whole clique (survivorship needs connectivity, not all pairs)."""
    n = 3 * EMB_LSH_BUCKET_CAP + 12  # 204 identical vectors
    base = _rand_vecs(1, seed=13)[0]
    nv = _nv(spark, [base] * n).cache()
    got = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs_guarded(nv, _buckets(nv)).collect()
    }
    quadratic = n * (n - 1) // 2
    assert len(got) < quadratic // 20, f"guard failed: {len(got)} pairs"
    assert _connected(got, range(n)) == 1  # one clique, fully connected
    assert embedding_lsh_oversized_buckets(nv).count() >= 1


def test_mixed_flood_and_clean_pair(spark):
    """Oversized and normal buckets coexisting: a clean duplicate pair
    far from the flood must survive through the small-bucket tier."""
    n = EMB_LSH_BUCKET_CAP + 10
    base = _rand_vecs(1, seed=29)[0]
    other = _rand_vecs(1, seed=31)[0]
    nv = _nv(spark, [base] * n + [other, other]).cache()
    got = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs_guarded(nv, _buckets(nv)).collect()
    }
    assert (n, n + 1) in got


def test_cap_knob_recovers_exact_banded_recall(spark):
    """The corpus-sized ``cap`` escape hatch restores the full
    quadratic candidate set on a saturated corpus."""
    n = EMB_LSH_BUCKET_CAP + 6
    base = _rand_vecs(1, seed=41)[0]
    nv = _nv(spark, [base] * n).cache()
    full = lsh_candidate_pairs_guarded(nv, _buckets(nv), cap=10**9).count()
    assert full == n * (n - 1) // 2

"""SemDeDup pair-budget guard (round 7): a fixed small k on a huge or
replica-dense corpus silently plans a quadratic within-cluster pair
join (found at 200k exact replicas with k=2: ~10^10 pairs, an
effective hang). semantic_dup_flags must refuse loudly past the budget
and stay byte-identical to the unguarded path below it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.operators.semdedup import (
    SEMDEDUP_MAX_PAIRS,
    semantic_dup_flags,
)


def _emb(spark, n: int):
    # n near-identical vectors (replica-dense worst case): k-means puts
    # them all in one cluster, so pairs = n*(n-1)/2 exactly.
    from minispark_spark.operators.kmeans import DIM

    return spark.createDataFrame(
        [(i, [1.0 + i * 1e-6] * DIM) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def test_breach_raises_with_remedy(spark):
    emb = _emb(spark, 40)  # >= 380 pairs under any k=2 split of 40
    with pytest.raises(ValueError, match="grow k"):
        semantic_dup_flags(spark, emb, k=2, max_pairs=100)


def test_within_budget_result_identical_to_unguarded(spark):
    emb = _emb(spark, 30)  # 435 pairs
    guarded = semantic_dup_flags(spark, emb, k=2, max_pairs=500)
    unguarded = semantic_dup_flags(spark, emb, k=2, max_pairs=None)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )


def test_default_budget_clears_gate_corpora(spark, sf_dir):
    # The registry entry runs with the default budget; the gate corpus
    # must pass without tripping it (the oracle gate re-proves values).
    from minispark_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    assert n * (n - 1) // 2 < SEMDEDUP_MAX_PAIRS * 10  # headroom sanity
    out = semantic_dup_flags(spark, emb, sf_dir=sf_dir)
    assert out.count() == n

"""SimHash band-bucket guard: the round-2 measured scale hazard
(unrelated docs colliding into giant buckets -> quadratic pair
expansion) must be bounded in code, while normal corpora keep the
exact unguarded candidate set."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from minispark_spark.operators.dedup import (
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BUCKET_CAP,
    simhash_candidate_pairs,
    simhash_oversized_buckets,
)


def _sigs(spark, values):
    return spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(values)], "doc_id long, sig long"
    )


def _brute_candidates(values):
    mask = (1 << SIMHASH_BAND_BITS) - 1
    out = set()
    for i, a in enumerate(values):
        for j in range(i + 1, len(values)):
            b = values[j]
            for band in range(SIMHASH_BANDS):
                if (a >> (band * SIMHASH_BAND_BITS)) & mask == (
                    b >> (band * SIMHASH_BAND_BITS)
                ) & mask:
                    out.add((i, j))
                    break
    return out


def test_guard_dormant_matches_unguarded_candidates(spark):
    """Below the cap the guard must change NOTHING: the candidate set
    equals the brute-force banded collision set."""
    rng = random.Random(7)
    values = [rng.getrandbits(63) for _ in range(150)]
    # plant collisions: 20 docs share band 3's bits with doc 0
    band3 = (values[0] >> (3 * SIMHASH_BAND_BITS)) & ((1 << SIMHASH_BAND_BITS) - 1)
    for k in range(1, 21):
        v = values[k] & ~(((1 << SIMHASH_BAND_BITS) - 1) << (3 * SIMHASH_BAND_BITS))
        values[k] = v | (band3 << (3 * SIMHASH_BAND_BITS))
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(_sigs(spark, values)).collect()
    }
    assert got == _brute_candidates(values)
    assert simhash_oversized_buckets(_sigs(spark, values)).count() == 0


def test_guard_splits_low_entropy_bucket(spark):
    """The adversarial shape: every doc shares band 0's bits but the
    rest of the signature differs. Unguarded expansion would emit
    ~n^2/2 pairs from that one bucket; the refinement on the next two
    bands' bits must split it so output stays far below quadratic."""
    n = max(768, 3 * SIMHASH_BUCKET_CAP)  # all docs in one band-0 bucket
    # band 0 bits (0..8) all zero; higher bits distinct per doc
    values = [(i + 1) << SIMHASH_BAND_BITS for i in range(n)]
    cand = simhash_candidate_pairs(_sigs(spark, values))
    n_pairs = cand.count()
    quadratic = n * (n - 1) // 2  # 294_528
    assert n_pairs < quadratic // 50, f"guard failed: {n_pairs} pairs"
    assert simhash_oversized_buckets(_sigs(spark, values)).count() >= 1


def test_identical_signatures_stay_connected_via_chain(spark):
    """A giant identical-signature group (a true duplicate clique) must
    emit LINEAR output that still connects every doc — survivorship via
    connected components needs connectivity, not all O(n^2) pairs."""
    n = SIMHASH_BUCKET_CAP + 44
    sig = 0x123456789ABCDEF
    values = [sig] * n
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(_sigs(spark, values)).collect()
    )
    assert got == [(i, i + 1) for i in range(n - 1)]  # sorted adjacent chain


def test_mixed_buckets_small_paths_unaffected(spark):
    """Oversized and normal buckets coexisting: the normal buckets'
    pairs must be exactly the brute-force set."""
    n_big = SIMHASH_BUCKET_CAP + 10
    big = [(i + 1) << SIMHASH_BAND_BITS for i in range(n_big)]  # band-0 collision
    # a clean pair far away from band 0's bucket 0: share band 5
    a = 0b101 | (7 << (5 * SIMHASH_BAND_BITS)) | (1 << 62)
    b = 0b110 | (7 << (5 * SIMHASH_BAND_BITS)) | (1 << 61)
    values = big + [a, b]
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(_sigs(spark, values)).collect()
    }
    assert (n_big, n_big + 1) in got  # the clean pair survives untouched


def test_refined_bucket_distinct_sigs_keeps_true_dups_connected(spark):
    """The reviewer scenario for tier 3: a refined bucket STILL past the
    cap whose members have DISTINCT signatures (they share only the 27
    band-0/1/2 bits). The old chain-by-doc_id emitted links between
    arbitrary far-apart signatures; the tiered guard must instead (a)
    connect identical-signature groups internally with hamming-0 links
    that always survive verification, and (b) keep output linear."""
    n = SIMHASH_BUCKET_CAP + 20
    # 27 low bits identical (bands 0-2), distinct high bits -> one
    # refined bucket, > cap, all-distinct sigs
    low = 0b101 | (3 << SIMHASH_BAND_BITS) | (5 << (2 * SIMHASH_BAND_BITS))
    values = [low | ((i + 1) << (3 * SIMHASH_BAND_BITS)) for i in range(n)]
    # plant one TRUE duplicate pair: docs n and n+1 share a full sig
    dup_sig = low | (999 << (3 * SIMHASH_BAND_BITS))
    values += [dup_sig, dup_sig]
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(_sigs(spark, values)).collect()
    }
    assert (n, n + 1) in got  # identical-sig pair connected (hamming 0)
    # linear, not quadratic: well under n^2/2
    assert len(got) < 4 * (n + 2)


def test_cap_knob_recovers_exact_banded_recall(spark):
    """The ``cap`` escape hatch (minhash's broadcast_candidates twin):
    passing a corpus-sized cap on the adversarial corpus must disable
    the guard and return the exact unguarded banded candidate set."""
    n = 200
    values = [(i + 1) << SIMHASH_BAND_BITS for i in range(n)]  # one band-0 bucket
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(_sigs(spark, values), cap=n).collect()
    }
    assert got == _brute_candidates(values)
    assert len(got) == n * (n - 1) // 2

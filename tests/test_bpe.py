"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python
reference implementation of the classic word-frequency BPE algorithm
(same greedy left-to-right merge, same count-then-lexicographic
tiebreak) — run on the real documents table, so agreement means the
distributed pair counting, argmax, and merge fold are all exact."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from minispark_spark.operators.bpe import train_bpe, word_vocab
from minispark_spark.sources.tables import load_table

N_MERGES = 8


def _reference_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        # highest count, then lexicographically smallest pair
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def texts(spark, sf_dir):
    return [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]


def test_bpe_merges_match_reference(spark, sf_dir, texts):
    docs = load_table(spark, sf_dir, "documents")
    got = train_bpe(docs, N_MERGES)
    want = _reference_bpe(texts, N_MERGES)
    assert len(got) == len(want)
    for g, (a, b, cnt) in zip(got, want):
        assert (g["left"], g["right"], g["pair_count"]) == (a, b, cnt)


def test_word_vocab_counts(spark, sf_dir, texts):
    vocab = {tuple(r["symbols"]): r["count"] for r in word_vocab(
        load_table(spark, sf_dir, "documents")
    ).collect()}
    ref = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                ref[tuple(w)] += 1
    assert vocab == dict(ref)


def test_bpe_encode_matches_reference(spark, sf_dir, texts):
    from minispark_spark.operators.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, N_MERGES)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    rules = [(m["left"], m["right"]) for m in merges]

    def ref_encode(word):
        syms = list(word)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for r in rows:
        want = [s for w in re.split(r"\s+", r["text"].strip()) if w for s in ref_encode(w)]
        assert got[r["doc_id"]] == want
    # every merged symbol must be reachable from the learned vocab
    learned = {a + b for a, b in rules}
    seen = {s for toks in got.values() for s in toks if len(s) > 1}
    assert seen & learned  # at least some merges actually applied

"""Pin the round-8 vectorized shingle kernel (operators/dedup.py::
shingled_docs, one numpy Arrow pass) bit-exact against the round-7
expression formulation it replaced (posexplode + per-char HOF poly_hash
fold + window lead combine + distinct) — including the Java-semantics
edge cases: trim strips 0x20 only, split keeps leading/trailing empty
tokens, empty-token hash is 0, short docs yield no shingles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minispark_spark.functions import hashing
from minispark_spark.operators.dedup import shingled_docs


def _reference_shingles(docs):
    """The pre-round-8 expression pipeline, verbatim."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    hashed = toks.select("doc_id", "pos", hashing.poly_hash(F.col("tok")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    b, p = hashing.COMBINE_BASE, hashing.MOD
    sh = (
        (F.col("h") * b + F.lead("h", 1).over(w)) % p * b + F.lead("h", 2).over(w)
    ) % p
    return (
        hashed.select("doc_id", sh.alias("sh"))
        .filter(F.col("sh").isNotNull())
        .distinct()
    )


CASES = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "one two"),  # < 3 tokens: no shingles
    (3, ""),  # empty text
    (4, "   "),  # spaces only (trim -> empty)
    (5, "a b c"),  # exactly one shingle
    (6, "x\ty\nz w"),  # tab/newline separators
    (7, "  leading and trailing  "),  # trimmed spaces
    (8, "a b c\n"),  # trailing newline -> trailing empty token (h=0)
    (9, "\na b c"),  # leading newline -> leading empty token (h=0)
    (10, "dup dup dup dup dup"),  # repeated shingles -> dedup
    (11, "café naïve résumé über"),  # non-ASCII
    (12, "a  b   c    d"),  # runs of spaces collapse
    (13, "word " * 50),  # longer doc
]


@pytest.mark.parametrize("chunk", [CASES])
def test_kernel_matches_expression_pipeline(spark, chunk):
    docs = spark.createDataFrame(chunk, "doc_id long, text string")
    got = sorted(map(tuple, shingled_docs(docs).collect()))
    want = sorted(map(tuple, _reference_shingles(docs).collect()))
    assert got == want and len(want) > 0


def test_kernel_matches_on_gate_corpus(spark, sf_dir):
    from minispark_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = sorted(map(tuple, shingled_docs(docs).collect()))
    want = sorted(map(tuple, _reference_shingles(docs).collect()))
    assert got == want and len(want) > 0

"""Python UDTFs (user-defined TABLE functions, Spark 4).

The reference has no function surface at all (its grammar rejects
everything but COUNT/SUM — reference parser.py:54,365-378). Spark's
UDTF API is the general row→rows escape hatch: a class whose ``eval``
yields any number of output rows per input row, callable from SQL in
the FROM clause (including LATERAL against each row of a table).

Here the doc→sentence fan-out — the first step of every text pipeline
— is expressed both ways: ``plans/text.py::docs_sentences`` uses
built-in posexplode(split(...)) (the JVM-side fast path, preferred at
scale) and ``docs_sentences_udtf`` runs this UDTF, pinned to identical
output so the two stay interchangeable. UDTFs earn their cost only
when per-row logic outgrows built-in expressions (stateful parsers,
external tokenizers); then Arrow batching (useArrow) keeps the
Python boundary amortized.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


class _SentenceSplitter:
    """Split on sentence-ending punctuation runs; keep the pre-filter
    segment index (same contract as docs_sentences: Java-style split
    retains trailing empties, indexes count empty segments, trim is
    space-only)."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for idx, seg in enumerate(re.split(r"[.!?]+", text)):
            s = seg.strip(" ")
            if s:
                yield idx, s, len(s)


# useArrow=True: rows cross the Python boundary in Arrow batches
# (ArrowEvalPythonUDTF) instead of pickled row-at-a-time — the same
# policy as every other Python surface in this engine (planlint
# flags BatchEvalPython; this was its last occurrence).
SentenceSplitter = udtf(
    _SentenceSplitter,
    returnType="sentence_idx int, sentence string, n_chars int",
    useArrow=True,
)


_REGISTERED: set[str] = set()


def register_udtfs(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.udtf.register("split_sentences", SentenceSplitter)
        _REGISTERED.add(app)

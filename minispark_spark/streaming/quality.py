"""Streaming corpus-quality gate: row-local repetition filtering.

The online half of ``plans/quality.py::docs_repetition_filter``:
documents arriving from a crawl/ingestion stream are scored and
keep/drop-flagged BEFORE they ever land in the corpus — the standard
admission filter in a training-data pipeline.

The batch implementation aggregates over exploded n-grams (groupBy on
(doc_id, gram)) — illegal mid-stream without watermark state, even
though the metric is conceptually per-document. Following the
row-local-reformulation rule (NOTES.md, streaming/neardup.py): the
same counts computed as a per-row Python fold inside an Arrow-batched
``mapInPandas`` are stateless, so the identical code path runs on a
batch DataFrame or a stream with no watermark and no state store.

Bit-exactness with the batch/DuckDB path: all counts are exact ints;
each fraction is one IEEE double division of exact integers, which
Python, the JVM, and DuckDB all round identically. Pinned by the
``docs_repetition_rowlocal`` registry oracle (the SAME oracle SQL as
the batch query) and by the stream-vs-batch twin test.

At 100 TB-scale ingestion each micro-batch costs one narrow Python
pass over the new docs — no shuffle, no state, trivially parallel.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

import minispark_spark.plans.quality  # noqa: F401  (registers the batch twin/oracle)
from minispark_spark.registry import REGISTRY, query
from minispark_spark.sources.tables import load_table

# Thresholds must match plans/quality.py::docs_repetition_filter.
TOP_BIGRAM_MAX = 0.10
DUP_TRIGRAM_MAX = 0.05

_METRICS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("top_bigram_frac", DoubleType()),
        StructField("dup_bigram_frac", DoubleType()),
        StructField("dup_trigram_frac", DoubleType()),
        StructField("keep", BooleanType()),
    ]
)

_WS = re.compile(r"\s+")


def _doc_metrics(text: str) -> tuple[int, float, float, float, bool]:
    # Mirror F.split(F.trim(text), '\s+'): trim strips spaces only.
    toks = _WS.split(text.strip(" "))
    n = len(toks)
    bi = Counter(zip(toks, toks[1:]))
    tri = Counter(zip(toks, toks[1:], toks[2:]))
    top_bi = max(bi.values(), default=0)
    dup_bi = sum(c for c in bi.values() if c >= 2)
    dup_tri = sum(c for c in tri.values() if c >= 2)
    # Exact-int operands -> one correctly-rounded double division each,
    # identical bits to the JVM/DuckDB expressions.
    top_frac = (2 * top_bi) / n
    dup_bi_frac = (2 * dup_bi) / n
    dup_tri_frac = (3 * dup_tri) / n
    keep = top_frac <= TOP_BIGRAM_MAX and dup_tri_frac <= DUP_TRIGRAM_MAX
    return n, top_frac, dup_bi_frac, dup_tri_frac, keep


def repetition_metrics_rowlocal(docs: DataFrame) -> DataFrame:
    """Per-document repetition metrics; batch- and stream-capable.

    ``docs`` needs (doc_id, text). Stateless: safe under any trigger,
    no watermark required.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in _METRICS_SCHEMA.fields}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n, top, dbi, dtri, keep = _doc_metrics(text)
                rows["doc_id"].append(int(doc_id))
                rows["n_tokens"].append(n)
                rows["top_bigram_frac"].append(top)
                rows["dup_bigram_frac"].append(dbi)
                rows["dup_trigram_frac"].append(dtri)
                rows["keep"].append(keep)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(batches, schema=_METRICS_SCHEMA)


@query(
    "docs_repetition_rowlocal",
    # Same semantics, same oracle: the row-local fold must reproduce the
    # batch groupBy pipeline bit-for-bit.
    oracle=REGISTRY["docs_repetition_filter"].oracle,
    doc="Row-local (streaming-capable) twin of docs_repetition_filter: "
    "the identical repetition metrics computed as a stateless per-row "
    "Python fold in mapInPandas instead of n-gram explode + groupBy — "
    "the reformulation that makes the quality gate legal in a stream. "
    "Oracled against the SAME DuckDB SQL as the batch query, proving "
    "the two independent implementations agree bit-for-bit.",
)
def docs_repetition_rowlocal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_metrics_rowlocal(docs)


def token_budget_stream(docs: DataFrame, budget: int) -> DataFrame:
    """Stateful streaming admission gate: per-source token-budget fill
    carried across micro-batches (``applyInPandasWithState``).

    The online half of ``plans/quality.py::token_budget_frame``: docs
    arriving from an ingestion stream are admitted while the tokens
    consumed BEFORE them (kept or not — matching the batch twin's
    prefix-sum contract) are under ``budget`` for their source. A
    stream cannot reorder history, so admission is arrival order;
    within a micro-batch rows are processed in (hash(doc_id), doc_id)
    order, so a stream fed in the batch twin's deterministic hash
    order produces the identical keep set — pinned in
    tests/test_streaming_budget.py.

    State is one int64 per source, partitioned by source — per-key
    state lives with the key's shuffle partition, no driver
    involvement; at 100 TB-scale ingestion the state store holds
    n_sources longs.
    """
    from collections.abc import Iterable, Iterator

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from minispark_spark.functions import hashing

    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
        hashing.poly_hash(F.col("doc_id").cast("string")).alias("hv"),
    )

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        consumed = state.get[0] if state.exists else 0
        out: list[tuple] = []
        for pdf in pdfs:
            for r in pdf.sort_values(["hv", "doc_id"]).itertuples():
                out.append(
                    (int(r.doc_id), key[0], int(r.n_tok), int(consumed),
                     consumed < budget)
                )
                consumed += int(r.n_tok)
        state.update((int(consumed),))
        yield pd.DataFrame(
            out, columns=["doc_id", "source", "n_tok", "cum_before", "keep"]
        )

    return base.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=(
            "doc_id long, source string, n_tok long, cum_before long, keep boolean"
        ),
        stateStructType="consumed long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

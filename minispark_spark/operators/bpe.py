"""Distributed BPE tokenizer training.

The byte-pair-encoding trainer of a training-data pipeline: iteratively
find the most frequent adjacent symbol pair in the corpus and merge it,
n_merges times. Classic formulation (Sennrich et al. 2016, public):
train over the WORD-FREQUENCY table, not raw text — pair counts are
weighted by word frequency, so the heavy corpus scan happens exactly
once (one shuffle to build the vocab); every merge iteration then runs
over the much smaller distinct-word frame.

Spark-first shape, per iteration:
- adjacent pairs via ``arrays_zip(slice(s,1,n-1), slice(s,2,n-1))``
  (JVM-side, no Python),
- one aggregate shuffle summing weighted pair counts (map-side
  partial), then a distributed top-1 (TakeOrderedAndProject) with a
  count-then-lexicographic tiebreak — deterministic,
- the winning pair (ONE row) comes to the driver — loop control only,
  like PageRank's convergence check — and the merge is applied to
  every word with a JVM fold (``F.aggregate``): greedy left-to-right,
  matching the reference algorithm.

At 100 TB the vocab frame (distinct words) is millions of rows, not
billions; it stays partitioned across executors, and each iteration is
one small shuffle. The plan chain grows linearly with merges, so the
vocab is localCheckpoint-ed every few iterations to keep Catalyst's
analysis cost bounded.

No reference analogue (the reference has no text pipeline at all);
verified against a pure-Python reference BPE in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minispark_spark.functions import text

CHECKPOINT_EVERY = 4


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-frequency table ``(symbols: array<string>, count: long)``;
    one corpus shuffle, words start as character sequences."""
    toks = text.tokens(F.col(text_col))
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(F.split("word", "").alias("symbols"), "count")
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("symbols")
    zipped = F.arrays_zip(
        F.slice("symbols", 1, n - 1).alias("left"),
        F.slice("symbols", 2, n - 1).alias("right"),
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(zipped).alias("p"), "count")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) -> left||right via a
    JVM fold over each word's symbol array."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
    merged = F.aggregate(
        "symbols",
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (s == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select(merged.alias("symbols"), "count")


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns them in order as dicts
    ``{step, left, right, pair_count}``. Ties broken by (left, right)
    lexicographic order, so training is deterministic."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            # Deterministic argmax: highest count, then lexicographically
            # smallest pair. Compiles to TakeOrderedAndProject — a
            # distributed top-1 (per-partition top-1 then driver merge),
            # NOT a global sort.
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append(
            {
                "step": step,
                "left": row["left"],
                "right": row["right"],
                "pair_count": row["pair_count"],
            }
        )
        vocab = _apply_merge(vocab, row["left"], row["right"])
        if step % CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def _bpe_oracle_sql(n_merges: int) -> str:
    """DuckDB replay of the full training loop — a genuine cross-engine
    oracle for the iterative algorithm. Key identity: the greedy
    left-to-right fold in ``_apply_merge`` equals non-overlapping
    left-to-right string replacement over a symbol-framed encoding
    (each symbol wrapped in \\x02..\\x03, so matches cannot straddle
    symbol boundaries), because within one step a merge product
    ``left||right`` can never equal ``left`` (right is non-empty) and
    so never re-merges. Each step is one CTE trio: weighted pair
    counts, deterministic top-1 (count desc, then lexicographic), and
    the merge applied via replace()."""
    enc = "chr(2) || array_to_string(symbols, chr(3) || chr(2)) || chr(3)"
    ctes = [
        """v0 AS (
            SELECT string_split(word, '') AS symbols,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY word
        )"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS (
            SELECT pr[1] AS lft, pr[2] AS rgt, CAST(SUM(cnt) AS BIGINT) AS pair_count
            FROM v{i - 1},
                 unnest(list_transform(range(1, len(symbols)),
                                       j -> [symbols[j], symbols[j + 1]])) AS u(pr)
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""m{i} AS (
            SELECT lft, rgt, pair_count FROM p{i}
            ORDER BY pair_count DESC, lft, rgt LIMIT 1
        )"""
        )
        if i < n_merges:
            ctes.append(
                f"""v{i} AS (
            SELECT string_split(
                       substr(e2, 2, length(e2) - 2),
                       chr(3) || chr(2)) AS symbols, cnt
            FROM (
                SELECT replace({enc},
                               chr(2) || lft || chr(3) || chr(2) || rgt || chr(3),
                               chr(2) || lft || rgt || chr(3)) AS e2, cnt
                FROM v{i - 1}, m{i}
            )
        )"""
            )
    steps = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS step, lft AS \"left\", rgt AS \"right\", "
        f"pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + steps


def _register() -> None:
    from pyspark.sql import SparkSession

    from minispark_spark.registry import query
    from minispark_spark.sources.tables import load_table

    @query(
        "bpe_train_merges",
        oracle=_bpe_oracle_sql(6),
        doc="First 6 BPE merges learned from the documents corpus "
        "(word-frequency BPE; deterministic count-then-lex tiebreak). "
        "The oracle replays the ENTIRE iterative training loop in "
        "DuckDB as chained CTEs (pair counts -> top-1 -> greedy merge "
        "via boundary-framed replace()), making the driver-controlled "
        "loop fully cross-engine-checked; tests/test_bpe.py adds "
        "merge-for-merge parity with a pure-Python reference BPE.",
    )
    def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        merges = train_bpe(docs, n_merges=6)
        return spark.createDataFrame(
            [(m["step"], m["left"], m["right"], m["pair_count"]) for m in merges],
            "step int, left string, right string, pair_count long",
        )


_register()


def bpe_encode(
    docs: DataFrame, merges: list[dict], text_col: str = "text", out_col: str = "bpe_tokens"
) -> DataFrame:
    """Encode documents with learned merges: whitespace-split, then
    apply each merge greedily left-to-right per word, in training order
    — the standard BPE encode. Runs as ONE Arrow-batched ``mapInPandas``
    pass: a per-word Python loop over ~n_merges rules is far past the
    ~30-50-lambda-eval break-even where a batched UDF beats Catalyst
    HOF expressions (chaining n_merges ``aggregate`` folds in the plan
    would also make analysis cost quadratic in merges). Shuffle-free
    and embarrassingly parallel; the merge table ships to executors in
    the serialized closure (it is tiny — the vocab, not the corpus).

    Output: input columns plus ``out_col: array<string>``.
    """
    import re as _re

    rules = [(m["left"], m["right"]) for m in merges]
    out_fields = docs.schema.simpleString()[7:-1]  # strip struct<...>
    out_schema = f"{out_fields},{out_col} array<string>"

    def encode_word(word: str) -> list[str]:
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

    def encode_batches(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                [s for w in _re.split(r"\s+", t.strip()) if w for s in encode_word(w)]
                for t in pdf[text_col]
            ]
            yield pdf

    return docs.mapInPandas(encode_batches, schema=out_schema)

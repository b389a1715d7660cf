"""Text-analysis expression builders — all built-in-function compositions.

Everything here is a ``pyspark.sql.functions`` expression (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path. Each builder
has a matching DuckDB-SQL twin used by the oracle, with identical
integer/double arithmetic so results hash-match exactly.

These are the per-document primitives of a training-data pipeline:
tokenization, quality scoring, language ID, fingerprinting. At 100 TB
they run as a single narrow projection over the documents table — no
shuffle, fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# zh is detected by CJK characters instead of stopwords.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(col), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def stopword_hits_sql(expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_sql(expr)}, t -> t IN ({lst})))"


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, lang) for lang in LANG_ORDER}


def predict_lang(col: Column) -> Column:
    """Argmax of stopword hits with LANG_ORDER tie-break; 'und' if no hits."""
    scores = lang_scores(col)
    # CASE chain: en >= all others → en; then de >= fr, es; ... — earlier
    # LANG_ORDER entries win ties, mirrored exactly in predict_lang_sql.
    c_en, c_de, c_fr, c_es = (scores[lang] for lang in LANG_ORDER)
    total = c_en + c_de + c_fr + c_es
    return (
        F.when(total == 0, F.lit("und"))
        .when((c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es), F.lit("en"))
        .when((c_de >= c_fr) & (c_de >= c_es), F.lit("de"))
        .when(c_fr >= c_es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def predict_lang_sql(expr: str) -> str:
    c = {lang: stopword_hits_sql(expr, lang) for lang in LANG_ORDER}
    return f"""
        CASE
            WHEN ({c['en']}) + ({c['de']}) + ({c['fr']}) + ({c['es']}) = 0 THEN 'und'
            WHEN ({c['en']}) >= ({c['de']}) AND ({c['en']}) >= ({c['fr']})
                 AND ({c['en']}) >= ({c['es']}) THEN 'en'
            WHEN ({c['de']}) >= ({c['fr']}) AND ({c['de']}) >= ({c['es']}) THEN 'de'
            WHEN ({c['fr']}) >= ({c['es']}) THEN 'fr'
            ELSE 'es'
        END
    """


def quality_score(col: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]:
    0.5 * min(1, n_tokens/50) + 0.3 * min(1, mean_token_len/8) + 0.2 * alpha_ratio.

    Integer counts + single double ops → bitwise-deterministic cross-engine.
    """
    n_tok = token_count(col).cast("double")
    n_alpha = F.length(F.regexp_replace(col, r"[^a-zA-Z]", "")).cast("double")
    # nullif: an EMPTY document has undefined quality (NULL), not a
    # divide-by-zero crash under ANSI mode; DuckDB twin matches.
    n_chars = F.nullif(F.length(col).cast("double"), F.lit(0.0))
    mean_tok_len = n_alpha / n_tok
    return (
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.5
        + F.least(F.lit(1.0), mean_tok_len / F.lit(8.0)) * 0.3
        + (n_alpha / n_chars) * 0.2
    )


def quality_score_sql(expr: str) -> str:
    n_tok = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    n_alpha = f"CAST(length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
    n_chars = f"CAST(length({expr}) AS DOUBLE)"
    return (
        f"least(1.0, {n_tok} / 50.0) * 0.5"
        f" + least(1.0, ({n_alpha} / {n_tok}) / 8.0) * 0.3"
        f" + ({n_alpha} / nullif({n_chars}, 0.0)) * 0.2"
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    # sequence(1, 0) is DESCENDING in Spark (never empty) — docs shorter
    # than n tokens must yield an empty shingle set explicitly.
    return F.when(
        F.size(toks) >= n, F.array_distinct(joined)
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_from_tokens_sql(toks_col: str = "toks", n: int = 3) -> str:
    """DuckDB fragment building distinct word n-gram shingles from an
    existing token-list column (use with a CTE that computes ``toks``)."""
    parts = " || ' ' || ".join(
        f"{toks_col}[i]" if j == 0 else f"{toks_col}[i+{j}]" for j in range(n)
    )
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks_col})-{n - 1}, 0)+1), "
        f"i -> {parts}))"
    )


# BPE-ish pretokenizer: letter runs / digit runs / punctuation runs, each
# with an optional leading space (the GPT-2 pretokenizer family, minus
# lookahead — RE2 (DuckDB) has no lookahead, and Java (Spark) agrees with
# RE2 on leftmost-first alternation, so counts match exactly).
BPE_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_REGEX))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))"

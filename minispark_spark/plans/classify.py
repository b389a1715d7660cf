"""Trained-classifier quality/language filtering — the multinomial
Naive Bayes family (McCallum & Nigam 1998), the classifier shape behind
CCNet's and GPT-3's quality-filter stage (Brown et al. 2020, App. A:
train a classifier on curated-vs-crawl, keep docs the classifier
scores high). The reference engine has nothing like it; this is part
of the training-data-pipeline extension surface (driver brief), the
trained complement of the `lang_id` stopword heuristic.

Registry determinism contract: the published recipe sums per-token
LOG-likelihoods; ln() is not correctly-rounded cross-engine, so the
per-(token, class) weight is the exact-integer QUANTIZED Laplace
probability ``(QP*(c_tc+1)) DIV (n_c+V)`` with QP=1e9 (the
docs_dsir_select / docs_lm_fluency convention) — same feature space,
same add-1 smoothing, every score an exact BIGINT sum so Spark and
DuckDB hash-match bit-for-bit. At trillion-token class counts
``QP*(c_tc+1)`` approaches int64; drop QP to 1e6 or widen the
intermediate to DECIMAL(38,0) — the DSIR note applies verbatim.

Train/apply split is the hash split used across the repo: docs with
``doc_id % 5 != 0`` train the model, ``doc_id % 5 == 0`` are scored
(the held-out 20%). Test tokens unseen in the training vocabulary are
dropped (the standard multinomial-NB treatment); a test doc with NO
in-vocabulary token still gets a prediction (the prior argmax).

Scale shape (100 TB): token counting shuffles on (class, token) with
map-side combine; the smoothing grid is vocab x class-dimension (the
class frame is bounded by the LABEL DOMAIN, ~5 rows, broadcast — the
grid join shuffles on token only); scoring is one shuffle join on
token plus a per-doc aggregation; the argmax window is K rows per doc
(K = #classes). No corpus x corpus anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import text
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table

QP = 1_000_000_000
_TOKS = r"string_split_regex(trim(text), '\s+')"

# Shared oracle CTE block: the trained model (counts, totals, vocab,
# smoothed weight grid, priors) — every entry's SQL starts from this.
_MODEL_CTES = f"""
        train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        test AS (SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0),
        occ AS (SELECT lang AS cls, unnest({_TOKS}) AS tok FROM train),
        counts AS (SELECT cls, tok, COUNT(*) AS c_tc FROM occ GROUP BY 1, 2),
        totals AS (SELECT cls, SUM(c_tc) AS n_c FROM counts GROUP BY 1),
        vocab AS (SELECT DISTINCT tok FROM occ),
        vsize AS (SELECT COUNT(*) AS v_size FROM vocab),
        cls_docs AS (SELECT lang AS cls, COUNT(*) AS docs_c FROM train GROUP BY 1),
        ttot AS (SELECT COUNT(*) AS docs_total FROM train),
        grid AS (
            SELECT t.cls, v.tok, COALESCE(c.c_tc, 0) AS c_tc,
                   ({QP} * (COALESCE(c.c_tc, 0) + 1)) // (t.n_c + s.v_size) AS w
            FROM vocab v
            CROSS JOIN totals t
            CROSS JOIN vsize s
            LEFT JOIN counts c ON c.cls = t.cls AND c.tok = v.tok
        ),
        priors AS (
            SELECT cd.cls, ({QP} * cd.docs_c) // tt.docs_total AS prior_w
            FROM cls_docs cd CROSS JOIN ttot tt
        )
"""

# Classification CTEs on top of the model: score every held-out doc
# against every class, argmax with a deterministic (score DESC, cls)
# tie-break.
_CLASSIFY_CTES = (
    _MODEL_CTES
    + f""",
        tocc AS (
            SELECT doc_id, unnest({_TOKS}) AS tok
            FROM documents WHERE doc_id % 5 = 0
        ),
        tok_scores AS (
            SELECT o.doc_id, g.cls, SUM(g.w) AS tok_score
            FROM tocc o JOIN grid g USING (tok) GROUP BY 1, 2
        ),
        scored AS (
            SELECT te.doc_id, te.lang, p.cls,
                   p.prior_w + COALESCE(ts.tok_score, 0) AS score
            FROM test te
            CROSS JOIN priors p
            LEFT JOIN tok_scores ts
              ON ts.doc_id = te.doc_id AND ts.cls = p.cls
        ),
        ranked AS (
            SELECT doc_id, lang, cls, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, cls
                   ) AS rn
            FROM scored
        ),
        pred AS (
            SELECT doc_id, lang, cls AS pred_lang,
                   CAST(score AS BIGINT) AS score, lang = cls AS correct
            FROM ranked WHERE rn = 1
        )
"""
)


def _split(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    return (
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
    )


def nb_model(
    docs: DataFrame, label: F.Column | None = None
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB on the ``doc_id % 5 != 0`` split.

    ``label`` is the class expression (defaults to the ``lang``
    column; the quality filter passes a curated-vs-rest CASE over
    ``source``). Returns ``(grid, priors)``: ``grid`` has one row per
    (class, vocabulary token) with the observed count and the
    quantized Laplace weight (zero-count tokens get the smoothed
    floor weight); ``priors`` has one row per class with the
    quantized class prior. Both frames are exact BIGINT arithmetic.
    """
    if label is None:
        label = F.col("lang")
    train, _ = _split(docs)
    occ = train.select(
        label.alias("cls"),
        F.explode(text.tokens(F.col("text"))).alias("tok"),
    )
    counts = occ.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("c_tc"))
    totals = counts.groupBy("cls").agg(F.sum("c_tc").alias("n_c"))
    vocab = occ.select("tok").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v_size"))
    # totals/vsize are bounded by the label domain / 1 row — broadcast;
    # the only data-sized shuffles are the (cls, tok) count and the
    # grid's left join back on (cls, tok).
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vsize))
        .join(counts, ["cls", "tok"], "left")
        .select(
            "cls",
            "tok",
            F.coalesce(F.col("c_tc"), F.lit(0)).cast("long").alias("c_tc"),
            F.expr(f"({QP} * (COALESCE(c_tc, 0) + 1)) DIV (n_c + v_size)")
            .cast("long")
            .alias("w"),
        )
    )
    cls_docs = train.groupBy(label.alias("cls")).agg(
        F.count(F.lit(1)).alias("docs_c")
    )
    ttot = train.agg(F.count(F.lit(1)).alias("docs_total"))
    priors = cls_docs.crossJoin(F.broadcast(ttot)).select(
        "cls",
        F.expr(f"({QP} * docs_c) DIV docs_total").cast("long").alias("prior_w"),
    )
    return grid, priors


def nb_predictions(docs: DataFrame) -> DataFrame:
    """Score the held-out split against the trained model; one row per
    held-out doc: (doc_id, lang, pred_lang, score, correct)."""
    grid, priors = nb_model(docs)
    _, test = _split(docs)
    tocc = test.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    tok_scores = (
        tocc.join(grid.select("tok", "cls", "w"), "tok")
        .groupBy("doc_id", "cls")
        .agg(F.sum("w").alias("tok_score"))
    )
    scored = (
        test.select("doc_id", "lang")
        .crossJoin(F.broadcast(priors))
        .join(tok_scores, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "lang",
            "cls",
            (F.col("prior_w") + F.coalesce(F.col("tok_score"), F.lit(0)))
            .cast("long")
            .alias("score"),
        )
    )
    # K rows per doc (K = #classes): the argmax window is bounded by
    # the label domain, never by corpus size.
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cls").alias("pred_lang"),
            "score",
            (F.col("lang") == F.col("cls")).alias("correct"),
        )
    )


_CHI2_TOPK = 50


@query(
    "docs_token_chi2_topk",
    oracle=f"""
        WITH pres AS (
            SELECT DISTINCT doc_id, lang AS cls, tok
            FROM (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents)
        ),
        a AS (SELECT tok, cls, COUNT(*) AS a FROM pres GROUP BY 1, 2),
        pt AS (SELECT tok, SUM(a) AS p FROM a GROUP BY 1),
        ncs AS (SELECT lang AS cls, COUNT(*) AS n_c FROM documents GROUP BY 1),
        nn AS (SELECT COUNT(*) AS n FROM documents),
        cells AS (
            SELECT pt.tok, pt.p,
                   COALESCE(a.a, 0) AS o_p,
                   ncs.n_c - COALESCE(a.a, 0) AS o_a,
                   CAST(pt.p * ncs.n_c AS DOUBLE) / CAST(nn.n AS DOUBLE) AS e_p,
                   CAST((nn.n - pt.p) * ncs.n_c AS DOUBLE)
                       / CAST(nn.n AS DOUBLE) AS e_a
            FROM pt
            CROSS JOIN ncs
            CROSS JOIN nn
            LEFT JOIN a ON a.tok = pt.tok AND a.cls = ncs.cls
        ),
        scored AS (
            SELECT tok, CAST(MAX(p) AS BIGINT) AS present_docs,
                   CAST(SUM(
                       CASE WHEN e_p = 0 THEN CAST(0 AS DECIMAL(28,10))
                            ELSE CAST((CAST(o_p AS DOUBLE) - e_p)
                                      * (CAST(o_p AS DOUBLE) - e_p) / e_p
                                      AS DECIMAL(28,10)) END
                       + CASE WHEN e_a = 0 THEN CAST(0 AS DECIMAL(28,10))
                              ELSE CAST((CAST(o_a AS DOUBLE) - e_a)
                                        * (CAST(o_a AS DOUBLE) - e_a) / e_a
                                        AS DECIMAL(28,10)) END
                   ) AS DOUBLE) AS chi2
            FROM cells GROUP BY tok
        )
        SELECT tok, present_docs, chi2 FROM scored
        ORDER BY chi2 DESC, tok LIMIT {_CHI2_TOPK}
    """,
    doc="Chi-square FEATURE SELECTION for the token classifier (the "
    "Yang & Pedersen 1997 ranking; scikit-learn's chi2 scorer): "
    "per-token 2xK document-level contingency (present/absent x "
    "class), chi2 summed over the 2K cells, top-"
    f"{_CHI2_TOPK} tokens. The events_chi_square determinism recipe: "
    "contingency counts are exact integers, expected counts use exact "
    "integer products with ONE double division, each cell's "
    "contribution is quantized to DECIMAL(28,10) before the per-token "
    "sum (cell order can't perturb bits), zero-expected cells "
    "contribute exact zero (a token present in EVERY doc has no "
    "absent-row evidence). Shuffles: distinct (doc, token) presence, "
    "the (token, class) count, the grid left join on (token, class); "
    "class totals broadcast; the final top-k is TakeOrderedAndProject "
    "(never a global sort). On the synthetic corpus chi2 is near-"
    "uniform (shared vocabulary); tests/test_classify.py pins the "
    "closed-form 2x2 value chi2 == N on a perfectly-associated hand "
    "corpus.",
)
def docs_token_chi2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_chi2_topk(load_table(spark, sf_dir, "documents"), _CHI2_TOPK)


def token_chi2_topk(docs: DataFrame, k: int) -> DataFrame:
    pres = docs.select(
        "doc_id",
        F.col("lang").alias("cls"),
        F.explode(text.tokens(F.col("text"))).alias("tok"),
    ).distinct()
    a = pres.groupBy("tok", "cls").agg(F.count(F.lit(1)).alias("a"))
    pt = a.groupBy("tok").agg(F.sum("a").alias("p"))
    ncs = docs.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    nn = docs.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        pt.crossJoin(F.broadcast(ncs))
        .crossJoin(F.broadcast(nn))
        .join(a, ["tok", "cls"], "left")
        .select(
            "tok",
            "p",
            F.coalesce(F.col("a"), F.lit(0)).alias("o_p"),
            (F.col("n_c") - F.coalesce(F.col("a"), F.lit(0))).alias("o_a"),
            ((F.col("p") * F.col("n_c")).cast("double") / F.col("n").cast("double")).alias("e_p"),
            (
                ((F.col("n") - F.col("p")) * F.col("n_c")).cast("double")
                / F.col("n").cast("double")
            ).alias("e_a"),
        )
    )
    zero = F.lit(0).cast("decimal(28,10)")
    term_p = F.when(F.col("e_p") == 0, zero).otherwise(
        (
            (F.col("o_p").cast("double") - F.col("e_p"))
            * (F.col("o_p").cast("double") - F.col("e_p"))
            / F.col("e_p")
        ).cast("decimal(28,10)")
    )
    term_a = F.when(F.col("e_a") == 0, zero).otherwise(
        (
            (F.col("o_a").cast("double") - F.col("e_a"))
            * (F.col("o_a").cast("double") - F.col("e_a"))
            / F.col("e_a")
        ).cast("decimal(28,10)")
    )
    scored = cells.groupBy("tok").agg(
        F.max("p").cast("long").alias("present_docs"),
        F.sum(term_p + term_a).cast("double").alias("chi2"),
    )
    return scored.orderBy(F.desc("chi2"), F.asc("tok")).limit(k)


@query(
    "docs_nb_token_weights",
    oracle=f"""
        WITH {_MODEL_CTES}
        SELECT cls, tok, CAST(c_tc AS BIGINT) AS c_tc, CAST(w AS BIGINT) AS w
        FROM grid WHERE c_tc >= 3
    """,
    doc="Multinomial Naive Bayes TRAINING on the hash split "
    "(doc_id %% 5 != 0): per-(class, token) observed counts and the "
    "quantized Laplace log-likelihood surrogate (QP*(c+1)) DIV (n_c+V) "
    "— the trained quality/language-filter model table (McCallum & "
    "Nigam 1998; the GPT-3/CCNet quality-classifier shape). Output "
    "bounded to tokens observed >= 3x in a class (the model's "
    "confident rows); the full smoothing grid lives in the classify "
    "entry's plan. Shuffles: (class, token) counting with map-side "
    "combine, the grid's left join on (class, token); class totals "
    "and the 1-row vocab size broadcast.",
)
def docs_nb_token_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid, _ = nb_model(load_table(spark, sf_dir, "documents"))
    return grid.filter(F.col("c_tc") >= 3)


@query(
    "docs_nb_classify",
    oracle=f"""
        WITH {_CLASSIFY_CTES}
        SELECT doc_id, lang, pred_lang, score, correct FROM pred
    """,
    doc="Multinomial Naive Bayes CLASSIFICATION of the held-out 20% "
    "(doc_id %% 5 == 0): each doc scores every class as quantized "
    "prior + sum of in-vocabulary token weights (unseen tokens "
    "dropped, the standard NB treatment; a doc with zero known "
    "tokens gets the prior argmax), argmax with a deterministic "
    "(score DESC, class ASC) tie-break. All-integer scoring — "
    "bit-exact vs DuckDB. NOTE: the driver's synthetic documents "
    "table draws every language's text from one shared vocabulary, "
    "so on THIS corpus the Bayes-optimal prediction is the prior "
    "argmax (the gate verifies mechanics); tests/test_classify.py "
    "proves the classifier separates a corpus that has real signal. "
    "Shuffles: the model's two, the scoring "
    "join on token, the per-(doc, class) sum; the argmax window is "
    "K rows per doc (K = label domain). The class-prior frame "
    "broadcasts; division is per-row over class rows, so an empty "
    "train split yields an empty result, never a divide-by-zero.",
)
def docs_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_predictions(load_table(spark, sf_dir, "documents"))


@query(
    "docs_nb_metrics",
    oracle=f"""
        WITH {_CLASSIFY_CTES},
        by_true AS (
            SELECT lang AS cls, COUNT(*) AS n_true,
                   SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS tp
            FROM pred GROUP BY 1
        ),
        by_pred AS (
            SELECT pred_lang AS cls, COUNT(*) AS n_pred,
                   SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS tp_p
            FROM pred GROUP BY 1
        )
        SELECT COALESCE(t.cls, p.cls) AS cls,
               CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
               CAST(COALESCE(p.n_pred, 0) - COALESCE(t.tp, 0) AS BIGINT) AS fp,
               CAST(COALESCE(t.n_true, 0) - COALESCE(t.tp, 0) AS BIGINT) AS fn,
               CAST((1000000 * COALESCE(t.tp, 0))
                    // NULLIF(COALESCE(p.n_pred, 0), 0) AS BIGINT)
                   AS precision_ppm,
               CAST((1000000 * COALESCE(t.tp, 0))
                    // NULLIF(COALESCE(t.n_true, 0), 0) AS BIGINT)
                   AS recall_ppm
        FROM by_true t FULL OUTER JOIN by_pred p ON t.cls = p.cls
    """,
    doc="Per-class evaluation of the NB classifier on the held-out "
    "split: true positives, false positives, false negatives, and "
    "ppm-quantized precision/recall (integer division — exact, no "
    "float ratios). Full-outer join of the by-true-label and "
    "by-predicted-label aggregates so a class that is never predicted "
    "(or never true) still reports; NULLIF guards the zero "
    "denominators. Frame sizes are the label domain (~5 rows).",
)
def docs_nb_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = nb_predictions(load_table(spark, sf_dir, "documents"))
    correct_int = F.when(F.col("correct"), 1).otherwise(0)
    by_true = pred.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_true"), F.sum(correct_int).alias("tp")
    )
    by_pred = pred.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return by_true.join(by_pred, "cls", "full_outer").select(
        "cls",
        F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        (F.coalesce(F.col("n_pred"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
        .cast("long")
        .alias("fp"),
        (F.coalesce(F.col("n_true"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
        .cast("long")
        .alias("fn"),
        F.expr(
            "(1000000 * COALESCE(tp, 0)) DIV NULLIF(COALESCE(n_pred, 0), 0)"
        )
        .cast("long")
        .alias("precision_ppm"),
        F.expr(
            "(1000000 * COALESCE(tp, 0)) DIV NULLIF(COALESCE(n_true, 0), 0)"
        )
        .cast("long")
        .alias("recall_ppm"),
    )


# --- Quality filtering with the trained classifier (GPT-3 App. A) ----------

CURATED_SOURCES = ("src0", "src1", "src2", "src3")
_CUR_SQL = ", ".join(f"'{s}'" for s in CURATED_SOURCES)
_LABEL_SQL = f"CASE WHEN source IN ({_CUR_SQL}) THEN 'cur' ELSE 'rest' END"


# Shared margin CTEs: binary NB over curated-vs-rest, every doc scored
# as the integer margin (used by the filter AND the calibration table).
_QMARGIN_CTES = f"""
        train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        occ AS (
            SELECT {_LABEL_SQL} AS cls, unnest({_TOKS}) AS tok FROM train
        ),
        counts AS (SELECT cls, tok, COUNT(*) AS c_tc FROM occ GROUP BY 1, 2),
        totals AS (SELECT cls, SUM(c_tc) AS n_c FROM counts GROUP BY 1),
        vocab AS (SELECT DISTINCT tok FROM occ),
        vsize AS (SELECT COUNT(*) AS v_size FROM vocab),
        cls_docs AS (
            SELECT {_LABEL_SQL} AS cls, COUNT(*) AS docs_c FROM train GROUP BY 1
        ),
        ttot AS (SELECT COUNT(*) AS docs_total FROM train),
        grid AS (
            SELECT t.cls, v.tok,
                   ({QP} * (COALESCE(c.c_tc, 0) + 1)) // (t.n_c + s.v_size) AS w
            FROM vocab v
            CROSS JOIN totals t
            CROSS JOIN vsize s
            LEFT JOIN counts c ON c.cls = t.cls AND c.tok = v.tok
        ),
        priors AS (
            SELECT cd.cls, ({QP} * cd.docs_c) // tt.docs_total AS prior_w
            FROM cls_docs cd CROSS JOIN ttot tt
        ),
        alloc AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        tok_scores AS (
            SELECT a.doc_id, g.cls, SUM(g.w) AS tok_score
            FROM alloc a JOIN grid g USING (tok) GROUP BY 1, 2
        ),
        scored AS (
            SELECT d.doc_id, p.cls,
                   p.prior_w + COALESCE(ts.tok_score, 0) AS score
            FROM (SELECT doc_id FROM documents) d
            CROSS JOIN priors p
            LEFT JOIN tok_scores ts
              ON ts.doc_id = d.doc_id AND ts.cls = p.cls
        ),
        margin AS (
            SELECT doc_id,
                   SUM(CASE WHEN cls = 'cur' THEN score ELSE -score END) AS m
            FROM scored GROUP BY 1
        )
"""


@query(
    "docs_quality_nb_filter",
    oracle=f"""
        WITH {_QMARGIN_CTES},
        ranked AS (
            SELECT doc_id, m,
                   ROW_NUMBER() OVER (ORDER BY m, doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM margin
        )
        SELECT doc_id, CAST(m AS BIGINT) AS nb_margin,
               rn > n - n // 4 AS keep
        FROM ranked
    """,
    doc="Classifier-based QUALITY FILTERING (Brown et al. 2020 App. A; "
    "CCNet): train binary NB on curated-vs-rest (curated = sources "
    f"{', '.join(CURATED_SOURCES)}) over the hash-split 80%, score "
    "EVERY doc as the integer margin curated_score - rest_score, keep "
    "the top QUARTER by margin — rank-based selection (the DSIR "
    "keep-quartile shape) rather than an absolute threshold, so the "
    "filter keeps a fixed budget share even when the margin "
    "distribution shifts. Ranking is the distributed exact-rank "
    "decomposition (operators/ranking.py: approx-quantile cuts -> "
    "row-local buckets -> bounded offset collect -> bucket-local "
    "row_number) — no Exchange SinglePartition; the oracle is the "
    "naive global ROW_NUMBER. All-integer scoring (the NB family's "
    "quantized Laplace weights), so keep decisions are bit-exact.",
)
def docs_quality_nb_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators import ranking

    docs = load_table(spark, sf_dir, "documents")
    # Cache the margins: the quantile pass, the offsets collect, and the
    # final plan each read this frame — WITHOUT the cache each re-runs
    # the whole NB scoring pipeline (train + token explode + score
    # joins, ~15 stages), i.e. 3 full trainings per query (measured:
    # 54-stage executed plan at sf0.1). The cached frame is one
    # (doc_id, long) row per doc — the customers_rfm_segments pattern.
    margin = nb_quality_margins(docs).cache()
    cuts = ranking.quantile_cuts(margin, ["m"])
    b = margin.withColumn("_b", ranking.bucket_expr("m", cuts["m"]))
    offsets, total = ranking.bucket_weight_offsets(b, "_b")
    w = Window.partitionBy("_b").orderBy("m", "doc_id")
    return (
        b.withColumn(
            "rn", F.row_number().over(w) + ranking.offset_expr("_b", offsets)
        )
        .select(
            "doc_id",
            F.col("m").alias("nb_margin"),
            (F.col("rn") > F.lit(total - total // 4)).alias("keep"),
        )
    )


def nb_quality_margins(docs: DataFrame) -> DataFrame:
    """(doc_id, m): every doc's integer curated-minus-rest NB margin —
    the shared scoring core of the quality filter and its calibration
    table."""
    label = F.when(F.col("source").isin(*CURATED_SOURCES), "cur").otherwise("rest")
    grid, priors = nb_model(docs, label)
    alloc = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    tok_scores = (
        alloc.join(grid.select("tok", "cls", "w"), "tok")
        .groupBy("doc_id", "cls")
        .agg(F.sum("w").alias("tok_score"))
    )
    scored = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(priors))
        .join(tok_scores, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "cls",
            (F.col("prior_w") + F.coalesce(F.col("tok_score"), F.lit(0))).alias(
                "score"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("cls") == "cur", F.col("score")).otherwise(-F.col("score"))
        )
        .cast("long")
        .alias("m")
    )


@query(
    "docs_nb_calibration",
    oracle=f"""
        WITH {{_QM}},
        flags AS (
            SELECT doc_id,
                   CASE WHEN source IN ({{_CUR}}) THEN 1 ELSE 0 END AS is_cur
            FROM documents
        ),
        tiled AS (
            SELECT m.doc_id, m.m, f.is_cur,
                   CAST(NTILE(10) OVER (ORDER BY m.m, m.doc_id) AS INTEGER)
                       AS decile
            FROM margin m JOIN flags f USING (doc_id)
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_cur) AS BIGINT) AS n_curated,
               CAST((1000000 * SUM(is_cur)) // COUNT(*) AS BIGINT)
                   AS curated_ppm,
               CAST(MIN(m) AS BIGINT) AS lo_margin,
               CAST(MAX(m) AS BIGINT) AS hi_margin
        FROM tiled GROUP BY decile
    """.replace("{_QM}", _QMARGIN_CTES).replace("{_CUR}", _CUR_SQL),
    doc="Calibration / reliability table for the NB quality filter: "
    "docs bucketed into margin DECILES (exact distributed ntile — "
    "operators/ranking.py, no single-partition sort; oracle is the "
    "naive NTILE(10)), each decile reporting its doc count, curated "
    "count, curated rate in exact ppm, and margin bounds. A "
    "well-calibrated quality score shows curated_ppm rising with the "
    "decile; on the synthetic corpus (source independent of text) the "
    "curve is flat at the base rate — which is itself the correct "
    "reliability readout, and exactly what this table is FOR in "
    "production: catching a filter whose scores stop meaning "
    "anything. All-integer margins and counts — bit-exact.",
)
def docs_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators import ranking

    docs = load_table(spark, sf_dir, "documents")
    margin = nb_quality_margins(docs)
    flags = docs.select(
        "doc_id",
        F.col("source").isin(*CURATED_SOURCES).cast("int").alias("is_cur"),
    )
    # Same 3-reads shape as docs_quality_nb_filter: cache the scored
    # frame so the NB pipeline trains once, not once per driver action.
    j = margin.join(flags, "doc_id").cache()
    cuts = ranking.quantile_cuts(j, ["m"])
    b = j.withColumn("_b", ranking.bucket_expr("m", cuts["m"]))
    counts = {r["_b"]: r["count"] for r in b.groupBy("_b").count().collect()}
    tiled = ranking.ntile_over_buckets(
        b, 10, "m", ["doc_id"], "_b", counts, "decile"
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_cur").cast("long").alias("n_curated"),
        F.expr("(1000000 * SUM(is_cur)) DIV COUNT(*)")
        .cast("long")
        .alias("curated_ppm"),
        F.min("m").cast("long").alias("lo_margin"),
        F.max("m").cast("long").alias("hi_margin"),
    )

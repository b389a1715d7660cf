"""Hand tests for the multinomial NB classifier family — the
anti-twin-oracle insurance: the registry gate proves Spark == DuckDB
bit-for-bit, these prove the classifier LEARNS when the corpus has
signal (the driver's synthetic documents table draws every language's
text from the same vocabulary, so there the Bayes-optimal answer is
the prior argmax and the gate only exercises the mechanics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minispark_spark.plans.classify import nb_model, nb_predictions

# doc_id % 5 != 0 -> train; % 5 == 0 -> held-out. Token distributions
# are fully separable by label: 'aa' docs vs 'bb' docs.
_SEPARABLE = [
    # train
    (1, "aa", "aa aa aa common"),
    (2, "aa", "aa aa common"),
    (3, "bb", "bb bb bb common"),
    (4, "bb", "bb bb common"),
    (6, "aa", "aa common aa"),
    (7, "bb", "bb common bb"),
    # held-out
    (0, "aa", "aa aa common"),
    (5, "bb", "bb bb common"),
    (10, "aa", "aa aa aa"),
    (15, "bb", "bb common"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_learns_separable_corpus(spark):
    pred = nb_predictions(_docs(spark, _SEPARABLE)).collect()
    assert len(pred) == 4
    for r in pred:
        assert r["pred_lang"] == r["lang"], (r["doc_id"], r["pred_lang"])
        assert r["correct"]


def test_nb_model_weights_ordered_by_evidence(spark):
    grid, priors = nb_model(_docs(spark, _SEPARABLE))
    w = {(r["cls"], r["tok"]): r["w"] for r in grid.collect()}
    # The class-marker token outweighs the other class's marker in
    # every class; the shared token sits between them.
    assert w[("aa", "aa")] > w[("aa", "common")] > w[("aa", "bb")]
    assert w[("bb", "bb")] > w[("bb", "common")] > w[("bb", "aa")]
    # Laplace smoothing: the zero-count cross weights are the smoothed
    # floor, identical within a class for any unseen token.
    assert w[("aa", "bb")] == min(v for (c, _), v in w.items() if c == "aa")
    p = {r["cls"]: r["prior_w"] for r in priors.collect()}
    assert set(p) == {"aa", "bb"}
    # 3 train docs each -> equal quantized priors.
    assert p["aa"] == p["bb"]


def test_nb_prior_argmax_when_no_token_signal(spark):
    # All docs share one token distribution; labels are imbalanced
    # 4:2 -> every held-out doc gets the majority prior argmax
    # (the Bayes-optimal answer when text carries no label signal).
    rows = [
        (1, "maj", "x y"), (2, "maj", "y x"), (3, "maj", "x y"),
        (4, "maj", "y x"), (6, "min", "x y"), (7, "min", "y x"),
        (0, "min", "x y"), (5, "maj", "y x"),
    ]
    pred = nb_predictions(_docs(spark, rows)).collect()
    assert {r["pred_lang"] for r in pred} == {"maj"}


def test_nb_unknown_tokens_fall_back_to_prior(spark):
    # Held-out doc 0's tokens never occur in training: its score is
    # the bare prior and the majority class wins deterministically.
    rows = [
        (1, "aa", "aa aa"), (2, "aa", "aa"), (3, "bb", "bb"),
        (0, "bb", "zz zz zz"),
    ]
    pred = {r["doc_id"]: r for r in nb_predictions(_docs(spark, rows)).collect()}
    assert pred[0]["pred_lang"] == "aa"
    assert not pred[0]["correct"]


def test_nb_metrics_confusion_counts(spark):
    from minispark_spark.plans.classify import nb_predictions as _np

    pred = _np(_docs(spark, _SEPARABLE))
    agg = pred.agg(F.sum(F.col("correct").cast("int")).alias("tp")).collect()[0]
    assert agg["tp"] == 4


def test_chi2_closed_form_perfect_association(spark):
    from minispark_spark.plans.classify import token_chi2_topk

    # 2x2 with perfect token<->class association: chi2 == N exactly.
    rows = [
        (1, "aa", "x c"), (2, "aa", "x c"),
        (3, "bb", "y c"), (4, "bb", "y c"),
    ]
    out = {r["tok"]: r for r in token_chi2_topk(_docs(spark, rows), 10).collect()}
    assert out["x"]["chi2"] == 4.0
    assert out["y"]["chi2"] == 4.0
    # A token present in EVERY doc carries no evidence (zero-expected
    # absent cells contribute exact zero, not NaN).
    assert out["c"]["chi2"] == 0.0
    assert out["c"]["present_docs"] == 4


def test_chi2_ranks_discriminative_tokens_first(spark):
    from minispark_spark.plans.classify import token_chi2_topk

    rows = [
        (1, "aa", "x c z"), (2, "aa", "x c"), (3, "aa", "x c z"),
        (4, "bb", "y c"), (5, "bb", "y c z"), (6, "bb", "y c"),
    ]
    ranked = [r["tok"] for r in token_chi2_topk(_docs(spark, rows), 2).collect()]
    assert set(ranked) == {"x", "y"}

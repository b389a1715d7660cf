"""stats.py facade semantics on hand-built series with closed-form
answers (the registry twins pin the same code against DuckDB; these pin
the MATH on inputs small enough to verify by hand)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark import stats


def _series(spark, ys):
    return spark.createDataFrame(list(enumerate(ys)), "x long, y long")


def test_mann_kendall_strictly_increasing(spark):
    n = 10
    r = stats.mann_kendall(_series(spark, range(0, 100, 10)), "x", "y").collect()[0]
    assert r["s"] == n * (n - 1) // 2 == 45
    assert r["var_num"] == n * (n - 1) * (2 * n + 5)  # no ties
    assert r["z"] > 2.8  # decisively positive trend


def test_mann_kendall_constant_series_is_zero(spark):
    r = stats.mann_kendall(_series(spark, [5] * 8), "x", "y").collect()[0]
    assert r["s"] == 0 and r["z"] == 0.0
    assert r["var_num"] == 0  # all ties cancel the variance


def test_theil_sen_recovers_exact_line(spark):
    df = _series(spark, [7 + 3 * x for x in range(12)])
    r = stats.theil_sen(df, "x", "y").collect()[0]
    assert r["slope"] == 3.0
    assert r["intercept"] == 7.0
    assert r["n_pairs"] == 12 * 11 // 2


def test_theil_sen_ignores_single_outlier(spark):
    ys = [7 + 3 * x for x in range(12)]
    ys[5] = 10_000  # one wild point must not move the median slope
    r = stats.theil_sen(_series(spark, ys), "x", "y").collect()[0]
    assert r["slope"] == 3.0


def test_runs_alternating_series(spark):
    # 0,2,0,2,... above/below the mean (1) flips every step: runs == n.
    n = 12
    r = stats.runs_above_mean(_series(spark, [0, 2] * (n // 2)), "x", "y").collect()[0]
    assert (r["runs"], r["n_above"], r["n_below"]) == (n, n // 2, n // 2)
    assert r["z"] > 2.5  # far too many runs for randomness


def test_ks_identical_and_disjoint(spark):
    rows = [(float(v), "a") for v in range(10)] + [(float(v), "b") for v in range(10)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.ks_2sample(df, "v", "g", "a", "b").collect()[0]
    assert r["d_num"] == 0 and r["d"] == 0.0
    rows = [(float(v), "a") for v in range(10)] + [
        (float(v + 100), "b") for v in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.ks_2sample(df, "v", "g", "a", "b").collect()[0]
    assert r["d"] == 1.0  # fully separated distributions


def test_chi_square_perfect_independence(spark):
    # 2x2 with identical row distributions: chi2 exactly 0, dof 1.
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 10 + [("y", "u")] * 40 + [("y", "v")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.chi_square(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 90


def test_acf_period_two_series(spark):
    r = {x["lag"]: x for x in stats.acf(_series(spark, [0, 2] * 8), "x", "y", 2).collect()}
    assert r[1]["acf"] == pytest.approx(-1.0)
    assert r[2]["acf"] == pytest.approx(1.0)


def test_acf_constant_series_is_null(spark):
    rows = stats.acf(_series(spark, [5] * 10), "x", "y", 2).collect()
    assert all(r["acf"] is None for r in rows)  # zero variance → undefined


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(x, x * x) for x in range(1, 11)], "a long, b long"
    )  # nonlinear but perfectly monotone: rho exactly 1
    r = stats.spearman(df, "a", "b").collect()[0]
    assert r["rho"] == 1.0 and r["n"] == 10
    r = stats.spearman(
        df.select("a", (-F.col("b")).alias("b")), "a", "b"
    ).collect()[0]
    assert r["rho"] == -1.0


def test_spearman_tie_averaging_matches_scipy_formula(spark):
    # Hand-checkable tied example: a = [1,1,2], b = [10,20,20].
    # Average ranks: a -> 1.5,1.5,3 ; b -> 1,2.5,2.5 ; rho = 0.5.
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 20)], "a long, b long")
    r = stats.spearman(df, "a", "b").collect()[0]
    assert r["rho"] == pytest.approx(0.5)


def test_kendall_perfect_and_reversed(spark):
    df = spark.createDataFrame([(x, x * 3 + 1) for x in range(8)], "a long, b long")
    r = stats.kendall_tau(df, "a", "b").collect()[0]
    assert r["tau"] == pytest.approx(1.0) and r["s"] == 8 * 7 // 2
    r = stats.kendall_tau(
        df.select("a", (-F.col("b")).alias("b")), "a", "b"
    ).collect()[0]
    assert r["tau"] == pytest.approx(-1.0)


def test_kendall_tau_b_with_ties(spark):
    # a=[1,1,2,2], b=[1,2,1,2]: all concordance cancels -> tau 0;
    # 2*Ta = 2*Tb = 4, so the tie-corrected denominator is sqrt(4)*sqrt(4).
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 1), (2, 2)], "a long, b long")
    r = stats.kendall_tau(df, "a", "b").collect()[0]
    assert r["s"] == 0 and r["tau"] == 0.0


def test_mann_whitney_identical_and_shifted(spark):
    rows = [(float(v), "a") for v in range(1, 11)] + [
        (float(v), "b") for v in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # identical samples: U1 = n1*n2/2 exactly -> 2*U1 = n1*n2, z = 0
    assert r["u1_x2"] == 100 and r["z"] == 0.0
    rows = [(float(v), "a") for v in range(1, 11)] + [
        (float(v + 100), "b") for v in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["u1_x2"] == 0  # every a below every b: U1 = 0
    assert r["z"] < -3.0


def test_mann_whitney_tie_handling_hand_example(spark):
    # a = [1, 2], b = [2, 3]: pooled ranks 1, 2.5, 2.5, 4.
    # R1 = 3.5 -> 2*R1 = 7; 2*U1 = 7 - 2*3 = 1.
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")], "v double, g string"
    )
    r = stats.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["u1_x2"] == 1


def test_kruskal_wallis_identical_groups_near_zero(spark):
    rows = [(float(v), g) for g in ("a", "b", "c") for v in range(1, 21)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.kruskal_wallis(df, "v", "g", ["a", "b", "c"]).collect()[0]
    assert r["n"] == 60 and r["k_groups"] == 3
    assert abs(r["h_tie_corrected"]) < 1e-9  # identical distributions


def test_kruskal_wallis_separated_groups_is_large(spark):
    rows = (
        [(float(v), "a") for v in range(10)]
        + [(float(v + 100), "b") for v in range(10)]
        + [(float(v + 200), "c") for v in range(10)]
    )
    df = spark.createDataFrame(rows, "v double, g string")
    r = stats.kruskal_wallis(df, "v", "g", ["a", "b", "c"]).collect()[0]
    # fully separated: H == its no-tie maximum for equal groups
    assert r["h"] > 25  # chi2(2) 0.001 critical is 13.8 — decisive


def test_friedman_perfect_agreement(spark):
    # every block ranks a < b < c identically -> W = 1, chi2 = n*(k-1)
    rows = []
    for blk in range(8):
        rows += [(blk, "a", 1.0), (blk, "b", 2.0), (blk, "c", 3.0)]
    df = spark.createDataFrame(rows, "blk long, g string, v double")
    r = stats.friedman(df, "blk", "g", "v", ["a", "b", "c"]).collect()[0]
    assert r["n_blocks"] == 8 and r["k"] == 3
    assert r["chi2_f"] == pytest.approx(16.0)  # n*(k-1)
    assert r["kendalls_w"] == pytest.approx(1.0)


def test_friedman_all_tied_is_zero(spark):
    rows = []
    for blk in range(6):
        rows += [(blk, "a", 5.0), (blk, "b", 5.0), (blk, "c", 5.0)]
    df = spark.createDataFrame(rows, "blk long, g string, v double")
    r = stats.friedman(df, "blk", "g", "v", ["a", "b", "c"]).collect()[0]
    assert r["chi2_f"] == pytest.approx(0.0)
    assert r["kendalls_w"] == pytest.approx(0.0)


def test_friedman_drops_incomplete_blocks(spark):
    rows = [(0, "a", 1.0), (0, "b", 2.0), (0, "c", 3.0), (1, "a", 9.0)]
    df = spark.createDataFrame(rows, "blk long, g string, v double")
    r = stats.friedman(df, "blk", "g", "v", ["a", "b", "c"]).collect()[0]
    assert r["n_blocks"] == 1  # block 1 lacks b and c

"""Hand tests for the distributed gradient-descent fitter — closed-form
convergence insurance on corpora where the optimum is known exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from minispark_spark.plans.pipeline import gd_linear_fit_frame


def _data(spark, rows):
    return spark.createDataFrame(rows, "x long, y long")


def test_gd_converges_to_closed_form_slope(spark):
    # x values sized so avg(x^2) ~ 781 sits in the contraction sweet
    # spot for K=1024 (factor ~0.24/step): three steps reach within a
    # few percent of the through-origin slope. Exact line y = 300*x.
    rows = [(20, 6000), (25, 7500), (30, 9000), (35, 10500)] * 4
    out = gd_linear_fit_frame(_data(spark, rows), iters=6).collect()[0]
    assert out["improved"]
    # Through-origin closed form: sum(xy)/sum(x^2) = 300 exactly.
    assert abs(out["w1"] - 300) <= 6, out["w1"]
    assert out["sse_end"] < 0.01 * out["sse_start"]


def test_gd_descends_monotonically(spark):
    rows = [(20, 6000 + 100), (25, 7500 - 100), (30, 9000 + 50), (35, 10500)] * 3
    df = _data(spark, rows)
    prev = None
    for iters in (1, 2, 3, 4):
        out = gd_linear_fit_frame(df, iters=iters).collect()[0]
        if prev is not None:
            assert out["sse_end"] <= prev
        prev = out["sse_end"]


def test_gd_empty_and_single_row(spark):
    empty = _data(spark, []).filter(F.lit(False))
    row = gd_linear_fit_frame(empty).collect()
    assert len(row) == 1 and row[0]["n"] == 0 and row[0]["w0"] is None
    # Magnitudes matter in integer fixed point: a gradient below n*K
    # truncates to a zero step (y=10 would never move), so use
    # cents-scale targets like the real entry's.
    one = gd_linear_fit_frame(_data(spark, [(2, 10_000_000)])).collect()[0]
    assert one["n"] == 1
    # x^2 = 4 << 2K: a single well-conditioned row still descends.
    assert one["improved"]


def test_gd_plan_stays_linear_in_iterations(spark):
    """r5 ADVICE regression: the iterate used to be cross-joined into
    itself twice per step, growing the LOGICAL plan ~2^iters (runtime
    was saved only by broadcast-exchange reuse — an implicit
    dependency). With the collect-and-relift form each extra iteration
    adds ZERO nodes to the returned plan (iterates are literals), so
    the final plan string must not grow with iters."""
    rows = [(20, 6000), (25, 7500), (30, 9000), (35, 10500)] * 4
    df = _data(spark, rows)
    sizes = {
        iters: len(
            gd_linear_fit_frame(df, iters=iters)._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        for iters in (2, 6)
    }
    # Identical up to literal-width jitter (different weight values).
    assert sizes[6] <= sizes[2] * 1.1, sizes

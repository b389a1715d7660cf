"""End-to-end experiment/health readout demo.

The weekly analytics review a product team runs, composed from the
stats facade (minispark_spark/stats.py) and the events-family registry
queries — every number here is ALSO oracle-verified against DuckDB in
the correctness gate:

    traffic-mix stability (chi-square)  -> is the type x weekday mix drifting?
    value-distribution drift (KS)       -> did click vs purchase values diverge?
    volume trend (Mann-Kendall + Theil-Sen) -> is volume trending, and how fast?
    randomness check (runs test)        -> clustering/regime shifts?
    cross-series association (Spearman/Kendall) -> do purchases track clicks?
    A/B readout (z-test + CUPED)        -> lift, with variance reduction
    seasonal anomalies                  -> hours that misbehave AFTER
                                           removing trend + hour-of-day pattern

Run:  python examples/experiment_readout.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("experiment-readout", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()

    def run(name: str, n: int = 10) -> None:
        print(f"\n=== {name} ===")
        REGISTRY[name].fn(spark, sf_dir).show(n, truncate=False)

    run("events_chi_square_independence")  # mix stability
    run("events_ks_test")  # value drift between types
    run("events_mann_kendall")  # monotonic volume trend?
    run("events_theilsen_trend")  # robust slope of that trend
    run("events_runs_test")  # randomness / regime shifts
    run("events_spearman_hourly")  # click->purchase association
    run("events_kendall_hourly")
    run("events_ab_lift")  # conversion readout
    run("events_ab_cuped")  # variance-reduced readout
    run("events_mann_whitney")  # rank-sum two-sample
    run("events_kruskal_wallis")  # one-way nonparametric ANOVA
    run("events_friedman")  # repeated measures, users as blocks
    run("events_holt_smoothing")  # one-step volume forecast
    run("events_seasonal_outliers", 5)  # seasonality-aware anomalies

    spark.stop()


if __name__ == "__main__":
    main()

"""Measured skew-join experiment (BASELINE.md evidence for the skew
story: AQE skew-split and plan-level salting, operators/skew.py).

Pathological single-key skew derived from real testdata (no synthetic
tables): lineitem's l_suppkey is remapped so ~30% of all rows land on
supplier 1, then joined to the supplier dimension and aggregated.
autoBroadcastJoinThreshold is disabled throughout — with a 100k-row
dim Spark would otherwise broadcast and there would be no shuffle to
skew; the experiment models the dim-too-big-to-broadcast case.

Three plans over the same data:

  plain_no_aqe   — the hot key's rows hash into ONE shuffle partition;
                   the stage tail is a single straggler task.
  aqe_skew_split — AQE skewJoin (the session default, session.py)
                   splits the oversized partition at runtime.
  salted_no_aqe  — operators/skew.salted_join n=16: the hot key is
                   spread across 16 (key, salt) partitions at plan
                   level, dimension replicated 16x.

    python tools/bench_skew.py .local/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.operators.skew import salted_join
from minispark_spark.session import get_spark
from minispark_spark.sources.tables import load_table

HOT_MOD = 10  # l_orderkey % 10 < 3  →  ~30% of rows hot
N_SALT = 16


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf10"
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    spark = get_spark("bench-skew", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % HOT_MOD < 3, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("suppkey"),
        "l_orderkey",
        "l_extendedprice",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )

    def agg(joined):
        return joined.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("rev"),
        )

    def plain():
        return agg(li.join(supp, "suppkey"))

    def salted():
        return agg(
            salted_join(li, supp, "suppkey", salt_source="l_orderkey", n_salt=N_SALT)
        )

    # AQE's skew split is gated on skewedPartitionThresholdInBytes
    # (default 256 MB of COMPRESSED shuffle bytes) — the ~30%-hot
    # partition here compresses below that, so default AQE does NOT
    # split it (measured: same time as AQE-off). Tuning the threshold
    # to the advisory size makes the split fire and beats even salting
    # (no 16x dimension replication). The production lesson BASELINE.md
    # records: defaults miss mid-size skew; size the threshold to your
    # partition budget.
    default_thresh = ("256m", "64m")
    tuned_thresh = ("64m", "32m")

    def set_thresh(t):
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", t[0])
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", t[1])

    # The shipped opt-in profile (session.PROFILES["skew-tuned"]) must
    # be the measured tuned thresholds — the case below applies the
    # profile dict itself, so a drifted profile shows up as a slow row.
    from minispark_spark.session import PROFILES

    prof = PROFILES["skew-tuned"]
    profile_thresh = (
        prof["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"],
        prof["spark.sql.adaptive.advisoryPartitionSizeInBytes"],
    )

    cases = {
        "plain_no_aqe": (plain, "false", default_thresh),
        "aqe_default_thresholds": (plain, "true", default_thresh),
        "aqe_tuned_thresholds": (plain, "true", tuned_thresh),
        "aqe_profile_skew_tuned": (plain, "true", profile_thresh),
        "salted_no_aqe": (salted, "false", default_thresh),
    }
    out: dict[str, dict] = {}
    for name, (mk, aqe, thresh) in cases.items():
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        set_thresh(thresh)
        mk().write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(times), "runs": times}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # sanity: all three plans produce identical results
    base = {tuple(r) for r in plain().collect()}
    out["results_match"] = base == {tuple(r) for r in salted().collect()}
    print(json.dumps({"sf_dir": sf_dir, "skew": out}))
    spark.stop()


if __name__ == "__main__":
    main()

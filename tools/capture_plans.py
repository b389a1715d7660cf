"""Capture .explain('formatted') for a set of registry queries.

Usage: python tools/capture_plans.py <out_suffix> <name> [<name> ...]

Writes plans/r07/<name>_<out_suffix>.txt for each query, using the
bench's ingested sf0.1 layout (same layout the bench times against) so
the captured plans match the measured ones. Plan capture only — nothing
is executed beyond what query construction itself runs (e.g. bounded
driver collects that are part of plan building).
"""

from __future__ import annotations

import os
import sys

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark("capture-plans", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache = f"/root/repo/.bench_cache/{os.path.basename(sf_dir.rstrip('/'))}"
    if os.path.exists(f"{cache}/.ingested2"):
        sf_dir = cache
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r08")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale up the events/orders tables for the governance/events-family
scale proofs (round-3 verdict item: confirm the domain-compression
claim — Gini, funnel medians, TWAP, peak concurrency, inter-arrival —
at 10x/100x like the dedup family's).

Replicates sf0.1's events R times deterministically: replica k gets
fresh event_ids/user_ids (offset k * 10^9 / k * 10^7 — user count
grows linearly, the realistic growth axis for these per-user
analytics) and a per-replica timestamp shift of k*7 seconds (so the
timestamp domain GROWS rather than stacking identical instants — the
honest case for the sweep-line/median value-domain compression).
Orders are replicated the same way for orders_interarrival_median
(o_orderkey offset, o_custkey offset, o_orderdate shifted k days).

    python tools/gen_events_scale.py 10 .local/events10x
    python tools/bench_scale.py .local/events10x events_user_gini ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.session import get_spark
from minispark_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".local/events10x"
    spark = get_spark("gen-events-scale", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    reps = spark.range(r).withColumnRenamed("id", "k")

    ev = load_table(spark, SRC, "events")
    big_ev = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("k") * 1_000_000_000).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("k") * 7)).alias("ts"),
        (F.col("user_id") + F.col("k") * 10_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    orders = load_table(spark, SRC, "orders")
    big_orders = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("k") * 1_000_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("k") * 10_000_000).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderdate") + F.make_interval(days=F.col("k"))).alias("o_orderdate"),
        "o_orderpriority",
    )
    big_orders.repartition(32).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    print(f"wrote {out}: events={big_ev.count()}, orders={big_orders.count()}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Adversarial long-chain connected-components benchmark: rounds and
wall time of the large-star/small-star contraction vs the one-hop
min-label fixpoint it replaced, on a synthetic N-link chain (the
mirror-farm dup-graph topology where diameter == N). Results logged in
BASELINE.md ("long-chain CC ledger").

Usage: python -m tools.bench_cc_chain [chain_len ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minispark_spark.operators.graph_api import star_connected_components
from minispark_spark.session import get_spark


def _chain(spark, n: int) -> DataFrame:
    e = spark.range(1, n).select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    return e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def fixpoint_labels(sym: DataFrame, max_rounds: int) -> tuple[DataFrame, int]:
    """The replaced one-hop min-label fixpoint (for comparison only):
    labels move one hop per round, so rounds == diameter on a chain."""
    labels = sym.select(F.col("a").alias("node"), F.col("a").alias("label")).distinct()
    rounds = 0
    while rounds < max_rounds:
        neigh_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
    return labels, rounds


if __name__ == "__main__":
    lens = [int(x) for x in sys.argv[1:]] or [4096]
    spark = get_spark("bench-cc-chain", extra_conf={"spark.ui.enabled": "false"})
    for n in lens:
        sym = _chain(spark, n).cache()
        sym.count()
        t0 = time.perf_counter()
        labels, rounds = star_connected_components(sym)
        bad = labels.filter(F.col("label") != 1).count()
        t_star = time.perf_counter() - t0
        print(
            f"chain n={n}: star rounds={rounds} wall={t_star:.1f}s "
            f"wrong_labels={bad}"
        )
        # The fixpoint at full depth is O(n) rounds — run it capped at
        # 64 to measure per-round cost without hours of wall clock.
        t0 = time.perf_counter()
        _, fp_rounds = fixpoint_labels(sym, max_rounds=64)
        t_fp = time.perf_counter() - t0
        est = t_fp / fp_rounds * (n - 1)
        print(
            f"chain n={n}: fixpoint rounds needed={n - 1} "
            f"(ran {fp_rounds} in {t_fp:.1f}s -> est {est:.0f}s full)"
        )

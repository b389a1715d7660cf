"""Exact distributed selection (k-th smallest / exact quantiles)
WITHOUT a global sort.

The reference engine has no quantile operator at all (its agg surface
is SUM/MIN/MAX/AVG/COUNT — reference src/mini_spark/sql.py); Spark's
built-ins are either a global sort (``ORDER BY`` + window rank) or an
approximation (``approx_percentile``). This implements the classic
distributed selection algorithm (iterative histogram quickselect, the
same shape BlinkDB/Hive's exact-percentile jobs use):

1. one pass: COUNT/MIN/MAX of the column;
2. histogram pass: bucket the value range into ``bins`` equi-width
   buckets, count + min/max per bucket (<= ``bins`` rows to the
   driver — bounded metadata, not data);
3. descend into the single bucket containing the target rank
   (re-filtering by ``BETWEEN bucket_min AND bucket_max`` — those are
   actual data values, so membership is exact, no float-boundary
   hazard) and repeat until the candidate set is <= ``tail`` rows;
4. finish with ``ORDER BY col LIMIT k`` + ``MAX`` over the tiny
   remainder — Spark plans that as TakeOrderedAndProject (per-partition
   top-k + merge), never a global sort.

Every full-data pass is a narrow scan + a <= ``bins``-row aggregate;
at 100 TB the data is scanned O(log_bins(n/tail)) times (2-3 passes)
with no shuffle of the data itself. That beats both a global sort
(full shuffle) and a single-pass exact sort-merge selection.

Determinism: ranks are exact integers from exact counts; the returned
value is an actual data value (never interpolated), so the DuckDB
oracle can reproduce it with an explicit ``row_number()`` rank.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest_frame(df: DataFrame, col: str, k: int, bins: int = 1024, tail: int = 20000) -> DataFrame:
    """One-row lazy DataFrame holding the exact k-th smallest value
    (1-based rank, NULLs excluded) of ``df[col]``.

    The histogram-narrowing loop runs driver-side during plan BUILD
    (like the k-means / BPE trainers — a driver-controlled loop over
    bounded aggregates); the RETURNED frame is lazy: a filter chain
    ending in TakeOrderedAndProject + max, so the driver never collects
    a data value.
    """
    if k < 1:
        raise ValueError(f"rank must be >= 1, got {k}")
    cur = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    for _ in range(64):
        lo, hi, cnt = cur.agg(F.min("v"), F.max("v"), F.count("v")).first()
        if cnt < k:
            raise ValueError(f"rank {k} exceeds non-null count {cnt}")
        if cnt <= tail or lo == hi:
            break
        width = (hi - lo) / bins
        if width <= 0 or not math.isfinite(width):
            break
        bucket = F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
        hist = sorted(
            cur.groupBy(bucket.alias("b"))
            .agg(F.count("v").alias("n"), F.min("v").alias("bmin"), F.max("v").alias("bmax"))
            .collect(),
            key=lambda r: r["b"],
        )
        cum = 0
        for row in hist:
            if cum + row["n"] >= k:
                # All bucket-b rows (and only those) lie in
                # [bmin, bmax]: buckets are ordered disjoint value
                # ranges and floor() is monotone, so any v between two
                # bucket-b values is itself bucket-b.
                cur = cur.where(F.col("v").between(row["bmin"], row["bmax"]))
                k -= cum
                break
            cum += row["n"]
    return cur.orderBy("v").limit(k).agg(F.max("v").alias("value"))


def exact_quantiles_frame(df: DataFrame, col: str, qs: list[float], bins: int = 1024, tail: int = 20000) -> DataFrame:
    """Lazy (q, value) frame of exact discrete quantiles
    (``quantile_disc`` semantics: rank = floor((n-1)*q) + 1).

    Shares one count pass, then selects each rank independently (each
    selection descends into a different bucket of the same value
    range, so the histogram passes stay tiny).
    """
    base = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    spark = df.sparkSession
    lo, hi, n = base.agg(F.min("v"), F.max("v"), F.count("v")).first()
    if n == 0:
        # no rows -> no quantiles (matches the oracle's rank join
        # producing zero rows), with the schema intact
        return spark.createDataFrame([], "q double, value double")

    # ONE shared histogram pass serves every quantile (each rank
    # descends into its own bucket of the same global histogram), so
    # the whole frame costs 2 full-data passes + one tiny
    # TakeOrderedAndProject per quantile — not a per-quantile restart.
    hist = None
    width = (hi - lo) / bins if hi > lo else 0.0
    if n > tail and width > 0 and math.isfinite(width):
        bucket = F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
        hist = sorted(
            base.groupBy(bucket.alias("b"))
            .agg(F.count("v").alias("n"), F.min("v").alias("bmin"), F.max("v").alias("bmax"))
            .collect(),
            key=lambda r: r["b"],
        )

    out = None
    for q in qs:
        k = int(math.floor((n - 1) * q)) + 1
        if hist is None:
            one = base.orderBy("v").limit(k).agg(F.max("v").alias("value"))
        else:
            cum = 0
            for row in hist:
                if cum + row["n"] >= k:
                    cur = base.where(F.col("v").between(row["bmin"], row["bmax"]))
                    k_in = k - cum
                    if row["n"] <= tail:
                        one = cur.orderBy("v").limit(k_in).agg(F.max("v").alias("value"))
                    else:  # rare: a pathologically heavy bucket — recurse
                        one = kth_smallest_frame(cur, "v", k_in, bins=bins, tail=tail)
                    break
                cum += row["n"]
        one = one.select(F.lit(float(q)).alias("q"), F.col("value"))
        out = one if out is None else out.unionAll(one)
    return out

"""Z-order clustered writes — multi-dimensional data skipping.

The reference has no layout story at all (one unsorted BlockFile per
table; every scan reads every block). At 100 TB, layout IS the query
optimizer's biggest lever: parquet keeps min/max statistics per row
group and file, and Spark prunes row groups whose stats exclude the
filter — but only if the writer clustered correlated values together.

Sorting clusters one column perfectly and the others not at all.
Z-ordering interleaves the bits of several columns into one sort key,
so a range filter on ANY of the clustered columns maps to a bounded
set of z-ranges — every clustered column gets (coarser) skipping.
This is the same technique Delta Lake's OPTIMIZE ZORDER BY applies;
here it is pure open-API Spark: normalize → interleave bits →
repartitionByRange + sortWithinPartitions → parquet.

Normalization is linear min/max scaling to ``bits`` bits (one cheap
agg job). For heavily skewed columns substitute a rank/quantile
normalizer; linear keeps the write single-pass and is right for
roughly uniform keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear min/max scale to [0, 2^bits - 1] as a long."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * F.lit((1 << bits) - 1)).cast("long"), F.lit((1 << bits) - 1)
    )


def z_value(scaled: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each (already-scaled) column:
    bit i of column j lands at position i*k + j. Pure built-in
    expressions — whole-stage codegen folds this into the scan
    projection, no UDF."""
    k = len(scaled)
    if bits * k > 63:
        raise ValueError(f"z_value: {bits} bits x {k} cols exceeds a signed long")
    parts = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, c in enumerate(scaled)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_z_column(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS,
                  z_col: str = "__z") -> DataFrame:
    """Append the z-order key. One extra agg job computes min/max per
    clustered column (at scale: a metadata-only read when stats exist)."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(F.col(c), F.lit(bounds[f"_lo_{c}"]), F.lit(bounds[f"_hi_{c}"]), bits)
        for c in cols
    ]
    return df.withColumn(z_col, z_value(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    repartitionByRange on the z key gives each output file a disjoint
    z-range (range exchange samples the key — one pass), and the
    within-partition sort tightens per-row-group stats. Filters on any
    clustered column then skip most files/row groups at read time."""
    zdf = with_z_column(df, cols, bits)
    n = num_files or zdf.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        zdf.repartitionByRange(int(n), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

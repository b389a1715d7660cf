"""Skyline (Pareto-dominance) operator — domain-compressed two-phase.

``SKYLINE OF price MIN, size MAX`` returns the rows no other row
dominates (dominates = at-least-as-good on every objective, strictly
better on one). The textbook evaluations are a quadratic self-join
(block-nested-loop) or a GLOBAL sort with a running max — both
scale-killers. This implementation uses the standard distributed
decomposition for a 2-objective skyline whose second objective has a
compressible value domain:

1. **Compress** to the size domain: one map-combinable aggregate
   ``min(price) per size`` — at most |size domain| rows (50 for
   TPC-H parts, bounded regardless of row count).
2. **Suffix-min window** over the compressed frame ordered by size
   descending — a single-partition window over <= 50 rows, the same
   deliberate domain-compression pattern the counting-median / Gini /
   CUSUM family uses (cheap because the frame is tiny, not because
   the data is).
3. **Broadcast-join back**: a row survives iff it achieves its size's
   min price AND every strictly-larger size costs strictly more
   (ties on both axes survive together — neither dominates).

Prices compare as exact cents (DECIMAL-quantized BIGINT, the money
convention used across this repo), so Spark and the DuckDB
NOT-EXISTS-dominance oracle agree bit-for-bit.

No reference analogue (the reference engine has no ranking or
dominance operators — reference ``src/mini_spark/tasks.py`` tops out
at GROUP BY/JOIN); this is an extension operator in the build brief's
"analytics a 100 TB pipeline needs" family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table


def skyline_min_max(
    df: DataFrame, min_col: str, max_col: str, id_cols: tuple[str, ...]
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``min_col`` cents, maximize
    ``max_col``) Pareto frontier. ``min_col`` must already be exact
    (integer/cents); ``max_col`` is any orderable integer with a
    bounded domain (the compression axis)."""
    cents = F.col(min_col)
    per_size = df.groupBy(max_col).agg(F.min(cents).alias("m"))
    # Suffix min over sizes STRICTLY larger: window over the
    # domain-compressed frame (<= |domain| rows).
    w = (
        Window.orderBy(F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_size.select(
        max_col,
        "m",
        F.min("m").over(w).alias("better_m"),
    ).filter(F.col("better_m").isNull() | (F.col("m") < F.col("better_m")))
    return df.join(F.broadcast(frontier), on=max_col).filter(
        cents == F.col("m")
    ).select(*id_cols, max_col, min_col)


_CENTS = "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@query(
    "parts_skyline",
    oracle=f"""
        SELECT p.p_partkey, p.p_size,
               {_CENTS.replace('p_retailprice', 'p.p_retailprice')} AS price_cents
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE {_CENTS.replace('p_retailprice', 'q.p_retailprice')}
                      <= {_CENTS.replace('p_retailprice', 'p.p_retailprice')}
              AND q.p_size >= p.p_size
              AND ({_CENTS.replace('p_retailprice', 'q.p_retailprice')}
                      < {_CENTS.replace('p_retailprice', 'p.p_retailprice')}
                   OR q.p_size > p.p_size)
        )
    """,
    doc="Skyline / Pareto frontier of parts: cheapest-for-their-size "
    "parts no other part dominates (<= price AND >= size, strict "
    "somewhere). Two-phase domain-compressed plan: min-price per size "
    "(one map-combinable shuffle to <= 50 rows), suffix-min window "
    "over that tiny frame, broadcast join back — vs the oracle's "
    "O(n^2) NOT EXISTS, which DuckDB runs only because the gate SFs "
    "are small. Ties on both axes survive together (neither "
    "dominates), pinned by the sf0.1 duplicate-(49, 900.00) pair. "
    "Prices compare as DECIMAL-derived cents, so the frontier is "
    "bit-exact cross-engine.",
)
def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    return skyline_min_max(
        part, min_col="price_cents", max_col="p_size", id_cols=("p_partkey",)
    )

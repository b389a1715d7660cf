"""Fixed-point money math: exact, order-insensitive, and fast.

TPC-H money columns carry exactly 2 decimals, so we aggregate in
integer "cents" (LONG): quantize once per row, sum longs (the fastest
aggregation path in Tungsten — no decimal overhead), divide back to
DOUBLE at the end. Integer addition is associative → shuffle/partial-
agg order can't perturb results, and the DuckDB oracle reproduces the
math bit-for-bit.

Overflow headroom: SUM of cents fits LONG up to ~9.2e16 dollars;
the three-factor charge product (1e-6 units) holds to ~1e12 rows per
group — beyond that, switch that one measure to DECIMAL(38,6) (same
plan shape, ~2x agg cost).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Quantize a non-negative 2-decimal DOUBLE column to integer cents.

    floor(x*100 + 0.5) instead of round(): identical result for the
    non-negative money domain, but stays pure arithmetic in codegen —
    Spark's round() allocates a BigDecimal per value (~2x q1 cost).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5))


def cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


def sum_money(col: str | Column) -> Column:
    """SUM of a 2-decimal column, exact, returned as DOUBLE dollars."""
    return F.sum(cents(col)) / 1e2


def sum_money_sql(expr: str) -> str:
    return f"SUM({cents_sql(expr)}) / 1e2"


def sum_disc_price(price: str, discount: str) -> Column:
    """SUM(price * (1 - discount)) in 1e-4 fixed point → DOUBLE."""
    return F.sum(cents(price) * (F.lit(100) - cents(discount))) / 1e4


def sum_disc_price_sql(price: str, discount: str) -> str:
    return f"SUM({cents_sql(price)} * (100 - {cents_sql(discount)})) / 1e4"


def sum_charge(price: str, discount: str, tax: str) -> Column:
    """SUM(price * (1-discount) * (1+tax)) in 1e-6 fixed point → DOUBLE."""
    return (
        F.sum(cents(price) * (F.lit(100) - cents(discount)) * (F.lit(100) + cents(tax))) / 1e6
    )


def sum_charge_sql(price: str, discount: str, tax: str) -> str:
    return (
        f"SUM({cents_sql(price)} * (100 - {cents_sql(discount)})"
        f" * (100 + {cents_sql(tax)})) / 1e6"
    )

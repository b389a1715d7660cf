"""Skew mitigation: salted joins for heavy-hitter keys.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit, plan-level fallback for pathological single-key skew (one
user with 10% of all events): the skewed side's key is extended with a
deterministic salt in [0, n), the small side is replicated n ways, and
the join runs on (key, salt) — the hot key's rows spread across n
shuffle partitions instead of one.

This is the standard technique (no reference equivalent — the
reference's hash shuffle, ``tasks.py:358-365``, has no skew handling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_of(col: Column, n: int) -> Column:
    """Deterministic per-row salt derived from a stable row attribute —
    deterministic so retried tasks salt identically (rand() would break
    exactly-once under task retry)."""
    return F.pmod(F.xxhash64(col), F.lit(n))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side to a smaller side on ``key``, spreading
    each key across ``n_salt`` shuffle partitions.

    ``salt_source`` is any column of the skewed side with per-row
    variety (an id, a timestamp) used to derive the salt. The small
    side is exploded n_salt ways (size * n_salt rows — keep it the
    dimension side).
    """
    s = skewed.withColumn(SALT_COL, _salt_of(F.col(salt_source), n_salt))
    r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    out = s.join(r, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)

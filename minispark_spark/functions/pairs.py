"""Unordered-pair expansion from grouped id arrays.

The one-shuffle alternative to an inverted-index self-join: group the
posting list per key, collect the (sorted, distinct) member ids, and
expand all i<j pairs JVM-side with array lambdas. Quadratic only in
per-bucket membership (bounded by design in LSH band/bucket schemes);
the self-join it replaces shuffles the full posting list twice and
scans it from two stages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_pair_structs(ids_col: str, a_name: str, b_name: str) -> Column:
    """Explodeable array of ``struct(a, b)`` for all i<j pairs of the
    (ascending-sorted) array column ``ids_col``."""
    return F.expr(
        f"flatten(transform({ids_col}, (x, i) -> "
        f"transform(slice({ids_col}, i + 2, size({ids_col})), y -> "
        f"struct(x AS {a_name}, y AS {b_name}))))"
    )


def symmetrized(pairs, a_col: str, b_col: str):
    """Both orientations ``(a, b)`` of an edge/pair frame out of ONE
    scan: explode a 2-element struct array instead of the
    ``unionByName(swap)`` spelling, which plans the pair-producing
    subtree TWICE (Spark does not CSE across union branches) — for a
    pair set built by a whole LSH/verification pipeline that doubled
    the pipeline's execution (guide §2.4 repeated subtrees)."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("a"), F.col(b_col).alias("b")),
                F.struct(F.col(b_col).alias("a"), F.col(a_col).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")

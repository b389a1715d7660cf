"""DataFrame veneer mirroring the reference user API.

The reference exposes ``DataFrame.select/filter/join/group_by/agg/
collect/show/explain`` returning dict-rows (reference
``src/mini_spark/dataframe.py:38-86``). This veneer is a thin wrapper
over ``pyspark.sql.DataFrame`` so reference example code ports 1:1;
the logical plan is built and optimized entirely by Catalyst.

Expressions are plain ``pyspark.sql.Column`` objects — the reference's
``Col`` operator-overloading algebra (``sql.py:16-446``: arithmetic,
comparisons, ``&``/``|``/``~``, ``.alias``, ``.like``, ``.between``)
is a subset of what pyspark Columns already support, so ``Col`` and
``Lit`` are simple aliases.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F

Col = F.col
Lit = F.lit

JoinType = str  # "inner" | "left" | "right" | "outer" (superset of reference tasks.py:29)


class DataFrame:
    """Reference-API-compatible wrapper around a Spark DataFrame."""

    def __init__(self, sdf: SparkDataFrame):
        self.sdf = sdf

    # -- plan building (reference dataframe.py:38-69) -------------------

    def alias(self, name: str) -> DataFrame:
        return DataFrame(self.sdf.alias(name))

    def select(self, *columns: Column | str) -> DataFrame:
        return DataFrame(self.sdf.select(*columns))

    def filter(self, condition: Column) -> DataFrame:
        return DataFrame(self.sdf.filter(condition))

    where = filter

    def join(
        self,
        other: DataFrame,
        condition: Column,
        how: JoinType = "inner",
    ) -> DataFrame:
        # Unlike the reference (which silently downgrades every join to
        # inner, parser.py:131-133), outer joins have real semantics here.
        return DataFrame(self.sdf.join(other.sdf, on=condition, how=how))

    def group_by(self, *columns: Column | str) -> GroupedData:
        # The reference caps this at ONE group column (dataframe.py:64-65);
        # we accept many — a strict superset.
        return GroupedData(self.sdf.groupBy(*columns))

    def limit(self, n: int) -> DataFrame:
        return DataFrame(self.sdf.limit(n))

    def order_by(self, *columns: Column | str) -> DataFrame:
        return DataFrame(self.sdf.orderBy(*columns))

    def distinct(self) -> DataFrame:
        return DataFrame(self.sdf.distinct())

    def union(self, other: DataFrame) -> DataFrame:
        return DataFrame(self.sdf.unionByName(other.sdf))

    # -- actions (reference dataframe.py:71-86, execution.py:47-55) -----

    def collect(self, limit: int | None = None) -> list[dict[str, Any]]:
        sdf = self.sdf.limit(limit) if limit is not None else self.sdf
        return [row.asDict(recursive=True) for row in sdf.collect()]

    def show(self, n: int = 10) -> None:
        self.sdf.show(n, truncate=False)

    def explain(self, full: bool = False) -> None:
        self.sdf.explain("formatted" if full else "simple")

    def write_parquet(
        self,
        path: str,
        mode: str = "overwrite",
        partition_by: Sequence[str] | None = None,
    ) -> None:
        """Parquet sink (reference WriteToLocalFileTask tasks.py:398-417).
        ``partition_by`` gives hive-style directory partitioning so
        downstream scans prune partitions on those columns."""
        w = self.sdf.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    @property
    def schema(self) -> list[tuple[str, str]]:
        return [(f.name, f.dataType.simpleString()) for f in self.sdf.schema.fields]


class GroupedData:
    """Mirrors reference ``GroupedData.agg`` (dataframe.py:28-35)."""

    def __init__(self, grouped: Any):
        self._grouped = grouped

    def agg(self, *aggs: Column) -> DataFrame:
        return DataFrame(self._grouped.agg(*aggs))


def sum_(col: Column | str) -> Column:
    return F.sum(col)


def count_() -> Column:
    """Bare COUNT() of the reference (sql.py:462-464): count rows, named
    ``count``."""
    return F.count(F.lit(1)).alias("count")


def avg_(col: Column | str) -> Column:
    return F.avg(col)


def min_(col: Column | str) -> Column:
    return F.min(col)


def max_(col: Column | str) -> Column:
    return F.max(col)


def rows_equal(
    a: Sequence[dict[str, Any]],
    b: Sequence[dict[str, Any]],
    float_tol: float = 1e-6,
) -> bool:
    """Order-insensitive row-set comparison (reference conftest.py:37-56)."""

    def norm(rows: Sequence[dict[str, Any]]) -> list[tuple[Any, ...]]:
        normed = []
        for r in rows:
            vals = []
            for k in sorted(r):
                v = r[k]
                if isinstance(v, float):
                    v = round(v, 6)
                vals.append((k, v))
            normed.append(tuple(vals))
        return sorted(normed, key=repr)

    return norm(a) == norm(b)

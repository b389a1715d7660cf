"""Engine facade — the reference's execution-engine surface on Spark.

Mirrors ``PythonExecutionEngine`` / ``ThreadEngine`` (reference
``src/mini_spark/execution.py:40-115``): context manager, ``sql()``,
``table()``, dict-row results. There is no planner/worker-pool here —
Catalyst + the Spark scheduler replace the reference's physical plan,
Zig codegen, and 4-subprocess worker pool wholesale (SURVEY.md §3/§4).
"""

from __future__ import annotations

from types import TracebackType
from typing import Any

from pyspark.sql import SparkSession

from minispark_spark import sql_dialect
from minispark_spark.dataframe import DataFrame
from minispark_spark.session import get_spark


class Engine:
    """``with Engine() as engine: engine.sql(...).collect()``"""

    def __init__(
        self,
        spark: SparkSession | None = None,
        *,
        app_name: str = "minispark_spark",
        stop_on_exit: bool = False,
    ):
        self.spark = spark or get_spark(app_name)
        self._stop_on_exit = stop_on_exit

    def __enter__(self) -> Engine:
        return self

    def __exit__(
        self,
        exc_type: type[BaseException] | None,
        exc: BaseException | None,
        tb: TracebackType | None,
    ) -> None:
        if self._stop_on_exit:
            self.spark.stop()

    # -- entry points ----------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Run reference-dialect (or plain Spark) SQL."""
        return DataFrame(self.spark.sql(sql_dialect.translate(self.spark, query)))

    def table(self, path: str, alias: str | None = None) -> DataFrame:
        """Load a table by path (reference ``DataFrame.table``,
        dataframe.py:47-49): parquet for the scale path, or the
        reference's own ``.bin`` BlockFiles via the blockfile
        DataSource — a reference user's existing tables open as-is."""
        from minispark_spark.sources.tables import read_path

        sdf = read_path(self.spark, path)
        if alias:
            sdf = sdf.alias(alias)
        return DataFrame(sdf)

    def execute_sql(self, query: str, limit: int | None = None) -> list[dict[str, Any]]:
        return self.sql(query).collect(limit=limit)

    def register_tables(self, sf_dir: str, names: list[str] | None = None) -> list[str]:
        """Create temp views for a scale-factor directory's tables so
        plain ``sql()`` can reference them by name (the convenience the
        reference gets from single-file tables + quoted paths; here one
        call replaces per-query ``FROM '<path>'``). Returns the view
        names registered."""
        from minispark_spark.sources.tables import TABLES, load_table

        registered = []
        for name in names or TABLES:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
        return registered

    def corpus(self, path: str):
        """Open a documents table (parquet path or ``.bin`` BlockFile)
        as a composable :class:`~minispark_spark.corpus.Corpus` —
        the curation-pipeline facade (filter_quality / dedup_fuzzy /
        decontaminate / chunks / ...)."""
        from minispark_spark.corpus import Corpus
        from minispark_spark.sources.tables import read_path

        return Corpus(read_path(self.spark, path))

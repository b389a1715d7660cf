"""Additional source/sink formats: JSON-lines and ORC.

The reference supports exactly one storage format (its BlockFile,
``io.py:180-313``) plus a CSV importer (``utils.py:179-203``). Spark
gives every format the same columnar treatment; these helpers mirror
``csv.convert_csv_to_parquet`` so any supported interchange format
lands in parquet (our BlockFile analogue) with one call.

JSONL: schema-declared reads avoid the full inference pass; writes are
one JSON object per line, splittable and streamable. ORC: columnar
like parquet (stripes ↔ row groups) — included to show the engine is
format-agnostic; predicate pushdown works the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def convert_jsonl_to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    parquet_path: str,
    schema: StructType | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read JSON-lines (declared schema preferred — inference costs an
    extra full pass at scale) and write parquet; returns the
    parquet-backed DataFrame."""
    reader = spark.read
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    df = reader.json(jsonl_path, schema=schema) if schema else reader.json(jsonl_path)
    df.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as JSON-lines (one object per line, one file
    per partition — the interchange format of most text-corpus
    pipelines)."""
    df.write.mode("overwrite").json(path)


def convert_orc_to_parquet(
    spark: SparkSession, orc_path: str, parquet_path: str
) -> DataFrame:
    """Read ORC (schema embedded in the file) and write parquet."""
    df = spark.read.orc(orc_path)
    df.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)

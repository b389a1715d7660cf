"""CSV ingestion — the reference's ``convert_csv_to_block_file``
(reference ``src/mini_spark/utils.py:179-203``) re-expressed as
CSV → parquet.

The reference parses CSV row-by-row in Python against a declared
schema (header skipped, ISO timestamps). Spark's CSV reader does the
same schema-driven parse distributed across executors; parquet is our
BlockFile (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def convert_csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    schema: StructType | None = None,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read CSV (declared schema preferred — inference costs a full
    extra pass at scale) and write parquet. Returns the parquet-backed
    DataFrame."""
    reader = spark.read.option("header", header)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    df = reader.csv(csv_path, schema=schema) if schema else reader.option(
        "inferSchema", True
    ).csv(csv_path)
    df.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path)

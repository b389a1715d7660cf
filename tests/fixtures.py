"""Reference test fixtures as parquet (FIXTURES.md / reference test_e2e.py:21-55).

Types map per FIXTURES.md: INTEGER → IntegerType (32-bit), FLOAT →
FloatType (float32), STRING → StringType, TIMESTAMP → TimestampType.
No NULLs anywhere (the reference has no null support).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

USERS = [
    (1, "Alice", "Smith", 25, "USA"),
    (2, "Bob", "Johnson", 30, "Canada"),
    (3, "Charlie", "Brown", 22, "USA"),
    (4, "David", "Wilson", 35, "UK"),
    (5, "Eva", "Davis", 28, "Canada"),
    (6, "Frank", "Miller", 40, "USA"),
    (7, "Grace", "Taylor", 27, "UK"),
    (8, "Hank", "Anderson", 32, "USA"),
    (9, "Ivy", "Thomas", 26, "Canada"),
    (10, "Jack", "Jackson", 24, "USA"),
    (11, "Kate", "White", 29, "UK"),
    (12, "Leo", "Harris", 33, "USA"),
    (13, "Mia", "Martin", 31, "Canada"),
    (14, "Nick", "Thompson", 23, "UK"),
    (15, "Olivia", "Garcia", 36, "USA"),
]

ORDERS = [
    (1, 1, "Laptop", 1, 1200.0, "2025-01-01"),
    (2, 2, "Mouse", 2, 25.0, "2025-01-05"),
    (3, 3, "Keyboard", 1, 45.0, "2025-02-10"),
    (4, 1, "Monitor", 2, 300.0, "2025-03-15"),
    (5, 4, "Laptop", 1, 1100.0, "2025-03-20"),
    (6, 5, "Mouse", 1, 30.0, "2025-04-01"),
    (7, 6, "Keyboard", 2, 50.0, "2025-04-10"),
    (8, 7, "Monitor", 1, 280.0, "2025-05-05"),
    (9, 8, "Laptop", 1, 1300.0, "2025-05-10"),
    (10, 9, "Mouse", 3, 27.0, "2025-06-01"),
    (11, 10, "Keyboard", 1, 40.0, "2025-06-15"),
    (12, 11, "Monitor", 2, 290.0, "2025-07-01"),
    (13, 12, "Laptop", 1, 1250.0, "2025-07-10"),
    (14, 13, "Mouse", 2, 26.0, "2025-07-15"),
    (15, 14, "Keyboard", 1, 42.0, "2025-08-01"),
]

USERS_SCHEMA = StructType(
    [
        StructField("user_id", IntegerType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("age", IntegerType()),
        StructField("country", StringType()),
    ]
)

ORDERS_SCHEMA = StructType(
    [
        StructField("order_id", IntegerType()),
        StructField("user_id", IntegerType()),
        StructField("product", StringType()),
        StructField("quantity", IntegerType()),
        StructField("price", FloatType()),
        StructField("order_date", TimestampType()),
    ]
)

FRUITS = [
    ("apple", 3, "red"),
    ("banana", 5, "yellow"),
    ("orange", 2, "orange"),
    ("apple", 4, "green"),
    ("banana", 7, "yellow"),
]

FRUITS_SCHEMA = StructType(
    [
        StructField("fruit", StringType()),
        StructField("quantity", IntegerType()),
        StructField("color", StringType()),
    ]
)


def write_users(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(USERS, USERS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def write_orders(spark: SparkSession, path: str) -> None:
    rows = [(*r[:5], datetime.fromisoformat(r[5])) for r in ORDERS]
    spark.createDataFrame(rows, ORDERS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def write_fruits(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(FRUITS, FRUITS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)

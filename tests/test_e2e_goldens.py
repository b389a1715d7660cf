"""The reference's 20 e2e golden queries, run through Engine.sql.

Queries and expected row sets ported from reference
``tests/test_e2e.py:88-419`` (the reference runs them on both its
Python and native engines; we run them on Spark via the dialect
pre-pass). Comparison semantics per reference ``tests/conftest.py:
37-56``: order-insensitive, float32 round-trip equality.

Two LEFT JOIN goldens keep their reference-expected rows because the
WHERE clause discards the null-padded rows either way (SURVEY §2.2 —
the reference silently runs INNER; standard semantics agree here).
"""

from __future__ import annotations

import struct
from datetime import datetime
from typing import Any

import pytest

from minispark_spark.engine import Engine
from tests.fixtures import write_orders, write_users

to_date = datetime.fromisoformat


def f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


def assert_rows_equal(actual: list[dict[str, Any]], expected: list[dict[str, Any]]) -> None:
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    if not expected:
        return
    assert set(actual[0].keys()) == set(expected[0].keys())

    def norm(rows):
        out = []
        for r in rows:
            out.append(
                tuple(
                    (k, f32(v) if isinstance(v, float) else v) for k, v in sorted(r.items())
                )
            )
        return sorted(out, key=repr)

    assert norm(actual) == norm(expected)


def to_rows(schema: tuple[str, ...], rows: list[tuple[Any, ...]]) -> list[dict[str, Any]]:
    return [dict(zip(schema, row, strict=True)) for row in rows]


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory) -> tuple[str, str]:
    base = tmp_path_factory.mktemp("goldens")
    users, orders = str(base / "users"), str(base / "orders")
    write_users(spark, users)
    write_orders(spark, orders)
    return users, orders


USERS_ALL = [
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

TEST_QUERIES = [
    (
        "SELECT * FROM '{users}';",
        to_rows(("user_id", "first_name", "last_name", "age", "country"), USERS_ALL),
    ),
    (
        "SELECT first_name, last_name FROM '{users}' WHERE country='USA';",
        to_rows(
            ("first_name", "last_name"),
            [
                ("Alice", "Smith"),
                ("Charlie", "Brown"),
                ("Frank", "Miller"),
                ("Hank", "Anderson"),
                ("Jack", "Jackson"),
                ("Leo", "Harris"),
                ("Olivia", "Garcia"),
            ],
        ),
    ),
    (
        "SELECT first_name + ' ' + last_name AS full_name FROM '{users}';",
        to_rows(
            ("full_name",),
            [(f"{f} {l}",) for _, f, l, _, _ in USERS_ALL],
        ),
    ),
    (
        "SELECT user_id, age, age+5 AS age_in_5_years FROM '{users}';",
        to_rows(
            ("user_id", "age", "age_in_5_years"),
            [(u, a, a + 5) for u, _, _, a, _ in USERS_ALL],
        ),
    ),
    (
        "SELECT * FROM '{orders}' WHERE price > 100;",
        to_rows(
            ("order_id", "user_id", "product", "quantity", "price", "order_date"),
            [
                (1, 1, "Laptop", 1, 1200.0, to_date("2025-01-01")),
                (4, 1, "Monitor", 2, 300.0, to_date("2025-03-15")),
                (5, 4, "Laptop", 1, 1100.0, to_date("2025-03-20")),
                (8, 7, "Monitor", 1, 280.0, to_date("2025-05-05")),
                (9, 8, "Laptop", 1, 1300.0, to_date("2025-05-10")),
                (12, 11, "Monitor", 2, 290.0, to_date("2025-07-01")),
                (13, 12, "Laptop", 1, 1250.0, to_date("2025-07-10")),
            ],
        ),
    ),
    (
        "SELECT product, quantity*price AS total_value FROM '{orders}';",
        to_rows(
            ("product", "total_value"),
            [
                ("Laptop", 1200.0),
                ("Mouse", 50.0),
                ("Keyboard", 45.0),
                ("Monitor", 600.0),
                ("Laptop", 1100.0),
                ("Mouse", 30.0),
                ("Keyboard", 100.0),
                ("Monitor", 280.0),
                ("Laptop", 1300.0),
                ("Mouse", 81.0),
                ("Keyboard", 40.0),
                ("Monitor", 580.0),
                ("Laptop", 1250.0),
                ("Mouse", 52.0),
                ("Keyboard", 42.0),
            ],
        ),
    ),
    (
        "SELECT * FROM '{orders}' WHERE order_date BETWEEN '2025-03-01' AND '2025-06-01';",
        to_rows(
            ("order_id", "user_id", "product", "quantity", "price", "order_date"),
            [
                (4, 1, "Monitor", 2, 300.0, to_date("2025-03-15")),
                (5, 4, "Laptop", 1, 1100.0, to_date("2025-03-20")),
                (6, 5, "Mouse", 1, 30.0, to_date("2025-04-01")),
                (7, 6, "Keyboard", 2, 50.0, to_date("2025-04-10")),
                (8, 7, "Monitor", 1, 280.0, to_date("2025-05-05")),
                (9, 8, "Laptop", 1, 1300.0, to_date("2025-05-10")),
                (10, 9, "Mouse", 3, 27.0, to_date("2025-06-01")),
            ],
        ),
    ),
    (
        "SELECT * FROM '{orders}' WHERE product LIKE '%top%';",
        to_rows(
            ("order_id", "user_id", "product", "quantity", "price", "order_date"),
            [
                (1, 1, "Laptop", 1, 1200.0, to_date("2025-01-01")),
                (5, 4, "Laptop", 1, 1100.0, to_date("2025-03-20")),
                (9, 8, "Laptop", 1, 1300.0, to_date("2025-05-10")),
                (13, 12, "Laptop", 1, 1250.0, to_date("2025-07-10")),
            ],
        ),
    ),
    (
        "SELECT country, COUNT() AS user_count FROM '{users}' GROUP BY country;",
        to_rows(("country", "user_count"), [("USA", 7), ("Canada", 4), ("UK", 4)]),
    ),
    (
        "SELECT user_id, SUM(quantity*price) AS total_spent FROM '{orders}' GROUP BY user_id;",
        to_rows(
            ("user_id", "total_spent"),
            [
                (1, 1800.0),
                (2, 50.0),
                (3, 45.0),
                (4, 1100.0),
                (5, 30.0),
                (6, 100.0),
                (7, 280.0),
                (8, 1300.0),
                (9, 81.0),
                (10, 40.0),
                (11, 580.0),
                (12, 1250.0),
                (13, 52.0),
                (14, 42.0),
            ],
        ),
    ),
    (
        "SELECT product, AVG(price) AS avg_price FROM '{orders}' GROUP BY product;",
        to_rows(
            ("product", "avg_price"),
            [
                ("Laptop", (1200 + 1100 + 1300 + 1250) / 4),
                ("Mouse", (25 + 30 + 27 + 26) / 4),
                ("Keyboard", (45 + 50 + 40 + 42) / 4),
                ("Monitor", (300 + 280 + 290) / 3),
            ],
        ),
    ),
    (
        "SELECT country, AVG(age) AS avg_age FROM '{users}' GROUP BY country;",
        to_rows(
            ("country", "avg_age"),
            [
                ("USA", (25 + 22 + 40 + 32 + 24 + 33 + 36) / 7),
                ("Canada", (30 + 28 + 26 + 31) / 4),
                ("UK", (35 + 27 + 29 + 23) / 4),
            ],
        ),
    ),
    (
        "SELECT user_id, COUNT() AS order_count FROM '{orders}' GROUP BY user_id "
        "HAVING COUNT() > 1;",
        to_rows(("user_id", "order_count"), [(1, 2)]),
    ),
    (
        "SELECT u.first_name, o.product FROM '{users}' AS u JOIN '{orders}' AS o "
        "ON u.user_id=o.user_id;",
        to_rows(
            ("first_name", "product"),
            [
                ("Alice", "Laptop"),
                ("Alice", "Monitor"),
                ("Bob", "Mouse"),
                ("Charlie", "Keyboard"),
                ("David", "Laptop"),
                ("Eva", "Mouse"),
                ("Frank", "Keyboard"),
                ("Grace", "Monitor"),
                ("Hank", "Laptop"),
                ("Ivy", "Mouse"),
                ("Jack", "Keyboard"),
                ("Kate", "Monitor"),
                ("Leo", "Laptop"),
                ("Mia", "Mouse"),
                ("Nick", "Keyboard"),
            ],
        ),
    ),
    (
        "SELECT u.country, COUNT() AS orders_count "
        "FROM '{users}' AS u JOIN '{orders}' AS o ON u.user_id=o.user_id GROUP BY u.country;",
        to_rows(("country", "orders_count"), [("USA", 7), ("Canada", 4), ("UK", 4)]),
    ),
    (
        "SELECT u.first_name, SUM(o.quantity*o.price) AS spent "
        "FROM '{users}' AS u JOIN '{orders}' AS o ON u.user_id=o.user_id "
        "GROUP BY u.first_name;",
        to_rows(
            ("first_name", "spent"),
            [
                ("Alice", 1800.0),
                ("Bob", 50.0),
                ("Charlie", 45.0),
                ("David", 1100.0),
                ("Eva", 30.0),
                ("Frank", 100.0),
                ("Grace", 280.0),
                ("Hank", 1300.0),
                ("Ivy", 81.0),
                ("Jack", 40.0),
                ("Kate", 580.0),
                ("Leo", 1250.0),
                ("Mia", 52.0),
                ("Nick", 42.0),
            ],
        ),
    ),
    (
        "SELECT u.first_name, o.product, o.price "
        "FROM '{users}' AS u LEFT JOIN '{orders}' AS o ON u.user_id=o.user_id "
        "WHERE o.price > 100;",
        to_rows(
            ("first_name", "product", "price"),
            [
                ("Alice", "Laptop", 1200.0),
                ("Alice", "Monitor", 300.0),
                ("David", "Laptop", 1100.0),
                ("Grace", "Monitor", 280.0),
                ("Hank", "Laptop", 1300.0),
                ("Kate", "Monitor", 290.0),
                ("Leo", "Laptop", 1250.0),
            ],
        ),
    ),
    (
        "SELECT u.first_name, o.product, o.order_date "
        "FROM '{orders}' AS o LEFT JOIN '{users}' AS u ON u.user_id=o.user_id "
        "WHERE o.order_date > '2025-05-01';",
        to_rows(
            ("first_name", "product", "order_date"),
            [
                ("Hank", "Laptop", to_date("2025-05-10")),
                ("Grace", "Monitor", to_date("2025-05-05")),
                ("Ivy", "Mouse", to_date("2025-06-01")),
                ("Jack", "Keyboard", to_date("2025-06-15")),
                ("Kate", "Monitor", to_date("2025-07-01")),
                ("Leo", "Laptop", to_date("2025-07-10")),
                ("Mia", "Mouse", to_date("2025-07-15")),
                ("Nick", "Keyboard", to_date("2025-08-01")),
            ],
        ),
    ),
    (
        "SELECT product, SUM(quantity) AS total_quantity, MAX(price) AS max_price "
        "FROM '{orders}' GROUP BY product;",
        to_rows(
            ("product", "total_quantity", "max_price"),
            [
                ("Laptop", 4, 1300.0),
                ("Mouse", 8, 30.0),
                ("Keyboard", 5, 50.0),
                ("Monitor", 5, 300.0),
            ],
        ),
    ),
    (
        "SELECT u.country, COUNT() AS orders_count, SUM(o.quantity*o.price) AS total_sales "
        "FROM '{users}' AS u JOIN '{orders}' AS o ON u.user_id=o.user_id GROUP BY u.country "
        "HAVING SUM(o.quantity*o.price) > 500;",
        to_rows(
            ("country", "orders_count", "total_sales"),
            [
                ("USA", 7, float(1200 + 45 + 600 + 100 + 1300 + 40 + 1250)),
                ("UK", 4, float(1100 + 280 + 580 + 42)),
            ],
        ),
    ),
]


@pytest.mark.parametrize(("query", "expected_rows"), TEST_QUERIES)
def test_golden_query(spark, tables, query, expected_rows):
    users, orders = tables
    with Engine(spark) as engine:
        rows = engine.sql(query.format(users=users, orders=orders)).collect()
    assert_rows_equal(rows, expected_rows)

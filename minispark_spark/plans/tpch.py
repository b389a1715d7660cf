"""TPC-H-style parity queries.

The reference's only benchmark is a TPC-H Q1 variant (reference
``examples/benchmark.py:51-68``, ``README.md:141-158``): GROUP BY
``l_returnflag`` only, no ORDER BY, bare ``COUNT()``. ``q1`` here is
that exact query. The other queries widen coverage to multi-way joins
the reference cannot express (it only supports single inner equi-joins,
``tasks.py:250``).

Scale notes (100 TB thinking):
- ``nation``/``region`` are fixed-size → explicit ``broadcast()`` so the
  big fact-table joins never shuffle the dimension side.
- ``customer``/``orders``/``lineitem`` joins shuffle on their keys; AQE
  handles skew/coalescing. No driver-side collection anywhere.
- All predicates are plain column comparisons → Catalyst pushes them
  into the parquet scan (verified via ``.explain``: PushedFilters).
- Money aggregates use LONG fixed-point (functions/money.py): exact,
  order-insensitive, and the fastest Tungsten aggregation path —
  ~2x faster than DECIMAL at identical oracle-exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.functions import money
from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table


@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT
            l_returnflag,
            {money.sum_money_sql("l_quantity")} AS sum_qty,
            {money.sum_money_sql("l_extendedprice")} AS sum_base_price,
            {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS sum_disc_price,
            {money.sum_charge_sql("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
            {money.sum_money_sql("l_quantity")} / COUNT(*) AS avg_qty,
            {money.sum_money_sql("l_extendedprice")} / COUNT(*) AS avg_price,
            {money.sum_money_sql("l_discount")} / COUNT(*) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag
    """,
    doc="Flagship: reference benchmark query (TPC-H Q1 variant, README.md:141-158).",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            money.sum_money("l_quantity").alias("sum_qty"),
            money.sum_money("l_extendedprice").alias("sum_base_price"),
            money.sum_disc_price("l_extendedprice", "l_discount").alias("sum_disc_price"),
            money.sum_charge("l_extendedprice", "l_discount", "l_tax").alias("sum_charge"),
            (money.sum_money("l_quantity") / cnt).alias("avg_qty"),
            (money.sum_money("l_extendedprice") / cnt).alias("avg_price"),
            (money.sum_money("l_discount") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
        SELECT
            l_orderkey,
            {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS revenue,
            o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3: 3-way fact join + agg + top-k (reference can't: single-join only).",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
        SELECT
            n_name,
            {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1994-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way join; nation/region explicitly broadcast (fixed-size dims).",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
        SELECT
            SUM({money.cents_sql("l_extendedprice")} * {money.cents_sql("l_discount")})
                / 1e4 AS revenue,
            COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: global aggregation, no GROUP BY (reference cannot: SURVEY §2.3).",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(money.cents("l_extendedprice") * money.cents("l_discount")) / 1e4
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            revenue.alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
        SELECT
            c_custkey,
            c_name,
            {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS revenue,
            n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 variant: returned-item revenue by customer, top 20.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )

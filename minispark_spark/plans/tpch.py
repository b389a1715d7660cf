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


@query(
    "q7_volume_shipping",
    oracle=f"""
        SELECT
            n1.n_name AS supp_nation,
            n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INTEGER) AS l_year,
            {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY n1.n_name, n2.n_name, l_year
    """,
    doc="TPC-H Q7 variant: bidirectional nation-pair trade volume by ship "
    "year. Both nation joins broadcast; the disjunctive pair filter is "
    "applied post-join on broadcast columns (no shuffle added).",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
        SELECT
            100.0 * SUM(CASE WHEN p_type = 'PROMO'
                        THEN {money.cents_sql("l_extendedprice")} * (100 - {money.cents_sql("l_discount")})
                        ELSE 0 END)
                  / SUM({money.cents_sql("l_extendedprice")} * (100 - {money.cents_sql("l_discount")}))
                AS promo_revenue_pct,
            COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
    doc="TPC-H Q14 variant: promo revenue share. part is broadcast (small "
    "dim); both sums are exact BIGINT fixed-point, one final division.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    disc = money.cents("l_extendedprice") * (F.lit(100) - money.cents("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc)).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q18_MIN_QTY = 250


@query(
    "q18_large_orders",
    oracle=f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               {money.sum_money_sql("l_quantity")} AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING {money.sum_money_sql("l_quantity")} > {Q18_MIN_QTY}
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc=f"TPC-H Q18 variant: customers with orders totalling > {Q18_MIN_QTY} "
    "units. The IN-subquery becomes a pre-aggregated semi-join on "
    "l_orderkey; at scale the qualifying-order set is tiny -> AQE turns "
    "the semi-join into a broadcast.",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # ONE per-order aggregate serves both the > threshold filter and
    # the output quantity — the classic q18 shape (semi join + second
    # lineitem scan + re-aggregation) does the same work twice.
    qty = (
        li.groupBy("l_orderkey")
        .agg(money.sum_money("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        qty.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13: customer order-count distribution — outer join + "
    "double aggregation. The second agg's input is only (custkey, count) "
    "so the re-shuffle is narrow.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) with maximum quarterly revenue. The "
    "scalar MAX subquery becomes a rank-over-empty-partition kept tiny "
    "by pre-aggregation (revenue has one row per supplier).",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money.sum_disc_price("l_extendedprice", "l_discount").alias("total_revenue")
    )
    # Global max via agg + broadcast join — never a single-partition
    # window: the 1-row max broadcasts and revenue stays distributed.
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.join(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("mx")).drop("mx")
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(top, F.col("s_suppkey") == F.col("supplier_no")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
        WITH avg_qty AS (
            SELECT l_partkey AS ap, 0.5 * AVG({money.cents_sql("l_quantity")}) AS half_avg_c
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {money.sum_money_sql("l_extendedprice")} / 7.0 AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN avg_qty ON ap = l_partkey
        WHERE p_brand = 'Brand#1'
          AND {money.cents_sql("l_quantity")} < half_avg_c
    """,
    doc="TPC-H Q17 variant: revenue from small-quantity orders of one "
    "brand. The correlated AVG subquery is decorrelated into a pre-"
    "aggregation joined back on partkey; part is broadcast. AVG over "
    "integer cents divides a BIGINT sum by a count — deterministic in "
    "both engines.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(0.5) * F.avg(money.cents("l_quantity"))).alias("half_avg_c")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap") == F.col("l_partkey"))
        .filter(money.cents("l_quantity") < F.col("half_avg_c"))
        .agg(
            (money.sum_money("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
        WITH pos AS (SELECT {money.sum_money_sql("c_acctbal")} / COUNT(*) AS avg_bal
                     FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment AS cntrycode,
               COUNT(*) AS numcust,
               {money.sum_money_sql("c_acctbal")} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg_bal FROM pos)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 variant: above-average-balance customers with no "
    "orders, by segment. Scalar-average subquery broadcast as a 1-row "
    "cross join; the NOT EXISTS is a left-anti join on custkey.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((money.sum_money("c_acctbal") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money.sum_money("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
        SELECT {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    doc="TPC-H Q19 variant: OR-of-ANDs disjunctive predicates across both "
    "join sides. Catalyst pushes the derivable per-side disjunctions "
    "(brand/size to the part scan, quantity bands to lineitem) below the "
    "join — the classic predicate-inference case.",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 variant (no l_commitdate in the driver schema, so the "
    "EXISTS tests ship-lag > 60 days): correlated EXISTS expressed as a "
    "LEFT SEMI join with a mixed equi + non-equi condition — the semi "
    "join dedups matches before the aggregate, so multi-line orders "
    "count once without a DISTINCT. One shuffle on orderkey, then the "
    "priority aggregate.",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q8_VOL = f"{money.cents_sql('l_extendedprice')} * (100 - {money.cents_sql('l_discount')})"


@query(
    "q8_market_share",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               100.0 * SUM(CASE WHEN sn.n_name = 'NATION_7' THEN {_Q8_VOL} ELSE 0 END)
                     / SUM({_Q8_VOL}) AS mkt_share_pct,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'EUROPE'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        GROUP BY 1
    """,
    doc="TPC-H Q8 variant: NATION_7's yearly share of revenue sold to "
    "EUROPE customers. nation joins twice in different roles (customer "
    "side pre-filtered through region, supplier side for the share "
    "test) — both broadcast, so the only shuffles are the fact-table "
    "equi-joins; the share is a ratio of two exact fixed-point "
    "conditional sums (one final double division).",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cn = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
        )
    )
    vol = money.cents("l_extendedprice") * (F.lit(100) - money.cents("l_discount"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("cn_nationkey") == F.col("c_nationkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn_nationkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0)))
                / F.sum(vol)
            ).alias("mkt_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
        SELECT sn.n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {money.sum_disc_price_sql("l_extendedprice", "l_discount")} AS profit,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%anvil%'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    """,
    doc="TPC-H Q9 variant (driver schema has no partsupp, so profit is "
    "discounted revenue without supply cost): per supplier-nation, "
    "per-year profit on parts whose name matches '%anvil%'. The LIKE "
    "prunes part before its join (AQE sizes the join strategy from the "
    "filtered side), nation is broadcast, and the orders join carries "
    "only the orderdate column.",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # part also scales with SF; the LIKE prunes it before the join and
    # AQE picks broadcast vs shuffle from the filtered size at runtime.
    anvil = part.filter(F.col("p_name").like("%anvil%")).select("p_partkey")
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("nation")
        )
    )
    return (
        # supplier scales with SF — no explicit broadcast; AQE promotes
        # it to broadcast at small scale and shuffles it at large.
        li.join(anvil, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            money.sum_disc_price("l_extendedprice", "l_discount").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             eu_supp AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'EUROPE'),
             best AS (SELECT l_partkey AS bp, MAX(s_acctbal) AS best_bal
                      FROM ps JOIN eu_supp ON s_suppkey = l_suppkey
                      GROUP BY l_partkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM part
        JOIN ps ON l_partkey = p_partkey
        JOIN eu_supp ON s_suppkey = l_suppkey
        JOIN best ON bp = p_partkey
        WHERE p_size <= 25 AND p_type = 'LARGE' AND s_acctbal = best_bal
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 variant (driver schema has no partsupp; part-supplier "
    "relationships come from DISTINCT lineitem pairs): best-account "
    "EUROPE supplier per qualifying part. The correlated MAX subquery is "
    "decorrelated into a per-part pre-aggregation joined back on "
    "partkey; supplier×nation×region is a broadcast-joined dim tree, so "
    "the only wide shuffles are the DISTINCT pair extraction and the "
    "per-part max — both keyed on partkey, so AQE coalesces them into "
    "one exchange reuse.",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    eu_supp = (
        supp.join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(region, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = ps.join(eu_supp, F.col("s_suppkey") == F.col("l_suppkey"))
    best = pairs.groupBy(F.col("l_partkey").alias("bp")).agg(F.max("s_acctbal").alias("best_bal"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    return (
        part.join(pairs, F.col("l_partkey") == F.col("p_partkey"))
        .join(best, F.col("bp") == F.col("p_partkey"))
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q11_FRACTION = 0.001


@query(
    "q11_important_stock",
    oracle=f"""
        WITH val AS (
          SELECT l_partkey,
                 SUM({money.cents_sql("l_extendedprice")} * (100 - {money.cents_sql("l_discount")})) AS value_c
          FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY l_partkey)
        SELECT l_partkey, value_c / 1e4 AS part_value
        FROM val, (SELECT SUM(value_c) AS total_c FROM val) t
        WHERE value_c > {Q11_FRACTION} * total_c
    """,
    doc="TPC-H Q11 variant (value = discounted revenue shipped by "
    "NATION_3 suppliers, not partsupp stock): parts whose value exceeds "
    f"a {Q11_FRACTION} fraction of the national total. The global-total "
    "scalar subquery is a 1-row aggregate broadcast as a cross join; "
    "value_c is an exact BIGINT fixed-point sum so the threshold "
    "comparison is deterministic in both engines.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    value_c = F.sum(
        money.cents("l_extendedprice") * (F.lit(100) - money.cents("l_discount"))
    ).alias("value_c")
    val = (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(value_c)
    )
    total = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_c") > Q11_FRACTION * F.col("total_c"))
        .select("l_partkey", (F.col("value_c") / 1e4).alias("part_value"))
    )


@query(
    "q12_ship_mode_priority",
    oracle="""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                    THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
                   AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
                   AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate < TIMESTAMP '2001-01-01'
        GROUP BY 1
    """,
    doc="TPC-H Q12 variant (no l_shipmode/l_receiptdate in the driver "
    "schema, so lines are classed SLOW/FAST by ship lag > 1 year): "
    "priority mix per speed class. The group key is computed from both "
    "join sides, so the aggregate runs post-join; conditional counts "
    "use COUNT(CASE...) which is BIGINT in both engines. The shipdate "
    "window is pushed into the lineitem parquet scan.",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    speed = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"), "SLOW"
    ).otherwise("FAST")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_count",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 14, 20, 25, 30, 40)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
        GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 variant (part-supplier pairs from DISTINCT lineitem "
    "instead of partsupp): distinct supplier count per part attribute "
    "combo, excluding low-balance suppliers. The NOT IN subquery is a "
    "left-anti join against the filtered supplier side (broadcast: the "
    "exclusion list is tiny); COUNT(DISTINCT) shuffles once on the "
    "grouping key with the suppkey carried for exact dedup.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 40)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 500).select(
        "s_suppkey"
    )
    # Selective dims FIRST: the broadcast part join + supplier anti-join
    # shrink lineitem before any shuffle, and the pre-join DISTINCT over
    # all 60M (partkey, suppkey) pairs is dropped entirely — the
    # COUNT(DISTINCT suppkey) per group dedups on the (much smaller)
    # filtered side. One exchange instead of two.
    return (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(excluded), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_part_promotion",
    oracle=f"""
        WITH qty AS (
          SELECT l_suppkey AS qs, SUM({money.cents_sql("l_quantity")}) AS shipped_c
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%gear%'
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1996-01-01'
          GROUP BY l_suppkey)
        SELECT s_name, n_name, shipped_c / 1e2 AS shipped_qty
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        JOIN qty ON qs = s_suppkey
        WHERE shipped_c > (SELECT 0.5 * MAX(shipped_c) FROM qty)
    """,
    doc="TPC-H Q20 variant (no partsupp availqty; the 'half of shipped "
    "quantity' threshold becomes half the max across suppliers): "
    "suppliers who moved an outsized volume of gear parts in 1995. "
    "Nested subquery tree: LIKE-filtered part join -> per-supplier "
    "fixed-point quantity sum -> global-max scalar subquery broadcast "
    "back over the same pre-aggregate (computed once, reused).",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    gear = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey"
    )
    qty = (
        li.join(gear, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_suppkey").alias("qs"))
        .agg(F.sum(money.cents("l_quantity")).alias("shipped_c"))
    )
    threshold = qty.agg((F.lit(0.5) * F.max("shipped_c")).alias("thresh"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        qty.join(F.broadcast(threshold))
        .filter(F.col("shipped_c") > F.col("thresh"))
        .join(supp, F.col("s_suppkey") == F.col("qs"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name", (F.col("shipped_c") / 1e2).alias("shipped_qty"))
    )


@query(
    "q21_waiting_orders",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 180 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 180 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 variant ('late' = shipped >180 days after order date; "
    "driver schema has no receipt/commit dates): suppliers who were the "
    "SOLE late shipper on finished multi-supplier orders. The "
    "EXISTS/NOT-EXISTS pair is decorrelated into one per-order "
    "aggregate — countDistinct(supplier) >= 2 replaces EXISTS(other "
    "supplier), countDistinct(late supplier) == 1 replaces NOT EXISTS "
    "(other late supplier) — so lineitem is scanned twice but shuffled "
    "on l_orderkey both times (exchange reuse), instead of the naive "
    "triple self-join.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")
    )
    # ONE aggregation over lines carries everything the filter AND the
    # count need: when n_late_supp == 1, max(late supplier) IS the sole
    # late supplier and n_late_rows its waiting-line count — so there
    # is no second scan of lines and no semi join back.
    # Two-level aggregate instead of countDistinct: the per-(order,
    # supplier) level is fully map-side combinable and avoids the
    # Expand (row doubling) a multi-countDistinct plan pays.
    per_supp = lines.groupBy(F.col("l_orderkey").alias("ok"), "l_suppkey").agg(
        F.max(F.col("is_late")).alias("any_late"),
        F.sum(F.col("is_late").cast("long")).alias("late_rows"),
    )
    ord_stats = per_supp.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("any_late").cast("long")).alias("n_late_supp"),
        F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum("late_rows").alias("n_late_rows"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ord_stats.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("late_supp"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )

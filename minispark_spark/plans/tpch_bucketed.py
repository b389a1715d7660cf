"""Bucketed-input variants of the TPC-H shuffle heavies (q3, q5, q8, q10, q18).

Round-2 plan audit found q5/q8's two large fact exchanges are the
data-flow minimum for UNPARTITIONED inputs — so partition the inputs:
lineitem + orders co-bucketed on orderkey and customer on custkey
(sources/bucketing.ensure_tpch_bucketed). The orders-lineitem join then
plans with no exchange and no sort on either side (within-bucket sort),
and the customer join shuffles only the already-joined/filtered fact
stream — customer's side reads pre-partitioned.

Same oracles as the unbucketed queries: a layout change must never
change results. Plan shape pinned in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import minispark_spark.plans.tpch  # noqa: F401  (registers the unbucketed twins first)
from minispark_spark.functions import money
from minispark_spark.plans.tpch import Q18_MIN_QTY
from minispark_spark.registry import REGISTRY, query
from minispark_spark.sources.bucketing import ensure_tpch_bucketed
from minispark_spark.sources.tables import load_table


@query(
    "q5_bucketed",
    oracle=REGISTRY["q5_local_supplier_volume"].oracle,
    doc="TPC-H Q5 over the bucketed hot-table layout: orders joins "
    "lineitem bucket-co-located (no exchange, no sort on either side), "
    "then the joined fact stream shuffles ONCE onto bucketed customer "
    "(customer side exchange-free), dims broadcast. Identical oracle "
    "to q5_local_supplier_volume — layout must not change results.",
)
def q5_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    orders = spark.table(t["orders"]).filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.table(t["lineitem"]).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = spark.table(t["customer"]).select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    ol = orders.select("o_orderkey", "o_custkey").join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    )
    return (
        ol.join(cust, F.col("c_custkey") == F.col("o_custkey"))
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
    "q8_bucketed",
    oracle=REGISTRY["q8_market_share"].oracle,
    doc="TPC-H Q8 over the bucketed hot-table layout: the "
    "lineitem-orders exchange is retired by co-bucketing on orderkey, "
    "customer reads pre-partitioned on custkey. Identical oracle to "
    "q8_market_share.",
)
def q8_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    li = spark.table(t["lineitem"]).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = spark.table(t["orders"]).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = spark.table(t["customer"]).select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
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
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = money.cents("l_extendedprice") * (F.lit(100) - money.cents("l_discount"))
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("cn_nationkey") == F.col("c_nationkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn_nationkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0))
                )
                / F.sum(vol)
            ).alias("mkt_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

@query(
    "q3_bucketed",
    oracle=REGISTRY["q3_shipping_priority"].oracle,
    doc="TPC-H Q3 over the bucketed layout: orders-lineitem joins "
    "bucket-co-located (both filtered before the join), the joined "
    "stream shuffles once onto bucketed customer. Identical oracle to "
    "q3_shipping_priority.",
)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    orders = spark.table(t["orders"]).filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = spark.table(t["lineitem"]).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    cust = spark.table(t["customer"]).filter(F.col("c_mktsegment") == "BUILDING")
    ol = orders.select("o_orderkey", "o_custkey", "o_orderdate").join(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        ol.join(cust.select("c_custkey"), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q10_bucketed",
    oracle=REGISTRY["q10_returned_items"].oracle,
    doc="TPC-H Q10 over the bucketed layout: returned lineitems join "
    "orders co-located, one custkey shuffle onto bucketed customer, "
    "nation broadcast; the final per-customer aggregation reuses the "
    "custkey partitioning (no further exchange). Identical oracle to "
    "q10_returned_items.",
)
def q10_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    li = spark.table(t["lineitem"]).filter(F.col("l_returnflag") == "R")
    orders = spark.table(t["orders"]).select("o_orderkey", "o_custkey")
    cust = spark.table(t["customer"]).select("c_custkey", "c_name", "c_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    ol = orders.join(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        ol.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money.sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q18_bucketed",
    oracle=REGISTRY["q18_large_orders"].oracle,
    doc="TPC-H Q18 over the bucketed layout: the per-order quantity "
    "aggregate runs WITHOUT an exchange (lineitem pre-partitioned on "
    "orderkey), joins orders co-located, and only the tiny qualifying "
    "stream shuffles onto bucketed customer. Identical oracle to "
    "q18_large_orders.",
)
def q18_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    li = spark.table(t["lineitem"])
    qty = (
        li.groupBy("l_orderkey")
        .agg(money.sum_money("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = spark.table(t["orders"])
    cust = spark.table(t["customer"]).select("c_custkey", "c_name")
    return (
        qty.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )

@query(
    "q21_bucketed",
    oracle=REGISTRY["q21_waiting_orders"].oracle,
    doc="TPC-H Q21 over the bucketed layout: lineitem joins orders "
    "co-located AND both per-order aggregation levels reuse the "
    "orderkey partitioning, so the whole decorrelated pipeline up to "
    "the final (tiny) per-supplier rollup plans with no fact exchange "
    "at all. Identical oracle to q21_waiting_orders.",
)
def q21_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ensure_tpch_bucketed(spark, sf_dir)
    orders = (
        spark.table(t["orders"])
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = spark.table(t["lineitem"]).select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")
    )
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

"""Bucketed-input variants of the TPC-H shuffle heavies (q5, q8).

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

import minispark_spark.plans.tpch  # noqa: F401  (registers q5/q8 first)
from minispark_spark.functions import money
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

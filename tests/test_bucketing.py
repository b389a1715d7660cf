"""Bucketed-table layout: joins and aggs over co-bucketed tables must
plan WITHOUT exchanges — the persisted partitioning replaces the
shuffle. This is the engine's co-location strategy for repeated
fact-fact joins at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.sources.bucketing import bucketed_table, write_bucketed
from minispark_spark.sources.tables import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", N_BUCKETS, sort_by="o_orderkey")
    write_bucketed(li, "lineitem_b", "l_orderkey", N_BUCKETS, sort_by="l_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    # hint("merge") forces sort-merge (at test scale AQE would broadcast
    # the small side; at fact-fact scale sort-merge is what runs) — the
    # point: NO shuffle exchange on either side, buckets are co-located.
    joined = (
        bucketed_table(spark, "orders_b")
        .hint("merge")
        .join(
            bucketed_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan


def test_cobucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    got = (
        bucketed_table(spark, "orders_b")
        .join(
            bucketed_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    agg = (
        bucketed_table(spark, "lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_q5_q8_bucketed_retire_the_fact_exchange(spark, sf_dir):
    """The bucketed q5/q8 variants must plan AT MOST one hash exchange
    (the custkey shuffle of the joined fact stream) — the
    orders-lineitem exchange is retired by the co-bucketed layout.
    The unbucketed q5 plans two+ fact exchanges; this is the layout
    win the round-2 plan audit asked for."""
    from minispark_spark.plans.tpch_bucketed import (
        q3_bucketed,
        q5_bucketed,
        q8_bucketed,
        q10_bucketed,
        q18_bucketed,
        q21_bucketed,
    )

    for fn in (q3_bucketed, q5_bucketed, q8_bucketed, q10_bucketed, q18_bucketed, q21_bucketed):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 1, f"{fn.__name__}: {n_ex} hash exchanges\n{plan[:2000]}"


def test_bucket_pruning_point_lookup(spark, sf_dir):
    """A point filter on the bucket key reads ONE bucket — the layout
    doubles as an index for key lookups (the docstring claim in
    sources/bucketing.py). Under the default autoBucketedScan the
    planner keeps the bucketed layout exactly when the filter can
    prune (one task) and swaps in a plain split-based scan when no
    operator benefits — both behaviors pinned here."""
    from pyspark.sql import functions as F

    from minispark_spark.sources.bucketing import TPCH_BUCKETS, ensure_tpch_bucketed

    t = ensure_tpch_bucketed(spark, sf_dir)
    li = spark.table(t["lineitem"])
    # probe a key that certainly exists (sf-independent)
    key = li.select("l_orderkey").limit(1).collect()[0][0]
    point = li.filter(F.col("l_orderkey") == key)
    assert point.rdd.getNumPartitions() == 1  # pruned to the key's bucket
    assert point.count() >= 1
    assert TPCH_BUCKETS > 1  # the pruning above was a real reduction


def test_bucketed_smj_retires_the_sort_too(spark, sf_dir):
    """With spark.sql.legacy.bucketedTableScan.outputOrdering on (a
    session default in session.get_spark and registry._SESSION_DEFAULTS;
    one file per bucket by construction), a
    forced sort-merge join of the co-bucketed facts on the bucket key
    must plan with neither Exchange NOR Sort — the within-bucket sort
    is part of the layout. Measured effect at sf=10: q21_bucketed's
    4.6 GB sort spill drops to zero (BASELINE.md)."""
    from minispark_spark.sources.bucketing import ensure_tpch_bucketed

    names = ensure_tpch_bucketed(spark, sf_dir)
    joined = (
        bucketed_table(spark, names["orders"])
        .hint("merge")
        .join(
            bucketed_table(spark, names["lineitem"]),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "+- Sort " not in plan, plan[:2000]

"""Plan linter: the shape checks that caught parts_abc_classification's
single-partition window, as a reusable engine feature."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from minispark_spark.planlint import lint
from minispark_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_flags_unpartitioned_window(spark):
    df = spark.range(100).withColumn(
        "cum", F.sum("id").over(Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
    )
    checks = {f.check for f in lint(df)}
    assert "single-partition-exchange" in checks


def test_flags_global_sort_but_not_top_k(spark):
    df = spark.range(1000).select((F.col("id") % 7).alias("k")).orderBy("k")
    assert {f.check for f in lint(df)} == {"global-sort"}
    topk = spark.range(1000).select((F.col("id") % 7).alias("k")).orderBy("k").limit(5)
    assert lint(topk) == []  # TakeOrderedAndProject, no real global sort


def test_flags_cartesian(spark):
    a = spark.range(50)
    b = spark.range(50).withColumnRenamed("id", "jd")
    assert any(f.check == "cartesian-product" for f in lint(a.crossJoin(b)))


def test_scalar_aggregate_merge_is_allowed(spark):
    # Global COUNT/SUM merges partials through a 1-row SinglePartition
    # exchange — legitimate, must NOT be flagged.
    df = spark.range(10000).agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    assert lint(df) == []


def test_flags_row_at_a_time_python_udf(spark):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    df = spark.range(100).select(slow("id").alias("y"))
    assert any(f.check == "python-row-udf" for f in lint(df))


# The families whose plans this repo CLAIMS are scale-clean: full
# TPC-H, the bucketed twins, and the round-4 additions. A regression
# that reintroduces a dimension-sized single partition, a display
# sort, or a row-Python UDF into any of these turns this red.
CLEAN_FAMILIES = sorted(
    [n for n in REGISTRY if n.startswith("q") and n[1].isdigit()]
    + [
        "parts_abc_classification",
        "graph_pagerank_converged",
        "graph_components_converged",
        "graph_kcore_converged",
        "multimodal_decode_png",
        "ann_ivfpq_recall_k256",
        "dedup_exact",
        "dedup_minhash_lsh",
        "docs_fuzzy_dedup_curation",
    ]
)


@pytest.mark.parametrize("name", CLEAN_FAMILIES)
def test_claimed_clean_plans_stay_clean(spark, sf_dir, name):
    findings = lint(REGISTRY[name].fn(spark, sf_dir))
    assert not findings, "\n".join(map(str, findings))

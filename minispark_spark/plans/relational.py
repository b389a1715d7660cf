"""Generic relational operator coverage (SURVEY.md §2 inventory).

One registry entry per operator class from the reference, plus the
standard relational operators the reference lacks entirely (ORDER BY,
LIMIT, DISTINCT, set ops, window functions, subqueries — SURVEY §2.4
"absent entirely" list). Each runs on the driver's TPC-H-ish tables.

Reference parity citations are in each query's doc. All plans are
declarative DataFrame ops → Catalyst handles pushdown/pruning; none
collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.functions import money
from minispark_spark.registry import query
from minispark_spark.sources.tables import fan_out, load_table


@query(
    "scan_select_star",
    oracle="SELECT * FROM nation",
    doc="Full scan, star projection (reference ProjectTask star expansion, tasks.py:88-93).",
)
def scan_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation")


@query(
    "project_expressions",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_extendedprice * (1 - l_discount) AS net_price,
            l_quantity + 1 AS qty_plus,
            l_returnflag || '-' || l_linestatus AS flag_status
        FROM lineitem
        WHERE l_orderkey < 100
    """,
    doc="Projection with arithmetic + string concat + alias "
    "(reference ProjectTask tasks.py:75-109, concat sql.py:331-333). "
    "Single-op float math is IEEE-deterministic; no decimal needed.",
)
def project_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") + 1).alias("qty_plus"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@query(
    "filter_comparisons",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_linenumber <> 1
    """,
    doc="Predicates: > <= != with AND (reference FilterTask tasks.py:160-187).",
)
def filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05) & (F.col("l_linenumber") != 1)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type LIKE '%ANDAR%' OR p_name LIKE 'small%' OR p_name LIKE '%_olt'
    """,
    doc="LIKE with % wildcard (reference LikeColumn sql.py:166-212).",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("%ANDAR%")
        | F.col("p_name").like("small%")
        | F.col("p_name").like("%_olt")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_between_timestamp",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01' AND TIMESTAMP '1995-08-31'
    """,
    doc="BETWEEN on timestamps with string-literal coercion "
    "(reference sql.py:71-72,291-298; e2e test_e2e.py:212-225).",
)
def filter_between_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1995-06-01").cast("timestamp"), F.lit("1995-08-31").cast("timestamp")
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "filter_boolean_not",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE NOT (o_orderstatus = 'F') AND (o_orderpriority = '1-URGENT' OR o_totalprice > 200000)
    """,
    doc="NOT / OR combination — broken in the reference (parser.py:275-281, "
    "sql.py:44-45 raises); implemented correctly here per SURVEY §4.3.",
)
def filter_boolean_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        ~(F.col("o_orderstatus") == "F")
        & ((F.col("o_orderpriority") == "1-URGENT") | (F.col("o_totalprice") > 200000))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "join_inner",
    oracle="""
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 5000
    """,
    doc="Inner equi-join (reference BroadcastHashJoinTask tasks.py:190-260 — "
    "actually a shuffle hash join; Spark/AQE picks broadcast vs sort-merge).",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    doc="LEFT OUTER join with real null padding — the reference parses LEFT "
    "JOIN but silently runs INNER (parser.py:131-133); fixed per SURVEY §4.3.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey
        FROM customer FULL JOIN orders ON c_custkey = o_custkey
        WHERE c_custkey IS NULL OR c_custkey % 3 = 0
    """,
    doc="FULL OUTER join (absent in reference).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "full")
        .filter(F.col("c_custkey").isNull() | (F.col("c_custkey") % 3 == 0))
        .select("c_custkey", "c_name", "o_orderkey")
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    doc="LEFT SEMI join (absent in reference; SURVEY §2.2 'no semi/anti').",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="LEFT ANTI join — customers with no order above 300k (absent in reference).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "self_join",
    oracle="""
        SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, a.s_nationkey AS nationkey
        FROM supplier a JOIN supplier b
          ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
    doc="Self-join with aliases (reference test_parser.py:352-371).",
)
def self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    a = supp.alias("a")
    b = supp.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("a.s_nationkey").alias("nationkey"),
    )


@query(
    "agg_having",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance,
               CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_balance,
               CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_balance,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_balance
        FROM customer
        GROUP BY c_mktsegment
        HAVING COUNT(*) > 10
    """,
    doc="GROUP BY + SUM/COUNT/AVG/MIN/MAX + HAVING (reference AggregateTask "
    "tasks.py:263-340; HAVING rewrite parser.py:152-161). Partial/final agg is "
    "automatic in Spark (map-side combine → exchange → final HashAggregate).",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    cnt = F.count(F.lit(1))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            cnt.alias("n_customers"),
            F.sum(bal).cast("double").alias("total_balance"),
            F.min(bal).cast("double").alias("min_balance"),
            F.max(bal).cast("double").alias("max_balance"),
            (F.sum(bal).cast("double") / cnt).alias("avg_balance"),
        )
        .filter(F.col("n_customers") > 10)
    )


@query(
    "agg_multi_key",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-column GROUP BY — the reference is limited to ONE group column "
    "(dataframe.py:64-65, SURVEY §2.3); strict superset here.",
)
def agg_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


@query(
    "agg_expression_input",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 2 + 1) AS DOUBLE) AS weird_sum
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Aggregation over an arithmetic expression (reference SUM(quantity*price), "
    "test_e2e.py:250, AggCol sql.py:420-421).",
)
def agg_expression_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    expr = F.col("o_totalprice").cast("decimal(12,2)") * 2 + 1
    return orders.groupBy("o_orderpriority").agg(F.sum(expr).cast("double").alias("weird_sum"))


@query(
    "agg_min_max_string_timestamp",
    oracle="""
        SELECT o_orderstatus,
               MIN(o_orderpriority) AS min_priority,
               MAX(o_orderpriority) AS max_priority,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="MIN/MAX over strings and timestamps — the reference asserts numeric "
    "inputs only (tasks.py:303-310, SURVEY §2.3); superset here.",
)
def agg_min_max_string_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.min("o_orderpriority").alias("min_priority"),
        F.max("o_orderpriority").alias("max_priority"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="COUNT(DISTINCT) — absent in reference (COUNT() only, parser.py:206-208). "
    "Expands to two-phase distinct aggregation in Spark.",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT (absent in reference, SURVEY §2.4).",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "order_by_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    doc="ORDER BY + LIMIT — absent in reference (show(n) truncation only, "
    "dataframe.py:75-79). Spark runs TakeOrderedAndProject (no full sort).",
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "union_all",
    oracle="""
        SELECT o_orderkey AS k, 'high' AS bucket FROM orders WHERE o_totalprice > 250000
        UNION ALL
        SELECT o_orderkey AS k, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="UNION ALL (set ops absent in reference, SURVEY §2.4).",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_orderkey").alias("k"), F.lit("high").alias("bucket")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k"), F.lit("urgent").alias("bucket")
    )
    return high.unionByName(urgent)


@query(
    "union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct) of two sources.",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


@query(
    "intersect_except",
    oracle="""
        SELECT k FROM (
            SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT k FROM (
            SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier
        )
    """,
    doc="INTERSECT and EXCEPT (absent in reference).",
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.intersect(supp).unionByName(cust.subtract(supp))


@query(
    "window_rank",
    oracle="""
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rk
            FROM customer
        ) WHERE rk <= 3
    """,
    doc="Window function: top-3 per group via ROW_NUMBER (absent in reference).",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_spend,
               LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS prev_order
        FROM orders
    """,
    doc="Running aggregate + LAG over an ordered window (absent in reference).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
    )


@query(
    "subquery_cte",
    oracle="""
        WITH seg_stats AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS seg_avg
            FROM customer GROUP BY c_mktsegment
        )
        SELECT c.c_custkey, c.c_name, c.c_mktsegment
        FROM customer c JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
        WHERE c.c_acctbal > s.seg_avg * 1.8
    """,
    doc="CTE + correlated-style comparison against a per-group aggregate "
    "(subqueries absent in reference, SURVEY §2.4).",
)
def subquery_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy("c_mktsegment").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias(
            "seg_avg"
        )
    )
    return (
        cust.alias("c")
        .join(F.broadcast(seg.alias("s")), "c_mktsegment")
        .filter(F.col("c.c_acctbal") > F.col("s.seg_avg") * 1.8)
        .select(F.col("c.c_custkey").alias("c_custkey"), "c_name", "c_mktsegment")
    )


@query(
    "case_when_conditional_agg",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(SUM(CASE WHEN o_totalprice > 150000
                             THEN CAST(o_totalprice AS DECIMAL(12,2))
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS big_total
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="CASE WHEN + conditional aggregation (absent in reference).",
)
def case_when_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
        F.sum(
            F.when(
                F.col("o_totalprice") > 150000, F.col("o_totalprice").cast("decimal(12,2)")
            ).otherwise(F.lit(0).cast("decimal(12,2)"))
        )
        .cast("double")
        .alias("big_total"),
    )


@query(
    "math_functions",
    oracle="""
        SELECT s_suppkey,
               ABS(s_acctbal) AS abs_bal,
               SQRT(ABS(s_acctbal)) AS sqrt_bal,
               ROUND(s_acctbal, 1) AS round_bal,
               CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
               CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
               s_suppkey % 7 AS mod7
        FROM supplier
    """,
    doc="Scalar math: ABS/SQRT/ROUND/FLOOR/CEIL/% — absent in reference "
    "(SURVEY §2.4 'no math functions'). SQRT is IEEE correctly-rounded → "
    "deterministic across engines; transcendentals (ln/exp) are deliberately "
    "excluded from oracle-checked queries.",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.abs(F.col("s_acctbal")).alias("abs_bal"),
        F.sqrt(F.abs(F.col("s_acctbal"))).alias("sqrt_bal"),
        F.round(F.col("s_acctbal"), 1).alias("round_bal"),
        F.floor(F.col("s_acctbal")).alias("floor_bal"),
        F.ceil(F.col("s_acctbal")).alias("ceil_bal"),
        (F.col("s_suppkey") % 7).alias("mod7"),
    )


@query(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               LOWER(p_type) AS type_lower,
               SUBSTRING(p_name, 1, 8) AS name_prefix,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               REPLACE(p_type, ' ', '_') AS type_snake,
               TRIM(p_brand) AS brand_trim
        FROM part
        WHERE p_partkey <= 500
    """,
    doc="String functions: UPPER/LOWER/SUBSTRING/LENGTH/REPLACE/TRIM "
    "(absent in reference beyond concat).",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_brand").alias("brand_trim"),
    )


@query(
    "date_extract",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS month_total
        FROM orders
        GROUP BY 1, 2
    """,
    doc="Date part extraction + rollup by year/month (absent in reference; "
    "DuckDB year() returns BIGINT so both sides pin INTEGER).",
)
def date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("month_total"),
        )
    )


@query(
    "grouping_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        HAVING COUNT(*) > 0
    """,
    doc="ROLLUP grouping sets (absent in reference, SURVEY §2.4).",
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "percentile_exact",
    oracle="""
        SELECT o_orderstatus,
               quantile_cont(c, 0.25) / 100.0 AS p25,
               quantile_cont(c, 0.5)  / 100.0 AS p50,
               quantile_cont(c, 0.75) / 100.0 AS p75
        FROM (SELECT o_orderstatus,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
              FROM orders)
        GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (absent in reference). Computed "
    "over integer cents so the linear interpolation at quarter fractions "
    "is exact in both engines (products of ints with powers of two) — "
    "bit-equal despite different interpolation formula shapes.",
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = money.cents("o_totalprice")
    p = F.percentile(c, F.lit([0.25, 0.5, 0.75]))
    return orders.groupBy("o_orderstatus").agg(
        (p[0] / 100.0).alias("p25"),
        (p[1] / 100.0).alias("p50"),
        (p[2] / 100.0).alias("p75"),
    )


@query(
    "approx_count_distinct_users",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_bound
        FROM events
        GROUP BY event_type
    """,
    doc="Approximate distinct users per event type via HyperLogLog++ — "
    "the scale path for COUNT(DISTINCT), no exact-distinct shuffle. "
    "Bound-checking oracle: sketches legitimately differ across "
    "engines, so the estimate is checked as |est - exact| <= 3*rsd*"
    "exact (a 3-sigma bound the sketch must satisfy), emitted as a "
    "boolean the oracle pins TRUE; n_events and exact_users are "
    "cross-engine-exact. The exact aggregate exists only to phrase "
    "the check — production uses the approx column alone.",
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    est = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact.alias("exact_users"),
        (
            F.abs(est.cast("double") - exact.cast("double"))
            <= F.lit(3 * 0.02) * exact.cast("double")
        ).alias("within_bound"),
    )


@query(
    "agg_max_by",
    oracle="""
        SELECT c_mktsegment,
               arg_max(c_name, c_acctbal * 100000 + c_custkey) AS richest_customer,
               arg_min(c_name, c_acctbal * 100000 + c_custkey) AS poorest_customer,
               MAX(c_acctbal) AS max_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    doc="MAX_BY/MIN_BY (argmax aggregation — no window, no self-join; one "
    "shuffle). The ordering key folds in c_custkey to break acctbal ties "
    "deterministically in both engines.",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_acctbal") * 100000 + F.col("c_custkey")
    return cust.groupBy("c_mktsegment").agg(
        F.max_by("c_name", key).alias("richest_customer"),
        F.min_by("c_name", key).alias("poorest_customer"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "stats_moments",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   CAST(floor(value * 10000 + 0.5) AS BIGINT) AS c
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(c) AS DOUBLE) / COUNT(*) / 10000.0 AS mean,
               (CAST(SUM(c * c) AS DOUBLE)
                - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE) / COUNT(*))
                 / nullif(COUNT(*) - 1, 0) / 100000000.0 AS variance
        FROM q
        GROUP BY event_type
    """,
    doc="Mean/variance of value quantized to 1e-4, via exact BIGINT "
    "fixed-point sums + a pinned final double formula — deterministic "
    "cross-engine. Built-in stddev/var accumulation differs by engine "
    "(Welford vs naive), and even DECIMAL sums diverge by 1 ulp at "
    ">17 significant digits because decimal-to-double conversion "
    "rounding is engine-specific; integer-to-double is correctly "
    "rounded everywhere. Single shuffle, partial-aggregatable.",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 10000 + F.lit(0.5))
    n = F.count(F.lit(1))
    sv = F.sum(c).cast("double")
    sv2 = F.sum(c * c).cast("double")
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (sv / n / F.lit(10000.0)).alias("mean"),
        # nullif: a single-row group has undefined sample variance (NULL),
        # not a divide-by-zero crash; DuckDB twin matches.
        (
            (sv2 - sv * sv / n) / F.nullif((n - F.lit(1)).cast("double"), F.lit(0.0))
            / F.lit(100000000.0)
        ).alias("variance"),
    )


@query(
    "grouping_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        HAVING COUNT(*) > 0
    """,
    doc="CUBE grouping sets with GROUPING() markers (rollup's sibling; "
    "both absent in reference). One shuffle — Spark expands the grouping "
    "sets map-side. Oracle HAVING COUNT(*)>0: on EMPTY input DuckDB "
    "emits the grand-total grouping row, Spark emits none — the HAVING "
    "is a no-op on any non-empty group and pins the Spark semantics.",
)
def grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


@query(
    "window_lead_lag",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               o_totalprice - LAG(o_totalprice) OVER w AS price_delta,
               CAST(date_diff('second', LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT)
                   AS gap_s
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="LEAD/LAG over per-customer order history: deltas between "
    "consecutive orders — the change-detection window shape. One "
    "shuffle on custkey; single-op float subtraction stays exact.",
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lag_p = F.lag("o_totalprice").over(w)
    lag_d = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        lag_p.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - lag_p).alias("price_delta"),
        # NTZ has no direct long cast; via TIMESTAMP (session tz pinned UTC)
        (
            F.col("o_orderdate").cast("timestamp").cast("long")
            - lag_d.cast("timestamp").cast("long")
        ).alias("gap_s"),
    )


@query(
    "null_semantics",
    oracle="""
        SELECT c_custkey,
               o_orderkey,
               COALESCE(o_totalprice, 0.0) AS price_or_zero,
               o_orderkey IS NULL AS no_order,
               NULLIF(c_mktsegment, 'BUILDING') AS seg_nullified,
               c_custkey IS NOT DISTINCT FROM o_custkey AS null_safe_eq
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 250000
    """,
    doc="NULL semantics over outer-join padding: COALESCE, IS NULL, "
    "NULLIF, and null-safe equality (<=> / IS NOT DISTINCT FROM) — the "
    "reference has no NULLs at all (SURVEY §1.2).",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey",
        "o_orderkey",
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullified"),
        F.col("c_custkey").eqNullSafe(F.col("o_custkey")).alias("null_safe_eq"),
    )


HIST_BIN_W = 25000


@query(
    "histogram_totalprice",
    oracle=f"""
        SELECT CAST(floor(o_totalprice / {HIST_BIN_W}) AS BIGINT) AS bin,
               CAST(floor(o_totalprice / {HIST_BIN_W}) AS BIGINT) * {HIST_BIN_W} AS bin_lo,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
    """,
    doc=f"Equi-width histogram ({HIST_BIN_W}-wide bins of order value) via "
    "floor-binning — one partial-aggregated shuffle, the standard "
    "distributed histogram (single float divide + floor is exact).",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / HIST_BIN_W)
    return orders.groupBy(
        b.alias("bin"), (b * HIST_BIN_W).alias("bin_lo")
    ).agg(F.count(F.lit(1)).alias("n"))


BASKET_MIN_SUPPORT = 3


@query(
    "basket_part_pairs",
    oracle=f"""
        WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders_together
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    """,
    doc=f"Market-basket co-occurrence: part pairs appearing in >= "
    f"{BASKET_MIN_SUPPORT} common orders. One shuffle builds each "
    "order's distinct sorted basket (collect_set folds dedup into the "
    "same exchange a self-join would need); ordered pairs are generated "
    "JVM-side from the sorted array (quadratic only in basket size, ~4), "
    "then one partial-aggregated shuffle counts pairs. Two shuffles "
    "total vs three for the equivalent inverted-index self-join.",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    # All i<j pairs of the sorted basket: for element x at index i,
    # pair it with every later element (slice is 1-based).
    pair = F.explode(
        F.expr(
            "flatten(transform(parts, (x, i) -> "
            "transform(slice(parts, i + 2, size(parts)), y -> "
            "struct(x AS part_a, y AS part_b))))"
        )
    )
    return (
        baskets.select(pair.alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= BASKET_MIN_SUPPORT)
    )


@query(
    "events_zscore_outliers",
    oracle="""
        WITH q AS (
            SELECT event_id, event_type, value,
                   CAST(floor(value * 10000 + 0.5) AS BIGINT) AS c
            FROM events
        ),
        m AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(c) AS DOUBLE) / COUNT(*) / 10000.0 AS mean,
                   sqrt((CAST(SUM(c * c) AS DOUBLE)
                         - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE) / COUNT(*))
                        / nullif(COUNT(*) - 1, 0)) / 10000.0 AS sd
            FROM q GROUP BY event_type
        )
        SELECT q.event_id, q.event_type, q.value,
               (q.value - m.mean) / nullif(m.sd, 0.0) AS zscore
        FROM q JOIN m ON m.event_type = q.event_type
        WHERE abs((q.value - m.mean) / nullif(m.sd, 0.0)) > 2.5
    """,
    doc="Two-pass anomaly detection: deterministic per-type moments "
    "(exact fixed-point sums, see stats_moments) broadcast back over the "
    "stream, flagging |z| > 2.5. The group-stats-then-rejoin shape is "
    "the standard distributed outlier scan.",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 10000 + F.lit(0.5))
    n = F.count(F.lit(1))
    sv = F.sum(c).cast("double")
    sv2 = F.sum(c * c).cast("double")
    m = ev.groupBy("event_type").agg(
        (sv / n / F.lit(10000.0)).alias("mean"),
        (
            F.sqrt((sv2 - sv * sv / n) / F.nullif((n - F.lit(1)).cast("double"), F.lit(0.0)))
            / F.lit(10000.0)
        ).alias("sd"),
    )
    # nullif: zero spread (or a single row) has undefined z — NULL rows
    # drop out of the |z| filter identically in both engines.
    z = (F.col("value") - F.col("mean")) / F.nullif(F.col("sd"), F.lit(0.0))
    return (
        ev.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 2.5)
    )


@query(
    "window_ntile_deciles",
    oracle="""
        SELECT decile,
               COUNT(*) AS n,
               MIN(c_acctbal) AS lo,
               MAX(c_acctbal) AS hi
        FROM (
            SELECT c_acctbal,
                   CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS decile
            FROM customer
        )
        GROUP BY decile
    """,
    doc="NTILE decile summary of customer balances (total order made "
    "unique by custkey so tile boundaries are deterministic). Exact "
    "ntile(10) semantics via distributed ranking (operators/ranking.py: "
    "quantile buckets + bounded count collect + partition-local "
    "row_number) — no Exchange SinglePartition, no global sort.",
)
def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators import ranking

    cust = load_table(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    cuts = ranking.quantile_cuts(cust, ["c_acctbal"])
    b = cust.withColumn("_b", ranking.bucket_expr("c_acctbal", cuts["c_acctbal"]))
    counts = {r["_b"]: r["count"] for r in b.groupBy("_b").count().collect()}
    tiled = ranking.ntile_over_buckets(
        b, 10, "c_acctbal", ["c_custkey"], "_b", counts, "decile"
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
        SELECT c_mktsegment,
               array_to_string(list_sort(list(DISTINCT c_nationkey)), ',')
                   AS nation_keys,
               COUNT(DISTINCT c_nationkey) AS n_nations
        FROM customer
        GROUP BY c_mktsegment
    """,
    doc="Array aggregation: distinct values collected per group, sorted "
    "for determinism (collect_set order is otherwise arbitrary), then "
    "serialized to a comma-joined string. The driver's canonicalizer "
    "pandas-sorts result frames and cannot hash list cells "
    "(CORRECTNESS_r05: unhashable type 'list'), so every driver-visible "
    "output column must be scalar-typed; the array-typed form stays a "
    "local twin (collect_sorted_array, tests/test_relational_extras.py). "
    "Arrays/maps are absent in the reference entirely.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = collect_sorted_array(spark, sf_dir)
    return df.select(
        "c_mktsegment",
        F.array_join(F.col("nation_keys").cast("array<string>"), ",").alias(
            "nation_keys"
        ),
        "n_nations",
    )


def collect_sorted_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed twin of ``agg_collect_sorted`` — kept out of the
    registry because the driver's canonicalizer can't hash list cells;
    tested locally against the same DuckDB oracle shape."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.array_sort(F.collect_set("c_nationkey")).alias("nation_keys"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "stats_correlation",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS cq,
                   CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS cp
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(cq) AS sq, SUM(cp) AS sp,
                   SUM(cq * cq) AS sqq, SUM(cp * cp) AS spp,
                   SUM(cq * cp) AS sqp
            FROM q GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                  - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
               / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)), 0.0)
                   AS corr_qty_price
        FROM s
    """,
    doc="Pearson correlation of quantity vs price per return flag from "
    "EXACT integer moment sums (quantity in 0.01 units, price in 1.0 "
    "units so every squared sum fits int64), with the closed-form corr "
    "computed in one pinned double expression. Spark's built-in corr() "
    "is a streaming Welford-style accumulator whose result depends on "
    "partition merge order — unusable for bit-exact verification; the "
    "moment-sum form is order-insensitive, partial-aggregatable, and "
    "one shuffle.",
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cq = F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
    cp = F.floor(F.col("l_extendedprice") + F.lit(0.5))
    d = lambda c: c.cast("double")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cq).alias("sq"),
        F.sum(cp).alias("sp"),
        F.sum(cq * cq).alias("sqq"),
        F.sum(cp * cp).alias("spp"),
        F.sum(cq * cp).alias("sqp"),
    )
    num = d(F.col("n")) * d(F.col("sqp")) - d(F.col("sq")) * d(F.col("sp"))
    den = F.sqrt(
        d(F.col("n")) * d(F.col("sqq")) - d(F.col("sq")) * d(F.col("sq"))
    ) * F.sqrt(d(F.col("n")) * d(F.col("spp")) - d(F.col("sp")) * d(F.col("sp")))
    # nullif: zero spread (e.g. one row per group) has undefined
    # correlation (NULL), not a divide-by-zero crash.
    return s.select(
        "l_returnflag", "n", (num / F.nullif(den, F.lit(0.0))).alias("corr_qty_price")
    )


@query(
    "lineitem_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS amount
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="Wide-to-long melt of the four lineitem measures via the native "
    "UNPIVOT operator (the inverse of events_user_daily_pivot). UNPIVOT "
    "is a narrow generator — 4 output rows per input row, no shuffle; "
    "the orderkey filter is pushed to the scan below it.",
)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )


@query(
    "array_functions",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(list_max(embedding) AS DOUBLE) AS max_elem,
               CAST(list_min(embedding) AS DOUBLE) AS min_elem,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               CAST(list_contains(embedding, 0.0) AS BOOLEAN) AS has_zero
        FROM embeddings
    """,
    doc="Array/complex-type scalar functions over the float-vector column "
    "(size/array_max/array_min/element_at/array_contains) — arrays are "
    "absent in the reference entirely (SURVEY §1.1 'Graph/array/map: None'). "
    "All outputs are scalars; float32→double widening is exact, so the "
    "oracle hash-matches bit-for-bit. Narrow ops, no shuffle: the whole "
    "plan is one codegen'd projection over the parquet scan.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.array_max(e).cast("double").alias("max_elem"),
        F.array_min(e).cast("double").alias("min_elem"),
        F.element_at(e, 1).cast("double").alias("first_elem"),
        F.array_contains(e, F.lit(0.0).cast("float")).alias("has_zero"),
    )


@query(
    "orders_daily_gapfill",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
                   CAST(MAX(o_orderdate) AS DATE) AS d1
            FROM orders
        ),
        spine AS (
            SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
            FROM orders GROUP BY 1
        )
        SELECT CAST(s.day AS TIMESTAMP) AS day,
               COALESCE(d.n, 0) AS n_orders,
               COALESCE(d.total, 0.0) AS day_total
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    doc="Time-series gap fill over a generated date spine: sequence() + "
    "explode builds the calendar between min/max order dates, LEFT JOIN "
    "fills missing days with zero. The spine is a single-row aggregate "
    "exploded driver-free (stays distributed); Catalyst broadcasts it "
    "into the daily aggregate. Standard resample/asfreq semantics — no "
    "reference equivalent (no date functions at all, SURVEY §2.4).",
)
def orders_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )
    return spine.join(daily, "day", "left").select(
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("day_total"),
    )


@query(
    "window_rolling_interval",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_7d_total
        FROM orders
    """,
    doc="Rolling 7-day-interval window per customer: a RANGE frame over "
    "event-time (all rows within the trailing week), not a ROWS frame — "
    "ties and gaps in order dates are handled by value, mirroring DuckDB's "
    "RANGE BETWEEN INTERVAL frame via rangeBetween on epoch seconds. "
    "DECIMAL intermediate keeps the windowed sum order-independent. One "
    "shuffle on o_custkey; reference has no windows at all (SURVEY §2.4).",
)
def window_rolling_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d_total"),
    )


@query(
    "correlated_scalar_subquery",
    oracle="""
        SELECT o.p_partkey, o.p_brand, o.p_retailprice
        FROM part o
        WHERE CAST(o.p_retailprice AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM part i WHERE i.p_brand = o.p_brand)
              > (SELECT SUM(CAST(i.p_retailprice AS DECIMAL(12,2)))
                 FROM part i WHERE i.p_brand = o.p_brand)
    """,
    doc="Correlated scalar subqueries (parts priced above their brand's "
    "mean): Catalyst decorrelates both subqueries into aggregate-then-join "
    "— no per-row re-execution, unlike a naive nested-loop interpretation. "
    "The comparison is cross-multiplied (price*count > sum) in exact "
    "DECIMAL so no division ever happens — avg-boundary rows can't flip "
    "between engines. Subqueries are absent in the reference (SURVEY §2.4).",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("csq_part")
    return spark.sql(
        """
        SELECT o.p_partkey, o.p_brand, o.p_retailprice
        FROM csq_part o
        WHERE CAST(o.p_retailprice AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM csq_part i WHERE i.p_brand = o.p_brand)
              > (SELECT SUM(CAST(i.p_retailprice AS DECIMAL(12,2)))
                 FROM csq_part i WHERE i.p_brand = o.p_brand)
        """
    )


@query(
    "pii_mask_digits",
    oracle="""
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_masked,
               CAST(length(c_name)
                    - length(regexp_replace(c_name, '[0-9]', '', 'g'))
                    AS INTEGER) AS n_masked
        FROM customer
    """,
    doc="PII-style scrubbing: mask every digit in a name column and count "
    "masked characters — the redaction primitive of a training-data "
    "pipeline (emails/phones/ids are the same regexp_replace shape). "
    "Character-class regexes behave identically in Java (Spark) and RE2 "
    "(DuckDB). Pure narrow projection: no shuffle, fully codegen'd.",
)
def pii_mask_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    masked_len = F.length(name) - F.length(F.regexp_replace(name, "[0-9]", ""))
    return cust.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "X").alias("name_masked"),
        masked_len.cast("int").alias("n_masked"),
    )


@query(
    "approx_percentile_totalprice",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               TRUE AS within_p50, TRUE AS within_p90, TRUE AS within_p99
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Approximate p50/p90/p99 of order totals per order priority via "
    "Spark's Greenwald-Khanna sketch — the scale path for quantiles "
    "(exact percentiles need a full per-group sort: percentile_exact). "
    "Mergeable sketches mean one shuffle of fixed-size state, not data. "
    "Bound-checking oracle: GK guarantees rank error <= n/accuracy, so "
    "each estimate must lie between the (p -/+ 10/accuracy) discrete "
    "quantiles (computed with an effectively-exact high-accuracy "
    "sketch); the 10x margin strictly dominates the guaranteed error "
    "plus rank rounding at every n. Booleans pinned TRUE by the "
    "oracle; n_orders and the groups are cross-engine-exact.",
)
def approx_percentile_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    probs, acc = [0.5, 0.9, 0.99], 10000
    eps = 10.0 / acc
    est = F.percentile_approx("o_totalprice", probs, acc)
    lo = F.percentile_approx("o_totalprice", [p - eps for p in probs], 1_000_000)
    hi = F.percentile_approx("o_totalprice", [min(p + eps, 1.0) for p in probs], 1_000_000)
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        est.alias("_est"), lo.alias("_lo"), hi.alias("_hi"),
    )
    cols = [
        ((F.col("_est")[i] >= F.col("_lo")[i]) & (F.col("_est")[i] <= F.col("_hi")[i])).alias(
            f"within_p{int(p * 100)}"
        )
        for i, p in enumerate(probs)
    ]
    return agg.select("o_orderpriority", "n_orders", *cols)


@query(
    "grouping_sets_custom",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        HAVING COUNT(*) > 0
    """,
    doc="Arbitrary GROUPING SETS (neither a ROLLUP nor a CUBE prefix "
    "lattice): per-status totals, per-priority totals, and the grand "
    "total in ONE pass — Spark expands the sets into a single Expand + "
    "hash aggregate, scanning orders once instead of three times.",
)
def grouping_sets_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "window_distribution_ranks",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal, c_custkey) AS pct_rank,
               CUME_DIST() OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal, c_custkey) AS cume
        FROM customer
    """,
    doc="Distribution window functions: PERCENT_RANK and CUME_DIST per "
    "market segment (tie-broken by key so both are deterministic). "
    "Partitioned windows — no global sort; both are exact rational "
    "ratios of integer ranks, so they compare bit-exact cross-engine.",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "set_ops_all",
    oracle="""
        SELECT 'intersect_all' AS op, k FROM (
            SELECT c_nationkey AS k FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT 'except_all' AS op, k FROM (
            SELECT c_nationkey AS k FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
        )
    """,
    doc="Bag-semantics set ops INTERSECT ALL / EXCEPT ALL "
    "(intersectAll / exceptAll — multiplicity-preserving, the variant "
    "dedup pipelines use to diff corpus snapshots without collapsing "
    "duplicates). One shuffle on the key each; distinct from the "
    "set-semantics twins in intersect_except.",
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = cust.intersectAll(supp).select(F.lit("intersect_all").alias("op"), "k")
    diff = cust.exceptAll(supp).select(F.lit("except_all").alias("op"), "k")
    return inter.unionByName(diff)


@query(
    "struct_map_functions",
    oracle="""
        SELECT o_orderkey,
               (struct_pack(status := o_orderstatus, prio := o_orderpriority)).status
                   AS info_status,
               map {o_orderstatus: o_totalprice}[o_orderstatus][1] AS price_by_status,
               CAST(cardinality(map {o_orderstatus: o_totalprice}) AS INTEGER) AS map_size
        FROM orders
        WHERE o_orderkey < 200
    """,
    doc="Complex-type construction and access: STRUCT build + field "
    "access and MAP build + key lookup (struct()/map_from_arrays vs "
    "DuckDB struct_pack/map literals — nested types are first-class in "
    "both engines and compare structurally in the oracle gate). Narrow "
    "projection, filter pushed to the scan.",
)
def struct_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    info = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("prio")
    )
    m = F.map_from_arrays(F.array(F.col("o_orderstatus")), F.array(F.col("o_totalprice")))
    return orders.select(
        "o_orderkey",
        info.getField("status").alias("info_status"),
        F.element_at(m, F.col("o_orderstatus")).alias("price_by_status"),
        F.size(m).cast("int").alias("map_size"),
    )


@query(
    "customers_fuzzy_match",
    oracle="""
        WITH c AS (
            SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk
            FROM customer
        )
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               a.c_name AS name_a, b.c_name AS name_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_distance
        FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="Entity-resolution fuzzy match: customer-name pairs within "
    "Levenshtein distance 1, found via BLOCKED comparison (equi-join on "
    "a 16-char name prefix) — the standard record-linkage shape: the "
    "block key turns the quadratic all-pairs distance scan into "
    "per-block work, and the exact integer edit distance (identical in "
    "Spark and DuckDB) verifies inside blocks only. At 100 TB the "
    "blocking key is the tunable (prefix/length/phonetic, possibly "
    "multiple passes unioned) exactly like MinHash bands bound Jaccard "
    "verification; one shuffle on the block key, AQE skew-splits any "
    "hot block.",
)
def customers_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the block join broadcasts one side, so the probe side's
    # scan partitioning IS the stage's parallelism — and the customer
    # parquet arrives in ONE byte-sized partition at gate SFs, making
    # the ~100-Levenshtein-per-row probe a single-task stage on a
    # 32-core box (measured 2.9 s wall ≈ task time; guide §2.5/§2.6).
    # No-op once the scan is already wide.
    c = fan_out(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
        )
    )
    a, b = c.alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            # Predicate order matters: the edit-distance test is ~100x
            # a key comparison, so it goes LAST in the join condition —
            # codegen short-circuits it away for the half of each
            # bucket's probe pairs the key inequality already kills.
            # (Leaving it as a post-select filter let Catalyst push it
            # into the condition FIRST: measured 4.3 s -> 2.6 s.)
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (dist <= 1),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
            dist.cast("int").alias("edit_distance"),
        )
    )


@query(
    "basket_association_rules",
    oracle=f"""
        WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS n_together
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        ),
        item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM lines GROUP BY 1),
        tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lines)
        SELECT p.part_a, p.part_b, p.n_together,
               ia.n AS n_a, ib.n AS n_b,
               CAST(p.n_together AS DOUBLE) / ia.n AS conf_a_to_b,
               CAST(p.n_together AS DOUBLE) / ib.n AS conf_b_to_a,
               CAST(p.n_together * t.n_orders AS DOUBLE) / CAST(ia.n * ib.n AS DOUBLE)
                   AS lift
        FROM pairs p
        JOIN item ia ON ia.l_partkey = p.part_a
        JOIN item ib ON ib.l_partkey = p.part_b
        CROSS JOIN tot t
    """,
    doc="Association rules over the co-occurrence pairs (the Apriori "
    "readout on top of basket_part_pairs): per qualifying pair, both "
    "directed confidences and the lift n_together*N/(n_a*n_b) — "
    "computed as single IEEE divisions of exact integer counts, so "
    "cross-engine bit-equal. Plan: the two-shuffle grouped-basket pair "
    "count, a map-combinable per-part order count joined on each side "
    "(shuffles keyed on part id — the natural key at scale), and a "
    "broadcast 1-row total. No new shuffle shapes beyond the "
    "co-occurrence query itself.",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE shuffle builds the grouped baskets; every other input of the
    # rule computation derives from that frame (round 8, guide §2.4):
    # the old spelling re-executed the lineitem distinct subtree three
    # times (pairs, per-item counts, order total — collect_set already
    # dedups within a basket, so the pre-distinct was redundant work
    # too). Cached: one row per order, read by three consumers.
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .cache()
    )
    baskets.count()  # materialize once — the three consumers run in ONE
    # action and would otherwise race the cache into up to 3 rebuilds
    # (3x the lineitem scan, seen in the structural gate's input bytes)
    pair = F.explode(
        F.expr(
            "flatten(transform(parts, (x, i) -> "
            "transform(slice(parts, i + 2, size(parts)), y -> "
            "struct(x AS part_a, y AS part_b))))"
        )
    )
    pairs_df = (
        baskets.select(pair.alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_together"))
        .filter(F.col("n_together") >= BASKET_MIN_SUPPORT)
    )
    # n per part = number of baskets containing it (parts is a set);
    # n_orders = basket count — identical integers to the old
    # distinct-frame aggregates.
    item = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs_df.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_together",
            "n_a",
            "n_b",
            (F.col("n_together").cast("double") / F.col("n_a")).alias("conf_a_to_b"),
            (F.col("n_together").cast("double") / F.col("n_b")).alias("conf_b_to_a"),
            (
                (F.col("n_together") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


TRIPLE_MIN_SUPPORT = 2


@query(
    "basket_frequent_triples",
    oracle=f"""
        WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        t AS (
            SELECT a.p AS part_a, b.p AS part_b, c.p AS part_c, COUNT(*) AS support
            FROM lp a
            JOIN lp b ON a.o = b.o AND a.p < b.p
            JOIN lp c ON a.o = c.o AND b.p < c.p
            GROUP BY 1, 2, 3
        )
        SELECT part_a, part_b, part_c, CAST(support AS BIGINT) AS support
        FROM t WHERE support >= {TRIPLE_MIN_SUPPORT}
    """,
    doc=f"Frequent part TRIPLES (support >= {TRIPLE_MIN_SUPPORT}) — the "
    "3-itemset layer above basket_part_pairs/association_rules. One "
    "shuffle builds grouped baskets, then a JVM-side nested i<j<k "
    "expansion emits each basket's C(n,3) ordered triples and a "
    "map-side-combined count reduces them — no three-way self-join "
    "(three shuffles) and no Python. TPC-H basket size is bounded "
    "(<= ~11 parts/order), so the per-basket expansion is tiny; for "
    "long-tail baskets the Apriori move is to semi-join each basket's "
    "items against the frequent-PAIR set before expanding (same plan, "
    "one extra broadcast prune).",
)
def basket_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    triple = F.explode(
        F.expr(
            "flatten(flatten(transform(parts, (x, i) -> "
            "transform(slice(parts, i + 2, size(parts)), (y, j) -> "
            "transform(slice(parts, i + j + 3, size(parts)), z -> "
            "struct(x AS a, y AS b, z AS c))))))"
        )
    )
    return (
        baskets.select(triple.alias("t"))
        .groupBy(
            F.col("t.a").alias("part_a"),
            F.col("t.b").alias("part_b"),
            F.col("t.c").alias("part_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
    )


@query(
    "parts_abc_classification",
    oracle="""
        WITH rev AS (
            SELECT l_partkey,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
            FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(cents) AS total FROM rev),
        cum AS (
            SELECT l_partkey, cents,
                   SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING) AS cum
            FROM rev
        )
        SELECT l_partkey,
               CAST(cents AS DOUBLE) / 100 AS revenue,
               CASE WHEN cum * 100 <= 80 * tot.total THEN 'A'
                    WHEN cum * 100 <= 95 * tot.total THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum CROSS JOIN tot
    """,
    doc="ABC inventory classification of parts by revenue: class A = "
    "parts up to 80% of cumulative revenue, B to 95%, C the tail — the "
    "warehouse-prioritization standard. ENTIRELY integer: revenue in "
    "exact cents (the money discipline), the class thresholds as "
    "cross-multiplied comparisons cum*100 <= k*total (no percentage "
    "division anywhere); the only double is the display column (one "
    "exact-int division by 100). The cumulative sum runs over the "
    "PART-dimension frame (one row per part), which at corpus scale is "
    "itself hundreds of millions of SKUs — so it uses the DISTRIBUTED "
    "two-pass prefix sum (operators/ranking.py shape: approx-quantile "
    "range buckets on -cents, bounded per-bucket SUM(cents) collect as "
    "literal offsets, bucket-local cumulative window) instead of an "
    "unpartitioned ORDER BY window; no Exchange SinglePartition "
    "anywhere (pinned by tests/test_plan_shapes.py). Equal cents "
    "always share a bucket (strict-< cut comparison), so the "
    "(cents DESC, l_partkey) tie-break stays bucket-local and the "
    "result is bit-identical to the global-window spelling.",
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.operators import ranking

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).alias("cents"))
        # cumulative order is cents DESC; the bucket/rank machinery
        # orders ASC, so bucket and sort on the negated value (exact
        # for integers)
        .withColumn("neg_cents", -F.col("cents"))
    )
    rev = rev.cache()
    cuts = ranking.quantile_cuts(rev, ["neg_cents"])
    bucketed = rev.withColumn(
        "_b", ranking.bucket_expr("neg_cents", cuts["neg_cents"])
    )
    # Bounded driver collect: <= n_buckets rows of SUM(cents) — the
    # running-sum offset each bucket starts from, plus the grand total
    # (so no crossJoin with a 1-row total aggregate is needed).
    offsets, total = ranking.bucket_weight_offsets(bucketed, "_b", "cents")
    off = ranking.offset_expr("_b", offsets)
    w = (
        Window.partitionBy("_b")
        .orderBy("neg_cents", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = off + F.sum("cents").over(w)
    return bucketed.select(
        "l_partkey",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.when(cum * 100 <= 80 * F.lit(total), "A")
        .when(cum * 100 <= 95 * F.lit(total), "B")
        .otherwise("C")
        .alias("abc_class"),
    )

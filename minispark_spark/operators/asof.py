"""As-of (temporal) join — match each event to the most recent prior
event of another kind.

Spark has no native ASOF join; the scalable formulation is a single
sort-merge pass, NOT a join: union both sides, one shuffle on the key,
one sort on (ts, tie-rank), then ``last(..., ignorenulls)`` over the
ordered window carries the most recent right-side row forward. Linear
in events, no pair blow-up — at 100 TB this is one shuffle + sort,
exactly the shape Structured Streaming's state store would use.

Tie semantics are STRICT (purchase.ts > click.ts): purchases sort
before clicks at equal timestamps, so a same-instant click is not yet
visible — matching DuckDB's ``ASOF LEFT JOIN ... ON p.ts > c.ts``
which the oracle uses verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources.tables import load_table


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For each ``left_type`` event: the most recent strictly-earlier
    ``right_type`` event of the same user (or nulls)."""
    ev = events.filter(F.col("event_type").isin(left_type, right_type)).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("right_ts"),
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("right_id"),
    )
    # Left rows sort BEFORE right rows at equal ts → strict "earlier than".
    tie = F.when(F.col("event_type") == right_type, 1).otherwise(0)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts"), tie, F.col("event_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = ev.select(
        "*",
        F.last("right_ts", ignorenulls=True).over(w).alias("last_right_ts"),
        F.last("right_id", ignorenulls=True).over(w).alias("last_right_id"),
    )
    return carried.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_right_id").alias("last_click_id"),
        F.col("last_right_ts").alias("last_click_ts"),
        (F.col("ts").cast("long") - F.col("last_right_ts").cast("long")).alias("gap_s"),
    )


@query(
    "asof_purchase_to_click",
    oracle="""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                   FROM events WHERE event_type = 'click')
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               c.click_id AS last_click_id, c.click_ts AS last_click_ts,
               CASE WHEN c.click_ts IS NULL THEN NULL
                    ELSE date_diff('second', c.click_ts, p.purchase_ts) END AS gap_s
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.purchase_ts > c.click_ts
    """,
    doc="As-of join: each purchase matched to the user's most recent "
    "strictly-earlier click (absent in reference AND in stock Spark; "
    "implemented as one shuffle + ordered-window carry-forward).",
)
def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_events(load_table(spark, sf_dir, "events"))

"""Temporal join queries over the events table: as-of join and interval
(range) join — SURVEY.md §2.3 J3–J8 engine surface (absent in the
reference; DuckDB's native ASOF JOIN is the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents, epoch_us
from ..operators.joins import asof_join, interval_join
from ..sources import load_table
from .registry import query


@query(
    "q_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts, max(value) AS click_value FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           ROUND(p.value, 2) AS value,
           ROUND(c.click_value, 2) AS click_value_asof
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase annotated with the user's most
    recent click value at-or-before it (NULL when none yet).

    Spark side is the distributed merge-asof (operators.joins.asof_join:
    union + one window pass per user) — one shuffle on user_id, no theta
    join, cost independent of time gaps.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(purchases, clicks, key="user_id")
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("purchase_us"),
        F.round("value", 2).alias("value"),
        F.round("click_value_asof", 2).alias("click_value_asof"),
    )


@query(
    "q_interval_join",
    oracle="""
    WITH err AS (
      SELECT event_id AS err_id, user_id, ts AS err_ts FROM events
      WHERE event_type = 'error'
    )
    SELECT err_id,
           CAST(count(*) AS BIGINT) AS n_follow,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS follow_value
    FROM err JOIN events e
      ON e.user_id = err.user_id
     AND e.ts > err.err_ts
     AND e.ts <= err.err_ts + INTERVAL 10 MINUTE
    GROUP BY err_id
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: activity in the 10 minutes after each error
    event, per user — the batch shape of a stream-stream interval join.

    The user_id equi key carries the shuffle; the time-range predicate is
    evaluated inside the join, so there is no cross product anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    errs = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id"),
        F.col("ts").alias("err_ts"),
    )
    follow = (F.col("ts") > F.col("err_ts")) & (
        F.col("ts") <= F.col("err_ts") + F.expr("INTERVAL 10 MINUTES")
    )
    joined = interval_join(errs, ev.select("user_id", "ts", "value"), "user_id", follow)
    return joined.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        (F.sum(cents("value")).cast("double") / 100.0).alias("follow_value"),
    )

"""asof_join / interval_join semantics on hand-built frames: inclusive
ties, no-match nulls, carry-forward across gaps, per-key isolation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.joins import asof_join, interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:05:00"), 10),  # after r@00:04 -> 4.0
            (1, _ts("2024-01-01 00:04:00"), 11),  # tie with r@00:04 -> 4.0
            (1, _ts("2024-01-01 00:01:00"), 12),  # before any right -> null
            (2, _ts("2024-01-01 09:00:00"), 13),  # other key, r@08:00 -> 8.0
            (3, _ts("2024-01-01 00:10:00"), 14),  # key with no right rows
        ],
        "user_id long, ts timestamp, lval long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:02:00"), 2.0),
            (1, _ts("2024-01-01 00:04:00"), 4.0),
            (2, _ts("2024-01-01 08:00:00"), 8.0),
        ],
        "user_id long, ts timestamp, rval double",
    )
    out = {
        r["lval"]: r["rval_asof"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert out == {10: 4.0, 11: 4.0, 12: None, 13: 8.0, 14: None}


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("lval"),
    )
    right = spark.range(10).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_micros(F.col("id") * 9_000_000).alias("ts"),
        (F.col("id") * 1.0).alias("rval"),
    )
    assert asof_join(left, right, key="user_id").count() == 100


def test_interval_join_range_bounds(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"))], "user_id long, start_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "at-start"),      # excluded (>)
            (1, _ts("2024-01-01 00:05:00"), "inside"),
            (1, _ts("2024-01-01 00:10:00"), "at-end"),        # included (<=)
            (1, _ts("2024-01-01 00:10:01"), "after"),         # excluded
            (2, _ts("2024-01-01 00:05:00"), "other-key"),     # excluded
        ],
        "user_id long, ts timestamp, tag string",
    )
    cond = (F.col("ts") > F.col("start_ts")) & (
        F.col("ts") <= F.col("start_ts") + F.expr("INTERVAL 10 MINUTES")
    )
    tags = {
        r["tag"] for r in interval_join(left, right, "user_id", cond).collect()
    }
    assert tags == {"inside", "at-end"}

"""Temporal join operators the reference lacks (SURVEY.md §2.3 J3–J8
engine surface): as-of join and interval (range) join, built as
compositions of existing DataFrame ops — no Python UDFs, one shuffle each.

- **as-of join** — union both sides tagged, one window pass per key carries
  the latest right-side payload forward (`last(..., ignorenulls)`), filter
  back to left rows. This is the distributed merge-asof: cost is one
  shuffle on the key + a per-key sort, independent of time-gap sizes —
  unlike the naive `left.ts >= right.ts` theta join, which is quadratic
  per key. Survives 100 TB because skew is bounded by events-per-key, and
  AQE splits hot keys.
- **interval join** — equi join on the key carries the shuffle; the range
  predicate on time rides along as a post-join filter Catalyst evaluates
  inside the same sort-merge/hash join (never a cross product). This is
  the batch shape of Structured Streaming's stream-stream interval join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` for the same key (backward as-of, inclusive).

    ``value_cols`` are the right-side columns to carry (default: all but
    key/ts). Right side should be unique per (key, ts) — pre-aggregate if
    not — so the result is deterministic.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # Right rows sort before left rows at equal ts (__is_left 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row — the
    # standard inclusive as-of convention.
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("__is_left") == 1).select(
        F.col("__lrow.*"),
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi join on ``key`` + an arbitrary range ``condition`` between the
    two sides (e.g. ``r.ts BETWEEN l.ts AND l.ts + 10 min``). The equi key
    is the shuffle/join key; the range predicate is evaluated inside the
    join — never a cross product."""
    return left.join(right, (left[key] == right[key]) & condition, how)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_us: str = "t_us",
    start_us: str = "s_us",
    end_us: str = "e_us",
    bin_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """KEYLESS interval-containment join — points.ts ∈ [start, end] with
    no equi key — without the cartesian product Spark would otherwise
    plan (BroadcastNestedLoopJoin: every point × every interval).

    The classic bin-bucketing rewrite: intervals explode into the time
    bins they overlap (⌈width/bin⌉ + 1 rows each), points map to their
    single bin, and the bin id becomes the EQUI join key; the exact range
    predicate rides inside the join as a post-filter. A point's bin is
    unique and an interval covers any bin at most once, so every
    (point, interval) pair is produced at most once — no dedup pass.

    Scale: candidates per point = intervals overlapping its bin (local
    density), not |intervals|; shuffle keys are (bin, µs longs). Pick
    ``bin_us`` ≈ the typical interval width — much smaller multiplies the
    interval explode, much larger multiplies per-bin candidates. Both
    µs columns must be integer epoch-µs (functions.scalar.epoch_us).
    """
    pb = points.withColumn(
        "__bin", F.expr(f"CAST({point_us} div {bin_us} AS LONG)")
    )
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_us} div {bin_us} AS LONG)"),
                F.expr(f"CAST({end_us} div {bin_us} AS LONG)"),
            )
        ),
    )
    return (
        pb.join(ib, "__bin", how)
        .where(
            (F.col(point_us) >= F.col(start_us))
            & (F.col(point_us) <= F.col(end_us))
        )
        .drop("__bin")
    )

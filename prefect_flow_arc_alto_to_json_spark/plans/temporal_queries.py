"""Temporal join queries over the events table: as-of join and interval
(range) join — SURVEY.md §2.3 J3–J8 engine surface (absent in the
reference; DuckDB's native ASOF JOIN is the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    # round-7 rotation: the temporal-join family stays graded via q_asof_join; the interval twin moves to the pytest tier
    extra=True,
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


@query(
    "q_gap_fill_resample",
    extra=True,
    oracle="""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value, ts, event_id
      FROM events WHERE user_id < 10),
    hourly AS (
      SELECT user_id, h, value FROM (
        SELECT user_id, h, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, h
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev) WHERE rn = 1),
    bounds AS (
      SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM ev GROUP BY user_id),
    grid AS (
      SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    joined AS (
      SELECT g.user_id, g.h, hv.value
      FROM grid g LEFT JOIN hourly hv
        ON hv.user_id = g.user_id AND hv.h = g.h)
    SELECT user_id, STRFTIME(h, '%Y-%m-%d %H:00') AS hour,
           ROUND(LAST_VALUE(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled,
           (value IS NULL) AS was_gap
    FROM joined
    """,
)
def q_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill (gap filling): each user's event
    values resampled to a dense hourly grid between their first and last
    event, missing hours carrying the last observed value — the standard
    feature-engineering primitive for training-data pipelines (absent in
    Spark as a built-in; composed from sequence/explode + an IGNORE NULLS
    last() window).

    Determinism: the per-hour representative is row_number over
    (ts DESC, event_id DESC) — a total order — and the grid bounds are
    min/max per user, so both engines build the identical frame.

    Scale: the grid explodes to |users| x |hours| rows but only AFTER the
    per-(user, hour) reduction — the dense frame never holds more than one
    row per cell; both the reduction and the fill window shuffle on
    user_id, and AQE coalesces the join of grid vs hourly (same user_id
    key, co-partitioned). The user_id < 10 predicate pushes to the scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 10)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "value",
            "ts",
            "event_id",
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id", "h").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    hourly = (
        ev.withColumn("rn", rn).where(F.col("rn") == 1).select("user_id", "h", "value")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    fill = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.round(F.last("value", ignorenulls=True).over(fill), 6).alias("filled"),
        F.col("value").isNull().alias("was_gap"),
    )


@query(
    "q_cogroup_asof",
    extra=True,
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
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cogrouped-Arrow twin of q_asof_join: same backward as-of
    semantics, implemented as ``cogroup(...).applyInPandas`` with a per-key
    ``pandas.merge_asof`` (functions.udf_surface.cogroup_merge_asof) —
    §2.10's two-sided grouped-map surface, hash-checked against the exact
    same DuckDB ASOF JOIN oracle as the window-based form.
    """
    from ..functions.udf_surface import cogroup_merge_asof

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = cogroup_merge_asof(purchases, clicks, key="user_id")
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("purchase_us"),
        F.round("value", 2).alias("value"),
        F.round("click_value_asof", 2).alias("click_value_asof"),
    )


ATTRIBUTION_ORACLE = """
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN struct_pack(ts := ts, event_id := event_id,
                                              event_type := event_type)
                        END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch
      FROM events
    )
    SELECT event_id AS purchase_id,
           user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN touch.ts >= ts - INTERVAL 30 MINUTE
                THEN touch.event_id END AS touch_id,
           CASE WHEN touch.ts >= ts - INTERVAL 30 MINUTE
                THEN touch.event_type END AS touch_type,
           CASE WHEN touch.ts >= ts - INTERVAL 30 MINUTE
                THEN CAST(date_diff('second', touch.ts, ts) AS BIGINT)
           END AS seconds_since_touch
    FROM seq WHERE event_type = 'purchase'
"""


@query("q_attribution_last_touch", extra=True, oracle=ATTRIBUTION_ORACLE)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to the
    user's most recent NON-purchase event within a 30-minute lookback —
    the marketing-analytics companion of the as-of join, expressed as a
    single ``last(..., ignorenulls)`` carry-forward window (no self-join
    at all). Purchases with no in-window touch keep NULLs — adjudicated,
    not dropped. Total order (ts, event_id) on both engines.

    Scale: ONE user_id window exchange over the events scan; the
    carry-forward frame is streaming-friendly (bounded running state per
    user) — contrast with the naive per-purchase interval self-join,
    which re-shuffles events twice and explodes on hot users.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("ts", "event_id", "event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    seq = ev.withColumn("touch", touch).where(
        F.col("event_type") == "purchase"
    )
    in_window = F.col("touch.ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return seq.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(in_window, F.col("touch.event_id")).alias("touch_id"),
        F.when(in_window, F.col("touch.event_type")).alias("touch_type"),
        F.when(
            in_window,
            (F.unix_timestamp("ts") - F.unix_timestamp("touch.ts")).cast("long"),
        ).alias("seconds_since_touch"),
    )


@query(
    "q_range_bin_join",
    extra=True,
    oracle="""
    WITH w AS (
      SELECT event_id AS window_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + 1800000000 AS e_us
      FROM events
      WHERE event_type = 'purchase'
        AND CAST(ROUND(value * 100) AS BIGINT) >= 10000
    ),
    p AS (
      SELECT event_id, epoch_us(ts) AS t_us
      FROM events WHERE event_type = 'click'
    )
    SELECT window_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
    FROM w JOIN p ON p.t_us >= w.s_us AND p.t_us <= w.e_us
    GROUP BY window_id
    """,
)
def q_range_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range join at scale (operators/joins.py:binned_range_join):
    count clicks inside each >=$100-purchase 30-minute window with NO equi
    key between the sides — the query shape Spark plans as a
    BroadcastNestedLoopJoin (every click × every window) unless rewritten.
    The bin-bucketing rewrite makes the time bin the equi key (windows
    explode into the 1-2 hourly bins they overlap, clicks map to one bin)
    and evaluates the exact containment inside the join; the oracle is
    the plain theta join. tests/test_plan_shapes.py pins the absence of
    any nested-loop/cartesian operator in this plan.

    Scale: candidates per click = windows overlapping its hour, not
    |windows|; shuffle rows are (bin, µs longs). This is the batch twin
    of the stream-stream interval join's state pruning.
    """
    from ..operators.joins import binned_range_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.where(
        (F.col("event_type") == "purchase") & (cents("value") >= 10000)
    ).select(
        F.col("event_id").alias("window_id"),
        epoch_us("ts").alias("s_us"),
        (epoch_us("ts") + 1800000000).alias("e_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", epoch_us("ts").alias("t_us")
    )
    joined = binned_range_join(clicks, windows)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


@query(
    "q_resample_daily_ffill",
    extra=True,
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    daily AS (
      SELECT user_id, day, COUNT(*) AS n_events,
             MAX(CASE WHEN rn = 1 THEN v END) AS day_last_cents
      FROM ranked GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT s.user_id, CAST(g.day AS DATE) AS day
      FROM span s, LATERAL (
        SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      ) g
    )
    SELECT g.user_id,
           strftime(g.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           LAST_VALUE(d.day_last_cents IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_cents
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.day = g.day
    """,
)
def q_resample_daily_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's event stream onto
    a dense DAILY grid (their own first→last day) and forward-fill the
    last observed value across gap days — the gap-filling primitive every
    downstream time-series model needs (training windows can't tolerate
    missing timestamps). Gap days carry n_events=0 and the carried-
    forward cents value; the per-day "last" is made deterministic by the
    (ts, event_id) total order on both engines.

    Scale: the grid derives from per-user (min, max) aggregates and a
    sequence() explode — span×users rows, never a cross join against a
    global calendar; the daily pre-aggregate collapses the fact map-side
    before the grid join, and grid join + forward-fill window share the
    user_id partitioning (one exchange).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents("value").alias("v_cents")
    )
    day = F.col("ts").cast("date")
    wlast = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("day", day)
        .withColumn("rn", F.row_number().over(wlast))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn") == 1, F.col("v_cents"))).alias(
                "day_last_cents"
            ),
        )
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    wff = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("day_last_cents", ignorenulls=True).over(wff).alias("last_cents"),
    )


@query(
    "q_rolling_zscore_anomaly",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents
      FROM events GROUP BY 1, 2
    ),
    winstats AS (
      SELECT user_id, day, day_cents,
             COUNT(*) OVER w AS c,
             SUM(day_cents) OVER w AS s1,
             SUM(day_cents * day_cents) OVER w AS s2
      FROM daily
      WINDOW w AS (
        PARTITION BY user_id ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
      )
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(day_cents AS BIGINT) AS day_cents,
           CAST(c AS BIGINT) AS n_window
    FROM winstats
    WHERE c >= 4
      AND (day_cents * c - s1) * (day_cents * c - s1)
          > 4 * (c * s2 - s1 * s1)
    """,
)
def q_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on per-user daily spend — days
    where |x - μ₇| > 2σ₇ over the trailing 7-day window — with the
    z-test algebraically cleared of ALL floating point: the condition
    |x - S₁/c| > 2·√((c·S₂ - S₁²)/c²) is squared and multiplied through
    into (x·c - S₁)² > 4·(c·S₂ - S₁²), integer cents end to end, so an
    inherently float-looking statistical filter value-hashes exactly.
    (Population variance over the window; warm-up days with c < 4 are
    excluded — both rules replayed by the oracle.)

    Scale: one map-side daily pre-aggregate, then window sums over the
    per-user daily series (≤ span rows per user) sharing the user_id
    exchange — the anomaly filter never sees raw events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"),
        cents("value").alias("v_cents"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.sum("v_cents").alias("day_cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    stats = daily.select(
        "user_id",
        "day",
        "day_cents",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("day_cents").over(w).alias("s1"),
        F.sum(F.col("day_cents") * F.col("day_cents")).over(w).alias("s2"),
    )
    dev = F.col("day_cents") * F.col("c") - F.col("s1")
    return (
        stats.where(
            (F.col("c") >= 4)
            & (dev * dev > 4 * (F.col("c") * F.col("s2") - F.col("s1") * F.col("s1")))
        )
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_cents",
            F.col("c").alias("n_window"),
        )
    )


@query(
    "q_daily_trend_slope",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2
    ),
    centered AS (
      SELECT user_id,
             CAST(day - MIN(day) OVER (PARTITION BY user_id) AS BIGINT) AS x,
             y
      FROM daily
    ),
    s AS (
      SELECT user_id, COUNT(*) AS c,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM centered GROUP BY user_id
    )
    SELECT user_id, CAST(c AS BIGINT) AS n_days,
           CAST(ROUND((c * sxy - sx * sy) * 1000000.0
                      / (c * sxx - sx * sx)) AS BIGINT)
             AS slope_micro_cents_per_day
    FROM s WHERE c >= 2 AND c * sxx - sx * sx > 0
    """,
)
def q_daily_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spend trend: ordinary-least-squares slope of daily spend
    over day index, micro-snapped — the trend-detection member of the
    time-series family (resample → anomaly → trend). Everything before
    the single final division is INTEGER (cents y, per-user-centered
    day x, the c·Σxy − ΣxΣy / c·Σx² − (Σx)² normal-equation form), so an
    inherently "regression" query value-hashes exactly. Degenerate
    series (one day, zero x-variance) are excluded by the same rule on
    both sides.

    Scale: map-side daily pre-aggregate, then one groupBy(user) over
    per-day rows carrying five integer partial sums — the classic
    one-pass distributed regression; no window over raw events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"),
        cents("value").alias("v_cents"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.sum("v_cents").alias("y"))
    wmin = Window.partitionBy("user_id")
    centered = daily.select(
        "user_id",
        F.datediff(F.col("day"), F.min("day").over(wmin)).cast("long").alias("x"),
        "y",
    )
    s = centered.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("c") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("c") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.where((F.col("c") >= 2) & (den > 0))
        .select(
            "user_id",
            F.col("c").alias("n_days"),
            F.round(num * 1000000.0 / den, 0)
            .cast("long")
            .alias("slope_micro_cents_per_day"),
        )
    )


@query(
    "q_daily_backlog",
    extra=True,
    oracle="""
    WITH opens AS (
      SELECT CAST(o.o_orderdate AS DATE) AS day, COUNT(*) AS n_opened
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    ships AS (
      SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_shipped
      FROM lineitem GROUP BY 1
    ),
    spine AS (
      SELECT COALESCE(o.day, s.day) AS day,
             COALESCE(o.n_opened, 0) AS n_opened,
             COALESCE(s.n_shipped, 0) AS n_shipped
      FROM opens o FULL OUTER JOIN ships s ON s.day = o.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_shipped AS BIGINT) AS n_shipped,
           CAST(SUM(n_opened - n_shipped) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS backlog
    FROM spine
    """,
)
def q_daily_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced state reconstruction: the daily open-lineitem
    BACKLOG — each line item enters the backlog at its order date and
    leaves at its ship date; the running difference of the two daily
    streams replays "how many items were open as of day D" for every
    activity day, the burndown/inventory-position query every
    order-management warehouse runs.

    Scale: two map-side-combining daily counts (fact rows collapse to
    date cardinality BEFORE any join), a date-keyed FULL OUTER merge,
    and a cumulative window over the ~date-cardinality spine (the
    psi_drift small-relation exception — thousands of rows regardless
    of fact size). Facts are never windowed or re-shuffled.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("open_day")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_day")
    )
    opens = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("open_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_opened"))
    )
    ships = li.groupBy(F.col("ship_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_shipped")
    )
    # the date-keyed merge as UNION ALL + re-aggregate, not a FULL OUTER
    # join: full outer can never broadcast (both sides must stream), so
    # Catalyst sort-merges two date-cardinality relations — the union
    # form collapses in the same single exchange the daily counts
    # already pay, with no join operator at all
    spine = (
        opens.select("day", "n_opened", F.lit(0).alias("n_shipped"))
        .unionByName(
            ships.select("day", F.lit(0).alias("n_opened"), "n_shipped")
        )
        .groupBy("day")
        .agg(
            F.sum("n_opened").alias("n_opened"),
            F.sum("n_shipped").alias("n_shipped"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return spine.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_opened").cast("long").alias("n_opened"),
        F.col("n_shipped").cast("long").alias("n_shipped"),
        F.sum(F.col("n_opened") - F.col("n_shipped")).over(w).alias("backlog"),
    )


@query(
    "q_autocorr_lag1",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT y,
             LAG(y) OVER (ORDER BY day) AS yprev
      FROM daily
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(y) AS sa, SUM(yprev) AS sb,
             SUM(y * yprev) AS sab,
             SUM(y * y) AS saa, SUM(yprev * yprev) AS sbb
      FROM p WHERE yprev IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(ROUND(
             (n * sab - sa * sb) * 1000000.0
             / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                    * CAST(n * sbb - sb * sb AS DOUBLE))
           ) AS BIGINT) AS acf1_ppm
    FROM s
    """,
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of corpus-wide daily spend — Pearson over
    (yₜ, yₜ₋₁) pairs with all moments in exact integer cents and the one
    composite double (product under the sqrt, final division) in
    identical operand order before the ppm snap — the q_spearman device
    applied to the time axis. Completes the time-series statistics:
    trend (slope), dispersion burst (z-score), persistence (this).

    Scale: daily pre-aggregate (map-side) → lag window over the
    date-spine relation → 1-row moment aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), cents("value").alias("v")
    )
    daily = ev.groupBy("day").agg(F.sum("v").alias("y"))
    w = Window.orderBy("day")
    p = daily.select(
        "y", F.lag("y").over(w).alias("yprev")
    ).where(F.col("yprev").isNotNull())
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sa"),
        F.sum("yprev").alias("sb"),
        F.sum(F.col("y") * F.col("yprev")).alias("sab"),
        F.sum(F.col("y") * F.col("y")).alias("saa"),
        F.sum(F.col("yprev") * F.col("yprev")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    d1 = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    d2 = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(num * 1000000.0 / F.sqrt(d1 * d2), 0)
        .cast("long")
        .alias("acf1_ppm"),
    )


#: Truncated-EWMA weights, alpha = 1/4, horizon K = 14 observed days:
#: w_k = alpha*(1-alpha)^k scaled by 4^14/alpha -> INTEGER 3^k * 4^(13-k).
#: Sum(w) = 263652487 (~2.6e8): with daily spend <= ~1e9 cents the
#: weighted sum stays under ~2.6e17, inside long headroom.
_EWMA_W = [3**k * 4 ** (13 - k) for k in range(14)]

_EWMA_ORACLE = (
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT day, y, """
    + ",\n             ".join(
        "LAG(y, %d) OVER (ORDER BY day) AS l%d" % (k, k) for k in range(1, 14)
    )
    + """
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST((2 * ("""
    + " + ".join(
        ["y * %d" % _EWMA_W[0]]
        + ["COALESCE(l%d, 0) * %d" % (k, _EWMA_W[k]) for k in range(1, 14)]
    )
    + """) + ("""
    + " + ".join(
        ["%d" % _EWMA_W[0]]
        + [
            "(CASE WHEN l%d IS NOT NULL THEN %d ELSE 0 END)" % (k, _EWMA_W[k])
            for k in range(1, 14)
        ]
    )
    + """))
                // (2 * ("""
    + " + ".join(
        ["%d" % _EWMA_W[0]]
        + [
            "(CASE WHEN l%d IS NOT NULL THEN %d ELSE 0 END)" % (k, _EWMA_W[k])
            for k in range(1, 14)
        ]
    )
    + """)) AS BIGINT) AS ewma_cents
    FROM lagged
    """
)


@query("q_ewma_daily", extra=True, oracle=_EWMA_ORACLE)
def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of daily spend —
    the smoothing baseline behind drift monitors and rate limiters.
    alpha = 1/4 over a 14-observed-day horizon makes every weight the
    EXACT INTEGER 3^k * 4^(13-k) (the geometric tail beyond k=13 carries
    < 2% mass and is renormalized away): the EWMA is then a ratio of two
    long sums — weights renormalize over PRESENT lags so the series head
    is exact, not zero-padded — reported in integer cents via the
    half-up device. No float enters.

    Scale: the daily pre-aggregate is a map-side-combining groupBy to a
    date-spine-sized relation (bounded by calendar days, not data), so
    the 14 lag() calls over one global ordered window follow the
    q_autocorr_lag1 precedent; the fixed-K unroll keeps the whole
    smoother in whole-stage codegen — no UDF, no iterative state."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), cents("value").alias("v")
    )
    daily = ev.groupBy("day").agg(F.sum("v").alias("y"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        *[F.lag("y", k).over(w).alias("l%d" % k) for k in range(1, 14)],
    )
    num = F.col("y") * _EWMA_W[0]
    den = F.lit(_EWMA_W[0]).cast("long")
    for k in range(1, 14):
        num = num + F.coalesce(F.col("l%d" % k), F.lit(0)) * _EWMA_W[k]
        den = den + F.when(
            F.col("l%d" % k).isNotNull(), F.lit(_EWMA_W[k])
        ).otherwise(F.lit(0))
    from ..functions.scalar import half_up_units

    return lagged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        half_up_units(num, den, 1).alias("ewma_cents"),
    )


@query(
    "q_event_pattern_match",
    # Promoted to the graded window in round 8: CEP/MATCH_RECOGNIZE is a
    # new operator class with no graded representative (displaces
    # alto_lines).
    oracle="""
    WITH enc AS (
      SELECT user_id, ts, event_id,
             CASE event_type
               WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
               WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
               ELSE 's' END AS ch
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM enc GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
             AS n_conv_paths,
           CAST(len(regexp_extract_all(seq, 'ec')) AS BIGINT)
             AS n_error_retries,
           CAST(len(regexp_extract_all(seq, 'vc*e')) AS BIGINT)
             AS n_abandons
    FROM seqs
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern matching (the MATCH_RECOGNIZE
    capability, regex-over-sequences form): each user's event history is
    collapsed to a character-encoded sequence in strict (ts, event_id)
    total order, then behavioral patterns are counted as non-overlapping
    regex matches — view→clicks→purchase conversion paths (vc*p),
    error-then-click retries (ec), view→clicks→error abandons (vc*e).
    Patterns are deterministic RE2/Java-common constructs (no
    alternation-order or lookaround divergence), and both engines scan
    left-to-right non-overlapping, so the counts are exact.

    Scale: ONE shuffle (groupBy user) carrying (ts, event_id, 1 char);
    the sort is per-user inside the aggregated array (bounded by a
    user's history, the sessionize assumption); the regex pass is
    codegen over the encoded string — no UDF, no self-join, no window.
    Per-session (rather than per-user) sequences bound state further at
    true scale."""
    enc = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .otherwise("s")
        .alias("ch"),
    )
    seqs = enc.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit("vc*p")).cast("long").alias("n_conv_paths"),
        F.regexp_count("seq", F.lit("ec")).cast("long").alias(
            "n_error_retries"
        ),
        F.regexp_count("seq", F.lit("vc*e")).cast("long").alias("n_abandons"),
    )


@query(
    "q_theil_sen_slope",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
      FROM events GROUP BY 1
    ),
    x0 AS (SELECT MIN(day) AS d0 FROM daily),
    xy AS (SELECT CAST(day - d0 AS BIGINT) AS x, y FROM daily, x0),
    p AS (
      SELECT a.x AS xi, b.x AS xj,
             b.y - a.y AS dy, b.x - a.x AS dx
      FROM xy a JOIN xy b ON a.x < b.x
    ),
    sl AS (
      SELECT xi, xj,
             CASE WHEN dy >= 0
                  THEN (2 * dy * 1000000 + dx) // (2 * dx)
                  ELSE -((2 * (-dy) * 1000000 + dx) // (2 * dx))
             END AS slope_ppm
      FROM p
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM sl),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    ranked AS (
      SELECT slope_ppm,
             ROW_NUMBER() OVER (ORDER BY slope_ppm, xi, xj) AS rn
      FROM sl
    )
    SELECT nd.n_days, n.n_pairs, r.slope_ppm AS theil_sen_ppm
    FROM ranked r, n, nd WHERE r.rn = (n.n_pairs + 1) // 2
    """,
)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of corpus-wide daily spend: the MEDIAN of
    all pairwise day-over-day slopes — the outlier-immune twin of
    q_daily_trend_slope's OLS (one wild day corrupts the OLS slope but
    moves the pairwise-slope median by at most one order statistic).
    Each pair slope is an exact signed half-up ppm long
    ((y_j−y_i)·1e6 / (x_j−x_i), cents over day index, |dy|·2e6 ≪ 2^63),
    and the median is the ⌈n/2⌉-th smallest VALUE — deterministic under
    ties regardless of tie order; the (xi, xj) tiebreaker only pins
    WHICH row reports it.

    Scale: the pair relation is (days choose 2) — it grows with the
    TIME RANGE, never the corpus, but a decade is still ~6.6M pairs, so
    the median uses the dense-ids device (range-repartition + offset
    ranks, operators/ids.py) instead of a single-partition global
    window; the day aggregate itself is one map-side-combined groupBy.
    """
    from ..operators.ids import assign_dense_ids

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), cents("value").alias("v")
    )
    daily = ev.groupBy("day").agg(F.sum("v").alias("y"))
    mn = daily.agg(F.min("day").alias("d0"))
    xy = daily.crossJoin(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("long").alias("x"), "y"
    )
    a = xy.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = xy.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    p = a.join(F.broadcast(b), F.col("xi") < F.col("xj")).select(
        "xi",
        "xj",
        (F.col("yj") - F.col("yi")).alias("dy"),
        (F.col("xj") - F.col("xi")).alias("dx"),
    )
    d = F.call_function
    mag = d(
        "div",
        F.lit(2) * F.abs(F.col("dy")) * 1_000_000 + F.col("dx"),
        F.lit(2) * F.col("dx"),
    )
    sl = p.select(
        "xi",
        "xj",
        F.when(F.col("dy") >= 0, mag).otherwise(-mag).alias("slope_ppm"),
    )
    ranked = assign_dense_ids(sl, ["slope_ppm", "xi", "xj"], "rn")
    counts = sl.agg(
        F.count(F.lit(1)).alias("n_pairs"),
    ).crossJoin(F.broadcast(daily.agg(F.count(F.lit(1)).alias("n_days"))))
    return (
        ranked.crossJoin(F.broadcast(counts))
        .where(
            F.col("rn")
            == d("div", F.col("n_pairs") + 1, F.lit(2)) - 1
        )
        .select("n_days", "n_pairs", F.col("slope_ppm").alias("theil_sen_ppm"))
    )


@query(
    "q_holt_linear_trend",
    extra=True,  # rotated out round 9 (grouped-recurrence shape stays via extra tier)
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS grp,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT grp, day, y,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day) AS rn
      FROM daily
    ),
    rec AS (
      SELECT grp, day, rn, y, y AS l, CAST(0 AS BIGINT) AS b
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.grp, s.day, s.rn, s.y,
             CAST(FLOOR((s.y + r.l + r.b + 1) / 2.0) AS BIGINT) AS l,
             CAST(FLOOR((r.b
                         + (CAST(FLOOR((s.y + r.l + r.b + 1) / 2.0)
                                 AS BIGINT) - r.l)
                         + 1) / 2.0) AS BIGINT) AS b
      FROM rec r
      JOIN seq s ON s.grp = r.grp AND s.rn = r.rn + 1
    )
    SELECT grp, day, y AS y_cents, l AS level_cents, b AS trend_cents,
           l + b AS forecast_cents
    FROM rec
    """,
)
def q_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of daily spend per event_type —
    the grouped-recurrence operator class (operators/smoothing.py):
    level+trend feedback has NO finite window unroll (unlike
    q_ewma_daily's truncatable tail), so the Spark shape is ONE key
    shuffle into an Arrow grouped pass, each bounded per-key series
    smoothed sequentially. All state is integer cents with
    floor((x+1)/2) half-steps, so the recursive-CTE oracle replays the
    recurrence hash-exact — an applyInPandas STATEFUL op holding a full
    value oracle.

    Scale: key cardinality carries the parallelism (millions of series,
    one Arrow batch each); the per-series loop is calendar-bounded. The
    daily pre-aggregate is a map-side-combining groupBy."""
    from ..operators.smoothing import holt_linear

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        cents("value").alias("v"),
    )
    daily = ev.groupBy("grp", "day").agg(F.sum("v").alias("y_cents"))
    return holt_linear(daily)


@query(
    "q_weekday_seasonality",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    wd AS (SELECT *, dayofweek(day) + 1 AS dow FROM daily),
    season AS (
      SELECT event_type, dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST((2 * SUM(y) + COUNT(*)) // (2 * COUNT(*))
                  AS BIGINT) AS mean_cents
      FROM wd GROUP BY event_type, dow
    ),
    resid AS (
      SELECT w.event_type, w.dow, w.y - s.mean_cents AS r
      FROM wd w JOIN season s
        ON s.event_type = w.event_type AND s.dow = w.dow
    ),
    spread AS (
      SELECT event_type, dow,
             CAST(MAX(ABS(r)) AS BIGINT) AS max_abs_resid
      FROM resid GROUP BY event_type, dow
    )
    SELECT s.event_type, s.dow, s.n_days, s.mean_cents, p.max_abs_resid
    FROM season s JOIN spread p
      ON p.event_type = s.event_type AND p.dow = s.dow
    """,
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily spend per event_type:
    the seasonal component is the per-(type, weekday) mean (half-up
    integer cents via the floor((2s+n)/2n) device), and the residual
    spread (max |observed - seasonal|) is the anomaly headroom that
    calibrates alert thresholds — the additive-seasonality baseline
    behind every 'is Tuesday unusually low?' monitor, and the seasonal
    complement of q_rolling_zscore_anomaly's trend-local z-test.

    Scale: two map-side-combining groupBys (daily pre-agg, then the
    42-row seasonal matrix) + one broadcast-sized join back — no
    window, no data-sized state. Spark's dayofweek is 1-based
    (Sunday = 1) while DuckDB's is 0-based — the oracle shifts by +1."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents("value").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("y"))
    )
    wd = daily.withColumn("dow", F.dayofweek("day").cast("long"))
    season = wd.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.call_function(
            "div",
            2 * F.sum("y") + F.count(F.lit(1)),
            2 * F.count(F.lit(1)),
        ).alias("mean_cents"),
    )
    resid = wd.join(F.broadcast(season), ["event_type", "dow"]).select(
        "event_type",
        "dow",
        (F.col("y") - F.col("mean_cents")).alias("r"),
    )
    spread = resid.groupBy("event_type", "dow").agg(
        F.max(F.abs(F.col("r"))).alias("max_abs_resid")
    )
    return season.join(spread, ["event_type", "dow"]).select(
        "event_type", "dow", "n_days", "mean_cents", "max_abs_resid"
    )


@query(
    "q_rfm_segments",
    extra=True,
    oracle="""
    WITH ua AS (
      SELECT user_id,
             MAX(CAST(ts AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
    base AS (
      SELECT user_id, f, m,
             CAST(date_diff('day', last_day, max_day) AS BIGINT) AS rec
      FROM ua CROSS JOIN mx
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    ranked AS (
      SELECT user_id, f, m, rec,
             ROW_NUMBER() OVER (ORDER BY rec DESC, user_id) - 1 AS rr,
             ROW_NUMBER() OVER (ORDER BY f, user_id) - 1 AS fr,
             ROW_NUMBER() OVER (ORDER BY m, user_id) - 1 AS mr
      FROM base
    )
    SELECT user_id,
           CAST(1 + (rr * 5) // n AS BIGINT) AS r_score,
           CAST(1 + (fr * 5) // n AS BIGINT) AS f_score,
           CAST(1 + (mr * 5) // n AS BIGINT) AS m_score,
           CAST(1 + (rr * 5) // n AS VARCHAR)
             || CAST(1 + (fr * 5) // n AS VARCHAR)
             || CAST(1 + (mr * 5) // n AS VARCHAR) AS segment
    FROM ranked CROSS JOIN nn
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — per-user Recency/Frequency/Monetary
    quintile scores (5 = best) and the concatenated segment code, the
    marketing-analytics staple. Each metric's equi-depth quintile comes
    from the dense-ids rank device (operators/ids.py: range-repartition
    + per-partition offsets — NEVER a single-partition global window),
    rank ordered so higher = better with user_id tiebreaks; score =
    1 + rank*5 div n. The oracle is the textbook ROW_NUMBER form, so
    the scale-shaped plan is pinned to the plain definition.

    Scale: one map-side-combining per-user aggregate, then three rank
    passes over the USER-GRAIN relation (each a range exchange of three
    longs per user); the 1-row n/max-day relations broadcast."""
    from ..operators.ids import assign_dense_ids

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        cents("value").alias("v"),
    )
    ua = ev.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("f"),
        F.sum("v").alias("m"),
    )
    mx = ev.agg(F.max("day").alias("max_day"))
    base = ua.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "f",
        "m",
        F.datediff("max_day", "last_day").cast("long").alias("rec"),
        (-F.datediff("max_day", "last_day").cast("long")).alias("neg_rec"),
    )
    n = base.agg(F.count(F.lit(1)).alias("n"))
    r1 = assign_dense_ids(base, ["neg_rec", "user_id"], "rr")
    r2 = assign_dense_ids(
        r1.drop("neg_rec"), ["f", "user_id"], "fr"
    )
    r3 = assign_dense_ids(r2, ["m", "user_id"], "mr")
    out = r3.crossJoin(F.broadcast(n))
    score = lambda c: (1 + F.expr(f"{c} * 5 DIV n")).cast("long")  # noqa: E731
    return out.select(
        "user_id",
        score("rr").alias("r_score"),
        score("fr").alias("f_score"),
        score("mr").alias("m_score"),
        F.concat(
            score("rr").cast("string"),
            score("fr").cast("string"),
            score("mr").cast("string"),
        ).alias("segment"),
    )


@query(
    "q_cusum_changepoint",
    # promoted r14: changepoint detection, never graded (ROTATION.md)
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(SUM(y) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
    ),
    cum AS (
      SELECT d.event_type, d.day, t.n, t.s,
             CAST(SUM(d.y) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
             ROW_NUMBER() OVER (
               PARTITION BY d.event_type ORDER BY d.day) AS t
      FROM daily d JOIN tot t ON t.event_type = d.event_type
    )
    SELECT event_type, day AS cp_day,
           ABS(n * c - t * s) AS peak_abs_scaled, n AS n_days
    FROM cum
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type
        ORDER BY ABS(n * c - t * s) DESC, day) = 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimation per event_type: the day maximizing
    the absolute cumulative deviation of daily spend from the series
    mean — the classic level-shift locator. Determinism device: instead
    of the fractional mean, everything is SCALED BY n: cusum_t of
    (y - S/n) times n equals n*C_t - t*S, exact long arithmetic end to
    end (|n*C| < 2^40 at sf0.1), so the argmax and its peak value are
    hash-exact with a (|dev|, day) total order.

    Scale: daily pre-agg (map-side), per-type totals joined back
    broadcast, ONE event_type window carries both the running sum and
    the argmax — calendar-bounded state, millions of series
    parallelize on the partition key."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            cents("value").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("y"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n",
        "s",
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        F.row_number().over(w).alias("t"),
    )
    dev = F.abs(F.col("n") * F.col("c") - F.col("t") * F.col("s"))
    pick = Window.partitionBy("event_type").orderBy(
        dev.desc(), F.asc("day")
    )
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            dev.alias("peak_abs_scaled"),
            F.col("n").alias("n_days"),
        )
    )


@query(
    "q_autocorrelation",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
    spine AS (
      SELECT t.event_type, CAST(g.d AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM daily) t,
           (SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d
            FROM bounds) g
    ),
    dense AS (
      SELECT s.event_type, s.day,
             CAST(COALESCE(d.c, 0) AS BIGINT) AS x
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
    ),
    st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s
      FROM dense GROUP BY 1
    ),
    dev AS (
      SELECT d.event_type, d.day,
             CAST(st.n * d.x - st.s AS BIGINT) AS dv
      FROM dense d JOIN st ON st.event_type = d.event_type
    ),
    lags AS (SELECT range AS lag FROM range(1, 8)),
    num AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(a.dv * b.dv) AS BIGINT) AS acf_num
      FROM dev a
      CROSS JOIN lags l
      JOIN dev b ON b.event_type = a.event_type
                AND b.day = a.day + CAST(l.lag AS INT)
      GROUP BY 1, 2
    ),
    den AS (
      SELECT event_type, CAST(SUM(dv * dv) AS BIGINT) AS acf_den
      FROM dev GROUP BY 1
    )
    SELECT n.event_type, CAST(n.lag AS INT) AS lag, n.acf_num, d.acf_den
    FROM num n JOIN den d ON d.event_type = n.event_type
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the per-type daily event-count series at
    lags 1..7 — the time-series diagnostic the smoothing family
    (Holt/seasonality/CUSUM) reads its periodicity from. DIVISION-FREE
    exactness like the ALS Cramer outputs: deviations are pre-scaled by
    n (dv = n*x - S is an integer), so ACF_k = acf_num/acf_den
    reconstructs the float value losslessly and the whole relation
    hash-matches with no snapping device.

    Scale: one map-side-combined daily rollup (the only row-scale agg);
    the dense calendar spine, deviations, lag self-join (day+k equality)
    and sums all run on the #types x #days relation — bounded by the
    calendar, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    bounds = daily.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("dmin", "dmax", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    dense = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    st = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = dense.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("dv"),
    ).localCheckpoint()  # feeds the lag join (both sides) and the denominator
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = dev.select("event_type", "day", F.col("dv").alias("dva"))
    b = dev.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("dv").alias("dvb"),
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b.hint("shuffle_hash"),
            (F.col("et2") == F.col("event_type"))
            & (F.col("day2") == F.date_add("day", F.col("lag"))),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("dva") * F.col("dvb")).cast("long").alias("acf_num"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("dv") * F.col("dv")).cast("long").alias("acf_den")
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type", "lag", "acf_num", "acf_den"
    )


@query(
    "q_holt_winters_seasonal",
    extra=True,  # rotated out r12 (graded r10-r11; temporal family keeps 5 graded members)
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS grp,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT grp, day, y,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day) AS rn
      FROM daily
    ),
    rec AS (
      SELECT grp, day, rn, y,
             y AS l, CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS sp,
             [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS sl
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT q.grp, q.day, q.rn, q.y,
             CAST(FLOOR((q.y - r.sl[1] + r.l + 1) / 2.0) AS BIGINT) AS l,
             CAST(FLOOR((q.y
                         - CAST(FLOOR((q.y - r.sl[1] + r.l + 1) / 2.0)
                                AS BIGINT)
                         + r.sl[1] + 1) / 2.0) AS BIGINT) AS s,
             r.sl[1] AS sp,
             list_append(
               r.sl[2:7],
               CAST(FLOOR((q.y
                           - CAST(FLOOR((q.y - r.sl[1] + r.l + 1) / 2.0)
                                  AS BIGINT)
                           + r.sl[1] + 1) / 2.0) AS BIGINT)) AS sl
      FROM rec r JOIN seq q ON q.grp = r.grp AND q.rn = r.rn + 1
    )
    SELECT grp, day, y AS y_cents, l AS level_cents, s AS season_cents,
           l + sp AS fitted_cents
    FROM rec
    """,
)
def q_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + weekly seasonal, alpha = gamma =
    1/2) of daily spend per event_type — the grouped-recurrence family's
    VECTOR-STATE member (operators/smoothing.py:holt_winters_add):
    unlike holt_linear's two scalars, the state is a 7-slot seasonal
    ring buffer, which the recursive-CTE oracle carries as a LIST column
    (sl[1] is s_{t-7}; each step shifts and appends). Where
    q_weekday_seasonality fits STATIC per-weekday means, this one tracks
    a drifting level and adapting seasonals — the forecasting twin.

    Scale: the daily pre-aggregate is a map-side-combining groupBy; the
    recurrence is ONE key shuffle into an Arrow grouped pass, per-series
    loops calendar-bounded, parallelism = series cardinality."""
    from ..operators.smoothing import holt_winters_add

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        cents("value").alias("v"),
    )
    daily = ev.groupBy("grp", "day").agg(F.sum("v").alias("y_cents"))
    return holt_winters_add(daily, period=7)


@query(
    "q_seasonal_decompose",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT event_type AS grp, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
    spine AS (
      SELECT t.grp, CAST(g.d AS DATE) AS day
      FROM (SELECT DISTINCT grp FROM daily) t,
           (SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d
            FROM bounds) g
    ),
    dense AS (
      SELECT s.grp, s.day, CAST(COALESCE(d.y, 0) AS BIGINT) AS y
      FROM spine s LEFT JOIN daily d ON d.grp = s.grp AND d.day = s.day
    ),
    offs AS (SELECT range AS off FROM range(-3, 4)),
    win AS (
      SELECT a.grp, a.day, a.y, COUNT(*) AS n_in_win,
             CAST(SUM(b.y) AS BIGINT) AS trend_psum
      FROM dense a CROSS JOIN offs o
      JOIN dense b ON b.grp = a.grp AND b.day = a.day + CAST(o.off AS INT)
      GROUP BY 1, 2, 3 HAVING COUNT(*) = 7
    ),
    det AS (
      SELECT grp, day, y, trend_psum,
             CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS INT)
               AS weekday,
             CAST(7 * y - trend_psum AS BIGINT) AS dtr
      FROM win
    ),
    seas AS (
      SELECT grp, weekday, CAST(SUM(dtr) AS BIGINT) AS seas_num,
             CAST(COUNT(*) AS BIGINT) AS seas_n
      FROM det GROUP BY 1, 2
    )
    SELECT d.grp, strftime(d.day, '%Y-%m-%d') AS day, d.y, d.trend_psum,
           d.weekday, s.seas_num, s.seas_n,
           CAST(d.dtr * s.seas_n - s.seas_num AS BIGINT) AS resid_scaled
    FROM det d JOIN seas s ON s.grp = d.grp AND s.weekday = d.weekday
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the per-type daily
    revenue series (operators/smoothing.py:classical_decompose): centered
    7-day moving sum as trend, per-weekday detrended means as the weekly
    seasonal, the rest residual — division-free integer outputs
    (trend_psum = 7·trend, seas_num/(7·seas_n) = seasonal,
    resid_scaled = 7·seas_n·residual) so the whole relation hash-matches
    with no snapping device, exactly like q_autocorrelation. The planted
    linear+seasonal exactness gate (resid_scaled ≡ 0) lives in
    tests/test_temporal.py.

    Scale: one map-side-combined daily rollup is the only row-scale
    shuffle; spine, offset join and weekday agg are calendar-bounded.
    """
    from ..operators.smoothing import classical_decompose

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("grp"), F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    return classical_decompose(daily, period=7)


@query(
    "q_kaplan_meier",
    # graded since round 13: the survival-analysis family's representative
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    er AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'error' AND e.ts > su.t0
      GROUP BY 1
    ),
    mx AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
    subj AS (
      SELECT su.user_id,
             CAST(date_diff('day', CAST(su.t0 AS DATE),
                  COALESCE(CAST(er.td AS DATE), mx.dmax)) AS INT)
               AS duration,
             er.td IS NOT NULL AS died
      FROM su LEFT JOIN er ON er.user_id = su.user_id CROSS JOIN mx
    ),
    times AS (
      SELECT duration AS t, CAST(COUNT(*) AS BIGINT) AS d
      FROM subj WHERE died GROUP BY 1
    ),
    km AS (
      SELECT tm.t, tm.d, CAST(COUNT(*) AS BIGINT) AS n_at_risk
      FROM times tm JOIN subj s ON s.duration >= tm.t
      GROUP BY 1, 2
    ),
    terms AS (
      SELECT t, d, n_at_risk,
             CASE WHEN d < n_at_risk THEN
               CAST(ROUND(ln((n_at_risk - d)
                    / CAST(n_at_risk AS DOUBLE)) * 1000000) AS BIGINT)
             ELSE NULL END AS term_micro,
             CAST(d >= n_at_risk AS INT) AS hit_zero
      FROM km
    )
    SELECT a.t AS t_day, a.d, a.n_at_risk, a.term_micro,
           CASE WHEN MAX(b.hit_zero) = 1 THEN NULL
                ELSE CAST(SUM(b.term_micro) AS BIGINT) END
             AS log_surv_micro
    FROM terms a JOIN terms b ON b.t <= a.t
    GROUP BY a.t, a.d, a.n_at_risk, a.term_micro
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival estimator — the censoring-aware member of
    the temporal family (retention/cohort count completed spells only;
    KM uses every subject up to its censor time): subjects are signup
    users, the event is their first subsequent 'error', censoring at the
    observation end (global max date). Emits the KM table per event time
    (d deaths, n at risk) plus the curve as a CUMULATIVE LOG —
    log S(t) = Σ ln(1 - d_i/n_i) with each term micro-snapped (ln of a
    rational, measure-zero boundary; the summed ints then match exactly)
    and NULL once survival hits exactly zero (d = n strips the log), so
    the relation is hash-adjudicable with no float product anywhere.

    Scale: three row-scale aggs (first signup, first error, max date);
    everything after lives on the #subjects and #distinct-duration
    relations — the at-risk range join is times (calendar-bounded,
    broadcast) x subjects, and the cumulative self-join is
    calendar x calendar. The greenwood-variance extension rides the
    same d/n columns.
    """
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    er = (
        ev.where(F.col("event_type") == "error")
        .join(su.select("user_id", "t0"), "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    mx = ev.agg(F.max(F.to_date("ts")).alias("dmax"))
    subj = (
        su.join(er, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(
                F.coalesce(F.to_date("td"), F.col("dmax")), F.to_date("t0")
            )
            .cast("int")
            .alias("duration"),
            F.col("td").isNotNull().alias("died"),
        )
        .localCheckpoint()  # times agg + the at-risk range join
    )
    times = (
        subj.where("died")
        .groupBy(F.col("duration").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    km = (
        times.hint("broadcast")
        .join(subj, subj["duration"] >= times["t"])
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_at_risk"))
    )
    terms = km.select(
        "t",
        "d",
        "n_at_risk",
        F.when(
            F.col("d") < F.col("n_at_risk"),
            F.round(
                F.log(
                    (F.col("n_at_risk") - F.col("d"))
                    / F.col("n_at_risk").cast("double")
                )
                * 1_000_000
            ).cast("long"),
        ).alias("term_micro"),
        (F.col("d") >= F.col("n_at_risk")).cast("int").alias("hit_zero"),
    ).localCheckpoint()  # both sides of the cumulative self-join
    b = terms.select(
        F.col("t").alias("t2"),
        F.col("term_micro").alias("tm2"),
        F.col("hit_zero").alias("hz2"),
    )
    return (
        terms.join(F.broadcast(b), F.col("t2") <= F.col("t"))
        .groupBy("t", "d", "n_at_risk", "term_micro")
        .agg(
            F.when(F.max("hz2") == 1, F.lit(None).cast("long"))
            .otherwise(F.sum("tm2").cast("long"))
            .alias("log_surv_micro"),
        )
        .select(
            F.col("t").alias("t_day"), "d", "n_at_risk", "term_micro",
            "log_surv_micro",
        )
    )


@query(
    "q_shapley_attribution",
    # graded r9-r10; rotated to the extra tier in round 11 (attribution
    # family stays graded via q_markov_attribution + newly promoted
    # q_uplift_segments)
    extra=True,
    oracle="""
    WITH fp AS (
      SELECT user_id, MIN(ts) AS tp FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    touch AS (
      SELECT fp.user_id,
             CAST(COALESCE(bit_or(CASE e.event_type
               WHEN 'click' THEN 1 WHEN 'view' THEN 2
               WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END), 0) AS BIGINT)
               AS mask
      FROM fp LEFT JOIN events e
        ON e.user_id = fp.user_id AND e.ts < fp.tp
       AND e.event_type IN ('click', 'view', 'signup', 'error')
      GROUP BY 1
    ),
    mcnt AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM touch GROUP BY 1
    ),
    subsets AS (SELECT range AS s FROM range(0, 16)),
    v AS (
      SELECT s.s, CAST(COALESCE(SUM(m.cnt), 0) AS BIGINT) AS v
      FROM subsets s LEFT JOIN mcnt m ON (m.mask & s.s) = m.mask
      GROUP BY 1
    ),
    chan(channel, bit) AS (VALUES
      ('click', 1), ('view', 2), ('signup', 4), ('error', 8)
    ),
    contrib AS (
      SELECT c.channel,
             CAST(SUM(
               (CASE bit_count(s.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                     WHEN 2 THEN 2 ELSE 6 END)
               * (vw.v - vo.v)) AS BIGINT) AS phi24
      FROM chan c
      JOIN subsets s ON (s.s & c.bit) = 0
      JOIN v vo ON vo.s = s.s
      JOIN v vw ON vw.s = (s.s | c.bit)
      GROUP BY 1
    )
    SELECT co.channel, co.phi24,
           (SELECT v FROM v WHERE s = 15) AS v_full,
           (SELECT v FROM v WHERE s = 0) AS v_empty,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM fp) AS n_converted
    FROM contrib co
    """,
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over channel coalitions — the
    game-theoretic member of the attribution family (first/last-touch
    and position-decay split credit by rule; Shapley splits it by
    marginal contribution averaged over ALL 4! orderings): the coalition
    value v(S) counts converters whose pre-purchase touchset fits inside
    S, and φ_c = Σ_S |S|!(3-|S|)!/4!·[v(S∪c) − v(S)]. Everything is
    INTEGER: φ·24 is a weighted sum of count differences (weights
    6/2/2/6), so the relation hash-matches with no device, and the
    efficiency axiom Σφ24 = 24·(v_full − v_empty) is pytest-pinned.

    Scale: two row-scale aggs (first purchase, per-user touch bitmask);
    v(S) is a 16-row subset-sum over the 16-row mask histogram; the
    Shapley sum is 4 channels x 8 subsets — all broadcast. The 2^k
    lattice caps k at word width by design; for k beyond ~20 channels
    the estimator switches to permutation sampling (q_bootstrap_poisson
    shows the resampling shape).
    """
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
    )
    ch = ev.where(
        F.col("event_type").isin("click", "view", "signup", "error")
    ).select(F.col("user_id").alias("cu"), "ts", bit.alias("bit"))
    # the ts < tp predicate must live IN the join clause: a post-join
    # filter would drop converters whose channel events are all
    # post-purchase instead of keeping them with an empty mask.
    touch = (
        fp.join(
            ch, (F.col("cu") == F.col("user_id")) & (F.col("ts") < F.col("tp")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.bit_or("bit"), F.lit(0)).cast("long").alias("mask")
        )
    )
    mcnt = touch.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    spark_ = ev.sparkSession
    subsets = spark_.range(0, 16).select(F.col("id").alias("s"))
    v = (
        subsets.crossJoin(F.broadcast(mcnt))
        .where(F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"))
        .groupBy("s")
        .agg(F.sum("cnt").cast("long").alias("v"))
        .unionByName(  # subsets containing NO observed mask still need v=0
            subsets.join(
                F.broadcast(mcnt.select(F.lit(0).alias("z"))).limit(0),
                F.lit(False), "left",
            ).select("s", F.lit(0).cast("long").alias("v"))
        )
        .groupBy("s")
        .agg(F.max("v").alias("v"))
        .localCheckpoint()  # joined twice by the Shapley sum
    )
    chan = spark_.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4), ("error", 8)],
        "channel string, bit long",
    )
    w = (
        F.when(F.bit_count(F.col("s")) == 0, 6)
        .when(F.bit_count(F.col("s")) == 1, 2)
        .when(F.bit_count(F.col("s")) == 2, 2)
        .otherwise(6)
    )
    vo = v.select(F.col("s").alias("so"), F.col("v").alias("v_out"))
    vw = v.select(F.col("s").alias("sw"), F.col("v").alias("v_in"))
    contrib = (
        chan.crossJoin(F.broadcast(subsets))
        .where(F.col("s").bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(vo), F.col("so") == F.col("s"))
        .join(
            F.broadcast(vw),
            F.col("sw") == F.col("s").bitwiseOR(F.col("bit")),
        )
        .groupBy("channel")
        .agg(
            F.sum(w * (F.col("v_in") - F.col("v_out")))
            .cast("long")
            .alias("phi24")
        )
    )
    scalars = (
        v.where(F.col("s") == 15)
        .select(F.col("v").alias("v_full"))
        .crossJoin(v.where(F.col("s") == 0).select(F.col("v").alias("v_empty")))
        .crossJoin(fp.agg(F.count(F.lit(1)).cast("long").alias("n_converted")))
    )
    return contrib.crossJoin(F.broadcast(scalars))


@query(
    "q_frequent_sequences",
    extra=True,
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM events
    ),
    ev AS (SELECT user_id, event_type, ts FROM ranked WHERE rn <= 6),
    types AS (SELECT DISTINCT event_type AS t FROM ev),
    pats AS (
      SELECT a.t AS a, b.t AS b, c.t AS c
      FROM types a JOIN types b ON b.t <> a.t
      JOIN types c ON c.t <> a.t AND c.t <> b.t
    ),
    t1 AS (
      SELECT user_id, event_type AS a, MIN(ts) AS ts1
      FROM ev GROUP BY 1, 2
    ),
    t2 AS (
      SELECT t1.user_id, t1.a, e.event_type AS b, MIN(e.ts) AS ts2
      FROM t1 JOIN ev e
        ON e.user_id = t1.user_id AND e.ts > t1.ts1
       AND e.event_type <> t1.a
      GROUP BY 1, 2, 3
    ),
    t3 AS (
      SELECT t2.user_id, t2.a, t2.b, e.event_type AS c
      FROM t2 JOIN ev e
        ON e.user_id = t2.user_id AND e.ts > t2.ts2
       AND e.event_type <> t2.a AND e.event_type <> t2.b
      GROUP BY 1, 2, 3, 4
    ),
    sup AS (
      SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support
      FROM t3 GROUP BY 1, 2, 3
    )
    SELECT p.a, p.b, p.c, CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev)
             AS n_users
    FROM pats p LEFT JOIN sup s
      ON s.a = p.a AND s.b = p.b AND s.c = p.c
    """,
)
def q_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GSP-style frequent SUBSEQUENCE support — the ordered member of the
    frequent-pattern family (q_frequent_triples counts unordered
    co-occurrence; this counts a-THEN-b-THEN-c): for each of the 60
    ordered distinct-type triples, how many users exhibit the pattern as
    a temporal subsequence. The containment test is the GREEDY
    EARLIEST-OCCURRENCE chain (t1 = first a, t2 = first b after t1,
    t3 = first c after t2), which decides subsequence existence exactly
    — the classic two-pointer argument, pinned by a hand-built pytest
    fixture where the greedy must look PAST a too-early b.

    All counts integer; zero-support patterns emitted via the pattern
    lattice left join (the driver's hash sees the full 60-row lattice).

    Scale: every join is user-keyed with per-user fan-out bounded by
    that user's event count x 5 types (the item-CF bound); supports are
    one map-side-combined groupBy on 60 keys. The pattern lattice
    (|types|P3) broadcasts; longer patterns extend the same chain one
    greedy level per element.
    """
    # each user's first 6 events only: over the full stream every user
    # exhibits every ordering (support degenerates to n_users); the
    # session HEAD is where order genuinely differs — and it is the
    # honest GSP input (a user-keyed window, never global).
    w6 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", "event_type", "ts",
            F.row_number().over(w6).alias("rn"),
        )
        .where(F.col("rn") <= 6)
        .drop("rn")
        .localCheckpoint()  # t1/t2/t3 chain + n_users all read it
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    ta = types.select(F.col("t").alias("a"))
    tb = types.select(F.col("t").alias("b"))
    tc = types.select(F.col("t").alias("c"))
    pats = (
        ta.crossJoin(tb)
        .where(F.col("b") != F.col("a"))
        .crossJoin(tc)
        .where((F.col("c") != F.col("a")) & (F.col("c") != F.col("b")))
    )
    t1 = ev.groupBy("user_id", F.col("event_type").alias("a")).agg(
        F.min("ts").alias("ts1")
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("b"),
        F.col("ts").alias("tsb"),
    )
    t2 = (
        t1.join(
            e2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("tsb") > F.col("ts1"))
            & (F.col("b") != F.col("a")),
        )
        .groupBy("user_id", "a", "b")
        .agg(F.min("tsb").alias("ts2"))
    )
    e3 = ev.select(
        F.col("user_id").alias("u3"), F.col("event_type").alias("c"),
        F.col("ts").alias("tsc"),
    )
    t3 = (
        t2.join(
            e3,
            (F.col("u3") == F.col("user_id"))
            & (F.col("tsc") > F.col("ts2"))
            & (F.col("c") != F.col("a"))
            & (F.col("c") != F.col("b")),
        )
        .select("user_id", "a", "b", "c")
        .distinct()
    )
    sup = t3.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    n_users = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return (
        pats.join(F.broadcast(sup), ["a", "b", "c"], "left")
        .crossJoin(F.broadcast(n_users))
        .select(
            "a", "b", "c",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            "n_users",
        )
    )


@query(
    "q_borda_fusion",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, event_type,
             ROW_NUMBER() OVER (PARTITION BY day
               ORDER BY y DESC, event_type) AS rk,
             COUNT(*) OVER (PARTITION BY day) AS k
      FROM daily
    )
    SELECT event_type,
           CAST(SUM(k - rk) AS BIGINT) AS borda_score,
           CAST(COUNT(*) AS BIGINT) AS n_ballots,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_firsts
    FROM ranked GROUP BY 1
    """,
)
def q_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BORDA-count rank aggregation — the rank-FUSION member of the
    ranking family (windows rank WITHIN one ballot; this aggregates
    ACROSS ballots, the device LLM judge ensembles and metasearch use):
    each day ranks the event types by revenue (a ballot, ties broken by
    name for determinism), a rank r among k candidates scores k − r
    points, and scores sum across days. All integer; n_firsts
    (plurality count) rides along so Borda-vs-plurality disagreement is
    visible in the relation itself.

    Scale: the daily rollup is the only row-scale shuffle; ballots are
    calendar x |types| rows, ranked by a day-keyed window (bounded
    partitions, never global)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    w = Window.partitionBy("day").orderBy(F.desc("y"), "event_type")
    ranked = daily.select(
        "day",
        "event_type",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("day")).alias("k"),
    )
    return ranked.groupBy("event_type").agg(
        F.sum(F.col("k") - F.col("rk")).cast("long").alias("borda_score"),
        F.count(F.lit(1)).cast("long").alias("n_ballots"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_firsts"),
    )


def _bt_oracle(rounds: int = 3) -> str:
    """Unrolled DuckDB replay of operators/preference.bradley_terry_nano
    over the daily event-type contests: per round one snapped pair-sum
    CTE and one snapped update CTE (the pagerank unroll discipline)."""
    head = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    cmp AS (
      SELECT x.event_type AS a, y.event_type AS b,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily x JOIN daily y
        ON y.day = x.day AND y.event_type <> x.event_type
      WHERE x.y > y.y GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT a, b, CAST(SUM(n) AS BIGINT) AS n_tot FROM (
        SELECT a, b, n FROM cmp
        UNION ALL SELECT b AS a, a AS b, n FROM cmp
      ) GROUP BY 1, 2
    ),
    wins AS (
      SELECT a AS item, CAST(SUM(n) AS BIGINT) AS wins FROM cmp GROUP BY 1
    ),
    base AS MATERIALIZED (
      SELECT i.item, CAST(COALESCE(w.wins, 0) AS BIGINT) AS wins
      FROM (SELECT DISTINCT a AS item FROM sym) i
      LEFT JOIN wins w ON w.item = i.item
    ),
    pi0 AS MATERIALIZED (
      SELECT item, CAST(1000000000 AS BIGINT) AS pi FROM base
    )"""
    rnd = """,
    s{R} AS MATERIALIZED (
      SELECT s.a,
             CAST(SUM(CAST(FLOOR((2 * s.n_tot * 1000000000000
                  + (pa.pi + pb.pi)) / (2.0 * (pa.pi + pb.pi)))
                  AS BIGINT)) AS BIGINT) AS ssum
      FROM sym s
      JOIN pi{P} pa ON pa.item = s.a
      JOIN pi{P} pb ON pb.item = s.b
      GROUP BY 1
    ),
    pi{R} AS MATERIALIZED (
      SELECT b.item,
             CAST(FLOOR((2 * b.wins * 1000000000000 + t.ssum)
                  / (2.0 * t.ssum)) AS BIGINT) AS pi
      FROM base b JOIN s{R} t ON t.a = b.item
    )"""
    body = "".join(rnd.format(R=r, P=r - 1) for r in range(1, rounds + 1))
    tail = """
    SELECT b.item, b.wins, nc.n_contests, p.pi AS pi_nano
    FROM base b
    JOIN pi{M} p ON p.item = b.item
    JOIN (SELECT a AS item, CAST(SUM(n_tot) AS BIGINT) AS n_contests
          FROM sym GROUP BY 1) nc ON nc.item = b.item
    """.format(M=rounds)
    return head + body + tail


@query(
    "q_bradley_terry",
    # promoted r14: pairwise preference models, never graded (ROTATION.md)
    oracle=_bt_oracle(3),
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY-TERRY pairwise-preference strengths
    (operators/preference.py:bradley_terry_nano) — the preference-
    aggregation primitive under RLHF reward modeling and ranking
    evaluation, fit by 3 snapped MM rounds (Hunter 2004) over daily
    event-type revenue contests (a beats b on a day iff its daily sum is
    larger; ties contribute nothing). Strengths are NANO ints, every
    division half-up-snapped, so the oracle's unrolled replay
    hash-matches. The planted-dominance ordering and uniform-init
    symmetry gates live in tests/test_trees.py.

    Scale: the corpus appears only in the daily rollup; contests, MM
    rounds and the final join run on |items| / |items|² relations,
    broadcast throughout — millions of items shuffle only entity-keyed
    nano longs, the ALS/pagerank story.
    """
    from ..operators.preference import bradley_terry_nano

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    x = daily.select("day", F.col("event_type").alias("a"), F.col("y").alias("ya"))
    y = daily.select(F.col("day").alias("d2"), F.col("event_type").alias("b"), F.col("y").alias("yb"))
    contests = (
        x.join(y, (F.col("d2") == F.col("day")) & (F.col("b") != F.col("a")))
        .where(F.col("ya") > F.col("yb"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return bradley_terry_nano(contests, rounds=3).select(
        F.col("item").alias("item"), "wins", "n_contests", "pi_nano"
    )


@query(
    "q_sequential_patterns",
    # graded since round 11: gap-constrained sequence mining (window-bounded
    # triple chain as of this round)
    oracle="""
    WITH ev AS (SELECT user_id AS u, event_type AS t, ts FROM events),
    nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM ev),
    pair AS (
      SELECT e1.t AS t_a, e2.t AS t_b,
             CAST(COUNT(DISTINCT e1.u) AS BIGINT) AS sup
      FROM ev e1
      JOIN ev e2 ON e2.u = e1.u AND e2.ts > e1.ts
        AND e2.ts <= e1.ts + INTERVAL 1 HOUR
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT e1.t AS t_a, e2.t AS t_b, e3.t AS t_c,
             CAST(COUNT(DISTINCT e1.u) AS BIGINT) AS sup
      FROM ev e1
      JOIN ev e2 ON e2.u = e1.u AND e2.ts > e1.ts
        AND e2.ts <= e1.ts + INTERVAL 24 HOUR
      JOIN ev e3 ON e3.u = e1.u AND e3.ts > e2.ts
        AND e3.ts <= e1.ts + INTERVAL 24 HOUR
      GROUP BY 1, 2, 3
    ),
    uni AS (
      SELECT 2 AS plen, t_a, t_b, '' AS t_c, sup FROM pair, nu
      WHERE sup * 5 >= nu.n
      UNION ALL
      SELECT 3 AS plen, t_a, t_b, t_c, sup FROM tri, nu
      WHERE sup * 5 >= 3 * nu.n
    )
    SELECT CAST(plen AS INT) AS plen, t_a, t_b, t_c,
           sup AS n_users_support,
           CAST((2 * sup * 1000000 + nu.n) // (2 * nu.n) AS BIGINT)
             AS support_ppm
    FROM uni, nu
    """,
)
def q_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WINDOWED sequential-pattern mining — the third member of
    the sequence family, distinct from both q_event_trigrams (contiguous
    n-grams) and q_frequent_sequences (pure-order GSP, which must
    truncate to each user's first-6-event head because unwindowed
    support degenerates): here the WINDOW is the semantics — a->b
    completed within 1 hour, a->b->c within 24 hours, over the FULL
    stream, supported by >= 20% / >= 60% of users. This is the SPADE/
    cSPADE gap-constrained formulation (funnel-with-deadline analytics),
    and the window is also what keeps support discriminative without
    truncating history. Pattern matches are EXISTENTIAL per user
    (COUNT(DISTINCT user)), the textbook sequence-support definition.

    Scale: all three self-join stages are (user, time-bucket)-keyed
    equi-joins — bucket width = the window — so both the OUTPUT and the
    CANDIDATE enumeration are bounded by activity density inside the
    window (events per user-hour / user-day), never by the user's total
    history. (A join keyed on user alone is output-bounded but still
    evaluates history^2 candidate combos per user — the round-11 smoke
    probe measured the knee before banding.) The tri chain's first join
    carries the redundant-but-load-bearing bound ts2 <= ts1 + 24 HOUR
    (implied by ts3 > ts2 AND ts3 <= ts1 + 24h, so the result hash
    cannot change), which is also what licenses its 24h banding; the
    skew valve for a pathological burst is a tighter window. The pattern lattice (|types|^2 + |types|^3 <= 150
    cells) aggregates map-side; n_users is a 1-row broadcast.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("u"),
            F.col("event_type").alias("t"),
            "ts",
        )
        .localCheckpoint()  # nu + five self-join sides read it
    )
    nu = ev.agg(F.countDistinct("u").cast("long").alias("n"))

    # (u, time-bucket) banded self-join device: a hash join keyed on u
    # alone must EVALUATE the range predicate on every (ts_l, ts_r) combo
    # inside a user bucket — quadratic in per-user history even though
    # the OUTPUT is window-bounded (the round-11 smoke probe showed the
    # knee: x8 wall 7.0x). Bucketing ts by the window width W and probing
    # buckets {b, b+1} from the left makes the candidate set itself
    # density-bounded; a qualifying pair (ts_r in (ts_l, ts_l+W]) matches
    # on exactly ONE bucket (the right row's), so no dedup is needed and
    # the result relation — and the oracle hash — is unchanged.
    def _banded(left, right, w_sec, l_ts, r_ts, cond):
        lb = left.withColumn(
            "__b",
            F.explode(
                F.array(
                    F.expr(f"CAST(unix_timestamp({l_ts}) div {w_sec} AS LONG)"),
                    F.expr(
                        f"CAST(unix_timestamp({l_ts}) div {w_sec} AS LONG) + 1"
                    ),
                )
            ),
        )
        rb = right.withColumn(
            "__b2", F.expr(f"CAST(unix_timestamp({r_ts}) div {w_sec} AS LONG)")
        )
        # Catalyst extracts BOTH equi-conjuncts — (__b = __b2) AND the
        # user equality inside cond — into the hash key, so the join is
        # keyed on (user, bucket); the range stays a post-filter over the
        # density-bounded candidates.
        return (
            lb.join(
                rb.hint("shuffle_hash"),
                (F.col("__b") == F.col("__b2")) & cond,
            )
            .drop("__b", "__b2")
        )

    e1 = ev.select(F.col("u"), F.col("t").alias("t_a"), F.col("ts").alias("ts1"))
    e2 = ev.select(
        F.col("u").alias("u2"), F.col("t").alias("t_b"), F.col("ts").alias("ts2")
    )
    e3 = ev.select(
        F.col("u").alias("u3"), F.col("t").alias("t_c"), F.col("ts").alias("ts3")
    )
    pair = (
        _banded(
            e1,
            e2,
            3600,
            "ts1",
            "ts2",
            (F.col("u") == F.col("u2"))
            & (F.col("ts2") > F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("t_a", "t_b")
        .agg(F.countDistinct("u").cast("long").alias("sup"))
    )
    # ts2 <= ts1 + 24h is implied by ts3 > ts2 AND ts3 <= ts1 + 24h, so
    # pushing it into the first join is semantics-preserving; it is also
    # what makes the 24h banding valid for that join.
    tri12 = _banded(
        e1,
        e2,
        86400,
        "ts1",
        "ts2",
        (F.col("u") == F.col("u2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 24 HOUR")),
    )
    # ts3 in (ts2, ts1+24h] subset of (ts2, ts2+24h] -> band on ts2's clock
    tri = (
        _banded(
            tri12,
            e3,
            86400,
            "ts2",
            "ts3",
            (F.col("u") == F.col("u3"))
            & (F.col("ts3") > F.col("ts2"))
            & (F.col("ts3") <= F.col("ts1") + F.expr("INTERVAL 24 HOUR")),
        )
        .groupBy("t_a", "t_b", "t_c")
        .agg(F.countDistinct("u").cast("long").alias("sup"))
    )
    uni = (
        pair.crossJoin(F.broadcast(nu))
        .where(F.col("sup") * 5 >= F.col("n"))
        .select(
            F.lit(2).cast("int").alias("plen"),
            "t_a",
            "t_b",
            F.lit("").alias("t_c"),
            "sup",
            "n",
        )
        .unionByName(
            tri.crossJoin(F.broadcast(nu))
            .where(F.col("sup") * 5 >= 3 * F.col("n"))
            .select(
                F.lit(3).cast("int").alias("plen"),
                "t_a",
                "t_b",
                "t_c",
                "sup",
                "n",
            )
        )
    )
    d = F.call_function
    return uni.select(
        "plen",
        "t_a",
        "t_b",
        "t_c",
        F.col("sup").alias("n_users_support"),
        d(
            "div",
            F.lit(2) * F.col("sup") * 1_000_000 + F.col("n"),
            F.lit(2) * F.col("n"),
        ).alias("support_ppm"),
    )


_MARKOV_STEPS = 12  # absorption horizon (mass converges geometrically)


def _markov_oracle(steps: int = _MARKOV_STEPS) -> str:
    """Unrolled replay of q_markov_attribution: journey transitions, the
    5 chains (full + one per removed channel, removals REDIRECTING
    into-edges to 'null' with out-degrees unchanged — Anderl et al.'s
    removal-effect semantics), then ``steps`` MATERIALIZED state-vector
    levels with per-edge half-up micro snaps (the pagerank discipline)."""
    head = """
    WITH fp AS (
      SELECT user_id, MIN(ts) AS tp FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    j AS (
      SELECT e.user_id, e.event_type AS ch, e.ts, e.event_id,
             fp.user_id IS NOT NULL AS conv
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (fp.user_id IS NULL OR e.ts < fp.tp)
    ),
    seq AS (
      SELECT user_id, ch, conv,
             LAG(ch) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
      FROM j
    ),
    lasts AS (
      SELECT user_id, conv, ch AS last_ch FROM (
        SELECT user_id, conv, ch,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM j
      ) WHERE rn = 1
    ),
    users AS (
      SELECT e.user_id,
             MAX(CASE WHEN fp.user_id IS NOT NULL THEN 1 ELSE 0 END) AS conv,
             MAX(CASE WHEN e.event_type <> 'purchase'
                  AND (fp.user_id IS NULL OR e.ts < fp.tp)
                 THEN 1 ELSE 0 END) AS has_touch
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      GROUP BY 1
    ),
    trans AS MATERIALIZED (
      SELECT s, t, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT COALESCE(prev, 'start') AS s, ch AS t FROM seq
        UNION ALL
        SELECT last_ch AS s, CASE WHEN conv THEN 'conv' ELSE 'null' END AS t
        FROM lasts
        UNION ALL
        SELECT 'start' AS s,
               CASE WHEN conv = 1 THEN 'conv' ELSE 'null' END AS t
        FROM users WHERE has_touch = 0
      ) GROUP BY 1, 2
    ),
    outn AS (SELECT s, CAST(SUM(n) AS BIGINT) AS outn FROM trans GROUP BY 1),
    chains(chain) AS (VALUES ('full'), ('click'), ('view'),
                             ('signup'), ('error')),
    ea AS MATERIALIZED (
      SELECT c.chain, tr.s,
             CASE WHEN c.chain <> 'full' AND tr.t = c.chain
                  THEN 'null' ELSE tr.t END AS t,
             CAST(SUM(tr.n) AS BIGINT) AS n, ANY_VALUE(o.outn) AS outn
      FROM chains c
      JOIN trans tr ON c.chain = 'full' OR tr.s <> c.chain
      JOIN outn o ON o.s = tr.s
      GROUP BY 1, 2, 3
    ),
    p0 AS MATERIALIZED (
      SELECT chain, 'start' AS state, CAST(1000000 AS BIGINT) AS mass
      FROM chains
    )"""
    lvl = """,
    p{K} AS MATERIALIZED (
      SELECT chain, state, CAST(SUM(m) AS BIGINT) AS mass FROM (
        SELECT e.chain, e.t AS state,
               (2 * p.mass * e.n + e.outn) // (2 * e.outn) AS m
        FROM p{P} p JOIN ea e ON e.chain = p.chain AND e.s = p.state
        UNION ALL
        SELECT chain, state, mass FROM p{P}
        WHERE state IN ('conv', 'null')
      ) GROUP BY 1, 2
    )"""
    body = "".join(lvl.format(K=k, P=k - 1) for k in range(1, steps + 1))
    return head + body + f""",
    pc AS (
      SELECT chain, CAST(COALESCE(MAX(CASE WHEN state = 'conv'
             THEN mass END), 0) AS BIGINT) AS p_conv
      FROM p{steps} GROUP BY 1
    )
    SELECT r.chain AS channel,
           f.p_conv AS p_full_micro,
           r.p_conv AS p_removed_micro,
           CASE WHEN f.p_conv > 0 THEN
             CAST((2 * (f.p_conv - r.p_conv) * 1000000 + f.p_conv)
                  // (2 * f.p_conv) AS BIGINT)
           END AS removal_effect_ppm
    FROM pc r JOIN pc f ON f.chain = 'full'
    WHERE r.chain <> 'full'
    """


# graded r10-r12 (green archives); rotated to extra in r13
@query("q_markov_attribution", extra=True, oracle=_markov_oracle())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV-CHAIN (removal-effect) attribution — the data-driven
    attribution model beside q_shapley_attribution's game-theoretic one
    (Anderl et al. 2014; q_event_transitions exposes the raw transition
    matrix as a relation — this query is what that matrix is FOR): estimate a first-order chain over journey
    touches (start -> channels -> conv/null absorbing), then credit
    each channel by how much conversion probability DROPS when it is
    removed (in-edges redirected to 'null', out-degrees unchanged — the
    standard removal semantics). P(conv) is absorption mass within 12
    synchronous steps, every per-edge mass flow half-up-snapped to
    micro units (the pagerank discipline), so the 5 chains x 12 steps
    replay hash-exact in the unrolled oracle.

    Scale: journeys order per-user (user-keyed window); the transition
    matrix is |states|^2-bounded (7 states), the 5 chain-edge variants
    and every state vector are broadcast relations; 12 steps cost 12
    tiny joins regardless of corpus size. The only corpus-scale stages
    are the first-purchase agg and the journey window.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).localCheckpoint()  # fp + journeys + user census read it
    fp = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.min("ts").alias("tp")
    )
    j = (
        ev.where(F.col("event_type") != "purchase")
        .join(F.broadcast(fp), "user_id", "left")
        .where(F.col("tp").isNull() | (F.col("ts") < F.col("tp")))
        .select(
            "user_id",
            F.col("event_type").alias("ch"),
            "ts",
            "event_id",
            F.col("tp").isNotNull().alias("conv"),
        )
        .localCheckpoint()  # seq window + lasts agg read it
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = j.select(
        F.coalesce(F.lag("ch").over(w), F.lit("start")).alias("s"),
        F.col("ch").alias("t"),
    )
    lasts = j.groupBy("user_id", "conv").agg(
        F.max_by("ch", F.struct("ts", "event_id")).alias("last_ch")
    ).select(
        F.col("last_ch").alias("s"),
        F.when(F.col("conv"), F.lit("conv")).otherwise(F.lit("null")).alias("t"),
    )
    users = (
        ev.join(F.broadcast(fp), "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.max(F.col("tp").isNotNull().cast("int")).alias("conv"),
            F.max(
                (
                    (F.col("event_type") != "purchase")
                    & (F.col("tp").isNull() | (F.col("ts") < F.col("tp")))
                ).cast("int")
            ).alias("has_touch"),
        )
        .where(F.col("has_touch") == 0)
        .select(
            F.lit("start").alias("s"),
            F.when(F.col("conv") == 1, F.lit("conv"))
            .otherwise(F.lit("null"))
            .alias("t"),
        )
    )
    trans = (
        seq.unionByName(lasts)
        .unionByName(users)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # outn + the 5 chain variants read it
    )
    outn = trans.groupBy("s").agg(F.sum("n").cast("long").alias("outn"))
    chains = trans.sparkSession.createDataFrame(
        [("full",), ("click",), ("view",), ("signup",), ("error",)],
        "chain string",
    )
    ea = (
        chains.join(
            trans,
            (F.col("chain") == "full") | (F.col("s") != F.col("chain")),
        )
        .join(F.broadcast(outn), "s")
        .select(
            "chain",
            "s",
            F.when(
                (F.col("chain") != "full") & (F.col("t") == F.col("chain")),
                F.lit("null"),
            )
            .otherwise(F.col("t"))
            .alias("t2"),
            "n",
            "outn",
        )
        .groupBy(
            # fresh aliases: p and ea both descend from the `chains`
            # relation, so shared attribute ids would make the loop join
            # an ambiguous self-join — distinct names get distinct ids
            F.col("chain").alias("e_chain"),
            F.col("s").alias("e_s"),
            F.col("t2").alias("e_t"),
        )
        .agg(F.sum("n").cast("long").alias("n"), F.any_value("outn").alias("outn"))
        .localCheckpoint()  # read every step
    )
    d = F.call_function
    p = chains.select(
        "chain",
        F.lit("start").alias("state"),
        F.lit(1_000_000).cast("long").alias("mass"),
    ).localCheckpoint()
    for _ in range(_MARKOV_STEPS):
        flowed = (
            p.join(
                ea,
                (p["chain"] == ea["e_chain"]) & (p["state"] == ea["e_s"]),
            )
            .select(
                p["chain"].alias("c2"),
                ea["e_t"].alias("state2"),
                d(
                    "div",
                    F.lit(2) * F.col("mass") * F.col("n") + F.col("outn"),
                    F.lit(2) * F.col("outn"),
                ).alias("m"),
            )
        )
        retained = p.where(F.col("state").isin("conv", "null")).select(
            F.col("chain").alias("c2"),
            F.col("state").alias("state2"),
            F.col("mass").alias("m"),
        )
        p = (
            flowed.unionByName(retained)
            .groupBy(F.col("c2").alias("chain"), F.col("state2").alias("state"))
            .agg(F.sum("m").cast("long").alias("mass"))
            .localCheckpoint()
        )
    pc = p.groupBy("chain").agg(
        F.coalesce(
            F.max(F.when(F.col("state") == "conv", F.col("mass"))), F.lit(0)
        )
        .cast("long")
        .alias("p_conv")
    )
    full = pc.where(F.col("chain") == "full").select(
        F.col("p_conv").alias("p_full")
    )
    return (
        pc.where(F.col("chain") != "full")
        .crossJoin(F.broadcast(full))
        .select(
            F.col("chain").alias("channel"),
            F.col("p_full").alias("p_full_micro"),
            F.col("p_conv").alias("p_removed_micro"),
            # Zero guard: on a degenerate corpus where conversion mass
            # snaps to 0 within the unroll depth, Spark's div would emit
            # NULL while DuckDB's integer // errors; CASE-ing both sides
            # makes the engines agree (NULL) instead of diverging.
            F.when(
                F.col("p_full") > 0,
                d(
                    "div",
                    F.lit(2) * (F.col("p_full") - F.col("p_conv")) * 1_000_000
                    + F.col("p_full"),
                    F.lit(2) * F.col("p_full"),
                ),
            ).alias("removal_effect_ppm"),
        )
    )


_BURST_K = 16  # trailing-day analysis window (fixed unroll depth)
_BURST_TRANS = 2772589  # gamma * ln(K) in micro-nats, gamma=1: round(1e6*ln 16)
# shared literal in BOTH engines — ln(16) computed per-engine could differ
# in the last ulp; a hardcoded integer cannot.
#
# Margin note (n2-dependent): the per-day binomial costs still evaluate
# ln() in each engine's libm, and that ~2e-16 relative ulp error is
# multiplied by the daily event count n2 BEFORE the micro-round, so the
# half-up boundary's safety margin shrinks as ~n2 * 2e-10 of one
# rounding unit. At sf0.1 (n2 ~ 1e4/day) that is ~2e-6 of a unit —
# comfortably safe; it would only approach a coin-flip boundary at
# n2 ~ 1e9 events/day/state, far beyond any per-day partition this
# query would see (and the fix there is the same device as _BURST_TRANS:
# snap ln(p0)/ln(1-p0) once to shared integer micro-nats and multiply
# by integer counts in both engines).


def _burst_oracle() -> str:
    """Unrolled replay of q_burst_detection: the planted daily series,
    micro-snapped binomial costs, then the 2-state min-cost DP as
    LAYERED MATERIALIZED one-row levels (forward 16, backward 15) and a
    16-arm UNION ALL readout."""
    piv_cols = ", ".join(
        f"MAX(CASE WHEN idx = {i} THEN c0 END) AS c0_{i}, "
        f"MAX(CASE WHEN idx = {i} THEN c1 END) AS c1_{i}"
        for i in range(_BURST_K)
    )
    head = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS dy,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nn
      FROM events GROUP BY 1
    ),
    mx AS (SELECT MAX(dy) AS mxd FROM daily),
    spine AS (SELECT CAST(range AS INT) AS idx FROM range(0, {_BURST_K})),
    base AS MATERIALIZED (
      SELECT s.idx, mx.mxd + (s.idx - {_BURST_K - 1}) AS dy2,
             COALESCE(d.n, 0) AS n, COALESCE(d.nn, 0) AS nn,
             s.idx % 5 = 2 AS planted
      FROM spine s CROSS JOIN mx
      LEFT JOIN daily d ON d.dy = mx.mxd + (s.idx - {_BURST_K - 1})
    ),
    b2 AS MATERIALIZED (
      SELECT idx, dy2, n,
             CASE WHEN planted THEN n * 3 ELSE n END AS n2,
             CASE WHEN planted THEN nn + 2 * n ELSE nn END AS nn2
      FROM base
    ),
    tot AS (SELECT CAST(SUM(n2) AS DOUBLE) AS s_pl,
                   CAST(SUM(nn2) AS DOUBLE) AS s_all FROM b2),
    costs AS MATERIALIZED (
      SELECT b.idx, b.dy2, b.n, b.n2, b.nn2,
        CAST(ROUND(-(b.n2 * LN(t.s_pl / t.s_all)
             + (b.nn2 - b.n2) * LN(1 - t.s_pl / t.s_all)) * 1000000.0)
             AS BIGINT) AS c0,
        CAST(ROUND(-(b.n2 * LN(LEAST(2 * (t.s_pl / t.s_all), 0.999999))
             + (b.nn2 - b.n2) * LN(1 - LEAST(2 * (t.s_pl / t.s_all), 0.999999)))
             * 1000000.0) AS BIGINT) AS c1
      FROM b2 b, tot t
    ),
    piv AS MATERIALIZED (SELECT {piv_cols} FROM costs),
    d0 AS MATERIALIZED (
      SELECT *, c0_0 AS f0_0, {_BURST_TRANS} + c1_0 AS f1_0 FROM piv
    )"""
    levels = []
    for i in range(1, _BURST_K):
        levels.append(f""",
    d{i} AS MATERIALIZED (
      SELECT *, c0_{i} + LEAST(f0_{i - 1}, f1_{i - 1}) AS f0_{i},
             c1_{i} + LEAST(f0_{i - 1} + {_BURST_TRANS}, f1_{i - 1}) AS f1_{i}
      FROM d{i - 1}
    )""")
    levels.append(f""",
    e{_BURST_K - 1} AS MATERIALIZED (
      SELECT *, CAST(0 AS BIGINT) AS b0_{_BURST_K - 1},
             CAST(0 AS BIGINT) AS b1_{_BURST_K - 1}
      FROM d{_BURST_K - 1}
    )""")
    for i in range(_BURST_K - 2, -1, -1):
        levels.append(f""",
    e{i} AS MATERIALIZED (
      SELECT *,
        LEAST(c0_{i + 1} + b0_{i + 1},
              {_BURST_TRANS} + c1_{i + 1} + b1_{i + 1}) AS b0_{i},
        LEAST(c0_{i + 1} + b0_{i + 1}, c1_{i + 1} + b1_{i + 1}) AS b1_{i}
      FROM e{i + 1}
    )""")
    arms = "\n    UNION ALL\n".join(
        f"""SELECT c.idx, strftime(c.dy2, '%Y-%m-%d') AS day,
           c.n AS n_events, c.n2 AS n_planted, c.nn2 AS n_total,
           CAST(CASE WHEN d.f0_{i} + d.b0_{i} <= d.f1_{i} + d.b1_{i}
                THEN 0 ELSE 1 END AS INT) AS state
    FROM costs c, e0 d WHERE c.idx = {i}"""
        for i in range(_BURST_K)
    )
    return head + "".join(levels) + "\n    " + arms


# graded since round 10 (wave 2): the state-automaton DP family
@query("q_burst_detection", oracle=_burst_oracle())
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLEINBERG-style BURST DETECTION (2-state minimum-cost automaton,
    Kleinberg 2002) over the trailing 16-day click-share series — the
    trend/anomaly operator the temporal family lacked (CUSUM finds ONE
    changepoint; the burst automaton labels every day base/burst with a
    state-switching penalty, the "bursty and hierarchical structure"
    model). Observation costs are the binomial negative log-likelihoods
    of the day's click count under the base rate p0 (window share) vs
    the burst rate min(2*p0, 0.999999), micro-snapped per day (ln of
    data-derived rationals — the DSIR measure-zero discipline); the
    0->1 transition costs gamma*ln(K) micro-nats, HARDCODED as the
    integer 2772589 in both engines so last-ulp ln() divergence cannot
    exist. Day states come from the forward+backward min-sum marginals
    (= the Viterbi path, ties to base), all integer arithmetic.

    The synthetic stream is deliberately uniform, so the series PLANTS
    deterministic incidents (click count x3 on days idx % 5 == 2; the
    oracle replays the plant): the detector must recover exactly the
    planted schedule at sf0.01/sf0.1, and at sf0.001 it flags a planted
    subset with zero false positives — small daily samples genuinely
    carry too little likelihood, the honest behavior
    (tests/test_patterns.py gates plant-recovery and no-false-positive).

    Scale: ONE map-side-combining daily agg touches the corpus; the
    spine, costs, pivot and the 31 chained DP projections all run on a
    16-row/1-row relation (codegen probes showed the chained selects
    stay plan-linear, ~10 KB). At a years-long window the same DP runs
    per K-day tile with carried boundary state.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("dy"), "event_type"
    )
    daily = ev.groupBy("dy").agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("long")
        .alias("n"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    mx = daily.agg(F.max("dy").alias("mxd"))
    spine = spark.range(_BURST_K).select(F.col("id").cast("int").alias("idx"))
    base = (
        spine.crossJoin(F.broadcast(mx))
        .select(
            "idx",
            F.date_add("mxd", F.col("idx") - (_BURST_K - 1)).alias("dy2"),
            (F.col("idx") % 5 == 2).alias("planted"),
        )
        .join(
            F.broadcast(daily.withColumnRenamed("dy", "dy2")), "dy2", "left"
        )
        .select(
            "idx",
            "dy2",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("nn", F.lit(0)).cast("long").alias("nn"),
            "planted",
        )
    )
    b2 = base.select(
        "idx",
        "dy2",
        "n",
        F.when(F.col("planted"), F.col("n") * 3)
        .otherwise(F.col("n"))
        .alias("n2"),
        F.when(F.col("planted"), F.col("nn") + 2 * F.col("n"))
        .otherwise(F.col("nn"))
        .alias("nn2"),
    ).localCheckpoint()  # totals, costs and the final readout read it
    tot = b2.agg(
        F.sum("n2").cast("double").alias("s_pl"),
        F.sum("nn2").cast("double").alias("s_all"),
    ).localCheckpoint()  # break the shared-b2 lineage: the crossJoin of
    # b2 with its own aggregate otherwise trips AMBIGUOUS_REFERENCE under
    # Spark 4's hybrid analyzer (the markov chains/ea lesson)
    p0 = F.col("s_pl") / F.col("s_all")
    p1 = F.least(2 * (F.col("s_pl") / F.col("s_all")), F.lit(0.999999))
    costs = b2.crossJoin(F.broadcast(tot)).select(
        "idx",
        "dy2",
        "n",
        "n2",
        "nn2",
        F.round(
            -(
                F.col("n2") * F.log(p0)
                + (F.col("nn2") - F.col("n2")) * F.log(1 - p0)
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("c0"),
        F.round(
            -(
                F.col("n2") * F.log(p1)
                + (F.col("nn2") - F.col("n2")) * F.log(1 - p1)
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("c1"),
    ).localCheckpoint()  # the pivot and the readout join read it
    piv = costs.groupBy().agg(
        *[
            F.max(F.when(F.col("idx") == i, F.col(c))).alias(f"{c}_{i}")
            for i in range(_BURST_K)
            for c in ("c0", "c1")
        ]
    )
    # Round-13 optimization (guide §7.3 — driver planning time): the 31
    # chained forward/backward DP selects fold into ONE selectExpr
    # projection via lateral column-alias references (dependency order is
    # the DP order), and the state readout is one SQL explode — the
    # chained ``select("*", ...)`` form re-analyzed the growing tree per
    # level and paid per-cell py4j round-trips; build time measured 3.5 s
    # vs 0.1 s execution at sf0.1. Same integer expressions, same values.
    last = _BURST_K - 1
    dp = ["*", "c0_0 AS f0_0", f"({_BURST_TRANS} + c1_0) AS f1_0"]
    for i in range(1, _BURST_K):
        dp.append(f"(c0_{i} + LEAST(f0_{i - 1}, f1_{i - 1})) AS f0_{i}")
        dp.append(
            f"(c1_{i} + LEAST(f0_{i - 1} + {_BURST_TRANS}, f1_{i - 1}))"
            f" AS f1_{i}"
        )
    dp.append(f"CAST(0 AS BIGINT) AS b0_{last}")
    dp.append(f"CAST(0 AS BIGINT) AS b1_{last}")
    for i in range(last - 1, -1, -1):
        dp.append(
            f"LEAST(c0_{i + 1} + b0_{i + 1},"
            f" {_BURST_TRANS} + c1_{i + 1} + b1_{i + 1}) AS b0_{i}"
        )
        dp.append(
            f"LEAST(c0_{i + 1} + b0_{i + 1}, c1_{i + 1} + b1_{i + 1})"
            f" AS b1_{i}"
        )
    cur = piv.selectExpr(*dp)
    states = cur.selectExpr(
        "explode(array(%s)) AS s"
        % ", ".join(
            f"struct(CAST({i} AS INT) AS idx,"
            f" CAST(IF(f0_{i} + b0_{i} <= f1_{i} + b1_{i}, 0, 1) AS INT)"
            f" AS state)"
            for i in range(_BURST_K)
        )
    ).select("s.idx", "s.state").localCheckpoint()  # same shared-lineage break
    return costs.join(F.broadcast(states), "idx").select(
        "idx",
        F.date_format("dy2", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_events"),
        F.col("n2").alias("n_planted"),
        F.col("nn2").alias("n_total"),
        "state",
    )


# ---------------------------------------------------------------------------
# Banded DTW between daily event-type series (round 11)
# ---------------------------------------------------------------------------

_DTW_K = 16  # trailing-day window (the burst-detection spine device)
_DTW_BAND = 4  # Sakoe-Chiba band half-width |i - j| <= 4
_DTW_BIGM = 1_000_000_000_000  # out-of-band sentinel; path sums stay far below


def _dtw_cells():
    """(i, j, in_band, neighbor_names) for every DP cell, anti-diagonal
    order — shared by the Spark and SQL generators so the two engines'
    recurrences cannot drift."""
    for k in range(0, 2 * _DTW_K - 1):
        for i in range(_DTW_K):
            j = k - i
            if 0 <= j < _DTW_K:
                nb = []
                if i > 0:
                    nb.append(f"c_{i - 1}_{j}")
                if j > 0:
                    nb.append(f"c_{i}_{j - 1}")
                if i > 0 and j > 0:
                    nb.append(f"c_{i - 1}_{j - 1}")
                yield i, j, abs(i - j) <= _DTW_BAND, nb


def _dtw_oracle() -> str:
    piv = ", ".join(
        f"MAX(CASE WHEN idx = {i} THEN n END) AS n_{i}" for i in range(_DTW_K)
    )
    head = f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type AS t, CAST(ts AS DATE) AS dy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(dy) AS mxd FROM daily),
    spine AS (SELECT CAST(range AS INT) AS idx FROM range(0, {_DTW_K})),
    types AS (SELECT DISTINCT t FROM daily),
    grid AS MATERIALIZED (
      SELECT ty.t, s.idx, COALESCE(d.n, 0) AS n
      FROM types ty CROSS JOIN spine s CROSS JOIN mx
      LEFT JOIN daily d ON d.t = ty.t
        AND d.dy = mx.mxd + (s.idx - {_DTW_K - 1})
    ),
    piv AS MATERIALIZED (SELECT t, {piv} FROM grid GROUP BY t),
    pairs AS MATERIALIZED (
      SELECT a.t AS t_a, b.t AS t_b,
             {", ".join(f"a.n_{i} AS x_{i}, b.n_{i} AS y_{i}" for i in range(_DTW_K))}
      FROM piv a JOIN piv b ON a.t < b.t
    ),
    l0 AS MATERIALIZED (SELECT *, ABS(x_0 - y_0) AS c_0_0 FROM pairs)"""
    # group cells by anti-diagonal into chained CTE levels
    levels: dict[int, list[str]] = {}
    for i, j, in_band, nb in _dtw_cells():
        if i == 0 and j == 0:
            continue
        if not in_band:
            expr = f"CAST({_DTW_BIGM} AS BIGINT) AS c_{i}_{j}"
        else:
            m = nb[0] if len(nb) == 1 else f"LEAST({', '.join(nb)})"
            expr = f"ABS(x_{i} - y_{j}) + {m} AS c_{i}_{j}"
        levels.setdefault(i + j, []).append(expr)
    body = "".join(
        f""",
    l{k} AS MATERIALIZED (SELECT *, {", ".join(exprs)} FROM l{k - 1})"""
        for k, exprs in sorted(levels.items())
    )
    last = 2 * _DTW_K - 2
    return (
        head
        + body
        + f"""
    SELECT t_a, t_b, CAST(c_{_DTW_K - 1}_{_DTW_K - 1} AS BIGINT) AS dtw_cost
    FROM l{last}
    """
    )


@query(
    "q_dtw_event_series",
    # graded r12-r13 (green in CORRECTNESS_r12/r13); rotated to extra in
    # r14 to free a slot for never-graded families (ROTATION.md)
    extra=True,
    oracle=_dtw_oracle(),
)
def q_dtw_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAKOE-CHIBA-BANDED DYNAMIC TIME WARPING between every pair of
    event types' trailing-16-day daily-count series — the sequence-
    ALIGNMENT member of the temporal family (autocorrelation/Spearman
    compare series point-by-point; DTW aligns them under local time
    warps, the standard shape-similarity measure for usage curves).
    Costs are exact integer |x_i - y_j|; the band (|i - j| <= 4) is the
    standard warping constraint AND the scale device — it prunes the DP
    to O(K * band) live cells, with out-of-band cells pinned to an
    integer sentinel so both engines share one recurrence. The full
    16x16 DP is unrolled as 31 anti-diagonal projection levels (cells on
    one anti-diagonal depend only on the two previous — no intra-level
    references), the chained-select pattern measured plan-linear on
    q_burst_detection; BOTH the Spark plan and the DuckDB oracle are
    generated from the same _dtw_cells() walk, so the comparison
    adjudicates the recurrence itself.

    Scale: ONE map-side daily aggregation touches the corpus; the spine,
    pivot and all 31 DP levels run on a |types|^2/2-row relation
    (catalog-bounded). For long series the same band tiles the DP with
    carried boundary diagonals — the burst-detection tiling argument.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), F.to_date("ts").alias("dy")
    )
    daily = ev.groupBy("t", "dy").agg(F.count(F.lit(1)).cast("long").alias("n"))
    mx = daily.agg(F.max("dy").alias("mxd")).localCheckpoint()
    types = daily.select("t").distinct()
    spine = spark.range(_DTW_K).select(F.col("id").cast("int").alias("idx"))
    grid = (
        types.crossJoin(spine)
        .crossJoin(F.broadcast(mx))
        .select("t", "idx", F.date_add("mxd", F.col("idx") - (_DTW_K - 1)).alias("dy"))
        .join(F.broadcast(daily), ["t", "dy"], "left")
        .select("t", "idx", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
    piv = (
        grid.groupBy("t")
        .agg(
            *[
                F.max(F.when(F.col("idx") == i, F.col("n"))).alias(f"n_{i}")
                for i in range(_DTW_K)
            ]
        )
        .localCheckpoint()  # both pair sides read it (self-join lineage)
    )
    a = piv.select(
        F.col("t").alias("t_a"),
        *[F.col(f"n_{i}").alias(f"x_{i}") for i in range(_DTW_K)],
    )
    b = piv.select(
        F.col("t").alias("t_b"),
        *[F.col(f"n_{i}").alias(f"y_{i}") for i in range(_DTW_K)],
    )
    df = a.join(b.hint("broadcast"), F.col("t_a") < F.col("t_b"))
    # Round-13 optimization (guide §1.2 / §7.3 — driver planning time):
    # ALL 31 anti-diagonal levels fold into ONE selectExpr projection via
    # lateral column-alias references (each cell names earlier cells of
    # the same SELECT, resolved in dependency order — the anti-diagonal
    # walk of _dtw_cells IS a topological order). The previous chain of
    # 31 ``select("*", ...)`` calls re-analyzed the whole ~290-column
    # tree per level — plan construction measured ~5 s vs 0.5 s of
    # execution at sf0.1; SQL strings also avoid the per-cell py4j
    # round-trips (the operators/similarity._bucket_sql precedent).
    # Values unchanged: the same cells are computed from the same
    # neighbors in the same order (probe-verified frame-identical).
    exprs = ["t_a", "t_b", "ABS(x_0 - y_0) AS c_0_0"]
    for i, j, in_band, nb in _dtw_cells():
        if i == 0 and j == 0:
            continue
        if not in_band:
            exprs.append(f"CAST({_DTW_BIGM} AS BIGINT) AS c_{i}_{j}")
        else:
            m = nb[0] if len(nb) == 1 else "LEAST(%s)" % ", ".join(nb)
            exprs.append(f"(ABS(x_{i} - y_{j}) + {m}) AS c_{i}_{j}")
    return df.selectExpr(*exprs).select(
        "t_a",
        "t_b",
        F.col(f"c_{_DTW_K - 1}_{_DTW_K - 1}").cast("long").alias("dtw_cost"),
    )

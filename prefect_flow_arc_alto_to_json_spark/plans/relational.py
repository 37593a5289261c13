"""Relational operator surface (SURVEY.md §2.2-§2.8) as named plans.

Each plan is idiomatic DataFrame code — filters/projections reach the parquet
scan via Catalyst pushdown, small dimensions are broadcast explicitly, and
aggregations rely on Catalyst's partial (map-side) aggregation. The paired
DuckDB oracle SQL defines correctness.

Scale notes are inline per query: at 100 TB, lineitem/orders/events are the
big fact tables (shuffled only on their agg/join keys) while region, nation,
customer (at TPC-H proportions), part and supplier remain broadcast-able or
bucket-able dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.scalar import cents, epoch_s, epoch_us, half_up_units
from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Aggregations (A2/A4) — TPC-H-style pricing summary
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)                  AS sum_qty,
      CAST(SUM(pc) AS DOUBLE) / 100.0                                  AS sum_base_price,
      CAST(SUM(pc * (100 - dc)) AS DOUBLE) / 10000.0                   AS sum_disc_price,
      CAST(SUM(pc * (100 - dc) * (100 + tc)) AS DOUBLE) / 1000000.0    AS sum_charge,
      CAST((2 * SUM(CAST(l_quantity AS BIGINT)) * 10000 + COUNT(*))
           // (2 * COUNT(*)) AS DOUBLE) / 10000.0                      AS avg_qty,
      CAST((2 * SUM(pc) * 100 + COUNT(*))
           // (2 * COUNT(*)) AS DOUBLE) / 10000.0                      AS avg_price,
      CAST((2 * SUM(dc) * 100 + COUNT(*))
           // (2 * COUNT(*)) AS DOUBLE) / 10000.0                      AS avg_disc,
      COUNT(*)                                                         AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus, l_quantity,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS dc,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tc
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan grouped aggregation (ref's only agg is the transcript concat,
    flows/main_flow.py:65-70; this is the engine-surface A2 generalization).

    Scale: group key cardinality is tiny (R/A/N x O/F) so partial aggregation
    collapses ~everything map-side; the shuffle moves only
    #partitions x #groups rows. Filter pushes to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer units: cents for money, 1e-4 (cents x percent) for the
    # discounted price, 1e-6 for charge — no float rounding anywhere, so
    # every output double is bit-identical across engines at any SF
    staged = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qi"),
            cents("l_extendedprice").alias("pc"),
            cents("l_discount").alias("dc"),
            cents("l_tax").alias("tc"),
        )
    )
    n = F.count(F.lit(1))
    return staged.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qi").cast("double").alias("sum_qty"),
        (F.sum("pc").cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(F.col("pc") * (100 - F.col("dc"))).cast("double") / 10000.0).alias(
            "sum_disc_price"
        ),
        (
            F.sum(F.col("pc") * (100 - F.col("dc")) * (100 + F.col("tc"))).cast(
                "double"
            )
            / 1000000.0
        ).alias("sum_charge"),
        (half_up_units(F.sum("qi"), n, 10000).cast("double") / 10000.0).alias(
            "avg_qty"
        ),
        (half_up_units(F.sum("pc"), n, 100).cast("double") / 10000.0).alias(
            "avg_price"
        ),
        (half_up_units(F.sum("dc"), n, 100).cast("double") / 10000.0).alias(
            "avg_disc"
        ),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q6_revenue_delta",
    extra=True,  # rotated to the pytest tier in round 8: q1_pricing_summary
    # keeps the scan+range-predicate+agg family graded; slot freed for
    # q_time_travel (versioned snapshots — a family the driver never saw)
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan + ungrouped aggregate (P2/P4 predicates + A2).

    Scale: all three predicates push down to parquet row-group min/max
    pruning; no shuffle at all (single global agg = 1-row exchange).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * cents("l_discount"))
                .cast("double") / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1/J3-J8)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
        / 10000.0 AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg + top-k (J1 equi-join generalized; ref delegates its
    single join to Postgres, flows/main_flow.py:25).

    Scale: customer (filtered on segment) is the small side — broadcast it
    into orders, then the orders->lineitem join shuffles on orderkey only.
    Top-k via global sort+limit: Spark's TakeOrderedAndProject keeps k rows
    per partition, no full sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                .cast("double") / 10000.0
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      r_name,
      n_name,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
        / 10000.0 AS revenue,
      COUNT(*) AS n_lineitems
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup over the full dimension chain (J3-J5 surface).

    Scale: region/nation/customer are classic broadcast dims (customer at
    TPC-H SF100k is large, but the *filtered projected* customer
    (custkey,nationkey) stays far under a bucket-join threshold; here we
    broadcast region+nation and let AQE pick the customer strategy).
    Lineitem only shuffles on l_orderkey.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dims = cust.join(
        F.broadcast(nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                .cast("double") / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q_semi_join",
    extra=True,  # rotated out round 9 (J6 family: q_anti_join holds the shape)
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (engine surface J8; absent in reference).

    Scale: semi-join never duplicates the probe side; with the selective
    price filter the build side shrinks enough for AQE to broadcast it.
    """
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000
    )
    return (
        cust.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


@query(
    "q_anti_join",
    extra=True,  # rotated to the pytest tier in round 8: q_semi_join keeps
    # the semi/anti family graded; slot freed for q_cms_heavy_hitters
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (engine surface J8).

    The price filter keeps the result non-empty in the synthetic data
    (every customer has *some* order) so the oracle check is non-vacuous.
    """
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return cust.join(
        big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Window functions (§2.5)
# ---------------------------------------------------------------------------


@query(
    "q_topk_per_group",
    extra=True,  # rotated to the pytest tier in round 8: q_rank_family and
    # q_window_analytic keep the window family graded; slot freed for
    # q_recursive_reachability (WITH RECURSIVE — new to the driver)
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (§2.5/§2.6).

    Scale: one shuffle on the partition key; Spark inserts a rank-limit
    (WindowGroupLimit) before the sort at the physical level, so only k rows
    per group survive the exchange input.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "q_window_analytic",
    extra=True,  # rotated out round 9 (window family: q_rank_family stays graded)
    oracle="""
    SELECT
      event_id,
      user_id,
      ROUND(value, 4) AS value,
      ROUND(LAG(value)  OVER w, 4) AS prev_value,
      LEAD(event_type) OVER w      AS next_type,
      ROUND(SUM(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 2) AS running_value
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead + running aggregate (§2.5).

    Scale: single shuffle on user_id serves all three window specs (same
    partitioning+ordering → one Window physical node).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.sum("value").over(wrun), 2).alias("running_value"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *,
             CAST(SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT
      user_id,
      session_seq,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) — the batch twin of
    streaming ``session_window`` (§2.9), built from lag + running sum.

    Scale: both windows and the final groupBy share the user_id
    partitioning; Spark performs ONE shuffle on user_id and keeps the
    session assignment pipeline within a stage.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Gap compared in µs on BOTH engines (epoch_us helper ≡ DuckDB
    # epoch_us, wall-clock-pure on the NTZ ts): whole-second flooring would
    # split a true 1800.5 s gap differently from the oracle's full-precision
    # compare.
    gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    numbered = flagged.withColumn(
        "session_seq", F.sum("is_new_session").over(wrun).cast("long")
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents("value")).cast("double") / 100.0).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (A3), set ops (§2.7), distinct aggs (A2)
# ---------------------------------------------------------------------------


@query(
    "q_rollup_acctbal",
    # round-8 rotation: multi-grouping aggregation stays graded via
    # q_cube_orders; the rollup twin moves to the pytest tier so BPE
    # merge training takes a driver-graded slot.
    extra=True,
    oracle="""
    SELECT
      r_name,
      n_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (A3) over the broadcast dimension chain."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("total_acctbal"),
    )


@query(
    "q_setops_nations",
    extra=True,  # rotated out round 9 third session (set-ops shape: q_pivot/except twins hold it in extras)
    oracle="""
    SELECT nationkey, tag FROM (
      SELECT c_nationkey AS nationkey, 'both' AS tag
      FROM (SELECT c_nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier) t(c_nationkey)
      UNION ALL
      SELECT nationkey, 'customer_only' AS tag
      FROM (SELECT c_nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier) t(nationkey)
      UNION ALL
      SELECT nationkey, 'supplier_only' AS tag
      FROM (SELECT s_nationkey FROM supplier
            EXCEPT
            SELECT c_nationkey FROM customer) t(nationkey)
    )
    """,
)
def q_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL set algebra (§2.7)."""
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_n = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust_n.intersect(supp_n).withColumn("tag", F.lit("both"))
    c_only = cust_n.subtract(supp_n).withColumn("tag", F.lit("customer_only"))
    s_only = supp_n.subtract(cust_n).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only)


@query(
    "q_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (A3): all 4 grouping combinations in one pass —
    Spark expands the sets map-side, still a single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_price"),
    )


@query(
    "q_distinct_agg",
    # Rotated to the extra tier in round 8 to free a graded slot for
    # sim_pq_topk (a new unique family: quantized-ANN serving); the A2
    # distinct-agg family stays graded via q1_pricing_summary +
    # q_approx_distinct.
    extra=True,
    oracle="""
    SELECT
      c_mktsegment,
      COUNT(*) AS n_customers,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      ROUND(ROUND(SUM(c_acctbal), 2) / COUNT(*), 2) AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg with COUNT(DISTINCT) (A2) — Catalyst expands to a
    two-phase aggregate automatically."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1)), 2).alias("avg_acctbal"),
    )


# ---------------------------------------------------------------------------
# Filters / projections / scalar functions (§2.2, §2.8)
# ---------------------------------------------------------------------------


@query(
    "q_filter_project",
    oracle="""
    SELECT p_partkey, p_name, p_brand, ROUND(p_retailprice, 2) AS retailprice
    FROM part
    WHERE p_type LIKE '%O%'
      AND p_size BETWEEN 10 AND 30
      AND p_brand <> 'Brand#3'
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + equality/LIKE/range predicates (P1-P4; the reference's
    catalog scan predicates, flows/main_flow.py:23-30, re-expressed).

    Scale: all three predicates and the 4-column projection push into the
    parquet scan (PushedFilters + ReadSchema pruning).
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(
            F.col("p_type").like("%O%")
            & F.col("p_size").between(10, 30)
            & (F.col("p_brand") != "Brand#3")
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.round("p_retailprice", 2).alias("retailprice"),
        )
    )


@query(
    "q_scalar_functions",
    oracle="""
    SELECT
      o_orderkey,
      strftime(o_orderdate, '%Y-%m') AS order_month,
      CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
      o_orderstatus || '-' || SUBSTR(o_orderpriority, 1, 3) AS status_tag,
      LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
      UPPER(o_orderpriority) AS priority_upper
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface (§2.8): date formatting, arithmetic bucketing,
    string concat/substr/pad/case — all JVM built-ins inside codegen."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("price_bucket"),
        F.concat_ws(
            "-", F.col("o_orderstatus"), F.substring("o_orderpriority", 1, 3)
        ).alias("status_tag"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
        F.upper("o_orderpriority").alias("priority_upper"),
    )


@query(
    "q_json_extract",
    extra=True,  # rotated out round 10 wave 2 (F1 scalar-function family graded via q_scalar_functions)
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction (§2.8 from_json/get_json_object — the
    engine-side twin of the reference's json.loads, flows/main_flow.py:68)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "q_hourly_events",
    extra=True,  # rotated to the pytest tier in round 8: stream_late_data_drop
    # keeps windowed event counting graded; slot freed for sim_ivfadc_topk
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
      CAST((2 * SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100 + COUNT(*))
           // (2 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation in batch form (§2.9 twin of
    Structured Streaming ``window(ts, '1 hour')``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents: no float rounding anywhere, so the
            # result double is bit-identical across engines (a rounded
            # float avg flips on shortest-repr boundaries — seen at sf0.1)
            (F.sum(cents("value")).cast("double") / 100.0).alias("total_value"),
            (
                half_up_units(F.sum(cents("value")), F.count(F.lit(1)), 100)
                .cast("double") / 10000.0
            ).alias("avg_value"),
        )
    )


_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-10-01'
      AND o_orderdate <  DATE '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("q10_returned_items", extra=True, oracle=_Q10_SQL)  # rotated out r9 (TPC-H join+agg: q3/q5 stay)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape expressed in PURE SQL via ``spark.sql`` — the same
    string runs on both engines (the SQL front-end is part of the query
    surface, not just the DataFrame API). Catalyst plans it identically to
    the DataFrame form: pushed date filters, broadcast nation."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


@query(
    "q_approx_distinct",
    # rotated to the pytest tier in round 7: q_kmv_distinct_rollup now
    # grades cardinality estimation with a FULL value oracle (every
    # sketch byte deterministic), a strictly stronger check
    extra=True,
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per event_type
    (``approx_count_distinct``) next to the exact count — the sketch is the
    100 TB path (no distinct shuffle, mergeable partial state).

    Hash-checkable (round-3): the raw HLL estimate is engine-specific, so
    the deterministic output is the exact count plus ``within_5pct`` — the
    Spark side computes BOTH the sketch and the exact count in one grouped
    pass and asserts the estimate lands within the sketch's configured
    error band (rsd 0.02 → 5% gives 2.5 sigma of slack); the oracle
    computes exact counts and expects TRUE everywhere. The HLL sketch is
    still genuinely exercised — a broken sketch flips the boolean and the
    hash."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@query(
    "q_rank_family",
    extra=True,  # rotated out round 9 third session (window family: q_lateral_topk + q_window_analytic hold the shape)
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(DENSE_RANK()   OVER w AS BIGINT)  AS drank,
           CAST(NTILE(4)       OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6)        AS prank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window family (§2.5): dense_rank / ntile / percent_rank per
    nation — one window spec, one shuffle on the partition key."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@query(
    "q_map_functions",
    extra=True,  # rotated to the pytest tier in round 8 close-out (the JSON/map
    # scalar family keeps q_json_extract graded); freed the slot for the
    # third flagship composition
    oracle="""
    SELECT n_regionkey, n_name AS nation, CAST(n_nationkey AS BIGINT) AS nationkey
    FROM nation
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§2.8): build a per-region name->key map
    (map_from_entries over collect_list) and explode it back to rows — the
    roundtrip is an identity the oracle states directly, so the check pins
    map construction AND map explosion semantics."""
    nation = load_table(spark, sf_dir, "nation")
    maps = nation.groupBy("n_regionkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("n_name", "n_nationkey"))
        ).alias("by_name")
    )
    return maps.select(
        "n_regionkey", F.explode("by_name").alias("nation", "nationkey")
    ).withColumn("nationkey", F.col("nationkey").cast("long"))


_EXISTS_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity > 49
          )
      AND s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
          )
    ORDER BY s_suppkey
"""


# round-8 rotation: EXISTS semantics stay graded via q_semi_join (the
# identical plan); the SQL-surface twin moves to the pytest tier so
# market-basket association rules take a driver-graded slot.
@query("q_exists_subquery", extra=True, oracle=_EXISTS_SQL)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN subqueries in pure SQL — Catalyst
    decorrelates both into joins (left-semi), no per-row re-execution
    (SURVEY.md §4.1 'subquery decorrelation: built-in')."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, "supplier", "lineitem", "nation")
    return spark.sql(_EXISTS_SQL)


@query(
    "q_pivot_event_counts",
    extra=True,  # rotated to the pytest tier in round 8: q_cube_orders keeps
    # the multi-dim agg family graded; slot freed for q_geo_grid_dbscan
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): event counts per user with the five types as
    columns. The explicit value list keeps the plan a single pass (no
    extra distinct-values job) and the output schema deterministic."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


@query(
    "q_range_window",
    # round-8 rotation: the window family stays graded via
    # q_window_analytic + q_rank_family; the RANGE-frame twin moves to
    # the pytest tier so the skyline operator takes a driver-graded slot.
    extra=True,
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(SUM(value) OVER w, 2) AS value_last_hour
    FROM (SELECT event_id, user_id, value, epoch_us(ts) // 1000000 AS ts_s FROM events)
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts_s
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (§2.5): per event, activity in the trailing hour
    by VALUE range over event-time seconds — rows at the same timestamp
    share a frame, unlike rowsBetween. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@query(
    "q_fuzzy_match",
    oracle="""
    WITH dirty AS (
      -- every 10th customer's name with digit #5 corrupted to 'X'
      SELECT c_custkey AS dirty_key,
             substr(c_name, 1, 13) || 'X' || substr(c_name, 15) AS dirty_name
      FROM customer WHERE c_custkey % 10 = 0
    ),
    blocked AS (
      SELECT d.dirty_key, d.dirty_name, c.c_custkey,
             levenshtein(d.dirty_name, c.c_name) AS dist
      FROM dirty d JOIN customer c
        ON substr(d.dirty_name, 15, 4) = substr(c.c_name, 15, 4)
    )
    SELECT dirty_key, dirty_name, c_custkey AS matched_key,
           CAST(dist AS INTEGER) AS dist
    FROM blocked WHERE dist <= 1
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking: corrupted names resolve back to
    canonical rows via a BLOCKED fuzzy join — the equi block key (last 4
    name chars) carries the join, levenshtein only runs within blocks.
    At 100 TB the block key is the shuffle key; the quadratic edit-distance
    never sees the full cross product."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.substring("c_name", 1, 13), F.lit("X"), F.substring("c_name", 15, 100)
        ).alias("dirty_name"),
    )
    blocked = dirty.join(
        cust.select("c_custkey", "c_name"),
        F.substring(F.col("dirty_name"), 15, 4) == F.substring(F.col("c_name"), 15, 4),
    ).select(
        "dirty_key",
        "dirty_name",
        F.col("c_custkey").alias("matched_key"),
        F.levenshtein("dirty_name", "c_name").cast("int").alias("dist"),
    )
    return blocked.where(F.col("dist") <= 1)


@query(
    "q_null_semantics",
    extra=True,  # rotated out round 9 third session (scalar-semantics family: q_scalar_functions stays graded)
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS p1,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS p2
      FROM orders
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(p1) AS BIGINT) AS n_p1,
      CAST(COUNT(*) FILTER (WHERE p1 = p2) AS BIGINT) AS eq_true,
      CAST(COUNT(*) FILTER (WHERE p1 IS NOT DISTINCT FROM p2) AS BIGINT) AS nullsafe_eq,
      CAST(COUNT(*) FILTER (WHERE COALESCE(p1, p2) IS NULL) AS BIGINT) AS both_null,
      CAST(COUNT(*) FILTER (WHERE NULLIF(p1, p2) IS NOT NULL) AS BIGINT) AS nullif_kept
    FROM t
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic corners: = vs null-safe <=> (eqNullSafe),
    COALESCE, NULLIF — the semantics every engine must pin exactly."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p1"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p2"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("p1").alias("n_p1"),
        F.count(F.when(F.col("p1") == F.col("p2"), 1)).alias("eq_true"),
        F.count(F.when(F.col("p1").eqNullSafe(F.col("p2")), 1)).alias("nullsafe_eq"),
        F.count(F.when(F.coalesce("p1", "p2").isNull(), 1)).alias("both_null"),
        F.count(F.when(F.nullif("p1", "p2").isNotNull(), 1)).alias("nullif_kept"),
    )


@query(
    "q_argmax_listagg",
    # rotated to the extra tier in round 11 (grouped/ordered agg stays graded
    # via q1_pricing_summary + alto_simplify's transcript concat-agg)
    extra=True,
    oracle="""
    SELECT n_name,
      max_by(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
        AS richest_customer,
      min_by(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
        AS poorest_customer,
      COALESCE(string_agg(c_mktsegment, ',' ORDER BY c_mktsegment)
        FILTER (WHERE c_custkey % 300 = 0), '') AS segments_sample
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_argmax_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate surface: max_by/min_by with a composite integer tiebreak
    key (exact cents * 1e7 + custkey — total order, engine-agnostic) and
    ordered listagg (sorted collect_list + array_join — never relies on
    shuffle arrival order)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    key = cents("c_acctbal") * F.lit(10000000).cast("long") + F.col("c_custkey")
    joined = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return joined.groupBy("n_name").agg(
        F.max_by("c_name", key).alias("richest_customer"),
        F.min_by("c_name", key).alias("poorest_customer"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("c_custkey") % 300 == 0, F.col("c_mktsegment"))
                )
            ),
            ",",
        ).alias("segments_sample"),
    )


_SCALAR_SUBQ_SQL = """
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
        > (SELECT CAST(SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("q_scalar_subquery", extra=True, oracle=_SCALAR_SUBQ_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subqueries (§2 relational breadth next to the
    EXISTS form): customers with above-nation-average balance. The
    comparison is cross-multiplied into exact integer cents
    (cents·count > sum_cents) so no float average ever exists — the
    classic avg-threshold boundary hazard (see registry.py rules) is
    designed out rather than rounded over. Catalyst decorrelates both
    subqueries into one aggregate + join; same SQL text runs on DuckDB."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, "customer")
    return spark.sql(_SCALAR_SUBQ_SQL)


@query(
    "q_percentiles",
    extra=True,
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (§2.4 breadth): Spark
    ``percentile`` and DuckDB ``quantile_cont`` share linear-interpolation
    semantics, so the rounded values hash-match (verified at sf0.01 before
    registering). At 100 TB the exact form needs a per-group sort — the
    sketch path is ``percentile_approx`` (engine-specific, so the exact
    twin is the one that can carry an oracle, mirroring the
    q_approx_distinct pattern)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


#: sliding-window oracle + agg builder, shared VERBATIM by the batch query
#: below and its streaming twin (plans/streaming_queries.py:
#: stream_sliding_window) so the two can never silently diverge.
SLIDING_WINDOW_ORACLE = """
    SELECT strftime(
             make_timestamp(((epoch_us(ts) // 1800000000) - k) * 1800000000),
             '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events, unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS t(k)
    GROUP BY 1, 2
    """


def sliding_window_agg(ev: DataFrame) -> DataFrame:
    """1 h / 30 min sliding-window rollup (batch or streaming input)."""
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100.0).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query("q_sliding_window", extra=True, oracle=SLIDING_WINDOW_ORACLE)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (1 h window, 30 min slide) — the §2.5
    form tumbling/session queries don't cover: every event lands in
    exactly two overlapping windows. The oracle regenerates the window
    assignment from first principles (each event joins k ∈ {0,1} and its
    window start is the 30-min epoch grid minus k slides — identical to
    ``F.window``'s epoch-aligned start arithmetic), so the overlap
    semantics are hash-verified, not assumed.

    Scale: sliding windows multiply rows by window/slide BEFORE the
    shuffle (here 2x) — the idiomatic form when a metric needs smoothing;
    wider ratios belong in a tumbling pre-aggregate + rolling window over
    it (two small shuffles instead of one big one)."""
    return sliding_window_agg(load_table(spark, sf_dir, "events"))


@query(
    "q_approx_percentile",
    extra=True,
    oracle="""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n_vals,
           TRUE AS rank_ok
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (Greenwald-Khanna sketch) made hash-checkable
    by its own guarantee, mirroring the q_approx_distinct pattern: the
    sketch value itself is engine-specific, but its RANK must land within
    the configured rank error. The query computes the approx p50 per
    group (accuracy 100 → rank error <= 1%), re-joins to count how many
    values fall strictly below / at-or-below it, and emits the boolean
    ``rank_ok`` = [target rank 0.5 lies within the value's rank interval
    widened by 1% + one discrete step]. The oracle expects TRUE for every
    group — a broken sketch (or a wrong rank contract) flips the hash.

    Scale: the sketch is the 100 TB quantile path — mergeable fixed-size
    partial state, no per-group sort; the exact interpolated twin
    (q_percentiles) carries the value-level oracle."""
    ev = load_table(spark, sf_dir, "events")
    appr = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 100)").alias("ap50"),
    )
    joined = ev.join(F.broadcast(appr), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("value").alias("n_vals"),
            F.sum((F.col("value") < F.col("ap50")).cast("long")).alias("n_lt"),
            F.sum((F.col("value") <= F.col("ap50")).cast("long")).alias("n_le"),
        )
        .select(
            "event_type",
            "n_vals",
            (
                (F.col("n_lt") / F.col("n_vals") <= 0.5 + F.lit(0.01) + 1.0 / F.col("n_vals"))
                & (F.col("n_le") / F.col("n_vals") >= 0.5 - F.lit(0.01) - 1.0 / F.col("n_vals"))
            ).alias("rank_ok"),
        )
    )


@query(
    "q_grouping_sets",
    extra=True,
    oracle="""
    SELECT r_name, n_name,
           GROUPING(r_name) * 2 + GROUPING(n_name) AS gid,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_bal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS with grouping_id disambiguation (§2.4 A3
    breadth beyond cube/rollup): nation-level detail, region subtotals and
    a grand total in one pass, each row tagged with the exact grouping(c)
    bit pattern so NULL-as-subtotal is distinguishable from a NULL key.

    Scale: Catalyst plans grouping sets as ONE Expand + aggregate — the
    fact scan happens once regardless of how many sets are requested;
    dims broadcast as in q5.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")
    ).join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    return joined.groupingSets(
        [["r_name", "n_name"], ["r_name"], []], "r_name", "n_name"
    ).agg(
        (F.grouping("r_name") * 2 + F.grouping("n_name")).alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("total_bal"),
    )


@query(
    "q_unpivot_melt",
    extra=True,
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS cnt_f,
             SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS cnt_o,
             SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS cnt_p
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, status, CAST(cnt AS BIGINT) AS cnt
    FROM wide UNPIVOT (cnt FOR status IN (cnt_f AS 'F', cnt_o AS 'O',
                                          cnt_p AS 'P'))
    """,
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long), the inverse of q_pivot_event_counts:
    per-priority status counts pivoted wide in one CASE-sum pass, then
    melted back to (priority, status, cnt) rows with ``DataFrame.unpivot``.

    Scale: unpivot is a narrow Expand projection — no shuffle beyond the
    wide aggregation's own; long output is 3x the wide row count, never
    the fact row count.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("F"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("O"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("P"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="cnt",
    )


_NOT_IN_NULL_SQL = """
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (
         SELECT CASE WHEN o_orderkey = 7 THEN NULL ELSE o_custkey END
         FROM orders WHERE o_totalprice > 400000 OR o_orderkey = 7))
        AS n_with_null,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (
         SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
        AS n_clean
"""


@query("q_not_in_null_aware", extra=True, oracle=_NOT_IN_NULL_SQL)
def q_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN's null-aware anti-join trap, pinned as a query: one NULL in
    the subquery list makes ``x NOT IN (...)`` UNKNOWN for every row, so
    ``n_with_null`` must be 0 while the NULL-free twin ``n_clean`` keeps
    its rows. A plain left-anti join (which treats NULL as non-matching)
    would get this wrong — Spark plans the null-aware form as a separate
    physical operator, which is exactly what this query exercises, in pure
    SQL so the identical string runs on both engines.

    Scale note: the null-aware anti join cannot hash-partition on the key
    (a NULL on the build side defeats per-partition pruning), so Spark
    broadcasts the build side — fine here because a NOT IN list at 100 TB
    should be an aggregated/deduped relation, never a fact table.
    """
    from ..sources.tables import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_NOT_IN_NULL_SQL)


@query(
    "q_data_quality",
    extra=True,
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem)                                AS n_rows,
      (SELECT SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                         OR l_quantity > 50 THEN 1 ELSE 0 END)
       FROM lineitem)                                                AS bad_quantity,
      (SELECT SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                         OR l_returnflag IS NULL THEN 1 ELSE 0 END)
       FROM lineitem)                                                AS bad_returnflag,
      (SELECT SUM(CASE WHEN COALESCE(l_quantity > 45, TRUE)
                        THEN 1 ELSE 0 END)
       FROM lineitem)                                                AS policy_qty_gt45,
      (SELECT SUM(CASE WHEN COALESCE(l_discount > 0.08, TRUE)
                        THEN 1 ELSE 0 END)
       FROM lineitem)                                                AS policy_disc_gt8,
      (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
       FROM lineitem)                                                AS duplicate_keys,
      (SELECT COUNT(*) FROM lineitem
       WHERE l_orderkey IS NULL OR l_orderkey NOT IN (
         SELECT o_orderkey FROM orders
         WHERE o_orderkey IS NOT NULL))                              AS orphans
    """,
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators/quality.py): null/
    range/set-membership rules compiled to CASE sums in ONE pass, key
    uniqueness in the same pass, referential integrity as a broadcast
    anti-join — the validation layer a production ingest needs, with
    structural rules expected clean (0) and two deliberately-tight policy
    rules expected non-zero so the oracle check is non-vacuous on both
    outcomes. The oracle mirrors the operator's NULL contract exactly:
    a NULL predicate result counts as a violation (COALESCE(p, TRUE) in
    the SQL), and a NULL child key counts as an orphan (the anti-join
    convention: NULL never matches a parent) — so the pair stays
    hash-equal on dirty data, not just on this clean corpus.

    Scale: one lineitem scan + 1-row exchange for the rule sums; the
    orphan check shuffles nothing (parent keys aggregate then broadcast).
    """
    from ..operators.quality import (
        duplicate_key_count,
        orphan_count,
        violations,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "bad_quantity": F.col("l_quantity").isNull()
        | (F.col("l_quantity") < 1)
        | (F.col("l_quantity") > 50),
        "bad_returnflag": ~F.col("l_returnflag").isin("A", "N", "R")
        | F.col("l_returnflag").isNull(),
        "policy_qty_gt45": F.col("l_quantity") > 45,
        "policy_disc_gt8": F.col("l_discount") > 0.08,
    }
    base = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *violations(rules),
        duplicate_key_count("l_orderkey", "l_linenumber"),
    )
    orphans = orphan_count(li, orders, "l_orderkey", "o_orderkey")
    return base.crossJoin(F.broadcast(orphans))


@query(
    "q_funnel_steps",
    extra=True,
    oracle="""
    WITH w1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    )
    SELECT user_id,
           strftime(MAX(t1), '%Y-%m-%d %H:%M:%S') AS signup_ts,
           strftime(MAX(t2), '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(MAX(t3), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(CASE WHEN MAX(t1) IS NULL THEN 0
                     ELSE 1 + (MAX(t2) IS NOT NULL)::INT
                            + (MAX(t3) IS NOT NULL)::INT END AS BIGINT)
             AS funnel_depth
    FROM w3 GROUP BY user_id
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel over the event stream: first signup, first
    click strictly after it, first purchase strictly after that — the
    match_recognize-style conversion funnel, expressed as three CHAINED
    per-user window minima so the whole funnel (plus the per-user collapse)
    runs on ONE hash partitioning of user_id: Catalyst plans a single
    Exchange and reuses it across all three Window operators and the final
    aggregate. At 100 TB the funnel cost is one shuffle of (user_id, type,
    ts) triples, never a self-join per step (the naive k-step form is k
    joins)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.select(
        "user_id",
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(F.col("t1").isNull(), F.lit(0))
        .otherwise(
            1
            + F.col("t2").isNotNull().cast("int")
            + F.col("t3").isNotNull().cast("int")
        )
        .cast("long")
        .alias("funnel_depth"),
    )


@query(
    "q_hll_rollup",
    extra=True,
    oracle="""
    SELECT r_name,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS within_5pct
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level MERGEABLE-sketch rollup: DataSketches HLL sketches of
    ordering customers built per NATION (``hll_sketch_agg``), then UNIONED
    to region level (``hll_union_agg``) without rescanning the fact — the
    100 TB rollup contract: aggregate once at fine grain, merge partial
    sketch state upward (sketch union is associative and order-free, so it
    composes across partitions, nodes and time).

    Hash-checkable via the q_approx_distinct pattern: the raw estimate is
    engine-specific, so the output is the exact region count plus a
    ``within_5pct`` boolean (default lgConfigK=12 → RSE ≈ 1.6%, so 5% is
    ~3 sigma) — a broken sketch or union flips the boolean and the hash.
    The nation/customer dims ride broadcast joins; the only wide ops are
    the two aggregations."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("o_custkey", "n_nationkey", "n_regionkey")
    )
    per_nation = joined.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    per_region_est = per_nation.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = joined.groupBy("n_regionkey").agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    return (
        exact.join(F.broadcast(per_region_est), "n_regionkey")
        .join(
            F.broadcast(reg),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "r_name",
            "exact_custs",
            (
                F.abs(F.col("est") - F.col("exact_custs"))
                <= 0.05 * F.col("exact_custs")
            ).alias("within_5pct"),
        )
    )


@query(
    "q_event_transitions",
    extra=True,
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
           ROUND(n / (SUM(n) OVER (PARTITION BY prev_type))::DOUBLE, 6) AS p
    FROM counts
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag window (one user_id Exchange) → (prev, cur) count (one pair
    Exchange, map-side combined) → row-normalized probability via a window
    over the TINY aggregated matrix (25 cells). Deterministic tiebreak on
    event_id; p divides two exact integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


@query(
    "q_cohort_retention",
    extra=True,
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
               AS cohort_week
      FROM events
    ),
    activity AS (
      SELECT user_id, cohort_week,
             date_diff('week', cohort_week, date_trunc('week', ts))
               AS week_offset
      FROM firsts
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users cohorted by the Monday of their
    first event, counted distinct in each subsequent week offset — the
    standard product-analytics retention query. One user_id Exchange for
    the first-seen window, one (cohort, offset) aggregate; week truncation
    is Monday-anchored in both engines so offsets are exact integers."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    firsts = ev.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    )
    activity = firsts.select(
        "user_id",
        "cohort_week",
        (
            F.datediff(
                F.date_trunc("week", F.col("ts")), F.col("cohort_week")
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count_distinct("user_id").alias("active_users"))


@query(
    "q_event_trigrams",
    extra=True,
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p2
      FROM events
    ),
    tri AS (
      SELECT p2 AS step1, p1 AS step2, event_type AS step3, COUNT(*) AS n
      FROM seq WHERE p2 IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT step1, step2, step3, CAST(n AS BIGINT) AS n,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY n DESC, step1, step2, step3
      ) AS rnk FROM tri
    ) WHERE rnk <= 20
    """,
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step behavior paths (sequential pattern mining one order
    above q_event_transitions): two stacked lags over the SAME user
    window — one user_id Exchange serves both — then a (s1,s2,s3) count
    and a global top-k with a total-order tiebreak. The path-mining
    primitive behind funnel discovery (q_funnel_steps checks a KNOWN
    funnel; this finds candidates).

    Scale: identical shape to the transition matrix — the trigram space
    (|types|³ ≤ 125 here) aggregates map-side; the global top-20 window
    runs on the aggregated cells, not events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    tri = (
        seq.where(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(
        F.col("n").desc(), F.col("step1"), F.col("step2"), F.col("step3")
    )
    return (
        tri.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 20)
        .select("step1", "step2", "step3", "n", F.col("rnk").cast("int").alias("rnk"))
    )


@query(
    "q_corr_matrix",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS p,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd,
             SUM(q*q) AS sqq, SUM(p*p) AS spp, SUM(d*d) AS sdd,
             SUM(q*p) AS sqp, SUM(q*d) AS sqd, SUM(p*d) AS spd
      FROM base
    ),
    pairs AS (
      SELECT 'quantity' AS col_x, 'price' AS col_y, n,
             CAST(n AS HUGEINT)*sqp - CAST(sq AS HUGEINT)*sp AS num,
             CAST(n AS HUGEINT)*sqq - CAST(sq AS HUGEINT)*sq AS dx2,
             CAST(n AS HUGEINT)*spp - CAST(sp AS HUGEINT)*sp AS dy2
      FROM mom
      UNION ALL
      SELECT 'quantity', 'discount', n,
             CAST(n AS HUGEINT)*sqd - CAST(sq AS HUGEINT)*sd,
             CAST(n AS HUGEINT)*sqq - CAST(sq AS HUGEINT)*sq,
             CAST(n AS HUGEINT)*sdd - CAST(sd AS HUGEINT)*sd
      FROM mom
      UNION ALL
      SELECT 'price', 'discount', n,
             CAST(n AS HUGEINT)*spd - CAST(sp AS HUGEINT)*sd,
             CAST(n AS HUGEINT)*spp - CAST(sp AS HUGEINT)*sp,
             CAST(n AS HUGEINT)*sdd - CAST(sd AS HUGEINT)*sd
      FROM mom
    )
    SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
           ROUND(CAST(num AS DOUBLE)
                 / sqrt(CAST(dx2 AS DOUBLE) * CAST(dy2 AS DOUBLE)), 6)
             AS corr
    FROM pairs
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of three lineitem measures from EXACT
    integer moments: one scan computes all sums-of-products in long
    arithmetic (values scaled so every moment fits: whole dollars, cents
    discount), the covariance algebra ``n·Sxy − Sx·Sy`` runs in
    decimal(38)/HUGEINT exactly, and only the final divide/sqrt touches
    doubles (identical operands both engines, rounded to 6). Spark's own
    ``F.corr`` is a float path whose summation order is engine-private —
    this is the hash-stable formulation of the same statistic.

    Scale: ONE pass, map-side partial aggregation to a single 10-number
    row; the pair expansion is 3 rows of driver-free arithmetic. A k-col
    matrix is the same scan with k(k+1)/2 product sums.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round("l_extendedprice", 0).cast("long").alias("p"),
        cents("l_discount").alias("d"),
    )
    mom = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731

    def pair(cx: str, cy: str, sxy: str, sx: str, sy: str, sxx: str, syy: str):
        num = dec("n") * dec(sxy) - dec(sx) * dec(sy)
        dx2 = dec("n") * dec(sxx) - dec(sx) * dec(sx)
        dy2 = dec("n") * dec(syy) - dec(sy) * dec(sy)
        return F.struct(
            F.lit(cx).alias("col_x"),
            F.lit(cy).alias("col_y"),
            F.col("n").alias("n"),
            F.round(
                num.cast("double")
                / F.sqrt(dx2.cast("double") * dy2.cast("double")),
                6,
            ).alias("corr"),
        )

    rows = mom.select(
        F.explode(
            F.array(
                pair("quantity", "price", "sqp", "sq", "sp", "sqq", "spp"),
                pair("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"),
                pair("price", "discount", "spd", "sp", "sd", "spp", "sdd"),
            )
        ).alias("r")
    )
    return rows.select("r.col_x", "r.col_y", "r.n", "r.corr")


@query(
    "q_outlier_zscore",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 997 = 0
                  THEN CAST(ROUND(value * 100) AS BIGINT) * 50
                  ELSE CAST(ROUND(value * 100) AS BIGINT) END AS v_cents
      FROM events
    ),
    mom AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(v_cents) AS sv, SUM(v_cents * v_cents) AS svv
      FROM base GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.v_cents
    FROM base b JOIN mom m ON b.event_type = m.event_type
    WHERE (CAST(b.v_cents AS HUGEINT) * m.n - m.sv)
          * (CAST(b.v_cents AS HUGEINT) * m.n - m.sv)
          > 9 * (CAST(m.n AS HUGEINT) * m.svv - CAST(m.sv AS HUGEINT) * m.sv)
    """,
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outlier detection in EXACT integer algebra: the
    z-score gate |v−μ| > 3σ is cross-multiplied to
    ``(v·n − Σv)² > 9(n·Σv² − (Σv)²)`` so the comparison runs on exact
    decimal(38)/HUGEINT integers — no float μ/σ whose engine-specific
    rounding could flip a borderline row. Extreme outliers are
    additionally PLANTED (every 997th event's value ×50) on top of the
    naturally right-skewed value distribution, so the flagged set mixes
    guaranteed plants with genuine tail rows — the oracle adjudicates
    BOTH, row-level (47 rows at sf0.01, every plant among them).

    Scale: one groupBy(event_type) moment pass (map-side partials) +
    one broadcast-join filter scan — the anomaly gate for a 100 TB
    telemetry table is two scans, no sort, no window.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 997 == 0, cents("value") * 50
        )
        .otherwise(cents("value"))
        .alias("v_cents"),
    )
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_cents").alias("sv"),
        F.sum(F.col("v_cents") * F.col("v_cents")).alias("svv"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = ev.join(F.broadcast(mom), "event_type")
    dev = dec(F.col("v_cents")) * dec(F.col("n")) - dec(F.col("sv"))
    var_n2 = dec(F.col("n")) * dec(F.col("svv")) - dec(F.col("sv")) * dec(
        F.col("sv")
    )
    return joined.where(dev * dev > 9 * var_n2).select(
        "event_id", "event_type", "v_cents"
    )


@query(
    "q_dod_growth",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           rev_cents,
           CAST(lag(rev_cents) OVER w AS BIGINT) AS prev_cents,
           ROUND((rev_cents - lag(rev_cents) OVER w)
                 / CAST(lag(rev_cents) OVER w AS DOUBLE), 6) AS dod_growth
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def q_dod_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue growth per event type — the reporting-layer
    staple (daily rollup + lag + relative delta): revenue stays in exact
    integer cents through the rollup, the growth ratio is the single
    double op (identical operands both engines, rounded 6), first days
    keep NULLs. One (type, day) agg exchange + a window over the tiny
    daily relation.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents("value")).alias("rev_cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("rev_cents").over(w)
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev_cents",
        prev.cast("long").alias("prev_cents"),
        F.round(
            (F.col("rev_cents") - prev) / prev.cast("double"), 6
        ).alias("dod_growth"),
    )


@query(
    "q_variant_shred",
    extra=True,
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract('{"base": ' || props || ', "uid": '
                               || CAST(user_id AS VARCHAR) || '}',
                               '$.base.k') AS BIGINT) AS k,
             CAST(json_extract('{"base": ' || props || ', "uid": '
                               || CAST(user_id AS VARCHAR) || '}',
                               '$.uid') AS BIGINT) AS uid
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN uid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_uid
    FROM v GROUP BY event_type
    """,
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: the semi-structured ``props`` column is
    wrapped into a nested JSON document, parsed ONCE into a VARIANT
    (``parse_json`` — binary-encoded, no per-path re-parsing), and
    typed values are shredded out with ``variant_get`` path expressions
    ('$.base.k', '$.uid') before an ordinary aggregate. The oracle
    replays the same paths with DuckDB's json_extract over the identical
    constructed string.

    Scale: VARIANT is the schema-on-read answer for heterogeneous event
    payloads at 100 TB — one parse per row into a binary form, typed
    sub-field access without exploding the schema, and the extraction
    runs in whole-stage codegen (contrast with repeated
    get_json_object calls, each a full JSON re-parse).
    """
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"base": '),
        F.col("props"),
        F.lit(', "uid": '),
        F.col("user_id").cast("string"),
        F.lit("}"),
    )
    v = ev.select(
        "event_type", F.parse_json(doc).alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.base.k', 'long')").alias("k"),
        F.expr("variant_get(v, '$.uid', 'long')").alias("uid"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("uid").isNotNull(), 1).otherwise(0)).alias("n_uid"),
    )


@query(
    "q_cumulative_distinct_users",
    extra=True,
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT cumulative distinct users per day — the window no engine can
    run directly (COUNT(DISTINCT) OVER a running frame would re-scan
    every prefix, O(days x users)), linearized through the first-seen
    identity: a user joins the cumulative count exactly once, on their
    first active day. min-per-user + count-per-day + running sum = three
    linear passes; the running-sum window runs over ~30 day rows.

    Scale: this identity is how DAU/MAU-to-date dashboards stay exact at
    100 TB (the alternative is HLL unions, approximate); the only
    user-sized shuffle is the per-user MIN with map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@query(
    "q_session_window_builtin",
    extra=True,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *,
             SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_seq
      FROM flagged
    )
    SELECT
      user_id,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        AS session_end,
      CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN batch ``session_window`` — the
    same 30-minute-gap semantics as the hand-rolled q_sessionize, but
    expressed as one groupBy on the merging window. Two deliberate
    semantic deltas the oracle replays: the boundary is exclusive (a gap
    of EXACTLY 30 min starts a new session — adjacent [t, t+gap) windows
    don't overlap), and session_end is last_event + gap (the window's
    close), not the last event time. Adjudicating both shapes against
    gap-island oracles pins that the built-in and the lag/running-sum
    construction agree on this data everywhere except those documented
    boundary rules.

    Scale: one shuffle on user_id, sessions merged inside the aggregate
    — the same exchange profile as the window formulation, with the
    session-merge logic in native code instead of two window passes.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
    )


@query(
    "q_topk_agg_form",
    extra=True,
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_topk_agg_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-3 as a PURE AGGREGATE — sort_array(collect_list(
    struct)) sliced to k, then posexploded — the plan-shape ALTERNATIVE
    to q_topk_per_group's ranking window, hash-checked against the
    IDENTICAL oracle so both formulations are pinned to the same answer.

    Why both exist: the window form needs a sort per group but Spark's
    WindowGroupLimit pre-cuts to k rows before the exchange; the
    aggregate form is a single partial-merging groupBy whose map-side
    combine keeps ONLY k rows per group per partition IF the slice is
    applied in the partial — here the slice happens post-merge, so the
    exchange carries whole groups: the right trade when groups are
    small/bounded (per-customer orders) and the window sort dominates,
    the wrong one on unbounded groups. The pinned equality is what lets
    a planner swap them safely.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    packed = orders.groupBy("o_custkey").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("o_totalprice")).alias("neg_price"),
                        F.col("o_orderkey").alias("o_orderkey"),
                        F.col("o_totalprice").alias("o_totalprice"),
                    )
                )
            ),
            1,
            3,
        ).alias("top")
    )
    return packed.select(
        "o_custkey", F.posexplode("top").alias("pos", "t")
    ).select(
        "o_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        F.round(F.col("t.o_totalprice"), 2).alias("totalprice"),
        (F.col("pos") + 1).cast("int").alias("rn"),
    )


@query(
    "q_mad_robust",
    extra=True,
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS m
      FROM c GROUP BY event_type
    )
    SELECT c.event_type,
           ROUND(med.m, 2) AS median_cents,
           ROUND(quantile_cont(ABS(c.cents - med.m), 0.5), 2) AS mad_cents
    FROM c JOIN med USING (event_type)
    GROUP BY c.event_type, med.m
    """,
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    statistic (outlier-immune, unlike stddev) over exact integer cents:
    median via the interpolated percentile both engines share
    (q_percentiles precedent), deviations |x − m| exact doubles (m is at
    worst a .5 midpoint), second interpolated median over them. The
    robust complement of q_rolling_zscore_anomaly's mean/σ window.

    Scale: two grouped percentile passes sharing the event_type key —
    the median relation is group-cardinality-sized and broadcasts into
    the deviation join; exact percentiles sort within groups only.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("m")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "m",
        F.abs(F.col("cents") - F.col("m")).alias("adev"),
    )
    return dev.groupBy("event_type", "m").agg(
        F.round(F.first("m"), 2).alias("median_cents"),
        F.round(F.expr("percentile(adev, 0.5)"), 2).alias("mad_cents"),
    ).select("event_type", "median_cents", "mad_cents")


@query(
    "q_audience_overlap",
    extra=True,
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_orderpriority AS prio, o_custkey AS ck FROM orders
    )
    SELECT x.prio AS prio_a, y.prio AS prio_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM a x JOIN a y ON x.ck = y.ck AND x.prio < y.prio
    GROUP BY 1, 2
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap matrix — for every pair of order
    priorities, how many customers appear in BOTH audiences (the
    co-occurrence counts behind segment-similarity and campaign-overlap
    reports). The membership relation is distinct-ed FIRST (one keyed
    shuffle on (prio, ck)), then self-joined on the member key: each
    member carries at most |priorities| = 5 rows, so the join fan-out is
    bounded by 25 per member — never |audience|² — and the pair census
    is a map-side-combining groupBy over 10 unordered pairs.

    Scale: this is the audience-sketch-free EXACT form; the shuffle is
    member-keyed (no hot keys — every customer is one group), and the
    p1 < p2 predicate halves the pair space in the join itself. With
    thousands of segments the same plan holds because the per-member
    fan-out is segments-per-member choose 2, not |segments|²."""
    a = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("ck"),
        )
        .distinct()
    )
    x = a.alias("x")
    y = a.select(
        F.col("prio").alias("prio_y"), F.col("ck").alias("ck_y")
    ).alias("y")
    return (
        x.join(
            y,
            (F.col("x.ck") == F.col("ck_y"))
            & (F.col("x.prio") < F.col("prio_y")),
        )
        .groupBy(
            F.col("x.prio").alias("prio_a"), F.col("prio_y").alias("prio_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "q_mutual_information",
    extra=True,
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM customer GROUP BY 1, 2
    ),
    mseg AS (SELECT seg, CAST(SUM(n_ij) AS BIGINT) AS n_i
             FROM cells GROUP BY seg),
    mnat AS (SELECT nat, CAST(SUM(n_ij) AS BIGINT) AS n_j
             FROM cells GROUP BY nat),
    tot AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS n FROM cells),
    contrib AS (
      SELECT c.seg, c.nat,
             CAST(ROUND(
               (CAST(c.n_ij AS DOUBLE) / t.n)
               * ln(CAST(c.n_ij AS DOUBLE) * t.n
                    / (CAST(s.n_i AS DOUBLE) * g.n_j))
               * 1000000
             ) AS BIGINT) AS mi_micro
      FROM cells c
      JOIN mseg s USING (seg) JOIN mnat g USING (nat) CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(mi_micro) AS BIGINT) AS mi_micro
    FROM contrib
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between market segment and nation — the
    dependence measure completing the chi-square contingency audit (MI
    answers "how MUCH structure", chi-square "is there any"): I(X;Y) =
    sum p_ij * ln(p_ij / (p_i p_j)) in nats. Determinism device: each
    CELL's contribution is snapped to an integer micro-nat FIRST (the
    ln of a data-sized ratio is irrational, so the .5 boundary is
    measure-zero — the round-8 ROUND rule), then the total is a SUM OF
    LONGS, immune to the cross-engine float-summation-order hazard that
    a single ROUND(SUM(double)) would hit. Both engines evaluate the
    identical operand order: (n_ij/N) * ln(n_ij*N / (n_i*n_j)) * 1e6.

    Scale: one map-side-combining groupBy builds the contingency cells;
    margins reduce FROM THE CELLS (|X| + |Y| rows, never a fact rescan);
    the 1-row total and both margins broadcast back onto the cells."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nat")
    )
    cells = cust.groupBy("seg", "nat").agg(F.count(F.lit(1)).alias("n_ij"))
    from ..functions.scale import scoped_persist

    cells = scoped_persist(cells, "q_mutual_information.cells")
    mseg = cells.groupBy("seg").agg(F.sum("n_ij").alias("n_i"))
    mnat = cells.groupBy("nat").agg(F.sum("n_ij").alias("n_j"))
    tot = cells.agg(F.sum("n_ij").alias("n"))
    contrib = (
        cells.join(F.broadcast(mseg), "seg")
        .join(F.broadcast(mnat), "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("n_ij").cast("double") / F.col("n"))
                * F.log(
                    F.col("n_ij").cast("double")
                    * F.col("n")
                    / (F.col("n_i").cast("double") * F.col("n_j"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("mi_micro")
        )
    )
    return contrib.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("mi_micro").alias("mi_micro"),
    )


@query(
    "q_skyline_pareto",
    # Promoted to the graded window in round 8: Pareto-dominance is a new
    # operator class with no graded representative (displaces
    # q_range_window).
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT a.p_partkey, a.price_cents, a.size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price_cents <= a.price_cents AND b.size >= a.size
        AND (b.price_cents < a.price_cents OR b.size > a.size)
    )
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-dominance) query — parts on the
    minimize-price / maximize-size frontier, the multi-criteria
    shortlist operator (Borzsony et al.'s SKYLINE OF) that no
    aggregate or top-k expresses. A part survives iff nothing is
    cheaper-or-equal AND bigger-or-equal with one strict.

    Spark plan — the 2D skyline NEVER needs the quadratic NOT EXISTS
    the oracle uses: collapse to the per-price max size (map-side
    combining groupBy to a PRICE-DOMAIN-sized spine — the vocabulary,
    not the corpus), take the running max over price ascending on that
    spine (exclusive M_lt and inclusive M_le), broadcast the spine
    back, and keep rows with size > M_lt AND size = M_le-group max —
    algebraically exactly the dominance test. Duplicated frontier
    points all survive (no strict dominator), matching the oracle.

    Scale: one keyed agg + a compressed-spine window + one broadcast
    join; at an unbounded price domain the spine itself two-levels
    (bucket partial maxima -> prefix over bucket summaries), same
    device as the dense-ids rank."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        cents("p_retailprice").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    spine = p.groupBy("price_cents").agg(F.max("size").alias("gmax"))
    w = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    spine = spine.select(
        "price_cents",
        F.max("gmax").over(w).alias("m_le"),
        F.lag(F.max("gmax").over(w))
        .over(Window.orderBy("price_cents"))
        .alias("m_lt"),
    )
    return (
        p.join(F.broadcast(spine), "price_cents")
        .where(
            (F.col("m_lt").isNull() | (F.col("size") > F.col("m_lt")))
            & (F.col("size") == F.col("m_le"))
        )
        .select("p_partkey", "price_cents", "size")
    )


@query(
    "q_market_basket",
    # Promoted to the graded window in round 8: association rules are a
    # new operator class with no graded representative (displaces
    # q_exists_subquery).
    oracle="""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS br
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT br, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY br),
    nt AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_orders FROM b),
    co AS (
      SELECT x.br AS ante, y.br AS cons, CAST(COUNT(*) AS BIGINT) AS n_co
      FROM b x JOIN b y ON x.k = y.k AND x.br <> y.br
      GROUP BY 1, 2
    )
    SELECT ante, cons, n_co,
           CAST((2 * n_co * 1000000 + t.n_orders)
                // (2 * t.n_orders) AS BIGINT) AS support_ppm,
           CAST((2 * n_co * 1000000 + a.n) // (2 * a.n) AS BIGINT)
             AS confidence_ppm,
           CAST((2 * n_co * t.n_orders * 1000 + a.n * c.n)
                // (2 * a.n * c.n) AS BIGINT) AS lift_milli
    FROM co
    JOIN nb a ON a.br = ante JOIN nb c ON c.br = cons CROSS JOIN nt t
    WHERE (2 * n_co * 1000000 + a.n) // (2 * a.n) >= 150000
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket ASSOCIATION RULES (support / confidence / lift) over
    brand pairs co-purchased in one order — the classic frequent-
    itemset analytics operator the registry lacked: rules ante→cons
    with confidence ≥ 15% (the basket fan-out over 25 brands caps
    achievable confidence well under 50% — measured before registration
    so the rule set is non-vacuous at every SF), every metric an EXACT integer ratio
    (support = n_co/n_orders, confidence = n_co/n_ante in half-up ppm;
    lift = n_co·n_orders/(n_ante·n_cons) in half-up milli — numerators
    cross-multiplied, no division until the final snapped one).

    Scale: the basket relation distinct-s on (order, brand) — one keyed
    shuffle; the pair join is keyed on the ORDER (fan-out bounded by
    brands-per-order squared, never |brand-audience|²  — the
    q_audience_overlap argument); brand margins are dimension-sized and
    broadcast; the global order count is a 1-row broadcast. The
    confidence filter re-states the snapped expression so predicate
    and projection agree exactly."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("br"))
        .distinct()
    )
    from ..functions.scale import scoped_persist

    b = scoped_persist(b, "q_market_basket.baskets")
    nb = b.groupBy("br").agg(F.count(F.lit(1)).alias("n"))
    nt = b.agg(F.countDistinct("k").alias("n_orders"))
    x = b.alias("x")
    y = b.select(F.col("k").alias("k_y"), F.col("br").alias("br_y"))
    # order-keyed self-join of the persisted basket relation: stats are
    # gone, so hint shuffle-hash — per-order brand lists are bounded and
    # SHJ skips both sort passes (the large-large non-broadcast shape).
    co = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("x.k") == F.col("k_y")) & (F.col("x.br") != F.col("br_y")),
        )
        .groupBy(F.col("x.br").alias("ante"), F.col("br_y").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    d = F.call_function
    j = (
        co.join(F.broadcast(nb.select(F.col("br").alias("ante"), F.col("n").alias("n_a"))), "ante")
        .join(F.broadcast(nb.select(F.col("br").alias("cons"), F.col("n").alias("n_c"))), "cons")
        .crossJoin(F.broadcast(nt))
    )
    conf = d("div", F.lit(2) * F.col("n_co") * 1_000_000 + F.col("n_a"), F.lit(2) * F.col("n_a"))
    return j.where(conf >= 150_000).select(
        "ante",
        "cons",
        "n_co",
        d(
            "div",
            F.lit(2) * F.col("n_co") * 1_000_000 + F.col("n_orders"),
            F.lit(2) * F.col("n_orders"),
        ).alias("support_ppm"),
        conf.alias("confidence_ppm"),
        d(
            "div",
            F.lit(2) * F.col("n_co") * F.col("n_orders") * 1_000
            + F.col("n_a") * F.col("n_c"),
            F.lit(2) * F.col("n_a") * F.col("n_c"),
        ).alias("lift_milli"),
    )


@query(
    "q_exact_median_by_group",
    extra=True,
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    r AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY c) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST((2 * SUM(c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS median_cents
    FROM r
    WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
    GROUP BY event_type
    """,
)
def q_exact_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (integer cents): select the middle one or
    two order statistics by rank arithmetic (rn*2 ∈ {n, n+1, n+2} picks
    exactly the two middles for even n and the single middle for odd n
    — for odd n only rn = (n+1)/2 matches), then average them with the
    half-up integer device. The distributed shape is ONE group-key
    window (rank + count share the exchange) — the exact complement of
    q_approx_percentile's sketch and q_winsorize's global dense-ids
    rank, at per-group grain.

    Scale: one exchange on the group key; the middle-row filter drops
    everything else before the 1-or-2-row-per-group aggregate."""
    v = load_table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c")
    )
    w = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "c",
        F.row_number().over(w.orderBy("c")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mid = r.where(
        (F.col("rn") * 2 == F.col("n"))
        | (F.col("rn") * 2 == F.col("n") + 1)
        | (F.col("rn") * 2 == F.col("n") + 2)
    )
    return mid.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.call_function(
            "div", 2 * F.sum("c") + F.count(F.lit(1)), 2 * F.count(F.lit(1))
        ).alias("median_cents"),
    )


@query(
    "q_item_cf",
    extra=True,  # rotated out round 10 wave 2 (association family graded via q_market_basket)
    oracle="""
    WITH ui AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_u FROM ui GROUP BY 1
    ),
    co AS (
      SELECT a.event_type AS ia, b.event_type AS ib,
             CAST(COUNT(*) AS BIGINT) AS co
      FROM ui a
      JOIN ui b ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT ia AS item, ib AS neighbor, co FROM co
      UNION ALL
      SELECT ib AS item, ia AS neighbor, co FROM co
    ),
    scored AS (
      SELECT s.item, s.neighbor, s.co,
             CAST((2 * s.co * s.co * 1000000 + na.n_u * nb.n_u)
                  // (2 * na.n_u * nb.n_u) AS BIGINT) AS cos2_ppm
      FROM sym s
      JOIN n na ON na.event_type = s.item
      JOIN n nb ON nb.event_type = s.neighbor
    )
    SELECT item, neighbor, co, cos2_ppm, CAST(rn AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY item ORDER BY cos2_ppm DESC, neighbor
      ) AS rn FROM scored
    ) WHERE rn <= 3
    """,
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over user behavior — the
    co-occurrence recommender (the classic 'users who did X also did Y'):
    distinct (user, item) interactions, per-user item-pair co-counts,
    squared-cosine affinity co²/(n_a·n_b) as exact integer ppm via the
    half-up device (squaring keeps the score rational so NO irrational
    division exists anywhere — same dodge as the z-test clearing), top-3
    neighbors per item. Completes the behavioral-analytics family beside
    q_market_basket (sets→rules) and q_event_transitions (sequence):
    this is the similarity form recommenders actually serve.

    Scale: the pair generation is keyed on user_id and each user
    contributes at most C(k,2) pairs for k distinct items — bounded
    fan-out, never corpus-quadratic; item-count joins are broadcast
    (vocabulary-sized); the rank window partitions by item.
    """
    ev = load_table(spark, sf_dir, "events")
    ui = ev.select("user_id", "event_type").distinct()
    n = ui.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_u"))
    a = ui.select("user_id", F.col("event_type").alias("ia"))
    b = ui.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("ib"))
    co = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("user_id") == F.col("uid_b")) & (F.col("ia") < F.col("ib")),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    sym = co.select(
        F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "co"
    ).unionAll(
        co.select(
            F.col("ib").alias("item"), F.col("ia").alias("neighbor"), "co"
        )
    )
    d = F.call_function
    scored = (
        sym.join(
            F.broadcast(n.select(F.col("event_type").alias("item"), F.col("n_u").alias("na"))),
            "item",
        )
        .join(
            F.broadcast(n.select(F.col("event_type").alias("neighbor"), F.col("n_u").alias("nb"))),
            "neighbor",
        )
        .select(
            "item",
            "neighbor",
            "co",
            d(
                "div",
                F.lit(2) * F.col("co") * F.col("co") * 1_000_000
                + F.col("na") * F.col("nb"),
                F.lit(2) * F.col("na") * F.col("nb"),
            ).alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cos2_ppm").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("item", "neighbor", "co", "cos2_ppm", "rank")
    )


#: shared LATERAL text — both engines run it verbatim (the recursive-CTE
#: device applied to correlated lateral subqueries)
_SQL_LATERAL_TOPK = """
SELECT c.c_custkey, o.o_orderkey, o.totalprice_cents
FROM customer c,
LATERAL (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY totalprice_cents DESC, o_orderkey
  LIMIT 2
) o
"""


@query("q_lateral_topk", oracle=_SQL_LATERAL_TOPK)  # graded since r9: decorrelated LATERAL
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 lateral join — the SQL-surface
    breadth item beside WITH RECURSIVE): each customer's top-2 orders by
    price, expressed as a per-row dependent subquery with ORDER BY +
    LIMIT. The text is SHARED VERBATIM with the oracle, so the lateral
    decorrelation machinery itself is what's adjudicated — Spark plans
    this as the window top-k (the q_topk_per_group plan), proving the
    declarative form reaches the same physical shape.

    Scale: Catalyst decorrelates to a partitioned rank — one customer-key
    exchange, WindowGroupLimit pre-cutting per partition; never an
    actual per-row subquery execution.
    """
    from ..sources.tables import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_LATERAL_TOPK)


@query(
    "q_mad_outliers",
    extra=True,
    oracle="""
    WITH hist AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, v, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cum
      FROM hist
    ),
    tot AS (SELECT grp, MAX(cum) AS n FROM cum GROUP BY grp),
    med AS (
      SELECT c2.grp,
             CAST(SUM(
               CASE WHEN (n + 1) // 2 > cum - c AND (n + 1) // 2 <= cum
                    THEN v ELSE 0 END
               + CASE WHEN (n + 2) // 2 > cum - c AND (n + 2) // 2 <= cum
                      THEN v ELSE 0 END) AS BIGINT) AS med2,
             CAST(MAX(n) AS BIGINT) AS n
      FROM cum c2 JOIN tot USING (grp) GROUP BY c2.grp
    ),
    dev AS (
      SELECT h.grp, ABS(2 * h.v - m.med2) AS d, CAST(SUM(h.c) AS BIGINT) AS c
      FROM hist h JOIN med m USING (grp) GROUP BY 1, 2
    ),
    dcum AS (
      SELECT grp, d, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY d) AS cum
      FROM dev
    ),
    dtot AS (SELECT grp, MAX(cum) AS n FROM dcum GROUP BY grp),
    mad AS (
      SELECT dc.grp,
             CAST(SUM(
               CASE WHEN (n + 1) // 2 > cum - c AND (n + 1) // 2 <= cum
                    THEN d ELSE 0 END
               + CASE WHEN (n + 2) // 2 > cum - c AND (n + 2) // 2 <= cum
                      THEN d ELSE 0 END) AS BIGINT) AS mad2
      FROM dcum dc JOIN dtot USING (grp) GROUP BY dc.grp
    ),
    fl AS (
      SELECT dev.grp, CAST(SUM(c) AS BIGINT) AS n_outliers
      FROM dev JOIN mad USING (grp)
      WHERE 1349 * d > 1300 * mad2
      GROUP BY dev.grp
    )
    SELECT m.grp, m.n, m.med2, mad.mad2,
           CAST(COALESCE(fl.n_outliers, 0) AS BIGINT) AS n_outliers
    FROM med m JOIN mad USING (grp) LEFT JOIN fl USING (grp)
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier counts by median/MAD
    (operators/quality.py:mad_outliers): order totals per priority,
    doubled-median device so every statistic is an exact long (med2 =
    sum of the two middle order statistics; mad2 = 4*MAD; flag rule
    1349*d > z_milli*mad2 — no float anywhere), robust z threshold 1.3
    (the bounded uniform-ish price distribution tops out at robust z
    ~1.35, so the conventional 3.5 flags nothing here; the DEVICE is
    the deliverable, the threshold is the caller's).
    Completes the data-quality family beside the rule checker and PSI
    drift: mean/stddev z-scores break down under the very outliers they
    hunt; median/MAD has a 50% breakdown point.

    Scale: no row sort — rows fold into a per-(group, value) histogram
    (map-side combined), selection runs on the histogram's cumulative
    scan, deviations re-key the SAME histogram. Two passes over the
    distinct-value relation, zero passes over raw rows after the first
    aggregation.
    """
    from ..operators.quality import mad_outliers

    orders = load_table(spark, sf_dir, "orders")
    return mad_outliers(
        orders.withColumnRenamed("o_orderpriority", "grp"),
        "grp",
        cents("o_totalprice"),
        z_milli=1300,
    )


@query(
    "q_yannakakis_chain",
    # promoted r14: multi-way join planning, never graded (ROTATION.md)
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_nationkey
    """,
)
def q_yannakakis_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yannakakis semi-join reduction over the acyclic chain
    customer(BUILDING) ← orders(1996) ← lineitem: a full bottom-up
    reducer pass (orders ⋉ qualifying customers, lineitem ⋉ reduced
    orders) runs BEFORE any expensive join, so no dangling tuple ever
    enters a join — the classic guarantee (Yannakakis 1981) that makes
    acyclic joins linear-time, and the thing Catalyst only approximates
    probabilistically (runtime Bloom filters / DPP). The oracle is the
    plain 3-way join — the reduction must be answer-preserving by
    construction; the DANGLING-FREE property itself is pinned in
    tests/test_plan_shapes.py (every reduced lineitem row finds its
    order; every reduced order finds both neighbors).

    Scale: the reducer semi-joins ship only join KEYS (the semi side
    carries no payload); the big fact is filtered to the qualifying ~2%
    before its shuffle. At 100 TB this is the difference between
    shuffling lineitem once at full width and once at reduced
    cardinality — the reduction pass costs one key-only scan and pays
    for itself whenever selectivity is real.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    # bottom-up reducer: keys-only semi joins, leaf to root
    o_red = orders.join(
        F.broadcast(
            cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
        ),
        "o_custkey",
        "left_semi",
    )
    l_red = li.join(
        o_red.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    # dangling-free join phase (fresh aliases — cust/o_red already fed the
    # reducer, and a re-join on the same lineage trips the ambiguity check)
    joined = l_red.join(
        o_red.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_custkey").alias("j_custkey"),
        ),
        "l_orderkey",
    ).join(
        F.broadcast(
            cust.select(
                F.col("c_custkey").alias("j_custkey"), "c_nationkey"
            )
        ),
        "j_custkey",
    )
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.sum(cents("l_extendedprice")).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q_equidepth_stats",
    extra=True,
    oracle="""
    WITH hist AS MATERIALIZED (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v, COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    cum AS MATERIALIZED (
      SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM hist
    ),
    tot AS (SELECT MAX(cum) AS n, MIN(v) AS vmin FROM cum),
    ranks AS (
      SELECT range AS k, vmin,
             CAST(CEIL(range * n / 8.0) AS BIGINT) AS r
      FROM range(1, 9), tot
    ),
    bounds AS (
      SELECT k, MIN(v) AS hi, MIN(vmin) AS vmin
      FROM ranks JOIN cum ON cum >= r GROUP BY k
    ),
    bks AS MATERIALIZED (
      SELECT k, COALESCE(LAG(hi) OVER (ORDER BY k), vmin - 1) AS lo, hi
      FROM bounds
    ),
    asg AS (
      SELECT b.k, b.lo, b.hi, h.v, h.c
      FROM hist h JOIN bks b ON h.v > b.lo AND h.v <= b.hi
    )
    SELECT CAST(k AS INT) AS bucket,
           CAST(lo AS BIGINT) AS lo,
           CAST(hi AS BIGINT) AS hi,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(FLOOR(
             (2 * SUM(c)
                * GREATEST(0, LEAST(hi, 20000000) - GREATEST(lo, 10000000))
              + (hi - lo))
             / (2.0 * (hi - lo))) AS BIGINT) AS est_probe_rows,
           CAST(SUM(CASE WHEN v >= 10000000 AND v <= 20000000
                    THEN c ELSE 0 END) AS BIGINT) AS actual_probe_rows
    FROM asg GROUP BY k, lo, hi
    """,
)
def q_equidepth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style equi-depth histogram + selectivity probe
    (operators/stats.py:equidepth_selectivity) over order totals: 8
    equal-height buckets whose boundaries are TRUE order statistics
    (selected from the cumulative value histogram — the mad_outliers
    device, no row sort anywhere), then the optimizer's
    uniform-within-bucket cardinality estimate for the $100k-$200k
    probe range next to the exact per-bucket answer. The
    estimate-vs-actual gap is the modeling error every cost-based
    planner carries — here it is itself an oracled relation. Completes
    the engine-internals family beside q_kmv_join_estimate (sketch-based
    join cardinality) and the Bloom/DPP runtime pruning pins.
    """
    from ..operators.stats import equidepth_selectivity

    orders = load_table(spark, sf_dir, "orders")
    return equidepth_selectivity(
        orders,
        cents("o_totalprice"),
        probe_lo=10_000_000,
        probe_hi=20_000_000,
        buckets=8,
    )


@query(
    "q_frequent_triples",
    extra=True,
    oracle="""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events
    ),
    tot AS (
      SELECT COUNT(*) AS n
      FROM (SELECT DISTINCT user_id, day FROM b)
    ),
    f1 AS (
      SELECT event_type FROM b, tot
      GROUP BY event_type, n HAVING COUNT(*) * 100 >= n * 5
    ),
    bf AS MATERIALIZED (
      SELECT * FROM b WHERE event_type IN (SELECT event_type FROM f1)
    ),
    p AS (
      SELECT x.event_type AS ia, y.event_type AS ib, COUNT(*) AS c
      FROM bf x
      JOIN bf y ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type
      GROUP BY 1, 2
    ),
    f2 AS MATERIALIZED (
      SELECT ia, ib FROM p, tot WHERE c * 100 >= n * 5
    ),
    cand AS (
      SELECT ab.ia AS ca, ab.ib AS cb, ac.ib AS cc
      FROM f2 ab
      JOIN f2 ac ON ac.ia = ab.ia AND ac.ib > ab.ib
      JOIN f2 bc ON bc.ia = ab.ib AND bc.ib = ac.ib
    ),
    t AS (
      SELECT x.event_type AS item_a, y.event_type AS item_b,
             z.event_type AS item_c, COUNT(*) AS support
      FROM bf x
      JOIN bf y ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type
      JOIN bf z ON y.user_id = z.user_id AND y.day = z.day
               AND y.event_type < z.event_type
      JOIN cand ON ca = x.event_type AND cb = y.event_type
               AND cc = z.event_type
      GROUP BY 1, 2, 3
    )
    SELECT item_a, item_b, item_c, CAST(support AS BIGINT) AS support
    FROM t, tot WHERE support * 100 >= n * 5
    """,
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets by the SON/Apriori two-stage shape over daily
    (user, day) interaction baskets: frequent singles gate the basket
    relation, frequent pairs prune the triple CANDIDATES (Apriori
    monotonicity — a triple can only be frequent if all three sub-pairs
    are), and only the surviving candidate set (broadcast, bounded by
    C(|frequent items|, 3)) is counted against the baskets. Extends
    q_market_basket (pairs → rules) to the level-wise lattice walk every
    frequent-itemset miner runs; all supports are exact integers and
    the 5% threshold is the cross-multiplied integer comparison
    (support * 100 >= n_baskets * 5 — no float ratio).

    Scale: each counting pass is a basket-keyed self-join whose per-
    basket fan-out is bounded by the item vocabulary (C(k,2)/C(k,3) per
    basket, never corpus²); candidate generation runs on the PAIRS
    relation (vocabulary-sized); the final count only materializes
    triples that survived pruning.
    """
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "user_id", F.to_date("ts").alias("day"), "event_type"
        )
        .distinct()
        .localCheckpoint()  # feeds singles, pairs and triple counting
    )
    tot = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    f1 = (
        b.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("c") * 100 >= F.col("n") * 5)
        .select("event_type")
    )
    bf = b.join(F.broadcast(f1), "event_type", "left_semi").localCheckpoint()
    bx = bf.select("user_id", "day", F.col("event_type").alias("ia"))
    by = bf.select(
        F.col("user_id").alias("u2"),
        F.col("day").alias("d2"),
        F.col("event_type").alias("ib"),
    )
    bz = bf.select(
        F.col("user_id").alias("u3"),
        F.col("day").alias("d3"),
        F.col("event_type").alias("ic"),
    )
    # shuffle_hash hints: the basket stubs are checkpointed (stats-less)
    # large-large self-joins — the q_market_basket precedent; never SMJ-
    # sort id pairs
    pairs = (
        bx.join(
            by.hint("shuffle_hash"),
            (F.col("user_id") == F.col("u2"))
            & (F.col("day") == F.col("d2"))
            & (F.col("ia") < F.col("ib")),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f2 = (
        pairs.crossJoin(F.broadcast(tot))
        .where(F.col("c") * 100 >= F.col("n") * 5)
        .select("ia", "ib")
        .localCheckpoint()  # tiny; feeds three candidate-join sides
    )
    # the candidate lattice joins run on the vocabulary-sized f2 stub —
    # broadcast both probe sides (stats-less stubs would SMJ otherwise)
    cand = (
        f2.select(F.col("ia").alias("ca"), F.col("ib").alias("cb"))
        .join(
            F.broadcast(
                f2.select(F.col("ia").alias("ca2"), F.col("ib").alias("cc"))
            ),
            (F.col("ca2") == F.col("ca")) & (F.col("cc") > F.col("cb")),
        )
        .join(
            F.broadcast(
                f2.select(F.col("ia").alias("cb2"), F.col("ib").alias("cc2"))
            ),
            (F.col("cb2") == F.col("cb")) & (F.col("cc2") == F.col("cc")),
            "left_semi",
        )
        .select("ca", "cb", "cc")
    )
    triples = (
        bx.join(
            by.hint("shuffle_hash"),
            (F.col("user_id") == F.col("u2"))
            & (F.col("day") == F.col("d2"))
            & (F.col("ia") < F.col("ib")),
        )
        .join(
            bz.hint("shuffle_hash"),
            (F.col("user_id") == F.col("u3"))
            & (F.col("day") == F.col("d3"))
            & (F.col("ib") < F.col("ic")),
        )
        .join(
            F.broadcast(cand),
            (F.col("ca") == F.col("ia"))
            & (F.col("cb") == F.col("ib"))
            & (F.col("cc") == F.col("ic")),
        )
        .groupBy(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            F.col("ic").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        triples.crossJoin(F.broadcast(tot))
        .where(F.col("support") * 100 >= F.col("n") * 5)
        .select(
            "item_a",
            "item_b",
            "item_c",
            F.col("support").cast("long").alias("support"),
        )
    )


@query(
    "q_k_anon_generalize",
    extra=True,
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0
                                      THEN 'neg' ELSE 'pos' END)
                  AS BIGINT) AS l_diversity
      FROM customer GROUP BY 1, 2
    ),
    rg AS (
      SELECT g.*, n.n_regionkey
      FROM g JOIN nation n ON n.n_nationkey = g.c_nationkey
    ),
    reg AS (
      SELECT n_regionkey, c_mktsegment,
             CAST(SUM(group_size) AS BIGINT) AS region_size
      FROM rg GROUP BY 1, 2
    )
    SELECT rg.c_nationkey, rg.c_mktsegment, rg.group_size, rg.l_diversity,
           CAST(CASE WHEN rg.group_size >= 5 THEN 0
                     WHEN reg.region_size >= 5 THEN 1
                     ELSE 2 END AS INT) AS anon_level
    FROM rg JOIN reg ON reg.n_regionkey = rg.n_regionkey
                    AND reg.c_mktsegment = rg.c_mktsegment
    """,
)
def q_k_anon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity GENERALIZATION ladder — completes q_k_anonymity (the
    suppression census over documents) with the actual anonymizer MOVE:
    quasi-identifier
    groups (nation, segment) smaller than k=5 re-identify their members,
    so each group gets the anonymization DECISION the k-anonymizer would
    take: keep at nation level (anon_level 0), generalize the hierarchy
    one step to region (1 — the standard domain-generalization move), or
    suppress (2 — even the region-level group is under k). l-diversity
    (distinct sensitive values per group — account-balance sign here)
    rides the same aggregate: a k-anonymous group with l=1 still leaks
    the sensitive attribute.

    Scale: one map-side-combined groupBy on the quasi-identifiers (the
    only row-scale operation), the hierarchy step is a broadcast dim
    join, the region recheck aggregates the GROUP relation (bounded by
    the QI domain, not rows).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos")
        )
        .cast("long")
        .alias("l_diversity"),
    )
    rg = g.join(F.broadcast(nation), "c_nationkey")
    reg = rg.groupBy("n_regionkey", "c_mktsegment").agg(
        F.sum("group_size").cast("long").alias("region_size")
    )
    return (
        rg.join(F.broadcast(reg), ["n_regionkey", "c_mktsegment"])
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "l_diversity",
            F.when(F.col("group_size") >= 5, 0)
            .when(F.col("region_size") >= 5, 1)
            .otherwise(2)
            .cast("int")
            .alias("anon_level"),
        )
    )


#: Poisson(1) inverse-CDF thresholds on the u32 hash scale
#: (floor(2^32 * P(Poisson(1) <= k)) for k = 0..4; counts cap at 5).
#: Shared integer literals between the Spark plan and the oracle — the
#: float CDF is evaluated ONCE here, never at query time.
_POIS1_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)


def _pois_case_sql(u_expr: str) -> str:
    """Shared CASE text mapping a u32 uniform to a Poisson(1) count."""
    whens = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_POIS1_T)
    )
    return f"(CASE {whens} ELSE 5 END)"


@query(
    "q_bootstrap_poisson",
    extra=True,
    oracle="""
    WITH reps AS (SELECT range AS r FROM range(0, 32)),
    drawn AS (
      SELECT r,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x,
             POISCASE AS c
      FROM orders o CROSS JOIN reps
    )
    SELECT CAST(r AS INT) AS replica,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(SUM(c * x) AS BIGINT) AS sum_cents,
           CAST(FLOOR((2 * SUM(c * x) + SUM(c)) / (2.0 * SUM(c)))
                AS BIGINT) AS mean_cents
    FROM drawn GROUP BY r
    """.replace(
        "POISCASE",
        _pois_case_sql(
            "(md5_number_lower('boot-v1:' || CAST(r AS VARCHAR) || ':' "
            "|| CAST(o.o_orderkey AS VARCHAR)) % 4294967296)"
        ),
    ),
)
def q_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed POISSON BOOTSTRAP of the mean order total — the
    one-pass resampling scheme every large-scale system uses (exact
    n-with-replacement needs a global multinomial; Poisson(1) row counts
    are independent per row, so B = 32 replicas ride ONE scan with
    map-side combine). Fully deterministic: each (row, replica) draws
    its count by inverse-CDF on the hash uniform, with the five CDF
    thresholds baked as shared INTEGER literals — no float boundary can
    disagree across engines. Per-replica (n_rows, sum_cents) are exact
    longs; the whole-cent mean uses the half-up device (safe here:
    2·sum·1 < 2^52 and the quotient's ulp is far under 1/(2n)). The 32
    replica means ARE the bootstrap distribution — quantile them for the
    CI; their spread is the standard error, assumption-free.

    Scale: replica fan-out multiplies MAP work only (the shuffle carries
    B partial aggregates per partition, not B copies of the data) — the
    statistical-inference member of the stats family beside OLS/CUPED/
    Mann-Whitney.
    """
    from ..functions.scalar import stable_hash_u32

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("x")
    )
    drawn = orders.select(
        "o_orderkey",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
    ).withColumn(
        "u",
        stable_hash_u32(
            F.concat(
                F.lit("boot-v1:"),
                F.col("r").cast("string"),
                F.lit(":"),
                F.col("o_orderkey").cast("string"),
            )
        ),
    )
    c = F.lit(5)
    for k, t in reversed(list(enumerate(_POIS1_T))):
        c = F.when(F.col("u") < t, k).otherwise(c)
    drawn = drawn.withColumn("c", c.cast("long"))
    return drawn.groupBy(F.col("r").cast("int").alias("replica")).agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.col("c") * F.col("x")).cast("long").alias("sum_cents"),
        F.floor(
            (2 * F.sum(F.col("c") * F.col("x")) + F.sum("c"))
            / (2.0 * F.sum("c"))
        )
        .cast("long")
        .alias("mean_cents"),
    )


@query(
    "q_hhi_concentration",
    extra=True,
    oracle="""
    WITH rev AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
             l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    )
    SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(r * r) AS HUGEINT)::VARCHAR AS hhi_num,
           CAST(SUM(r) AS BIGINT) AS rev_total
    FROM rev GROUP BY 1
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN market concentration by year — the
    concentration-TREND audit beside the Gini/Lorenz inequality point
    measures: per year, supplier revenue shares s_i = r_i/R yield
    HHI = Σ s_i², emitted DIVISION-FREE as hhi_num = Σ r_i² (decimal,
    stringified — the squares of cent revenues exceed int64 at sf0.1)
    over rev_total² — a marketplace drifting toward winner-take-all
    shows hhi_num/rev_total² rising year over year. All arithmetic is
    exact integer/decimal; the string form keeps the driver hash
    engine-agnostic.

    Scale: one (year, supplier) rollup — map-side combining on a
    bounded key space — then a per-year agg over the supplier census.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("yr")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("yr", "l_suppkey")
        .agg(F.sum("cents").cast("long").alias("r"))
    )
    return rev.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("hhi_num"),
        F.sum("r").cast("long").alias("rev_total"),
    )


@query(
    "q_apriori_triples",
    extra=True,
    # The oracle is the SPEC (brute three-way basket join, no pruning):
    # apriori pruning is a plan-side optimization whose result set is
    # provably identical (every subset of a frequent itemset is
    # frequent), so a hash match certifies the pruned plan against the
    # unpruned definition.
    oracle="""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS br
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ms AS (
      SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_orders,
             GREATEST(3, CAST(COUNT(DISTINCT k) AS BIGINT) // 250) AS m
      FROM b
    ),
    tri AS (
      SELECT x.br AS br_a, y.br AS br_b, z.br AS br_c,
             CAST(COUNT(*) AS BIGINT) AS n_tri
      FROM b x
      JOIN b y ON y.k = x.k AND y.br > x.br
      JOIN b z ON z.k = x.k AND z.br > y.br
      GROUP BY 1, 2, 3
    )
    SELECT br_a, br_b, br_c, n_tri,
           CAST((2 * n_tri * 1000000 + ms.n_orders)
                // (2 * ms.n_orders) AS BIGINT) AS support_ppm
    FROM tri, ms WHERE n_tri >= ms.m
    """,
)
def q_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APRIORI frequent-itemset mining at the lattice scale where
    pruning is LOAD-BEARING: brand TRIPLES bought together in one order
    with support >= max(3, n_orders/250). q_frequent_triples runs the
    same level-wise walk on the 5-event-type lattice (C(5,3) = 10
    candidates — pruning there is structural, not material); this one
    climbs the 25-brand lattice (C(25,3) = 2300 candidates) where the
    frequent-pair semi-joins genuinely shrink the counted set, and its
    oracle is the UNPRUNED brute definition, so the hash certifies the
    pruning itself (the two differ on any apriori bug; see also the
    downward-closure axiom gate in tests/test_patterns.py).

    Spark plan: the distinct (order, brand) basket relation is pinned
    once (localCheckpoint — five consumers); frequent items and
    frequent pairs are brand-lattice-sized (<= 25 and <= 300 rows) and
    BROADCAST back as semi-join prunes, so the three-way order-keyed
    self-join only ever fans over baskets whose items survived level-1
    and whose pairs survived level-2. The oracle replays the unpruned
    textbook definition — identical output by the apriori guarantee.

    Scale: per-order fan-out is (basket width choose 3) AFTER pruning;
    the lattice relations stay broadcast-sized at any corpus scale
    (they are bounded by the brand vocabulary, not the order count);
    the support threshold scales with n_orders, keeping the output the
    frequent head of the lattice rather than growing with the corpus.
    """
    from ..functions.scale import scoped_persist

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("br"))
        .distinct()
        .localCheckpoint()  # nt, f1, pair and triple joins all read it
    )
    d = F.call_function
    nt = b.agg(
        F.countDistinct("k").cast("long").alias("n_orders")
    ).withColumn(
        "m", F.greatest(F.lit(3).cast("long"), d("div", F.col("n_orders"), F.lit(250)))
    )
    f1 = (
        b.groupBy("br")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(nt))
        .where(F.col("n") >= F.col("m"))
        .select("br")
    )
    b1 = b.join(F.broadcast(f1), "br", "semi")
    x = b1.select("k", F.col("br").alias("br_a"))
    y = b1.select(F.col("k").alias("k_y"), F.col("br").alias("br_b"))
    z = b1.select(F.col("k").alias("k_z"), F.col("br").alias("br_c"))
    # The basket pair fan-out is deliberately COMPUTED TWICE (level-2
    # count here, level-3 pair stream below) rather than checkpointed
    # once: the fan-out is LARGER than its input (pairs-per-basket), so
    # materializing it costs more than the map-side-combined aggregate
    # that consumes it fused — a round-13 lazy-checkpoint single-copy
    # variant regressed the driver's number 2.64 -> 3.13 s and was
    # reverted (round-14; the cache-a-fan-out anti-pattern, guide §5).
    pairs = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("k") == F.col("k_y")) & (F.col("br_a") < F.col("br_b")),
        )
        .groupBy("br_a", "br_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    f2 = (
        pairs.crossJoin(F.broadcast(nt))
        .where(F.col("n_pair") >= F.col("m"))
        .select("br_a", "br_b")
        .localCheckpoint()  # three semi-join prunes read it
    )
    # level-2-pruned pair stream, then extend by a third item and prune
    # the two new faces of the triple against the same frequent-pair set
    pstream = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("k") == F.col("k_y")) & (F.col("br_a") < F.col("br_b")),
        )
        .select("k", "br_a", "br_b")
        .join(F.broadcast(f2), ["br_a", "br_b"], "semi")
    )
    tri = (
        pstream.join(
            z.hint("shuffle_hash"),
            (F.col("k") == F.col("k_z")) & (F.col("br_b") < F.col("br_c")),
        )
        .join(
            F.broadcast(f2.select(F.col("br_a"), F.col("br_b").alias("br_c"))),
            ["br_a", "br_c"],
            "semi",
        )
        .join(
            F.broadcast(
                f2.select(F.col("br_a").alias("br_b"), F.col("br_b").alias("br_c"))
            ),
            ["br_b", "br_c"],
            "semi",
        )
        .groupBy("br_a", "br_b", "br_c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        tri.crossJoin(F.broadcast(nt))
        .where(F.col("n_tri") >= F.col("m"))
        .select(
            "br_a",
            "br_b",
            "br_c",
            "n_tri",
            d(
                "div",
                F.lit(2) * F.col("n_tri") * 1_000_000 + F.col("n_orders"),
                F.lit(2) * F.col("n_orders"),
            ).alias("support_ppm"),
        )
    )


_APPORTION_SEATS = 20


@query(
    "q_seat_apportionment",
    # graded r11-r12 (green in CORRECTNESS_r11/r12); rotated to extra in r13
    extra=True,
    oracle=f"""
    WITH vals AS MATERIALIZED (
      SELECT c.c_nationkey AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    ks AS (SELECT CAST(range AS BIGINT) AS k
           FROM range(1, {_APPORTION_SEATS} + 1)),
    quot AS MATERIALIZED (SELECT nation, k, v FROM vals CROSS JOIN ks),
    ranked AS MATERIALIZED (
      SELECT a.nation, a.k,
             1 + CAST(COUNT(*) FILTER (WHERE
               b.v * a.k > a.v * b.k
               OR (b.v * a.k = a.v * b.k
                   AND (b.nation < a.nation
                        OR (b.nation = a.nation AND b.k < a.k)))
             ) AS BIGINT) AS rk
      FROM quot a
      JOIN quot b ON NOT (a.nation = b.nation AND a.k = b.k)
      GROUP BY 1, 2, a.v
    ),
    dh AS (
      SELECT nation,
             CAST(SUM(CASE WHEN rk <= {_APPORTION_SEATS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS seats_dhondt
      FROM ranked GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(v) AS BIGINT) AS t FROM vals),
    lrb AS MATERIALIZED (
      SELECT v2.nation, v2.v,
             (v2.v * {_APPORTION_SEATS}) // tot.t AS fl,
             (v2.v * {_APPORTION_SEATS}) % tot.t AS rem
      FROM vals v2, tot
    ),
    extra_n AS (
      SELECT CAST({_APPORTION_SEATS} - SUM(fl) AS BIGINT) AS n_extra
      FROM lrb
    ),
    lrr AS (
      SELECT a.nation, a.v, a.fl,
             1 + CAST(COUNT(*) FILTER (WHERE
               b.rem > a.rem OR (b.rem = a.rem AND b.nation < a.nation)
             ) AS BIGINT) AS rrank
      FROM lrb a JOIN lrb b ON b.nation <> a.nation
      GROUP BY 1, 2, 3, a.rem
    )
    SELECT r.nation, r.v AS revenue_cents,
           d.seats_dhondt,
           CAST(r.fl + CASE WHEN r.rrank <= e.n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS seats_lr
    FROM lrr r JOIN dh d ON d.nation = r.nation CROSS JOIN extra_n e
    """,
)
def q_seat_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROPORTIONAL APPORTIONMENT — split a 20-seat budget "seats" across
    nations by revenue under the two classic methods: D'HONDT (highest
    averages: the top-S of the v/k quotient table) and HAMILTON (largest
    remainder: floor(v*S/total) plus one for the biggest remainders) —
    the allocation-algorithm family (shard budgets, sampling quotas,
    parliament seats) the registry lacked. EVERYTHING is exact integer
    arithmetic: quotient order resolves by CROSS-MULTIPLICATION
    (v_a*k_b > v_b*k_a — never a float division), remainders are exact
    modulo residues, and both rank computations are count-of-better
    self-joins over the bounded quotient/nation relations (500 and 25
    rows — no global window, no sort). The two methods genuinely differ
    (D'Hondt favors large shares; Hamilton is quota-respecting), and
    both columns must sum to exactly S — the axiom gate in
    tests/test_patterns.py.

    Scale: the revenue rollup is the only corpus-scale stage; quotient
    ranking is |nations|*S squared at worst — broadcast territory at
    any real seat count. For huge S the top-S switches to the divisor
    binary search; S=20 here keeps the textbook form.
    """
    vals = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.sum(cents("o_totalprice")).cast("long").alias("v"))
        .localCheckpoint()  # quotients, totals and the LR rollup read it
    )
    S = _APPORTION_SEATS
    ks = vals.sparkSession.range(1, S + 1).select(F.col("id").alias("k"))
    quot = vals.crossJoin(F.broadcast(ks)).localCheckpoint()
    a = quot.select(
        F.col("nation").alias("na"), F.col("k").alias("ka"), F.col("v").alias("va")
    )
    b = quot.select(
        F.col("nation").alias("nb"), F.col("k").alias("kb"), F.col("v").alias("vb")
    )
    better = (F.col("vb") * F.col("ka") > F.col("va") * F.col("kb")) | (
        (F.col("vb") * F.col("ka") == F.col("va") * F.col("kb"))
        & (
            (F.col("nb") < F.col("na"))
            | ((F.col("nb") == F.col("na")) & (F.col("kb") < F.col("ka")))
        )
    )
    ranked = (
        a.join(
            F.broadcast(b),
            ~((F.col("na") == F.col("nb")) & (F.col("ka") == F.col("kb"))),
        )
        .groupBy("na", "ka")
        .agg((1 + F.sum(better.cast("long"))).alias("rk"))
    )
    dh = ranked.groupBy(F.col("na").alias("nation")).agg(
        F.sum((F.col("rk") <= S).cast("long")).cast("long").alias("seats_dhondt")
    )
    tot = vals.agg(F.sum("v").cast("long").alias("t"))
    d = F.call_function
    lrb = vals.crossJoin(F.broadcast(tot)).select(
        "nation",
        "v",
        d("div", F.col("v") * S, F.col("t")).alias("fl"),
        F.pmod(F.col("v") * S, F.col("t")).alias("rem"),
    ).localCheckpoint()  # extra-seat scalar + both rank sides read it
    extra_n = lrb.agg((F.lit(S) - F.sum("fl")).cast("long").alias("n_extra"))
    rb = lrb.select(
        F.col("nation").alias("nb2"), F.col("rem").alias("remb")
    )
    lrr = (
        lrb.join(F.broadcast(rb), F.col("nb2") != F.col("nation"))
        .groupBy("nation", "v", "fl", "rem")
        .agg(
            (
                1
                + F.sum(
                    (
                        (F.col("remb") > F.col("rem"))
                        | (
                            (F.col("remb") == F.col("rem"))
                            & (F.col("nb2") < F.col("nation"))
                        )
                    ).cast("long")
                )
            ).alias("rrank")
        )
    )
    return (
        lrr.join(F.broadcast(dh), "nation")
        .crossJoin(F.broadcast(extra_n))
        .select(
            "nation",
            F.col("v").alias("revenue_cents"),
            "seats_dhondt",
            (
                F.col("fl")
                + (F.col("rrank") <= F.col("n_extra")).cast("long")
            )
            .cast("long")
            .alias("seats_lr"),
        )
    )

"""Full TPC-H-shape breadth over the trimmed star schema (extra tier).

The graded registry already carries the classic q1/q3/q5/q6/q10; this module
completes the remaining TPC-H query *shapes* — correlated scalar subqueries,
correlated EXISTS with date arithmetic, nation-pair volume, market-share
ratios, multi-way profit joins, left-outer count distributions, conditional
ratios, max-equality subqueries, NOT IN + COUNT DISTINCT, decorrelated
per-group averages, HAVING-IN, disjunctive join predicates, aggregated
semi-joins, "last shipper" multi-CTE analysis, and dormant-customer
anti-joins — adapted to the columns the synthetic testdata actually has
(no partsupp / commitdate / receiptdate / shipmode / phone / comment).

The reference engine's surface is a single Postgres-delegated join
(flows/main_flow.py:25); these queries are the engine-surface generalization
a user migrating relational workloads expects (SURVEY.md §2.2-§2.8).

Determinism follows plans/registry.py rules: money in exact integer cents
units end-to-end; ratios are ONE IEEE double division of two exact BIGINTs
(bit-identical across engines); every LIMIT carries a total-order
tiebreaker.

Scale notes are inline; the shared shape: lineitem/orders shuffle only on
their join/agg keys, every dimension (region/nation/supplier/part at these
proportions, filtered customer) is broadcast, and correlated subqueries are
decorrelated into broadcast-joined aggregates rather than per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..sources import load_table
from .registry import query


def _amt(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Discounted line amount in exact 1e-4 units: cents(price)*(100-cents(disc))."""
    return cents(price) * (100 - cents(disc))


# ---------------------------------------------------------------------------
# q2 shape: correlated scalar subquery (per-nation max)
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_max_acctbal_supplier",
    extra=True,
    oracle="""
    SELECT n_name, s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s JOIN nation ON n_nationkey = s.s_nationkey
    WHERE s.s_acctbal = (
      SELECT MAX(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def tpch_q2_max_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2's correlated-min shape (no partsupp table, so the per-nation
    MAX(s_acctbal) plays the per-part MIN(ps_supplycost) role).

    Spark-first decorrelation: a window MAX over the nation partition —
    ONE shuffle of the supplier table on nationkey, no per-row subquery.
    The double equality is deterministic: both engines take MAX over the
    identical parquet doubles. Scale: supplier shuffles on a low-skew
    key; nation is broadcast.
    """
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        sup.withColumn("mx", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("mx"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q4 shape: correlated EXISTS with date arithmetic
# ---------------------------------------------------------------------------


@query(
    "tpch_q4_late_ship_priority",
    extra=True,
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4: priority counts of orders with a late line (shipdate more
    than 60 days after the order date stands in for the missing
    commitdate < receiptdate predicate).

    The correlated EXISTS is a left-semi join whose condition carries the
    correlated date comparison — Spark evaluates it inside the join, no
    decorrelation pass needed. Scale: the quarter filter pushes to the
    orders scan; the semi join shuffles both sides on orderkey and never
    duplicates orders rows.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q7 shape: nation-pair shipping volume
# ---------------------------------------------------------------------------


@query(
    "tpch_q7_nation_volume",
    extra=True,
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(amt) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             YEAR(l_shipdate) AS l_year,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS amt
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
        AND ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        AND ns.n_name <> nc.n_name)
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7: cross-nation shipping volume within a nation set by year
    (four nations, not the spec's two, so the result is non-vacuous at the
    sf0.001 smoke scale as well).

    Scale: the nation-set filter is applied to the two *dimension* chains
    (supplier x nation, customer x nation) BEFORE they reach the facts, so
    both broadcast tiny; lineitem shuffles once on orderkey to meet orders,
    and the final group-by key cardinality is pairs x years.
    """
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.where(F.col("n_name").isin(pair))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.where(F.col("n_name").isin(pair))),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_amt()).cast("double") / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q8 shape: market share (conditional-sum ratio)
# ---------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    extra=True,
    oracle="""
    SELECT o_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN amt ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(amt) AS DOUBLE), 9) AS mkt_share
    FROM (
      SELECT YEAR(o_orderdate) AS o_year,
             ns.n_name AS supp_nation,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS amt
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = nc.n_regionkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: NATION_3's share of supplier revenue to EUROPE customers
    per order year.

    Determinism: both conditional sums are exact BIGINT unit totals; the
    share is ONE IEEE double division of those two integers, bit-identical
    across engines (the ROUND(.,9) guards only the decimal-vs-binary
    presentation edge). Scale: region+nation prune the customer dim before
    broadcast; supplier nation rides a broadcast map join; one orderkey
    shuffle; final key is the year.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("c_custkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    staged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            "supp_nation",
            _amt().alias("amt"),
        )
    )
    return staged.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("amt")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("amt").cast("double"),
            9,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q9 shape: product profit by nation x year
# ---------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    extra=True,
    oracle="""
    SELECT n_name AS nation, o_year,
           CAST(SUM(amt - cost) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT n_name, YEAR(o_orderdate) AS o_year,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS amt,
             CAST(ROUND(p_retailprice * 100) AS BIGINT)
               * CAST(l_quantity AS BIGINT) * 10 AS cost
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9: profit on 'red' parts by supplier nation and order year
    (cost = 10% of retail price x quantity stands in for the missing
    ps_supplycost; both sides stay in exact 1e-4 integer units).

    Scale: part is filtered by the LIKE before broadcast; supplier+nation
    broadcast; the only shuffle of lineitem is the orderkey join, and the
    final agg key (nation x year) is tiny so partial agg collapses it
    map-side.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                _amt()
                - cents("p_retailprice") * F.col("l_quantity").cast("long") * 10
            ).alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("profit").cast("double") / 10000.0).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q11 shape: aggregate HAVING against a global scalar
# ---------------------------------------------------------------------------


@query(
    "tpch_q11_important_parts",
    extra=True,
    oracle="""
    WITH val AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS v
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(v) AS tv, COUNT(*) AS np FROM val)
    SELECT pk AS partkey, CAST(v AS DOUBLE) / 100.0 AS value
    FROM val CROSS JOIN tot
    WHERE v * np * 10 > 13 * tv
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11's shape: per-group value totals kept only when they exceed
    a threshold computed from the WHOLE aggregate (no partsupp, so part
    traded value replaces stock value; the spec's fixed fraction becomes
    1.3x the mean per-part value so the result is non-vacuous at every SF).

    Determinism: the HAVING threshold is the float trap — rewritten as
    v * np * 10 > 13 * tv over exact BIGINTs. Scale: one partkey shuffle
    builds the per-part totals; the global (sum, count) is a 1-row
    broadcast back over them (crossJoin(broadcast)), NOT a driver collect
    or a recomputation of the aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(cents("l_extendedprice")).alias("v")
    )
    tot = val.agg(F.sum("v").alias("tv"), F.count(F.lit(1)).alias("np"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("v") * F.col("np") * 10 > 13 * F.col("tv"))
        .select(
            F.col("pk").alias("partkey"),
            (F.col("v").cast("double") / 100.0).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# q12 shape: CASE-sum category split over a join
# ---------------------------------------------------------------------------


@query(
    "tpch_q12_priority_split",
    extra=True,
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12's shape: high/low priority CASE-sums per category for
    late-shipped lines (l_returnflag stands in for the missing l_shipmode;
    shipped >30 days after order date for the commit/receipt lag).

    Spark keeps both conditional sums in ONE aggregation pass (two CASE
    columns, not two scans). Scale: the year filter pushes to the lineitem
    scan; the join shuffles on orderkey only; the residual date comparison
    is a post-join filter as it must be (it references both sides).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13 shape: left outer join + double aggregation
# ---------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    extra=True,
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: distribution of per-customer order counts, zero-order
    customers included (the priority exclusion stands in for the missing
    o_comment NOT LIKE filter).

    COUNT(o_orderkey) — not COUNT(*) — so the null row a left join emits
    for an orderless customer counts as 0. Scale: orders pre-aggregates
    per custkey BEFORE the join in the manual plan below, so the left
    join moves one row per customer, not one per order; the second agg
    keys on the tiny c_count domain.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        cust.join(per_cust, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# q14 shape: conditional ratio, single row
# ---------------------------------------------------------------------------


@query(
    "tpch_q14_promo_revenue",
    extra=True,
    oracle="""
    SELECT ROUND(
             100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN amt ELSE 0 END) AS DOUBLE)
             / CAST(SUM(amt) AS DOUBLE), 9) AS promo_revenue
    FROM (
      SELECT p_type,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS amt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01')
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14: PROMO revenue share for one ship month.

    Determinism: two exact BIGINT sums, one double multiply+divide — the
    100.0 factor and the division are IEEE-identical on both engines.
    Scale: month filter pushes to the lineitem scan; part broadcast; the
    global agg is a 1-row exchange.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    staged = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_type", _amt().alias("amt")
    )
    return staged.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("amt")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("amt").cast("double"),
            9,
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# q15 shape: aggregate + max-equality subquery
# ---------------------------------------------------------------------------


@query(
    "tpch_q15_top_supplier",
    extra=True,
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT MAX(total) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: supplier(s) with the maximum quarterly revenue (the view
    becomes a CTE; ties all surface, exactly like the spec's = MAX form).

    The max-equality is a 1-row MAX aggregate broadcast back onto the
    supplier-grain revenue relation (round 10 — previously a rank()==1
    unpartitioned window, which funnels the per-supplier relation
    through ONE partition: supplier grows with SF, so that relation is
    dim-sized, not bounded). rank()==1 and total == max(total) keep
    ties identically. Determinism: revenue totals are exact BIGINT
    units, so = MAX has no float hazard. Scale: the agg shrinks
    lineitem to one row per supplier before any join; the max is a
    1-row broadcast; supplier is broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # pin the supplier-grain aggregate once: the MAX aggregate and the
    # equality filter both read it, and without the pin the lineitem
    # scan+agg lineage re-derives per consumer (one extra exchange)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_amt()).alias("total"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total").alias("mx"))
    top = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total") == F.col("mx"))
        .drop("mx")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey")
    ).select(
        "s_suppkey",
        "s_name",
        (F.col("total").cast("double") / 10000.0).alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# q16 shape: NOT IN + COUNT DISTINCT
# ---------------------------------------------------------------------------


@query(
    "tpch_q16_supplier_cnt",
    extra=True,
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16: distinct supplier counts per (brand, type, size), with a
    NOT IN exclusion list (negative-balance suppliers stand in for the
    missing comment-matched complaint list).

    NOT IN over a provably non-null key list is exactly a left-anti join —
    Spark's planner gets that via the broadcast anti below without the
    null-aware anti join penalty. Scale: part (size-filtered) and the
    exclusion list broadcast; the count-distinct triggers Catalyst's
    two-phase expand, keyed on the small (brand,type,size) domain.
    """
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17 shape: decorrelated per-group average threshold
# ---------------------------------------------------------------------------


@query(
    "tpch_q17_small_qty_revenue",
    extra=True,
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS sq,
             COUNT(*) AS cq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq   ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND 5 * CAST(l_quantity AS BIGINT) * cq < sq
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: revenue of lines whose quantity is under 20% of the
    part's average quantity — the correlated AVG subquery decorrelated
    into a per-part (sum, count) aggregate joined back to the fact.

    Determinism: qty < 0.2*avg is rewritten 5*qty*count < sum — pure
    BIGINT arithmetic, no float threshold to disagree on. Scale: the
    per-part agg is one lineitem shuffle on partkey; its result (one row
    per part) broadcasts back; brand-filtered part broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.count(F.lit(1)).alias("cq"),
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(pq), F.col("pk") == F.col("l_partkey"))
        .where(5 * F.col("l_quantity").cast("long") * F.col("cq") < F.col("sq"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias(
                "total_price"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q18 shape: HAVING subquery join (large-volume orders)
# ---------------------------------------------------------------------------


@query(
    "tpch_q18_large_volume_customer",
    extra=True,
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o_totalprice, 2) AS totalprice, sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 280)
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18: customers behind orders totalling >280 units (the spec's
    IN (GROUP BY ... HAVING) collapses to joining the aggregate directly —
    same rows, one less pass over lineitem).

    Scale: the orderkey agg is the only lineitem shuffle; HAVING makes its
    output tiny, so both subsequent joins broadcast the aggregated side
    into orders/customer rather than shuffling the facts again.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 280)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# q19 shape: disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------


@query(
    "tpch_q19_disjunctive_join",
    extra=True,
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: revenue under an OR of brand/size/quantity conjunctions
    that straddles the join (part attrs AND lineitem attrs in each arm).

    Catalyst splits the disjunction: the part-only implication
    (brand IN ... AND size <= 15) and the lineitem-only implication
    (quantity BETWEEN 1 AND 30) are inferred and pushed below the join,
    leaving the full OR as the post-join residual — the optimization this
    query exists to test. Scale: part broadcasts; no lineitem shuffle at
    all (broadcast join + 1-row global agg).
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(arm1 | arm2 | arm3)
        .agg(
            (F.sum(_amt()).cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q20 shape: semi-join on an aggregated HAVING set
# ---------------------------------------------------------------------------


@query(
    "tpch_q20_promo_excess_suppliers",
    extra=True,
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 400)
    """,
)
def tpch_q20_promo_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20's shape: suppliers who moved >400 units of PROMO parts in
    1997 (the partsupp availqty threshold becomes a shipped-quantity
    threshold — same IN (aggregated subquery with HAVING) plan shape).

    Scale: type-filtered part broadcasts into lineitem; the agg shrinks to
    one row per supplier; the final IN is a left-semi with the tiny
    aggregate broadcast — supplier itself never shuffles.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("tot"))
        .where(F.col("tot") > 400)
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return sup.join(
        F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# q21 shape: "the one supplier who shipped last" multi-CTE analysis
# ---------------------------------------------------------------------------


@query(
    "tpch_q21_last_shipper",
    extra=True,
    oracle="""
    WITH om AS (
      SELECT l_orderkey AS ok, MAX(l_shipdate) AS mx,
             COUNT(DISTINCT l_suppkey) AS ns
      FROM lineitem GROUP BY l_orderkey),
    last AS (
      SELECT li.l_orderkey AS ok2, MIN(li.l_suppkey) AS last_sk,
             COUNT(DISTINCT li.l_suppkey) AS nlast
      FROM lineitem li JOIN om ON li.l_orderkey = om.ok
                              AND li.l_shipdate = om.mx
      GROUP BY li.l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM last
    JOIN om       ON ok2 = ok
    JOIN orders   ON o_orderkey = ok
    JOIN supplier ON s_suppkey = last_sk
    WHERE o_orderstatus = 'F' AND ns > 1 AND nlast = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21's shape: per supplier, the number of completed
    multi-supplier orders where that supplier was the *sole last* shipper
    (the EXISTS other-supplier / NOT EXISTS other-late-supplier pair
    becomes two aggregate predicates: ns > 1 and nlast = 1 — same set,
    no correlated scan).

    Scale: ONE lineitem shuffle on orderkey computes both per-order
    aggregates (max shipdate + distinct suppliers) in a single pass; the
    second pass joins the per-order max back on the co-partitioned key.
    Orders broadcast-prunes on status F; supplier broadcasts for the
    name lookup; top-20 runs as TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    om = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("mx"),
        F.count_distinct("l_suppkey").alias("ns"),
    )
    last = (
        li.join(
            om,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_shipdate") == F.col("mx")),
        )
        .groupBy(F.col("l_orderkey").alias("ok2"))
        .agg(
            F.min("l_suppkey").alias("last_sk"),
            F.count_distinct("l_suppkey").alias("nlast"),
            F.first("ns").alias("ns2"),
        )
        .where(F.col("nlast") == 1)
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        last.where(F.col("ns2") > 1)
        .join(orders, F.col("o_orderkey") == F.col("ok2"), "left_semi")
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("last_sk"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q22 shape: above-average balance + anti-join (dormant customers)
# ---------------------------------------------------------------------------


@query(
    "tpch_q22_dormant_customers",
    extra=True,
    oracle="""
    WITH pos AS (
      SELECT c_custkey AS ck, c_nationkey AS nk,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bc
      FROM customer),
    stats AS (
      SELECT SUM(bc) AS sm, COUNT(*) AS n FROM pos WHERE bc > 0)
    SELECT nk AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(bc) AS DOUBLE) / 100.0 AS totacctbal
    FROM pos CROSS JOIN stats
    WHERE bc > 0 AND bc * n > sm
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = ck
          AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY nk
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22: per nation, customers with above-average positive balance
    and no recent orders (nationkey stands in for the missing phone
    country code; "no order since mid-2000" for "never ordered").

    Determinism: acctbal > AVG(positive acctbal) is the float-threshold
    trap — the two engines would sum doubles in different orders. Rewritten
    exactly: bc * n > sm over integer cents, no float anywhere. Scale: the
    (sum, count) aggregate is one 1-row broadcast (crossJoin(broadcast)) —
    NOT a driver collect; the NOT EXISTS is an anti join against the
    date-filtered orders projection.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        cents("c_acctbal").alias("bc"),
    )
    stats = cust.where(F.col("bc") > 0).agg(
        F.sum("bc").alias("sm"), F.count(F.lit(1)).alias("n")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(stats))
        .where((F.col("bc") > 0) & (F.col("bc") * F.col("n") > F.col("sm")))
        .join(recent, F.col("o_custkey") == F.col("ck"), "left_anti")
        .groupBy(F.col("nk").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bc").cast("double") / 100.0).alias("totacctbal"),
        )
    )

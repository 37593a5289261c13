"""Graph/link-analysis queries (operators/graph.py) — iterative PageRank
made hash-checkable by unrolling the fixed iteration count in the oracle.

The graph is derived from the star schema itself: nation→nation trade
edges (customer's nation → supplier's nation, weighted by lineitem
count, the TPC-H q7 join shape), so the query also re-exercises the
3-fact join path. 25 nodes keeps the oracle's 3-way unroll cheap while
the Spark side runs the exact loop a billion-node corpus would (per-
iteration join + partial agg + lineage truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_SQL_EDGES = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
"""

_SQL_ITER = """
    r{K} AS (
      SELECT n2.node,
             CAST((SELECT base FROM consts) + COALESCE(SUM(c), 0) AS BIGINT)
               AS rank_nano
      FROM nodes n2 LEFT JOIN (
        SELECT e.dst AS node,
               CAST(ROUND(r.rank_nano * 0.85 * e.w / o.out_w) AS BIGINT) AS c
        FROM edges e
        JOIN outw o ON o.src = e.src
        JOIN r{P} r ON r.node = e.src
      ) contrib ON contrib.node = n2.node
      GROUP BY n2.node
    )
"""


@query(
    "q_pagerank_trade",
    # Promoted to the graded window in round 7: the iterative-graph
    # family previously had no driver-graded representative.
    oracle=f"""
    WITH edges AS ({_SQL_EDGES}),
    outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    consts AS (
      SELECT CAST(ROUND((1.0 - 0.85) * 1000000000 / COUNT(*)) AS BIGINT)
               AS base,
             CAST(ROUND(1000000000.0 / COUNT(*)) AS BIGINT) AS r_init
      FROM nodes
    ),
    r0 AS (
      SELECT node, (SELECT r_init FROM consts) AS rank_nano FROM nodes
    ),
    {_SQL_ITER.format(K=1, P=0)},
    {_SQL_ITER.format(K=2, P=1)},
    {_SQL_ITER.format(K=3, P=2)}
    SELECT CAST(node AS BIGINT) AS node, rank_nano FROM r3
    """,
)
def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 synchronous iterations, d=0.85) over the
    nation-level trade graph: src = customer's nation, dst = supplier's
    nation, weight = lineitem count on orders between them. Every edge
    contribution is nano-unit snapped BEFORE the per-node sum
    (operators/graph.py determinism contract), so the triple-unrolled
    SQL replay is hash-exact — an ITERATIVE float algorithm holding a
    full value oracle, like dedup_components does for label propagation.

    Scale: per iteration ONE ranks⋈edges join on src (exchange-free if
    edges persist bucketed by src) + one groupBy(dst) partial agg;
    localCheckpoint truncates lineage so 3 or 300 iterations plan the
    same. The edge build is the q7 join shape: facts shuffle on
    orderkey/custkey, nation dims broadcast.
    """
    from ..operators.graph import pagerank

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, iterations=3).select(
        F.col("node").cast("long").alias("node"), "rank_nano"
    )


@query(
    "q_triangle_counts",
    extra=True,
    oracle=f"""
    WITH edges AS ({_SQL_EDGES}),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    GROUP BY node
    """,
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected trade graph
    (operators/graph.py:triangle_counts) — each triangle (a<b<c) found
    once via the canonical two-join wedge closure and attributed to its
    three corners. Completes the graph-primitive trio (components /
    PageRank / triangles) with the same derived-graph input as
    q_pagerank_trade, and the oracle replays edge canonicalization,
    closure and attribution exactly.
    """
    from ..operators.graph import triangle_counts

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return triangle_counts(edges).select(
        F.col("node").cast("long").alias("node"), "n_tri"
    )


#: the SHARED recursion text — spliced after the engine-specific edge CTE
_SQL_REACH_BODY = """reach(node, hops) AS (
      SELECT CAST(3 AS BIGINT) AS node, 0 AS hops
      UNION ALL
      SELECT e.dst AS node, r.hops + 1 AS hops
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.hops < 2
    )
    SELECT node, CAST(MIN(hops) AS INTEGER) AS min_hops
    FROM reach GROUP BY node"""


@query(
    "q_recursive_reachability",
    extra=True,
    oracle=f"""
    WITH RECURSIVE edges AS ({_SQL_EDGES}),
    {_SQL_REACH_BODY}
    """,
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded transitive closure via a RECURSIVE CTE (Spark 4's WITH
    RECURSIVE — the SQL-surface breadth item): BFS from nation 3 over the
    directed trade graph, depth ≤ 2, minimum hop count per reached node.
    The recursion text is SHARED between engines (same CTE, same depth
    bound, same MIN fold — only the edge derivation differs, DataFrame
    API vs the _SQL_EDGES oracle CTE), so the recursive evaluator itself
    is what's being adjudicated.

    Scale: each recursion level is one join + union (Spark executes
    levels iteratively like the hand-rolled pagerank loop); the depth
    bound keeps the working relation finite on cyclic graphs — unbounded
    closures belong to the iterative operators (dedup.connected_
    components), which checkpoint per level.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges.createOrReplaceTempView("edges")
    return spark.sql("WITH RECURSIVE " + _SQL_REACH_BODY)

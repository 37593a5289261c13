"""q_skyline_pareto's distributed form (per-price spine + running max)
is an algebraic rewrite of the quadratic dominance test — property-test
the equivalence on random point sets, duplicates and ties included."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _spark_skyline(spark, pts):
    p = spark.createDataFrame(pts, "pid long, price long, size long")
    spine = p.groupBy("price").agg(F.max("size").alias("gmax"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    spine = spine.select(
        "price",
        F.max("gmax").over(w).alias("m_le"),
        F.lag(F.max("gmax").over(w)).over(Window.orderBy("price")).alias("m_lt"),
    )
    out = (
        p.join(F.broadcast(spine), "price")
        .where(
            (F.col("m_lt").isNull() | (F.col("size") > F.col("m_lt")))
            & (F.col("size") == F.col("m_le"))
        )
        .select("pid")
    )
    return {r["pid"] for r in out.collect()}


def _brute_skyline(pts):
    out = set()
    for pid, pr, sz in pts:
        dominated = any(
            bpr <= pr and bsz >= sz and (bpr < pr or bsz > sz)
            for _, bpr, bsz in pts
        )
        if not dominated:
            out.add(pid)
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=12,
    )
)
def test_skyline_matches_quadratic_definition(spark, points):
    pts = [(i, pr, sz) for i, (pr, sz) in enumerate(points)]
    assert _spark_skyline(spark, pts) == _brute_skyline(pts), pts

"""Geo grid operators: the blocking-losslessness claim is the load-bearing
one — with cell >= radius, the 3x3 probe ring must find EVERY pair the
quadratic cross-join definition finds (operators/geo.py). Proven here
against brute force on the real sf tables plus adversarial boundary
points, so q_geo_radius_join's oracle (which replays the blocked plan)
is not the only line of defense.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.geo import (
    MICRO,
    radius_join,
    with_grid,
)
from prefect_flow_arc_alto_to_json_spark.sources import load_table


def _brute_pairs(left, right, radius_micro):
    dlat = left["lat_micro"] - right["lat_micro"]
    dlon = left["lon_micro"] - right["lon_micro"]
    return (
        left.crossJoin(right)
        .where(dlat * dlat + dlon * dlon <= F.lit(radius_micro * radius_micro))
        .select("c_custkey", "s_suppkey")
    )


@pytest.mark.parametrize("cell_mult", [1, 2])
def test_radius_join_blocking_is_lossless(spark, sf_dir, cell_mult):
    radius = 3 * MICRO
    cell = radius * cell_mult
    cust = with_grid(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        cell,
    )
    supp = with_grid(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        cell,
    )
    blocked = {
        (r["c_custkey"], r["s_suppkey"])
        for r in radius_join(cust, supp, radius, cell_micro=cell)
        .select("c_custkey", "s_suppkey")
        .collect()
    }
    brute = {
        (r["c_custkey"], r["s_suppkey"])
        for r in _brute_pairs(cust, supp, radius).collect()
    }
    assert blocked == brute
    assert brute, "degenerate test: no pairs within radius"


def test_radius_join_boundary_points(spark):
    # Adversarial: pairs exactly at distance == radius on a cell edge
    # must be found (<=, not <) and found exactly once despite both
    # points probing overlapping rings.
    cell = 10 * MICRO
    rows = [
        (1, 0, 0),  # at a cell corner
        (2, 0, 10 * MICRO),  # exactly radius away, next cell over
        (3, 10 * MICRO, 0),
        (4, -1, -1),  # just across the corner diagonal
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("lat_micro", T.LongType()),
            T.StructField("lon_micro", T.LongType()),
        ]
    )
    from prefect_flow_arc_alto_to_json_spark.operators.geo import cell_x, cell_y

    def grid(alias):
        # independent createDataFrame per side: same-lineage self-joins
        # trip Spark's ambiguous-column check
        pts = spark.createDataFrame(rows, schema)
        g = pts.withColumn("cx", cell_x(F.col("lon_micro"), cell)).withColumn(
            "cy", cell_y(F.col("lat_micro"), cell)
        )
        return g.select(
            F.col("k").alias(alias), "lat_micro", "lon_micro", "cx", "cy"
        )

    left = grid("c_custkey")
    right = grid("s_suppkey")
    got = sorted(
        (r["c_custkey"], r["s_suppkey"])
        for r in radius_join(left, right, 10 * MICRO, cell_micro=cell)
        .select("c_custkey", "s_suppkey")
        .collect()
    )
    # every pair within <= radius, including self-pairs and the two
    # exactly-at-radius pairs, each exactly once
    expect = sorted(
        (a, b)
        for a, la, lo in rows
        for b, lb, lob in rows
        if (la - lb) ** 2 + (lo - lob) ** 2 <= (10 * MICRO) ** 2
    )
    assert got == expect


def test_point_in_polygon_concave_and_box(spark):
    """Known-answer gates for the ray caster: (1) the box accepts exactly
    the points its closed-form bounds accept; (2) the CONCAVE L-shape
    excludes the notch — a point in the bbox but in the cut-out corner
    must NOT match (the case bbox tests and convex-only code get wrong);
    (3) parity survives the ray passing through both sides of the L."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_alto_to_json_spark.operators.geo import (
        point_in_polygon_join,
    )
    from prefect_flow_arc_alto_to_json_spark.plans.geo_queries import (
        PIP_POLYGONS,
        _pip_edges,
    )

    edges = spark.createDataFrame(
        _pip_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
    )
    M = 1_000_000
    pts = [
        # (key, lat, lon, expect_set)
        (1, 50 * M, 20 * M, {1}),          # middle of the box
        (2, 29 * M, 20 * M, set()),        # just south of the box
        (3, 70 * M + 1, 20 * M, set()),    # just north (boundary-adjacent)
        (4, -45 * M, -100 * M, {2}),       # lower arm of the L
        (5, -15 * M, -75 * M, {2}),        # upper-right arm of the L
        (6, -15 * M, -105 * M, set()),     # the NOTCH: bbox yes, poly no
        (7, 0, 0, set()),                  # origin, outside everything
    ]
    df = spark.createDataFrame(
        [(k, lat, lon) for k, lat, lon, _ in pts], "k long, lat long, lon long"
    )
    got = {}
    for r in point_in_polygon_join(df, edges).collect():
        got.setdefault(r["k"], set()).add(r["poly_id"])
    for k, _, _, want in pts:
        assert got.get(k, set()) == want, (k, got.get(k), want)

    # box closed form over a sweep grid: ray parity == coordinate bounds
    box = PIP_POLYGONS[1]
    xs = sorted({v[0] for v in box})
    ys = sorted({v[1] for v in box})
    grid = [
        (100 + 10 * i + j, lat, lon)
        for i, lat in enumerate(range(20 * M, 81 * M, 7 * M))
        for j, lon in enumerate(range(-10 * M, 51 * M, 9 * M))
    ]
    gdf = spark.createDataFrame(grid, "k long, lat long, lon long")
    inside = {
        r["k"]
        for r in point_in_polygon_join(gdf, edges)
        .where(F.col("poly_id") == 1)
        .collect()
    }
    for k, lat, lon in grid:
        want = xs[0] < lon < xs[1] and ys[0] < lat < ys[1]
        assert (k in inside) == want, (k, lat, lon)

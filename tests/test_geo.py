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

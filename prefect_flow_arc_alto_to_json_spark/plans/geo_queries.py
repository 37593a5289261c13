"""Geospatial grid queries (operators/geo.py) — the spatial-join family:
grid-cell density, lossless grid-blocked radius join, bounded
nearest-neighbor. Coordinates are deterministic synthetic micro-degrees
derived from the md5 stable hash (the TPC-H-ish tables carry no
geography), so the DuckDB oracles replay the derivation verbatim
(``md5_number_lower(x) % 4294967296`` ≡ ``stable_hash_u32``) and every
distance compares as an exact long — the whole family is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geo import nearest_in_ring, radius_join, with_grid
from ..sources import load_table
from .registry import query


def _sql_pt(key: str) -> str:
    """Point CTE body: lat/lon micro-degrees + grid cell for ``key``.

    Textually mirrors operators/geo.py: u32 hash -> modulus shift ->
    floor-division cell (the shifted coords are < 2^29 so the double
    division is exact in both engines).
    """
    return f"""
      SELECT {key} AS k,
             CAST(md5_number_lower('geo-v1:lat:' || CAST({key} AS VARCHAR))
                  % 4294967296 % 180000001 AS BIGINT) - 90000000 AS lat,
             CAST(md5_number_lower('geo-v1:lon:' || CAST({key} AS VARCHAR))
                  % 4294967296 % 360000001 AS BIGINT) - 180000000 AS lon
    """


def _sql_cells(cell: int) -> str:
    return f"""
      CAST(FLOOR((lon + 180000000) / {cell}) AS BIGINT) AS cx,
      CAST(FLOOR((lat + 90000000) / {cell}) AS BIGINT) AS cy
    """


@query(
    "q_geo_grid_density",
    extra=True,
    oracle=f"""
    WITH pts AS ({_sql_pt('c_custkey')} FROM customer),
    cells AS (SELECT k, {_sql_cells(5_000_000)} FROM pts)
    SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n
    FROM cells GROUP BY cx, cy
    ORDER BY n DESC, cx, cy LIMIT 25
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell density map (5-degree cells): the hotspot census that
    sizes the blocking grid for the joins below — at scale it is ALSO the
    skew probe (a cell whose count dwarfs the rest needs a finer grid,
    exactly like freqItems gates the salted join). One map-side-combining
    groupBy on the synthetic cells; top-25 with a (n, cx, cy) total
    order."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    g = with_grid(cust, "c_custkey", 5_000_000)
    return (
        g.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "cx", "cy")
        .limit(25)
    )


@query(
    "q_geo_radius_join",
    # graded rounds 7-10; rotated to the extra tier in round 11 (the spatial
    # family stays graded via q_geo_grid_dbscan + q_geo_point_in_polygon)
    extra=True,
    oracle=f"""
    WITH c AS ({_sql_pt('c_custkey')} FROM customer),
    cc AS (SELECT k, lat, lon, {_sql_cells(2_000_000)} FROM c),
    s AS ({_sql_pt('s_suppkey')} FROM supplier),
    sc AS (SELECT k, lat, lon, {_sql_cells(2_000_000)} FROM s),
    probes AS (
      SELECT cc.*, cc.cx + dx.dx AS px, cc.cy + dy.dy AS py
      FROM cc
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
    )
    SELECT p.k AS c_custkey, sc.k AS s_suppkey,
           (p.lat - sc.lat) * (p.lat - sc.lat)
             + (p.lon - sc.lon) * (p.lon - sc.lon) AS d2
    FROM probes p JOIN sc ON sc.cx = p.px AND sc.cy = p.py
    WHERE (p.lat - sc.lat) * (p.lat - sc.lat)
            + (p.lon - sc.lon) * (p.lon - sc.lon)
          <= {2_000_000 * 2_000_000}
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every (customer, supplier) pair within 2 degrees,
    via the lossless grid blocking (cell = radius, 3x3 probe ring, exact
    integer d2 verify — operators/geo.py). The oracle replays the SAME
    blocked plan; tests/test_geo.py separately proves the blocking equals
    the quadratic definition, so correctness does not ride on the shared
    shape.

    100 TB: suppliers (the small dim) broadcast — the fact side never
    shuffles; with two fact-sized inputs the index side shuffles once on
    (cx, cy) and candidate volume is the grid-density bound."""
    cust = with_grid(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        2_000_000,
    )
    supp = with_grid(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        2_000_000,
    )
    pairs = radius_join(cust, supp, 2_000_000, broadcast_right=True)
    return pairs.select(
        "c_custkey", "s_suppkey", F.col("d2").cast("long").alias("d2")
    )


@query(
    "q_geo_nearest_supplier",
    extra=True,
    oracle=f"""
    WITH c AS ({_sql_pt('c_custkey')} FROM customer),
    cc AS (SELECT k, lat, lon, {_sql_cells(15_000_000)} FROM c),
    s AS ({_sql_pt('s_suppkey')} FROM supplier),
    sc AS (SELECT k, lat, lon, {_sql_cells(15_000_000)} FROM s),
    probes AS (
      SELECT cc.*, cc.cx + dx.dx AS px, cc.cy + dy.dy AS py
      FROM cc
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
    )
    SELECT c_custkey, s_suppkey, d2 FROM (
      SELECT p.k AS c_custkey, sc.k AS s_suppkey,
             (p.lat - sc.lat) * (p.lat - sc.lat)
               + (p.lon - sc.lon) * (p.lon - sc.lon) AS d2
      FROM probes p JOIN sc ON sc.cx = p.px AND sc.cy = p.py
    ) QUALIFY ROW_NUMBER() OVER (
        PARTITION BY c_custkey ORDER BY d2, s_suppkey) = 1
    """,
)
def q_geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded nearest-neighbor: for each customer, the closest supplier
    inside its 3x3 ring of 15-degree cells (argmin by (d2, s_suppkey) —
    a total order, hash-exact). Customers whose ring is empty are absent:
    bounded-kNN semantics; production coverage comes from the documented
    expanding-ring re-probe of the misses, each round a constant-fan-out
    join, never a cross product."""
    cust = with_grid(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        15_000_000,
    )
    supp = with_grid(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        15_000_000,
    )
    best = nearest_in_ring(
        cust, supp, "c_custkey", "s_suppkey", broadcast_right=True
    )
    return best.select(
        "c_custkey", "s_suppkey", F.col("d2").cast("long").alias("d2")
    )


_SQL_DBSCAN_ROUND = """
    l{R} AS (
      SELECT e.a AS cid, CAST(MIN(l.lab) AS BIGINT) AS lab
      FROM edges e JOIN l{P} l ON l.cid = e.b GROUP BY e.a
    )
"""


@query(
    "q_geo_grid_dbscan",
    # promoted to the graded window in round 8 (density clustering was
    # extra-only; q_pivot_event_counts rotated out)
    oracle=f"""
    WITH pts AS ({_sql_pt('c_custkey')} FROM customer),
    cc AS (SELECT k, {_sql_cells(5_000_000)} FROM pts),
    cells0 AS (
      SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n
      FROM cc GROUP BY cx, cy
    ),
    mp AS (
      SELECT GREATEST(2, CAST(CEIL(COUNT(*) * 2.0 / 2592) AS BIGINT))
               AS minpts
      FROM customer
    ),
    dense AS (
      SELECT cx, cy, n, cx * {180_000_000 // 5_000_000 + 2} + cy AS cid
      FROM cells0 CROSS JOIN mp WHERE n >= minpts
    ),
    edges AS (
      SELECT a.cid AS a, b.cid AS b
      FROM dense a JOIN dense b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    ),
    l0 AS (SELECT cid, cid AS lab FROM dense),
    {_SQL_DBSCAN_ROUND.format(R=1, P=0)},
    {_SQL_DBSCAN_ROUND.format(R=2, P=1)},
    {_SQL_DBSCAN_ROUND.format(R=3, P=2)}
    SELECT d.cx, d.cy, d.n, l3.lab AS cluster
    FROM dense d JOIN l3 ON l3.cid = d.cid
    """,
)
def q_geo_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering of customers (operators/geo.grid_dbscan):
    5-degree cells, DATA-DERIVED density threshold (2x mean occupancy —
    fixed minPts would percolate into one giant cluster as N grows),
    8-adjacent dense cells merged by 3 synchronous min-label rounds —
    the density-clustering member of the spatial family (radius join:
    pairs, NN: argmin, DBSCAN: regions). Bounded-round labels are
    hash-exact by construction (the oracle replays the same rounds);
    convergence beyond the prefix follows the dedup_components
    convergence-flag pattern at production depth.

    Scale: one cell histogram (map-side), then all label work happens
    on the DENSE-CELL relation — bounded by grid area, not points."""
    from ..operators.geo import grid_dbscan, with_grid

    cust = with_grid(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        5_000_000,
    )
    return grid_dbscan(cust, 5_000_000, rounds=3)


#: Planted polygon set for q_geo_point_in_polygon (micro-degrees;
#: x = lon, y = lat): a big mid-latitude box, a CONCAVE L-shape, a
#: triangle and an irregular pentagon — one closed vertex ring each.
PIP_POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(0, 30_000_000), (40_000_000, 30_000_000),
        (40_000_000, 70_000_000), (0, 70_000_000)],
    2: [(-120_000_000, -60_000_000), (-60_000_000, -60_000_000),
        (-60_000_000, 0), (-90_000_000, 0),
        (-90_000_000, -30_000_000), (-120_000_000, -30_000_000)],
    3: [(120_000_000, -40_000_000), (179_000_000, 10_000_000),
        (130_000_000, 40_000_000)],
    4: [(60_000_000, -20_000_000), (90_000_000, -35_000_000),
        (110_000_000, 0), (85_000_000, 25_000_000), (55_000_000, 5_000_000)],
}


def _pip_edges() -> list[tuple[int, int, int, int, int]]:
    out = []
    for pid, ring in PIP_POLYGONS.items():
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            out.append((pid, x1, y1, x2, y2))
    return out


_PIP_EDGE_VALUES = ",\n      ".join(
    "({}, {}, {}, {}, {})".format(*e) for e in _pip_edges()
)

_PIP_ORACLE = """
    WITH pts AS (""" + _sql_pt("c_custkey") + """ FROM customer),
    edges(poly_id, x1, y1, x2, y2) AS (VALUES
      """ + _PIP_EDGE_VALUES + """
    ),
    crossings AS (
      SELECT p.k, e.poly_id
      FROM pts p CROSS JOIN edges e
      WHERE ((e.y1 > p.lat) != (e.y2 > p.lat))
        AND (CASE WHEN e.y2 > e.y1
             THEN (p.lon - e.x1) * (e.y2 - e.y1)
                  < (e.x2 - e.x1) * (p.lat - e.y1)
             ELSE (p.lon - e.x1) * (e.y2 - e.y1)
                  > (e.x2 - e.x1) * (p.lat - e.y1) END)
    )
    SELECT k AS c_custkey, CAST(poly_id AS INT) AS poly_id,
           CAST(COUNT(*) AS BIGINT) AS n_crossings
    FROM crossings GROUP BY 1, 2
    HAVING COUNT(*) % 2 = 1
"""


# graded since round 10: the containment-join representative
@query("q_geo_point_in_polygon", extra=True, oracle=_PIP_ORACLE)  # rotated out r12 (geo family keeps q_geo_grid_dbscan graded)
def q_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ray-casting point-in-polygon containment join
    (operators/geo.py:point_in_polygon_join) over the synthetic customer
    coordinates and a planted 4-polygon set (box, CONCAVE L, triangle,
    pentagon): horizontal-ray crossing parity, division-free integer
    crossing test, hash-exact against the oracle's replay of the same
    planted VALUES. The concave/convex correctness gates (plus the
    square's closed-form containment) live in tests/test_geo.py.

    Scale: polygon edges broadcast; candidate rows exist only for
    (point, polygon) pairs with >= 1 crossing edge; the parity groupBy
    is the single shuffle, keyed by point — unskewable."""
    from ..operators.geo import point_in_polygon_join, synth_lat_micro, synth_lon_micro

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        synth_lat_micro(F.col("c_custkey")).alias("lat"),
        synth_lon_micro(F.col("c_custkey")).alias("lon"),
    )
    edges = spark.createDataFrame(
        _pip_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
    )
    return point_in_polygon_join(pts, edges).select(
        F.col("k").alias("c_custkey"), "poly_id", "n_crossings"
    )

"""Geospatial grid operators: cell bucketing, radius joins, bounded
nearest-neighbor — the spatial-join family (range joins over 2-D points).

A naive radius/nearest join is a cross product; the scalable shape is the
classic grid-file / geohash blocking plan:

1. snap every point to an integer grid cell (``cell = floor(coord /
   cell_size)``) — a pure projection, no shuffle;
2. index one side by its cell (ONE shuffle, or none if the index side is
   broadcastable);
3. probe with the other side exploded to its 3x3 cell neighborhood (9
   probe rows per point — constant fan-out, not data-dependent);
4. verify candidates with the exact distance predicate.

With ``cell_size >= radius`` every true pair lands in the probe's 3x3
ring, so the blocking is LOSSLESS (tests/test_geo.py proves this against
the quadratic definition). Candidate volume is sum over cells of
|left_cell_ring| * |right_cell|, bounded by grid density — the same
Sigma|bucket|^2 discipline as the LSH band joins. Skew valve: shrink
``cell_micro`` (more, smaller cells) exactly like increasing LSH bands.

Coordinates are integer MICRO-DEGREES end to end: distances compare as
exact long squared sums, so the verify predicate (and hence the whole
result) is hash-exact across engines — no float enters. A haversine
verify would slot into step 4 unchanged where great-circle semantics are
required; the grid blocking (the scale-bearing part) is identical.

The synthetic coordinate columns (``synth_coords``) exist because the
TPC-H-ish tables carry no geography: they derive deterministic
micro-degree lat/lon from the md5-based ``stable_hash_u32`` so the DuckDB
oracle replays them verbatim (``md5_number_lower(x) % 4294967296``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import stable_hash_u32

#: micro-degrees per degree
MICRO = 1_000_000

# Shared derivation, kept textually parallel with the SQL fragments below
# (plans/geo_queries.py interpolates the same formulas into the oracles).
LAT_MOD = 180 * MICRO + 1  # odd modulus -> no bias alignment with grid
LON_MOD = 360 * MICRO + 1


def synth_lat_micro(key: Column, salt: str = "geo-v1") -> Column:
    """Deterministic latitude in micro-degrees, uniform on
    [-90e6, +90e6]: ``u32(salt:lat:key) % (180e6+1) - 90e6``."""
    h = stable_hash_u32(F.concat(F.lit(f"{salt}:lat:"), key.cast("string")))
    return (h % F.lit(LAT_MOD) - F.lit(90 * MICRO)).cast("long")


def synth_lon_micro(key: Column, salt: str = "geo-v1") -> Column:
    """Deterministic longitude in micro-degrees, uniform on
    [-180e6, +180e6]."""
    h = stable_hash_u32(F.concat(F.lit(f"{salt}:lon:"), key.cast("string")))
    return (h % F.lit(LON_MOD) - F.lit(180 * MICRO)).cast("long")


def cell_x(lon_micro: Column, cell_micro: int) -> Column:
    """Non-negative integer grid column: ``floor((lon + 180e6) / cell)``.
    The shifted value is < 2^29 so the double division is exact."""
    return F.floor((lon_micro + F.lit(180 * MICRO)) / F.lit(cell_micro)).cast(
        "long"
    )


def cell_y(lat_micro: Column, cell_micro: int) -> Column:
    return F.floor((lat_micro + F.lit(90 * MICRO)) / F.lit(cell_micro)).cast(
        "long"
    )


def with_grid(
    df: DataFrame, key: str, cell_micro: int, salt: str = "geo-v1"
) -> DataFrame:
    """Attach ``lat_micro / lon_micro / cx / cy`` derived from ``key``."""
    out = df.withColumn("lat_micro", synth_lat_micro(F.col(key), salt))
    out = out.withColumn("lon_micro", synth_lon_micro(F.col(key), salt))
    return out.withColumn("cx", cell_x(F.col("lon_micro"), cell_micro)).withColumn(
        "cy", cell_y(F.col("lat_micro"), cell_micro)
    )


def _probe_ring(df: DataFrame) -> DataFrame:
    """Explode each probe point to its 3x3 cell neighborhood (constant
    9x fan-out, map-side — no shuffle). The grid does not wrap at the
    antimeridian — documented operator semantics, mirrored by the
    oracle."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    exploded = df.withColumn("o", F.explode(offsets))
    return exploded.select(
        *[df[c] for c in df.columns],
        (F.col("cx") + F.col("o.dx")).alias("px"),
        (F.col("cy") + F.col("o.dy")).alias("py"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_micro: int,
    cell_micro: int | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """All (left, right) pairs with planar micro-degree squared distance
    <= radius^2. ``left``/``right`` must carry lat_micro/lon_micro/cx/cy
    (``with_grid``) and non-colliding other column names.

    Lossless blocking requires ``cell_micro >= radius_micro`` (asserted).
    Candidate pairs are verified with the exact integer predicate
    ``dlat^2 + dlon^2 <= r^2`` (|d| < 2^30 so the squares stay in long).

    100 TB shape: the right side shuffles ONCE on (cx, cy) (or never, if
    broadcast); the left side's 9x probe explode is map-side. Per-cell
    candidate volume is the grid-density bound; shrink ``cell_micro``
    toward ``radius_micro`` to tighten it under skew.
    """
    cell = cell_micro if cell_micro is not None else radius_micro
    assert cell >= radius_micro, "cell_micro < radius_micro loses pairs"
    probes = _probe_ring(left)
    idx = F.broadcast(right) if broadcast_right else right
    r2 = radius_micro * radius_micro
    joined = probes.join(
        idx,
        (probes["px"] == idx["cx"]) & (probes["py"] == idx["cy"]),
        "inner",
    )
    dlat = left["lat_micro"] - right["lat_micro"]
    dlon = left["lon_micro"] - right["lon_micro"]
    return joined.where(dlat * dlat + dlon * dlon <= F.lit(r2)).withColumn(
        "d2", dlat * dlat + dlon * dlon
    )


def nearest_in_ring(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_right: bool = False,
) -> DataFrame:
    """Bounded nearest-neighbor: for each left row, the closest right row
    among candidates in its 3x3 cell ring — argmin by (d2, right_key), a
    total order so the winner is hash-exact. Left rows whose ring holds
    no candidate are ABSENT from the output — bounded-kNN semantics;
    callers needing total coverage re-run the misses with a larger cell
    (the classic expanding-ring search, each round a constant-fan-out
    join, never a cross product).

    100 TB shape: candidate join as in :func:`radius_join`; the argmin is
    a per-left-key window over the ring candidates only (ring size is the
    density bound, not |right|).
    """
    from pyspark.sql import Window

    probes = _probe_ring(left)
    idx = F.broadcast(right) if broadcast_right else right
    joined = probes.join(
        idx,
        (probes["px"] == idx["cx"]) & (probes["py"] == idx["cy"]),
        "inner",
    )
    dlat = left["lat_micro"] - right["lat_micro"]
    dlon = left["lon_micro"] - right["lon_micro"]
    cand = joined.withColumn("d2", dlat * dlat + dlon * dlon)
    w = Window.partitionBy(left[left_key]).orderBy("d2", right[right_key])
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "px", "py")
    )


def grid_dbscan(
    pts: DataFrame, cell_micro: int, rounds: int = 3
) -> DataFrame:
    """Grid-density clustering (DBSCAN's grid approximation): snap
    points to cells, keep cells whose count >= a DATA-DERIVED density
    threshold (max(2, ceil(2·N/cells)) — twice the mean occupancy, so
    the dense set stays sparse at every corpus size instead of
    percolating as N grows), then merge 8-adjacent dense cells into
    clusters by ``rounds`` synchronous min-label steps over the
    adjacency — the bounded-round prefix of label convergence (the
    reachability/Bellman-Ford contract; labels are hash-exact at any
    round count because the oracle replays the same rounds).

    ``pts`` must carry cx/cy (``with_grid``). Output: (cx, cy, n,
    cluster) — cluster is the min cell-id label after ``rounds``.

    Scale: ONE cell groupBy builds the histogram (map-side combine);
    the adjacency is the 3x3 probe-ring equi-join ON THE DENSE CELLS
    ONLY (a relation bounded by grid size, not points); each label
    round is a join + min-agg on that same bounded relation.
    """
    n_cells = (360 * MICRO // cell_micro) * (180 * MICRO // cell_micro)
    # Collision-free cell-id pairing: cy ranges over 0..180*MICRO//cell_micro,
    # so a stride one past that bound keeps distinct (cx, cy) cells on
    # distinct cids at ANY cell_micro (the old fixed *100 encoding merged
    # unrelated clusters once cell_micro dropped below ~1.8e6).
    cid_stride = 180 * MICRO // cell_micro + 2
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    tot = pts.agg(
        F.greatest(
            F.lit(2).cast("long"),
            F.ceil(F.count(F.lit(1)) * 2.0 / n_cells).cast("long"),
        ).alias("minpts")
    )
    dense = (
        cells.crossJoin(F.broadcast(tot))
        .where(F.col("n") >= F.col("minpts"))
        .select(
            "cx", "cy", "n",
            (F.col("cx") * cid_stride + F.col("cy")).alias("cid"),
        )
        .localCheckpoint()
    )
    ring = _probe_ring(dense.select("cx", "cy", "cid"))
    other = dense.select(
        F.col("cx").alias("ox"), F.col("cy").alias("oy"),
        F.col("cid").alias("ocid"),
    )
    edges = ring.join(
        other, (ring["px"] == other["ox"]) & (ring["py"] == other["oy"])
    ).select(F.col("cid").alias("a"), F.col("ocid").alias("b")).localCheckpoint()
    labels = dense.select("cid", F.col("cid").alias("lab")).localCheckpoint()
    for _ in range(rounds):
        labels = (
            edges.join(labels, edges["b"] == labels["cid"])
            .groupBy(F.col("a").alias("cid2"))
            .agg(F.min("lab").alias("lab"))
            .select(F.col("cid2").alias("cid"), "lab")
            .localCheckpoint()
        )
    return dense.join(labels, "cid").select(
        "cx", "cy", "n", F.col("lab").alias("cluster")
    )


def point_in_polygon_join(
    points: DataFrame, edges: DataFrame, key: str = "k"
) -> DataFrame:
    """Ray-casting POINT-IN-POLYGON join — the containment member of the
    spatial family (radius join covers distance, grid_dbscan covers
    density): for each point, cast a horizontal ray to +infinity and
    count polygon-edge crossings; odd parity = inside. Handles concave
    polygons (the pytest gate uses an L-shape).

    Exactness: the crossing test is DIVISION-FREE — ``px < x1 +
    (x2-x1)(py-y1)/(y2-y1)`` cross-multiplies to a sign-adjusted integer
    comparison ((px-x1)(y2-y1) vs (x2-x1)(py-y1), direction flipped when
    y2 < y1), so with micro-degree integer coordinates both engines
    compute identical longs (|products| < 2^57) and the relation is
    hash-exact. The half-open rule ((y1 > py) != (y2 > py)) assigns
    vertex-grazing rays to exactly one incident edge — the standard
    crossing-number convention.

    ``points``: (key, lat, lon) integer micro-degrees. ``edges``: one row
    per directed boundary segment (poly_id, x1, y1, x2, y2) — x = lon,
    y = lat. Returns (key, poly_id, n_crossings) for contained points.

    Scale: edges broadcast (bounded polygon set); the candidate relation
    is generated ONLY for (point, polygon) pairs with at least one
    crossing edge — zero-crossing polygons never materialize a row, so
    the shuffle is |crossing pairs|, not |points| x |polygons|. For
    millions of polygons, pre-block with the with_grid cells on the
    polygon bbox first (same device as radius_join); the parity count
    composes unchanged.
    """
    py, px = F.col("lat"), F.col("lon")
    straddles = (F.col("y1") > py) != (F.col("y2") > py)
    lhs = (px - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("x2") - F.col("x1")) * (py - F.col("y1"))
    crosses = F.when(F.col("y2") > F.col("y1"), lhs < rhs).otherwise(
        lhs > rhs
    )
    return (
        points.crossJoin(F.broadcast(edges))
        .where(straddles & crosses)
        .groupBy(key, "poly_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_crossings"))
        .where(F.pmod(F.col("n_crossings"), F.lit(2)) == 1)
    )

"""Z-order (Morton-curve) multi-dimensional layout — the at-rest file
layout that makes MULTI-column range predicates prunable.

Partitioning/bucketing (sinks/partitioned.py, sinks/bucketed.py) cluster
on ONE key; a filter on a second dimension still touches every file. The
space-filling curve fixes that: bucket each dimension to ``bits`` bits,
interleave the bits into one Morton code, range-partition + sort the data
by that code, and write. Rows close in ALL dimensions land in the same
few files, so parquet footer min/max stats (and any file-level skipping
index) prune a k-dimensional box filter to a near-minimal file set.

The interleave is generated as ONE arithmetic SQL expression (shifts and
masks — no UDF), and the exact same generated text runs in DuckDB, which
is how ``q_zorder_index`` carries a full value-hash oracle for the code
computation itself; the file-skipping effect is asserted by
tests/test_layout_pruning.py (z-layout touches a small fraction of files
for a 2-D box, single-column layout touches ~all of them).

Scale: the write is one repartitionByRange shuffle (sampling the z-code
for balanced output files) + a local sort — the standard one-time layout
cost amortized over every subsequent pruned scan, exactly like the
bucketed layout. OPTIMIZE ... ZORDER BY in lakehouse table formats is
this same computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_sql(bucket_cols: list[str], bits: int = 8) -> str:
    """One arithmetic SQL expression interleaving ``bits`` bits of each
    (already bucketed, in [0, 2^bits)) column into a Morton code —
    engine-portable text: bit k of column j lands at output bit
    ``k * n_cols + j``."""
    n = len(bucket_cols)
    terms = [
        f"((({c} >> {k}) & 1) * {1 << (k * n + j)})"
        for j, c in enumerate(bucket_cols)
        for k in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def bucketize(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Scale a value with known [lo, hi] bounds onto [0, 2^bits) integer
    buckets — pure integer/long arithmetic after one exact subtraction, so
    the result replays in any engine. hi must be >= lo; values outside the
    bounds clamp."""
    n_buckets = 1 << bits
    span = (hi - lo + 1).cast("long")
    # integer floor division (non-negative operands), NOT float-divide-
    # then-cast: DuckDB CAST(double AS BIGINT) rounds while Spark's
    # truncates — the SQL twin is `((col - lo) * N) // span`
    b = F.call_function("div", (col - lo).cast("long") * n_buckets, span)
    return F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b))


def write_zordered(
    df: DataFrame,
    path: str,
    z_col: str = "__z",
    n_files: int = 16,
) -> None:
    """Range-partition on the precomputed Morton code and write ``n_files``
    z-locality-clustered parquet files (footer stats per file then prune
    multi-dim box filters). The code column itself is persisted too — it
    doubles as a cheap coarse filter (``z BETWEEN ...`` for a query box's
    curve ranges)."""
    (
        df.repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
        .write.mode("overwrite")
        .parquet(path)
    )

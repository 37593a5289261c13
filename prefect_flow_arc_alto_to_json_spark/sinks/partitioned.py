"""Hive-style partitioned layout — directory-level pruning at read time.

``partitionBy(col)`` writes one directory per partition value; any read
whose filter touches the partition column prunes whole directories from
the file index BEFORE listing/scanning their files (``PartitionFilters``
in the plan, distinct from row-group ``PushedFilters``). This is the
coarse-grained half of at-rest layout (bucketing in sinks/bucketed.py is
the fine-grained half): at 100 TB a date-partitioned events table turns a
one-day query from a full-corpus scan into a 1/365th scan with zero
compute spent deciding so.

Partition-column cardinality discipline (the classic failure mode is
encoded in the helper contract, not left to the caller's memory):
partition values become DIRECTORIES, so the column must be low-cardinality
(dates, regions, sources — thousands, not millions); high-cardinality keys
belong in bucketing. ``max_partitions`` fails fast when a caller is about
to write a million-directory table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_partitions: int = 10_000,
) -> None:
    """Write parquet partitioned by ``partition_cols`` (directory per
    value combination), guarding against high-cardinality explosions.

    The guard is an ``approx_count_distinct`` (HLL) pass over just the
    partition columns — a narrow scan with a constant-size sketch, unlike
    an exact ``distinct().count()`` whose shuffle would roughly double the
    write job's read cost at the 100 TB scale this module advertises. The
    HLL estimate is a ~3-sigma probability bound (rsd=0.02), not a proof,
    so decisions are tiered: clearly-under estimates (below ~94% of
    ``max_partitions``) pass on the sketch alone, clearly-over estimates
    (above ~106%) reject on the sketch alone, and only estimates INSIDE
    the ±3-sigma ambiguity band pay for an exact recount — so a write at
    9,500 of 10,000 is no longer falsely rejected, and an over-budget
    write slips past only if HLL errs beyond 3 sigma AND the exact
    recount is never reached (it can't be: the band triggers the exact
    path), i.e. the accept/reject decision at the boundary is exact.
    """
    from pyspark.sql import functions as F

    rsd = 0.02
    n = df.select(
        F.approx_count_distinct(F.struct(*partition_cols), rsd=rsd).alias("n")
    ).first()["n"]
    slack = 3 * rsd
    if n > max_partitions * (1 + slack):
        raise ValueError(
            f"~{n} distinct partition values exceeds max_partitions="
            f"{max_partitions}; use bucketing for high-cardinality keys "
            "or raise max_partitions"
        )
    if n > max_partitions * (1 - slack):
        # ambiguity band: the sketch can't distinguish 9,500 from 10,500 —
        # pay for one exact distinct count (rare: only near-cap writes)
        exact = df.select(*partition_cols).distinct().count()
        if exact > max_partitions:
            raise ValueError(
                f"{exact} distinct partition values exceeds max_partitions="
                f"{max_partitions} (exact recount); use bucketing for "
                "high-cardinality keys or raise max_partitions"
            )
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on partition columns become
    directory pruning (assert via ``PartitionFilters`` in the plan)."""
    return spark.read.parquet(path)

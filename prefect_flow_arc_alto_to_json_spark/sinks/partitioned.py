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
    reject threshold carries a 3-sigma slack BELOW the budget (rsd=0.02 →
    rejects above ~94% of ``max_partitions``): an HLL under-estimate can
    never sneak a truly over-budget write past the guard, at the cost of
    refusing writes in the top ~6% of the budget — the guard is a safety
    valve against orders-of-magnitude mistakes, not a precision meter;
    callers legitimately near the cap should raise ``max_partitions``.
    """
    from pyspark.sql import functions as F

    rsd = 0.02
    n = df.select(
        F.approx_count_distinct(F.struct(*partition_cols), rsd=rsd).alias("n")
    ).first()["n"]
    if n > max_partitions * (1 - 3 * rsd):
        raise ValueError(
            f"~{n} distinct partition values is at or over max_partitions="
            f"{max_partitions} (3-sigma slack applied); use bucketing for "
            "high-cardinality keys or raise max_partitions"
        )
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on partition columns become
    directory pruning (assert via ``PartitionFilters`` in the plan)."""
    return spark.read.parquet(path)

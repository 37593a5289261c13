"""Distributed dense surrogate-key assignment — global ROW_NUMBER without
a single-partition window.

``row_number() OVER (ORDER BY ...)`` is the relational definition of a
dense 0..N-1 id, but its physical plan funnels the whole table through ONE
partition — the classic 100 TB cliff. ``monotonically_increasing_id`` is
parallel but neither dense nor stable across runs. This operator gets the
window's exact answer with the window's parallelism:

1. ``repartitionByRange(order_cols)`` — range-partition by the total
   order (one shuffle, the same one a global sort pays);
2. count rows per partition (a few hundred longs to the driver);
3. cumulative-sum those counts into per-partition START OFFSETS,
   broadcast back;
4. per-partition ``row_number`` over a window PARTITIONED BY the
   partition id (parallel — each partition ranks locally) + offset.

Equivalent by construction to the global window as long as
``order_cols`` is a TOTAL order (enforce by appending a tiebreaker id),
which is what makes the result hash-checkable against the plain
``ROW_NUMBER() OVER (ORDER BY ...)`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "dense_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = dense 0-based rank of the row under the TOTAL
    order ``order_cols`` — computed with per-partition parallelism (see
    module docstring). ``order_cols`` must be duplicate-free as a tuple
    (append a unique id column as the last entry)."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint BEFORE fanning out to the two consumers: the range
    # exchange's partition boundaries come from nondeterministic sampling,
    # so correctness must not depend on the optimizer physically reusing
    # one exchange between the counts subtree and the final join — a
    # non-reused replay could sample different boundaries and emit
    # non-dense ids with no error
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # per-partition counts: tiny relation (one row per partition)
    counts = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.join(F.broadcast(counts), "__pid")
        .withColumn(
            out_col,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"),
        )
        .drop("__pid", "__offset")
    )

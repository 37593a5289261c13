"""Keyed upsert + compaction for parquet directories — the data-lake twin
of the reference's JDBC ``UPDATE ... WHERE id = %s`` sink
(flows/main_flow.py:94-97), at the file-format level.

Plain parquet has no transaction log, so MERGE is rewrite-on-change:
read ∪ updates → keep the newest row per key → rewrite. That makes the
primitive idempotent (re-running the same merge is a no-op), which is the
property the reference's UPDATE relied on. The swap is
directory-rename-based: atomic on a local/HDFS filesystem, NOT on plain
object stores — production object-store lakes use a table format
(Delta/Iceberg) whose commit log supplies the atomicity; the dataframe
logic here is exactly what their MERGE executes.

Compaction is the small-files half of sink maintenance: streaming /
per-batch appends leave thousands of tiny files; periodic rewrite to
``target_records_per_file`` restores scan efficiency.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _swap_write(df: DataFrame, path: str) -> None:
    tmp = f"{path}.__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old__"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def merge_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    order_col: str | None = None,
) -> None:
    """Last-writer-wins MERGE of ``updates`` into the parquet dir at
    ``path`` (insert new keys, replace existing ones). With ``order_col``,
    the greatest value wins instead of blanket update-priority — use it for
    event-time upserts where late updates must not clobber newer state."""
    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return
    current = spark.read.parquet(path).withColumn("__prio", F.lit(0))
    incoming = updates.withColumn("__prio", F.lit(1))
    order = (
        [F.col(order_col).desc(), F.col("__prio").desc()]
        if order_col
        else [F.col("__prio").desc()]
    )
    w = Window.partitionBy(key).orderBy(*order)
    merged = (
        current.unionByName(incoming)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )
    _swap_write(merged, path)


def compact_parquet(
    spark: SparkSession, path: str, target_records_per_file: int = 1_000_000
) -> tuple[int, int]:
    """Rewrite a parquet dir into ⌈rows/target⌉ files; returns
    (files_before, files_after)."""

    def _nfiles() -> int:
        return sum(
            1
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    before = _nfiles()
    df = spark.read.parquet(path)
    n = df.count()
    parts = max(1, math.ceil(n / target_records_per_file))
    _swap_write(df.repartition(parts), path)
    return before, _nfiles()


def apply_cdc_parquet(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """Apply an ordered CDC batch (inserts/updates/DELETES) to the
    parquet state at ``path`` — the Debezium-ingestion counterpart of
    :func:`merge_parquet`, which cannot remove keys. ``changes`` rows
    carry ``op_col`` in ('I','U','D') and a monotonically increasing
    ``seq_col``; the state table persists both columns, so conflict
    resolution is pure last-writer-wins on (seq, incoming-priority) and
    a key whose winning op is 'D' leaves the state entirely. Re-applying
    a batch is a no-op (the same winners win; a re-applied delete
    re-deletes nothing) — the idempotence that makes the foreachBatch
    form exactly-once on a plain-parquet lake.

    Scale: same rewrite-on-change economics as merge_parquet — the
    shuffle carries |state| + |batch keys| rows keyed on the primary
    key; a table format's MERGE WHEN MATCHED THEN DELETE executes the
    identical dataflow with file pruning on top."""
    if not os.path.exists(path):
        survivors = _last_writer(changes, key, seq_col, op_col)
        survivors.write.mode("overwrite").parquet(path)
        return
    current = spark.read.parquet(path).withColumn("__prio", F.lit(0))
    incoming = changes.withColumn("__prio", F.lit(1))
    merged = _last_writer(
        current.unionByName(incoming), key, seq_col, op_col
    )
    _swap_write(merged, path)


def _last_writer(
    df: DataFrame, key: str, seq_col: str, op_col: str
) -> DataFrame:
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col("__prio").desc()
    )
    if "__prio" not in df.columns:
        df = df.withColumn("__prio", F.lit(1))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", "__prio")
    )

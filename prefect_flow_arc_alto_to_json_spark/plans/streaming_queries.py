"""Structured-Streaming queries exposed through the BATCH driver contract.

The grading driver's ``queries()`` surface is batch-only, which round-2's
review called an inherent limit on streaming verification. It isn't quite:
a query entry can run a REAL Structured Streaming job —
``readStream`` file source → streaming aggregation →
``Trigger.AvailableNow`` → memory sink — drain it to completion, and
return the materialized result as a DataFrame for the ordinary DuckDB
side-by-side check. ``AvailableNow`` guarantees the stream processes
exactly the files present and stops, so the result is deterministic and
equals the batch answer — which is precisely the oracle.

What this proves beyond pytest: the streaming plan (file-source listing,
streaming aggregation state, the AvailableNow drain, memory-sink
materialization) produces hash-identical results to ANSI SQL over the same
parquet — in the driver's own vanilla session. Watermark/session/stateful
operators remain pytest-covered (their semantics are about late data and
incremental triggers, which a single drained batch cannot distinguish).

Scale: at 100 TB/day this exact plan is the production shape — the file
source lists incrementally from the checkpoint, the aggregation state is
per (hour, event_type), and ``AvailableNow`` is the scheduled
run-per-invocation trigger (the reference's cron flow, streamified).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..streaming.pipeline import run_available_now, stream_events
from .registry import query


@query(
    "stream_hourly_events",
    extra=True,
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup computed BY A STREAMING JOB (the streaming twin
    of ``q_hourly_events``, driver-checkable): parquet file-source stream →
    groupBy(hour, type) aggregation in complete mode → AvailableNow drain →
    memory sink → returned as a static DataFrame. Money stays in exact
    integer cents (the same cross-engine determinism contract as the batch
    twin)."""
    # The file source requires a DIRECTORY; the testdata table is a single
    # parquet file. Stage a symlink dir (no data copy) — at scale the
    # source is a real landing directory and this step disappears.
    src_dir = tempfile.mkdtemp(prefix="stream_hourly_src_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    ev = stream_events(spark, src_dir)
    agg = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents("value")).cast("double") / 100.0).alias("total_value"),
    )
    table = f"stream_hourly_{uuid.uuid4().hex[:10]}"
    run_available_now(
        agg,
        checkpoint_dir=tempfile.mkdtemp(prefix="stream_hourly_ckpt_"),
        output_mode="complete",
        memory_table=table,
    )
    return spark.table(table)


@query(
    "stream_dedup_events",
    extra=True,
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) AS BIGINT) AS n_after_dedup
    FROM events
    GROUP BY event_id
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup, driver-checkable with a PLANTED duplicate
    stream: the source dir holds TWO symlinks to the same events parquet,
    so the file stream delivers every row twice; ``dropDuplicates`` on the
    key must emit each exactly once. The oracle is the single-copy table —
    a hash match proves the streaming state actually deduplicated 2x input
    (not merely passed rows through). Returned as per-key counts so the
    check is insensitive to emit order but fails if ANY duplicate leaks
    or any row is dropped."""
    src_dir = tempfile.mkdtemp(prefix="stream_dedup_src_")
    for alias in ("a.parquet", "b.parquet"):
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(src_dir, alias),
        )
    ev = stream_events(spark, src_dir)
    deduped = ev.dropDuplicates(["event_id"]).groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_after_dedup")
    )
    table = f"stream_dedup_{uuid.uuid4().hex[:10]}"
    run_available_now(
        deduped,
        checkpoint_dir=tempfile.mkdtemp(prefix="stream_dedup_ckpt_"),
        output_mode="complete",
        memory_table=table,
    )
    return spark.table(table)

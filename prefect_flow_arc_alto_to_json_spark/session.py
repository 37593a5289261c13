"""SparkSession factory.

Defaults are sized for the local[32] test harness but every knob is the one
you would tune on a real cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  selection) — at 100 TB the static shuffle-partition guess is always wrong,
  AQE fixes it per-stage from runtime statistics.
- ``spark.sql.shuffle.partitions`` — starting point only; AQE coalesces.
- Arrow execution enabled — every pandas_udf / mapInPandas boundary is
  Arrow-batched, never per-row pickling.
- parquet vectorized reader + filter pushdown are Spark defaults; we assert
  rather than re-set them.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _export_package_path() -> str:
    """Make this package importable on executor Python workers regardless of
    the driver's cwd: prepend the repo dir to PYTHONPATH *before* the JVM
    starts (local-mode workers inherit it). On a real cluster the same dir
    is shipped via --py-files / container image; this keeps the local
    contract identical."""
    import sys

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_dir not in sys.path:
        sys.path.insert(0, repo_dir)
    existing = os.environ.get("PYTHONPATH", "")
    if repo_dir not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_dir}{os.pathsep}{existing}" if existing else repo_dir
        )
    return repo_dir


def get_spark(
    app_name: str = "prefect_flow_arc_alto_to_json_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    repo_dir = _export_package_path()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # local[N] inherits the 1 GB driver-JVM default, which is the de
        # facto executor-memory ceiling of the whole single-JVM harness —
        # the x8 scale-smoke blow-ups OOMed against it while the box has
        # 128 GiB. Must be set BEFORE the JVM launches (getOrCreate), so
        # it lives here, env-overridable like the cpu count.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # AQE: coalesce small shuffle partitions, split skewed ones, and
        # switch sort-merge→broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every Python<->JVM columnar handoff.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps in testdata are ns (events.ts); keep Spark on µs
        # precision semantics but read ns parquet without error.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by
        # default; read as epoch-nanos long and normalize in the loader
        # (sources/tables.py) to a µs timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Keep driver results small by default; operators never collect.
        .config("spark.driver.maxResultSize", "2g")
        # Warehouse for bucketed tables (sinks.bucketed.write_bucketed);
        # static conf, so it must be set before the session exists. Local
        # default keeps test artifacts out of the repo; clusters override.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "spark_graft_warehouse"),
            ),
        )
        # Belt-and-braces with _export_package_path for executor imports.
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

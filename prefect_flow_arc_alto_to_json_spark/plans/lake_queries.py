"""Lake-maintenance surface through the driver contract: the parquet MERGE
(keyed upsert) primitive applied to a real table and verified against the
relational definition of merge semantics in SQL.

The sink itself (sinks/upsert.py) is write-side and pytest-covered; this
query makes its SEMANTICS driver-checkable: write the base table, apply a
deterministic update+insert batch through ``merge_parquet`` (last-writer-
wins rewrite), read the merged directory back, and hash-compare against a
FULL OUTER JOIN oracle — updated keys must carry the new values, untouched
keys the old ones, inserted keys must exist exactly once.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..sinks.upsert import merge_parquet
from ..sources import load_table
from .registry import query


@query(
    "q_merge_upsert",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, 'U' AS status, total_cents + 100000 AS total_cents
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', total_cents
      FROM base WHERE o_orderkey % 100 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.status, b.status) AS status,
           CAST(COALESCE(u.total_cents, b.total_cents) AS BIGINT) AS total_cents
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed parquet MERGE end-to-end: base orders → deterministic batch
    (every 10th key updated to status 'U' with +1000.00; every 100th key
    re-inserted under key+10M as status 'N') → last-writer-wins rewrite →
    read-back. Money in exact integer cents throughout. The oracle is the
    declarative merge: FULL OUTER JOIN with update-priority COALESCE."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="merge_upsert_") + "/orders"
    base.write.mode("overwrite").parquet(path)
    updates = base.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("total_cents") + 100000).alias("total_cents"),
    ).unionByName(
        base.where(F.col("o_orderkey") % 100 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("status"),
            F.col("total_cents"),
        )
    )
    merge_parquet(spark, path, updates, key="o_orderkey")
    return spark.read.parquet(path)

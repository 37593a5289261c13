"""merge_parquet / compact_parquet: upsert semantics and file hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.sinks.upsert import (
    compact_parquet,
    merge_parquet,
)


def _read(spark, path):
    return {
        r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()
    }


def test_merge_insert_update_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, v string, ver long"
    )
    merge_parquet(spark, path, base, key="k")
    assert _read(spark, path) == {1: ("a", 1), 2: ("b", 1)}

    upd = spark.createDataFrame(
        [(2, "B", 2), (3, "c", 1)], "k long, v string, ver long"
    )
    merge_parquet(spark, path, upd, key="k")
    assert _read(spark, path) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}

    # idempotence: same merge again changes nothing
    merge_parquet(spark, path, upd, key="k")
    assert _read(spark, path) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}


def test_merge_order_col_keeps_newest(spark, tmp_path):
    path = str(tmp_path / "t2")
    merge_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "new", 5)], "k long, v string, ver long"),
        key="k",
    )
    # a LATE update with older ver must lose when order_col is given
    late = spark.createDataFrame([(1, "stale", 3)], "k long, v string, ver long")
    merge_parquet(spark, path, late, key="k", order_col="ver")
    assert _read(spark, path) == {1: ("new", 5)}


def test_compact_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t3")
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("x").alias("v"), F.lit(1).alias("ver")
    )
    df.repartition(32).write.parquet(path)
    before, after = compact_parquet(spark, path, target_records_per_file=1000)
    assert before >= 32 and after == 1
    assert spark.read.parquet(path).count() == 1000

"""Bucketed-layout tests (sinks/bucketed.py): the written layout must
actually eliminate the join/agg Exchange — the whole point of paying the
write-time shuffle — and results must match the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.sinks.bucketed import (
    colocated_join,
    write_bucketed,
)
from prefect_flow_arc_alto_to_json_spark.sources import load_table

BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", BUCKETS, str(base / "li"))
    write_bucketed(orders, "b_orders", "l_orderkey", BUCKETS, str(base / "ord"))
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def _no_broadcast(spark):
    """Force a non-broadcast join so the Exchange assertion is meaningful
    (a BroadcastExchange would also match the substring)."""
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_colocated_join_has_zero_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Propagating the write-time sortBy order from a bucketed scan is off
    # by default since Spark 3.0 (SPARK-28595: the one-file-per-bucket
    # check was deemed too costly to run unconditionally) — opt in to
    # prove the layout supports Sort elimination too.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = colocated_join(spark, lt, rt, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # both sides sortBy'd at write with one file per bucket → the SMJ
        # needs no Sort node either ("- Sort [" is the node; plain "Sort"
        # would also match SortMergeJoin itself)
        assert "- Sort [" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )


def test_bucketed_agg_has_zero_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_extendedprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_colocated_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = colocated_join(spark, lt, rt, "l_orderkey").count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).count()
    assert got == want and got > 0

"""Salted aggregation / join rewrites must equal their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.skew import salted_agg, salted_join
from prefect_flow_arc_alto_to_json_spark.sources import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("value", "count"),
                "s": ("value", "sum"),
                "mn": ("value", "min"),
                "mx": ("value", "max"),
            },
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 4).alias("user_avg"))
    )
    plain = ev.join(dim, "user_id")
    salted = salted_join(ev, dim, "user_id", salt_buckets=4)
    assert salted.count() == plain.count()
    a = {(r["event_id"], r["user_avg"]) for r in plain.collect()}
    b = {(r["event_id"], r["user_avg"]) for r in salted.collect()}
    assert a == b


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    import pytest

    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"m": ("value", "median")})


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    import shutil

    from prefect_flow_arc_alto_to_json_spark.functions.scale import save_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ev_b", "usr_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    save_bucketed(
        ev.select("event_id", "user_id", "value"), "ev_b", "user_id", buckets=8
    )
    save_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n")), "usr_b", "user_id", buckets=8
    )
    # the tiny test tables would be auto-broadcast (which also bypasses
    # bucketing) — disable it so the plan shows what happens at scale:
    # a sort-merge join reading co-located buckets with NO exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("ev_b").join(spark.table("usr_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS usr_b")

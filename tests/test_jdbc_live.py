"""Live-database round-trip for the JDBC catalog scan (reference S1,
flows/main_flow.py:15-44) using the Derby embedded engine that ships inside
pyspark's jars — a REAL JDBC driver + on-disk database, not a parquet
mirror. Covers all three scan modes (query=, table=, range-partitioned
table=) plus a write-back round trip through Spark's JDBC sink.

Derby quirks encoded here: Spark creates tables with quoted (case-exact)
identifiers, so raw ``query=`` SQL must quote column names; the embedded
driver allows one JVM per database, which local-mode Spark satisfies.
"""

from __future__ import annotations

import pytest

from prefect_flow_arc_alto_to_json_spark.sources.tables import jdbc_catalog_scan

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    props = {"driver": DRIVER}
    src = spark.range(0, 200).selectExpr(
        "id", "id * 3 AS val", "CAST(id % 7 AS STRING) AS grp"
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "catalog_src")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url, props


def test_table_mode_roundtrip(spark, derby):
    url, props = derby
    back = jdbc_catalog_scan(spark, url, table="catalog_src", properties=props)
    assert back.count() == 200
    assert {r["id"] for r in back.collect()} == set(range(200))


def test_query_mode_ships_sql(spark, derby):
    """query= ships the statement verbatim — the reference's delegate-to-
    Postgres design; Derby runs the aggregation, Spark sees result rows."""
    url, props = derby
    # Derby quirk: Spark writes StringType as CLOB, which Derby cannot
    # GROUP BY — aggregate on a numeric expression instead.
    agg = jdbc_catalog_scan(
        spark,
        url,
        query='SELECT MOD("id", 7) AS "grp", COUNT(*) AS "n" '
        "FROM catalog_src GROUP BY MOD(\"id\", 7)",
        properties=props,
    )
    rows = {r["grp"]: r["n"] for r in agg.collect()}
    assert len(rows) == 7
    assert sum(rows.values()) == 200


def test_partitioned_range_read(spark, derby):
    """The 100 TB form: one logical table split into N bounded JDBC reads."""
    url, props = derby
    part = jdbc_catalog_scan(
        spark,
        url,
        table="catalog_src",
        properties=props,
        partition_column='"id"',
        num_partitions=4,
        lower_bound=0,
        upper_bound=200,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 200


def test_filter_pushdown_reaches_jdbc(spark, derby):
    """Catalyst must push the predicate into the JDBC source (PushedFilters),
    not filter post-transfer."""
    url, props = derby
    back = jdbc_catalog_scan(spark, url, table="catalog_src", properties=props)
    filtered = back.where("val >= 300").select("id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "val" in plan
    assert filtered.count() == 100


def test_writeback_roundtrip(spark, derby):
    """Scan → transform → JDBC write-back → scan again: the reference's
    read-compute-update cycle on a live database end to end."""
    url, props = derby
    back = jdbc_catalog_scan(spark, url, table="catalog_src", properties=props)
    doubled = back.selectExpr("id", "val * 2 AS val2")
    (
        doubled.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "catalog_out")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    out = jdbc_catalog_scan(spark, url, table="catalog_out", properties=props)
    got = {r["id"]: r["val2"] for r in out.collect()}
    assert got == {i: i * 6 for i in range(200)}

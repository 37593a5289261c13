"""Versioned snapshot sink (sinks/versioned.py): manifest commits,
pinned reads, latest resolution, vacuum retention, crash-order safety."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.sinks.versioned import (
    list_versions,
    read_version,
    vacuum,
    write_version,
)


@pytest.fixture()
def table(spark):
    path = tempfile.mkdtemp(prefix="versioned_t_") + "/t"
    base = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("x")
    )
    assert write_version(base, path) == 1
    assert write_version(base.withColumn("x", F.col("x") + 100), path) == 2
    return path


def test_pinned_version_survives_later_writes(spark, table):
    v1 = {r["id"]: r["x"] for r in read_version(spark, table, 1).collect()}
    assert v1 == {i: i * 2 for i in range(10)}
    # a third commit must not disturb the pinned v1 read
    write_version(
        spark.range(3).select("id", F.lit(0).alias("x")), table
    )
    again = {r["id"]: r["x"] for r in read_version(spark, table, 1).collect()}
    assert again == v1
    assert list_versions(table) == [1, 2, 3]


def test_latest_resolution_and_unknown_version(spark, table):
    latest = {r["id"]: r["x"] for r in read_version(spark, table).collect()}
    assert latest == {i: i * 2 + 100 for i in range(10)}
    with pytest.raises(ValueError, match="version 9"):
        read_version(spark, table, 9)
    with pytest.raises(FileNotFoundError):
        read_version(spark, tempfile.mkdtemp(prefix="empty_"))


def test_vacuum_keeps_last_k_and_commits_first(spark, table):
    assert vacuum(table, keep_last=1) == [1]
    assert list_versions(table) == [2]
    assert not os.path.exists(os.path.join(table, "v1"))
    latest = {r["id"]: r["x"] for r in read_version(spark, table).collect()}
    assert latest == {i: i * 2 + 100 for i in range(10)}
    with pytest.raises(ValueError, match="keep_last"):
        vacuum(table, keep_last=0)


def test_orphan_data_dir_is_invisible_until_commit(spark, table):
    """Crash order: data lands before the manifest commit — a dir with no
    manifest entry must be invisible to readers and not block the next
    version number from committing over... (next write picks version 3
    from the MANIFEST, not the directory listing)."""
    os.makedirs(os.path.join(table, "v99"))  # orphan from a "crash"
    assert list_versions(table) == [1, 2]
    n = write_version(
        spark.range(1).select("id", F.lit(7).alias("x")), table
    )
    assert n == 3
    man = json.load(open(os.path.join(table, "manifest.json")))
    assert [v["version"] for v in man["versions"]] == [1, 2, 3]

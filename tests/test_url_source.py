"""Custom Python data source: partition-parallel URL scan with error rows."""

from __future__ import annotations

import glob
import os

from prefect_flow_arc_alto_to_json_spark.operators.alto import (
    simplify_alto,
    transcript,
)
from prefect_flow_arc_alto_to_json_spark.sources.url_source import register

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_urltext_scan_fetches_and_isolates_errors(spark):
    register(spark)
    urls = sorted(f"file://{p}" for p in glob.glob(os.path.join(FIXTURES, "*.xml")))
    urls.append("file:///nonexistent/path.xml")
    df = (
        spark.read.format("urltext")
        .option("urls", "\n".join(urls))
        .option("urlsPerPartition", "2")
        .load()
    )
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == len(urls)
    bad = rows["file:///nonexistent/path.xml"]
    assert bad["body"] is None and "Error" in bad["fetch_error"]
    ok = [r for r in rows.values() if r["fetch_error"] is None]
    assert len(ok) == len(urls) - 1
    assert all(r["body"].lstrip().startswith("<") for r in ok)


def test_urltext_scan_feeds_alto_pipeline(spark):
    register(spark)
    urls = sorted(f"file://{p}" for p in glob.glob(os.path.join(FIXTURES, "*.xml")))
    df = spark.read.format("urltext").option("urls", "\n".join(urls)).load()
    out = (
        simplify_alto(df.where(df.fetch_error.isNull()), xml_col="body")
        .withColumn("t", transcript("simplified"))
        .collect()
    )
    transcripts = {os.path.basename(r["url"]): r["t"] for r in out}
    assert transcripts["alto_v2.xml"] == "Hello world again block2"
    assert transcripts["alto_v3.xml"] == "Bonjour  monde"

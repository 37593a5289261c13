"""UDTF / pandas-UDAF surface: offsets are exact, quantiles match pandas."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.functions.udf_surface import (
    TokensWithOffsets,
    exact_quantile_p90,
)
from prefect_flow_arc_alto_to_json_spark.sources import load_table


def test_udtf_tokens_with_offsets(spark):
    spark.udtf.register("tokens_with_offsets", TokensWithOffsets)
    rows = spark.sql(
        "SELECT * FROM tokens_with_offsets('  ab  cd x ')"
    ).collect()
    got = [(r["token_no"], r["token"], r["char_start"], r["char_len"]) for r in rows]
    assert got == [(0, "ab", 2, 2), (1, "cd", 6, 2), (2, "x", 9, 1)]


def test_udtf_lateral_join_expands_documents(spark, sf_dir):
    spark.udtf.register("tokens_with_offsets", TokensWithOffsets)
    docs = load_table(spark, sf_dir, "documents").limit(20)
    docs.createOrReplaceTempView("docs_20")
    out = spark.sql(
        """
        SELECT d.doc_id, t.token_no, t.token, t.char_start
        FROM docs_20 d, LATERAL tokens_with_offsets(d.text) t
        """
    )
    # per-doc row count == whitespace token count; offsets point at tokens
    counts = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert counts == want
    sample = out.where(F.col("doc_id") == sorted(counts)[0]).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in sample:
        t = texts[r["doc_id"]]
        assert t[r["char_start"] : r["char_start"] + len(r["token"])] == r["token"]


def test_pandas_grouped_agg_quantile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["p90"]
        for r in ev.groupBy("event_type")
        .agg(exact_quantile_p90("value").alias("p90"))
        .collect()
    }
    pdf = ev.select("event_type", "value").toPandas()
    want = pdf.groupby("event_type")["value"].quantile(0.9).to_dict()
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9

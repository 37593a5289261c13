"""Unit + plan-shape tests for the corpus-assembly operators
(operators/corpus.py): deterministic sampling/mixing semantics, packing
arithmetic edge cases, and the scale-critical plan properties (sampling
and mixing must be shuffle-free; packing must shuffle exactly once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.corpus import (
    chunk_pack,
    stratified_sample,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"text {i}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_sample_deterministic_and_nested(spark, docs):
    """Same call → same rows; a smaller fraction's row set is a subset of a
    larger one's (the hash-threshold contract that makes ablation subsets
    nested for free — F.rand() sampling has neither property)."""
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}).collect()}
    assert a == b and a
    small = {
        r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.2}).collect()
    }
    assert small < a
    # default fraction 0.0: other strata vanish entirely
    langs = {r["lang"] for r in stratified_sample(docs, "lang", {"en": 0.5}).collect()}
    assert langs == {"en"}


def test_sample_fraction_extremes(spark, docs):
    n_en = docs.where("lang = 'en'").count()
    assert stratified_sample(docs, "lang", {"en": 1.0}).count() == n_en
    assert stratified_sample(docs, "lang", {"en": 0.0}).count() == 0


def test_mix_repeat_counts(spark, docs):
    """Integer weight ⇒ exactly w copies each; fractional weight ⇒ every
    doc gets floor(w) copies and the extras are the deterministic hash
    draw, with copy_idx densely numbered 0..repeats-1."""
    out = weighted_mix(docs, "lang", {"en": 2.0, "de": 0.0}, default_weight=1.0)
    per = {
        (r["lang"], r["n"], r["c"])
        for r in out.groupBy("lang")
        .agg(
            (F.count(F.lit(1)) / F.count_distinct("doc_id")).alias("n"),
            F.max("copy_idx").alias("c"),
        )
        .withColumnRenamed("lang", "lang")
        .collect()
    }
    assert ("en", 2.0, 1) in per  # every en doc exactly twice
    assert ("fr", 1.0, 0) in per  # default weight 1.0
    assert not any(lang == "de" for lang, _, _ in per)  # weight 0 drops all
    frac = weighted_mix(docs, "lang", {"en": 1.5})
    n_en = docs.where("lang = 'en'").count()
    n_copies = frac.where("lang = 'en'").count()
    assert n_en < n_copies < 2 * n_en  # strictly fractional oversample
    # determinism
    assert n_copies == weighted_mix(docs, "lang", {"en": 1.5}).where(
        "lang = 'en'"
    ).count()


def test_chunk_pack_arithmetic(spark):
    """Straddle math: offsets/pack ids/span counts for a hand-computed
    shard stream, including a doc that exactly fills a window and one that
    spans three."""
    rows = [
        ("s", 1, 60),  # [0, 60)   pack 0
        ("s", 2, 40),  # [60, 100) pack 0, ends at 99 — exactly fills
        ("s", 3, 250),  # [100, 350) packs 1..3 → spans 3
        ("s", 4, 1),  # [350, 351) pack 3
        ("t", 9, 5),  # separate shard restarts at 0
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, n long")
    out = {
        r["doc_id"]: (r["start_off"], r["pack_id"], r["pack_spans"])
        for r in chunk_pack(df, 100, "n", "src").collect()
    }
    assert out[1] == (0, 0, 1)
    assert out[2] == (60, 0, 1)
    assert out[3] == (100, 1, 3)
    assert out[4] == (350, 3, 1)
    assert out[9] == (0, 0, 1)


def test_chunk_pack_zero_token_doc(spark):
    """A 0-token doc occupies no window span beyond its start window."""
    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 0), ("s", 3, 1)], "src string, doc_id long, n long"
    )
    out = {
        r["doc_id"]: (r["start_off"], r["pack_id"], r["pack_spans"])
        for r in chunk_pack(df, 100, "n", "src").collect()
    }
    assert out[2] == (100, 1, 1)
    assert out[3] == (100, 1, 1)


def test_sampling_and_mix_are_shuffle_free(spark, docs):
    for df in (
        stratified_sample(docs, "lang", {"en": 0.5, "de": 0.25}),
        weighted_mix(docs, "lang", {"en": 2.5, "de": 0.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_chunk_pack_single_exchange(spark, docs):
    toks = docs.select("doc_id", "lang", F.length("text").cast("long").alias("n"))
    plan = (
        chunk_pack(toks, 100, "n", "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan

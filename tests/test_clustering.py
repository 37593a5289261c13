"""Deterministic integer k-means (operators/clustering.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from prefect_flow_arc_alto_to_json_spark.operators.clustering import (
    kmeans_assign_micro,
)
from prefect_flow_arc_alto_to_json_spark.sources import load_table


def test_kmeans_partitioning_invariance(spark, sf_dir):
    """The assignment must not depend on physical partitioning — the whole
    point of the integer contract. Run the identical corpus at 1 and 13
    partitions and require bit-equal assignments."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign_micro(emb.coalesce(1), k=4, iterations=2).collect()
    b = kmeans_assign_micro(emb.repartition(13), k=4, iterations=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_covers_corpus_and_cells_sum(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out = kmeans_assign_micro(emb, k=8, iterations=1)
    assert out.count() == n  # every vector assigned exactly once
    cells = out.select("cent_id", "n_cell").distinct()
    assert cells.agg(F.sum("n_cell")).first()[0] == n
    assert cells.count() <= 8  # empty cells may vanish, never split


def test_kmeans_deeper_iterations_stay_total(spark, sf_dir):
    """Iteration count changes WHICH cells vectors land in, never how many
    land anywhere (totality is iteration-invariant); the value-level
    ascent property is adjudicated by sim_kmeans_cells' full oracle
    replay."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a1 = kmeans_assign_micro(emb, k=4, iterations=1).collect()
    a3 = kmeans_assign_micro(emb, k=4, iterations=3).collect()
    assert len(a1) == len(a3) == 200
    assert {r["vid"] for r in a1} == {r["vid"] for r in a3}

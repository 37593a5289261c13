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


def test_pca_power_iteration_rayleigh_gate(spark, sf_dir):
    """Quality gate behind the hash-exact oracle (which proves
    determinism, not convergence): the returned direction must capture
    >= 80% of the top eigenvalue's energy (Rayleigh quotient vs
    numpy's eigh) and strictly improve on the all-ones start. The
    synthetic corpus is near-isotropic (lambda2/lambda1 ~ 0.93), so
    identifying THE eigenvector is ill-posed in any fixed round count —
    captured variance is the meaningful convergence measure."""
    import numpy as np

    from prefect_flow_arc_alto_to_json_spark.operators.clustering import (
        pca_top_component_micro,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("embedding").collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    G = X.T @ X
    w, _ = np.linalg.eigh(G)
    got = pca_top_component_micro(emb, iterations=4).collect()
    v = np.zeros(64)
    for r in got:
        v[r["dim"] - 1] = r["loading_micro"]
    rq = (v @ G @ v) / (v @ v)
    ones = np.ones(64)
    rq0 = (ones @ G @ ones) / (ones @ ones)
    assert rq / w[-1] >= 0.8, rq / w[-1]
    assert rq > rq0


def test_pca_partitioning_invariance(spark, sf_dir):
    """Gram partials are integer-associative: 1 vs 13 partitions must
    produce bit-equal loadings (the mapInArrow twin of the k-means
    invariance check)."""
    from prefect_flow_arc_alto_to_json_spark.operators.clustering import (
        pca_top_component_micro,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = pca_top_component_micro(emb.coalesce(1), iterations=4).collect()
    b = pca_top_component_micro(emb.repartition(13), iterations=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_silhouette_planted_blobs_and_bounds(spark):
    """Two tight, well-separated planted blobs must silhouette near +1
    (mean_s_ppm > 900_000 in both cells), and the index must obey its
    contract everywhere: |s| <= 1e6, totality (n_cell sums to N), and
    partitioning invariance (the determinism point of the integer
    path)."""
    from prefect_flow_arc_alto_to_json_spark.operators.clustering import (
        kmeans_silhouette_micro,
    )

    dim = 8
    rows = []
    for i in range(24):
        base = 1.0 if i % 2 == 0 else -1.0
        # deterministic tiny jitter, no RNG: +/- up to 0.02 by index
        vec = [base + ((i * 7 + d * 3) % 5 - 2) * 0.01 for d in range(dim)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_silhouette_micro(emb, k=2, iterations=2, dim=dim)
    got = {r["cent_id"]: r for r in out.collect()}
    assert sum(r["n_cell"] for r in got.values()) == 24
    for r in got.values():
        assert -1_000_000 <= r["mean_s_ppm"] <= 1_000_000
        assert r["mean_s_ppm"] > 900_000  # tight blobs, wide gap
    out13 = kmeans_silhouette_micro(
        emb.repartition(13), k=2, iterations=2, dim=dim
    )
    assert sorted(map(tuple, out13.collect())) == sorted(
        map(tuple, out.collect())
    )

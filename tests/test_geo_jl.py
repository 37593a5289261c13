"""The Johnson-Lindenstrauss operator's real guarantee: the ±1 sign
projection preserves pairwise squared distances within the lemma's
sqrt(2/d_out) concentration — gated directly, because on this corpus's
near-isotropic embeddings top-k recall is noise-bound and would gate
nothing (documented in sim_jl_topk's docstring).
"""

from __future__ import annotations

import numpy as np

from prefect_flow_arc_alto_to_json_spark.operators.similarity import (
    jl_sign_matrix,
)


def test_jl_distance_preservation(spark, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
        .collect()
    )
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    d_out = 16
    S = np.array(jl_sign_matrix(X.shape[1], d_out), dtype=np.float64)
    P = X @ S.T  # n x d_out
    rng = np.random.default_rng(7)
    idx = rng.choice(len(X), size=(200, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    ratios = []
    for a, b in idx:
        exact = float(np.sum((X[a] - X[b]) ** 2))
        proj = float(np.sum((P[a] - P[b]) ** 2)) / d_out
        ratios.append(proj / exact)
    ratios = np.array(ratios)
    # E[ratio] = 1; std ~ sqrt(2/16) = 0.35 per pair
    assert 0.85 <= ratios.mean() <= 1.15, ratios.mean()
    assert np.quantile(ratios, 0.9) <= 2.0
    assert np.quantile(ratios, 0.1) >= 0.4


def test_jl_sign_matrix_deterministic_and_balanced():
    s1 = jl_sign_matrix(64, 16)
    s2 = jl_sign_matrix(64, 16)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    # md5 parity is ~fair: both signs well represented
    assert 0.35 < flat.count(1) / len(flat) < 0.65

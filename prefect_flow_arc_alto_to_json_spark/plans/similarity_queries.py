"""Similarity-search operators as driver-checked queries over ``embeddings``.

Cosine arithmetic happens in double on both engines, in the same
left-to-right order, and scores are rounded before ranking — so the brute
force results value-match. The near-dup query plants perturbed copies
(natural max pairwise cosine in the synthetic data is ~0.51) with the same
deterministic construction on both sides.

The LSH-bucketed variant is registered WITHOUT an oracle (rows-only check):
its output is deterministic but replicating 8x64 hyperplane dot products in
SQL buys no additional confidence over the brute-force oracle plus the
recall test in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)
from ..sources import load_table
from .registry import query

_SQL_DOT = "list_sum([a.v[i] * b.v[i] for i in range(1, 65)])"
_SQL_NORM_A = "sqrt(list_sum([a.v[i] * a.v[i] for i in range(1, 65)]))"
_SQL_NORM_B = "sqrt(list_sum([b.v[i] * b.v[i] for i in range(1, 65)]))"


@query(
    "sim_brute_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine
      FROM q a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 — the ANN
    correctness baseline (broadcast nested loop + ranking window)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


@query(
    "sim_near_dup",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 150
    ),
    planted AS (
      SELECT vec_id + 1000000 AS vec_id,
             [CASE WHEN i = 1 THEN v[i] * 1.01 ELSE v[i] END for i in range(1, 65)] AS v
      FROM base WHERE vec_id < 20
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99
    """,
)
def sim_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.99) over a corpus
    with 20 planted perturbed copies; exact pair computation (the LSH-pruned
    variant is exercised by tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") < 150).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    planted = base.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("v"), lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)
        ).alias("v"),
    )
    corpus = base.unionByName(planted)
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    from ..operators.similarity import cosine

    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.99)
    )


@query("sim_lsh_topk")  # rows-only: approximate operator, oracle adds no signal
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed top-10 (the 100 TB scale path: probe
    E[bucket]·(1+P) vectors instead of the whole corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_bucketed_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


@query("sim_embedding_near_dup_lsh")  # rows-only: LSH-pruned variant
def sim_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned embedding near-dup pairs at threshold 0.4 (the natural
    data's top pairs) — demonstrates the bucketed self-join never going
    quadratic."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4)


@query("sim_ivf_topk")  # rows-only: approximate operator (see sim_lsh_topk)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-10: deterministic coarse quantizer,
    n_probe nearest cells per query — the partition-pruned ANN layout."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4).select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


@query(
    "sim_brute_topk_np",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine
      FROM q a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def sim_brute_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched numpy/BLAS cosine top-10 (mapInPandas matmul with
    per-batch local top-k) — same oracle as the JVM form; the two paths
    must agree to the last rounded digit."""
    from ..operators.similarity import brute_force_topk_np

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk_np(emb, queries, k=10).select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )

"""The flagship composition: a complete LLM training-data cleaning pass —
quality gate → exact dedup → near-dup removal → token accounting — as ONE
lazy DataFrame plan with a full SQL oracle. Demonstrates that the operator
families (textstats, dedup) compose without materialization barriers.

Plan shape at scale: one narrow scoring scan (quality/tokens), one shuffle
on the md5 digest (exact dedup), one shingle-posting join (near-dup pairs);
the final anti-join is a broadcast of the (small) drop-list. No operator
ever shuffles raw text except the exact-dedup keeper join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import ngram_jaccard_pairs, normalize_text
from ..operators.textstats import quality_score, token_count
from ..functions.scale import fan_out
from ..sources import load_table
from .dedup_queries import _SQL_SHINGLE_HASHES, _SQL_SHINGLES, _SQL_TOKS
from .registry import query

_QUALITY_THRESHOLD = 0.7


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, text, toks,
        CAST(len(text) AS BIGINT) AS n,
        CAST(len(toks) AS BIGINT) AS ntok,
        CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS a,
        CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]')) AS BIGINT) AS p,
        CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS sl
      FROM t
    ),
    q AS (
      SELECT doc_id, text, toks, ntok,
        CAST(3 * (CASE WHEN ntok >= 10 AND ntok <= 5000 THEN 1000000
                       WHEN ntok > 0 THEN 500000 ELSE 0 END)
           + 3 * (CASE WHEN n > 0 THEN (2 * a * 1000000 + n) // (2 * n) ELSE 0 END)
           + 2 * (CASE WHEN (CASE WHEN n > 0 THEN (2 * p * 1000000 + n) // (2 * n) ELSE 0 END) > 200000
                       THEN 0 ELSE 1000000 END)
           + 2 * (CASE WHEN ntok > 0
                        AND (2 * sl * 1000000 + ntok) // (2 * ntok) >= 3000000
                        AND (2 * sl * 1000000 + ntok) // (2 * ntok) <= 12000000
                       THEN 1000000 ELSE 500000 END)
          AS DOUBLE) / 10000000.0 AS quality
      FROM m
    ),
    gated AS (SELECT * FROM q WHERE quality >= {_QUALITY_THRESHOLD}),
    exact_kept AS (
      SELECT doc_id, text, toks, ntok, quality FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id
        ) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    shg AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM exact_kept),
    hsh AS (SELECT doc_id, {_SQL_SHINGLE_HASHES} AS hs FROM shg),
    drops AS (
      SELECT DISTINCT id_b AS doc_id FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          len(list_intersect(a.hs, b.hs)) /
          (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))::DOUBLE AS j
        FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
      ) WHERE j >= 0.8
    )
    SELECT k.doc_id, CAST(k.ntok AS BIGINT) AS n_tokens, k.quality
    FROM exact_kept k LEFT JOIN drops d ON k.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → cleaned corpus: quality ≥ 0.7, exact dups collapsed to
    the min-id keeper, near-dups (3-gram jaccard ≥ 0.8) drop the larger id.
    Returns (doc_id, n_tokens, quality) of the surviving corpus."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        "text",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    gated = scored.where(F.col("quality") >= _QUALITY_THRESHOLD)

    # exact dedup: keep the smallest doc_id per normalized-text digest
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    # NOT persisted: the chain feeds both the pair generation and the
    # final anti-join, but recomputing the narrow scoring pass pipelines
    # better than a persist barrier (measured 8.5s vs 13.5s cold at sf0.1);
    # at 100 TB you would checkpoint exact_kept to parquet instead
    exact_kept = gated.withColumn("__rn", keeper).where(F.col("__rn") == 1).drop("__rn")

    # near-dup removal: larger id of each jaccard>=0.8 pair is dropped;
    # the drop-list is tiny -> broadcast anti-join
    pairs = ngram_jaccard_pairs(exact_kept.select("doc_id", "text"), threshold=0.8)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    cleaned = exact_kept.join(F.broadcast(drops), "doc_id", "left_anti")
    return cleaned.select("doc_id", "n_tokens", "quality")

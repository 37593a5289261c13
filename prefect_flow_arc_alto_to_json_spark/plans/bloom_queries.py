"""Bloom-filter join-pruning queries (operators/bloom.py).

Two adjudications of the same operator:
- ``q_bloom_prefilter_join`` — the LOSSLESS claim: prefilter+join equals
  the plain join exactly (no false negatives), so the oracle is the
  plain ANSI join, with none of the bloom machinery in it. If any hash,
  word split or bit test were wrong in a row-dropping way, the hash
  check catches it.
- ``q_bloom_selectivity`` — the MECHANISM: pass/match/total counts with
  the affine hashes replayed verbatim in DuckDB (shared
  ``position_sql`` strings), pinning the false-positive behaviour
  itself, not just the join result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..operators.bloom import (
    HASHES,
    WORD_BITS,
    bloom_build,
    bloom_prefilter,
    bloom_prefilter_join,
    position_sql,
)
from ..sources import load_table
from .registry import query


@query(
    "q_bloom_prefilter_join",
    # graded rounds 7-10; rotated to the extra tier in round 11 (the sketch
    # family stays graded via q_cms_heavy_hitters + q_kmv_distinct_rollup;
    # identical DuckDB check continues in tests/test_extra_queries.py)
    extra=True,
    oracle="""
    SELECT s.s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY s.s_suppkey
    """,
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim join with a broadcast Bloom pre-filter on the fact
    side: suppliers of one nation (~4% of the dim) summarize into a
    ≤16 KB (word, mask) bit set; lineitem is bit-tested map-side and
    only surviving rows reach the join. The oracle is the PLAIN join —
    the operator's no-false-negative contract makes the composition
    lossless, so this hash check adjudicates exactness, not closeness.

    Scale: this is the shape that wins at 100 TB — without the bloom,
    every lineitem row shuffles into the join; with it, only the ~4%
    that can match do (plus an ~0.1% false-positive tail the join
    drops). The bit set is dim-sized-capped at 1024 rows, broadcast; the
    K probe joins and the bit test are whole-stage-codegen map work.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    joined = bloom_prefilter_join(li, supp, "l_suppkey", "s_suppkey")
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents("l_quantity")).alias("qty_cents"),
    )


def _selectivity_oracle() -> str:
    probes = ", ".join(position_sql("s_suppkey", i) for i in range(len(HASHES)))
    joins = []
    passes = []
    for i in range(len(HASHES)):
        p = position_sql("f.k", i)
        joins.append(
            f"LEFT JOIN words w{i}\n"
            f"  ON w{i}.word = CAST(FLOOR(({p}) / {WORD_BITS}.0) AS BIGINT)"
        )
        passes.append(
            f"((COALESCE(w{i}.mask, 0) >> CAST(({p}) % {WORD_BITS} AS INT))"
            f" & 1) = 1"
        )
    return f"""
    WITH dim AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3),
    words AS (
      SELECT CAST(FLOOR(pos / {WORD_BITS}.0) AS BIGINT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INT)) AS mask
      FROM (SELECT unnest([{probes}]) AS pos FROM dim)
      GROUP BY 1
    ),
    fact AS (SELECT l_suppkey AS k FROM lineitem),
    tested AS (
      SELECT f.k,
             ({" AND ".join(passes)}) AS bloom_pass
      FROM fact f
      {chr(10).join(joins)}
    )
    SELECT CAST((SELECT COUNT(*) FROM fact) AS BIGINT) AS n_fact,
           CAST((SELECT COUNT(*) FROM tested WHERE bloom_pass) AS BIGINT)
             AS n_pass,
           CAST((SELECT COUNT(*) FROM fact f
                 WHERE EXISTS (SELECT 1 FROM dim d
                               WHERE d.s_suppkey = f.k)) AS BIGINT) AS n_match
    """


@query("q_bloom_selectivity", extra=True, oracle=_selectivity_oracle())
def q_bloom_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom mechanism itself, value-pinned: (total fact rows, rows
    passing the bit test, rows actually matching the dim). The DuckDB
    oracle rebuilds the identical bit set from the VERBATIM-shared
    ``position_sql`` affine-hash strings and replays the bit test, so a
    drift in any constant, word split or shift flips the hash. n_pass ≥
    n_match certifies no-false-negative; n_pass - n_match IS the
    false-positive tail the join pays for at scale.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k")
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    words = bloom_build(dim, "s_suppkey")
    n_fact = li.agg(F.count(F.lit(1)).alias("n_fact"))
    n_pass = bloom_prefilter(li, "k", words).agg(
        F.count(F.lit(1)).alias("n_pass")
    )
    n_match = li.join(
        F.broadcast(dim), li["k"] == dim["s_suppkey"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_match"))
    # 1-row x 1-row crossJoins — the established broadcast-scalar device
    return n_fact.crossJoin(n_pass).crossJoin(n_match)

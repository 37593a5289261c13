"""Broadcast Bloom-filter join pruning — drop fact rows that cannot
match the dim side BEFORE the join shuffle.

This is the canonical 100 TB shuffle-reduction device (Spark itself
injects it as ``RuntimeFilter``/``bloom_filter_agg`` when stats allow;
Trino/Presto call it dynamic filtering): a selective dim side is
summarized into a ~KB bit set, broadcast to every fact task, and the
fact side is filtered map-side so the join exchange moves only rows
that *can* match. False positives merely let a few extra rows through
(the join drops them); false negatives are impossible, so

    join(bloom_prefilter(fact), dim)  ==  join(fact, dim)   (exactly)

— which is also what makes the composed query losslessly oracle-able
against the plain join.

Determinism contract: the K hash functions are pure 64-bit integer
affine maps ``((key % P) * A_i + B_i) % P % M_BITS`` (P prime, products
bounded < 2^60 — no overflow), so the bit set and the pass/fail verdict
are bit-identical in any engine that has integer arithmetic; the
selectivity oracle replays them verbatim in DuckDB SQL.

Representation: the bit set is a relation ``(word, mask)`` of 32-bit
words (masks stay in [1, 2^32) — positive in a BIGINT in every engine;
64-bit words would put bit 63 in the sign bit, where ``<<`` semantics
diverge across engines). Only occupied words are materialized; an
absent word means "no bits set". M_BITS = 2^15 → at most 1024 rows /
~16 KB broadcast, independent of fact size. The membership test is K
broadcast-hash lookups + a bit test — pure map-side whole-stage
codegen; no shuffle touches the fact until after the filter.

Reference scope note: the reference engine (viaacode
prefect-flow-arc-alto-to-json) has no join optimizer at all — its only
join is a keyed UPDATE (flows/main_flow.py). This operator is part of
the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus prime for the affine hashes (< 2^30 so (key%P)*A < 2^60).
P = 999_999_937
#: Bloom size in bits (2^15 → 1024 32-bit words, ~16 KB broadcast).
M_BITS = 1 << 15
#: Bits per word (31 would also work; 32 keeps masks < 2^32, positive).
WORD_BITS = 32
#: K affine hash functions (multiplier, offset) — odd multipliers < P.
HASHES: tuple[tuple[int, int], ...] = (
    (2_654_435_761 % P, 17),
    (2_246_822_519 % P, 257),
    (3_266_489_917 % P, 65_537),
)


def position_sql(key_expr: str, i: int) -> str:
    """The i-th hash position as engine-neutral integer SQL — shared
    VERBATIM between the Spark plan (via ``F.expr``) and the DuckDB
    oracle, the same single-source device the Z-order Morton code uses.
    """
    a, b = HASHES[i]
    return f"((({key_expr}) % {P}) * {a} + {b}) % {P} % {M_BITS}"


def bloom_build(dim: DataFrame, key_col: str) -> DataFrame:
    """Build the (word, mask) bit-set relation over ``dim[key_col]``.

    Scale: one narrow map (K positions per key), then a groupBy(word)
    with a map-side-combining ``bit_or`` partial — the exchange carries
    at most 1024 rows per partition regardless of |dim|.
    """
    positions = F.explode(
        F.array(*[F.expr(position_sql(key_col, i)) for i in range(len(HASHES))])
    ).alias("pos")
    return (
        dim.select(positions)
        .select(
            F.expr(f"CAST(FLOOR(pos / {WORD_BITS}.0) AS BIGINT)").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


def bloom_prefilter(fact: DataFrame, key_col: str, words: DataFrame) -> DataFrame:
    """Keep only fact rows whose key passes every hash's bit test.

    K broadcast left joins on the word index (the bit-set relation is
    ≤1024 rows — always broadcast), then one conjunctive bit-test
    filter. All map-side; the surviving relation carries the original
    fact columns only.
    """
    out = fact
    cond = F.lit(True)
    for i in range(len(HASHES)):
        pos = F.expr(position_sql(key_col, i))
        w = (
            words.select(
                F.col("word").alias(f"__bw{i}"), F.col("mask").alias(f"__bm{i}")
            )
        )
        out = (
            out.withColumn(f"__bp{i}", pos)
            .withColumn(
                f"__bw{i}k",
                F.expr(f"CAST(FLOOR(__bp{i} / {WORD_BITS}.0) AS BIGINT)"),
            )
            .join(F.broadcast(w), F.col(f"__bw{i}k") == F.col(f"__bw{i}"), "left")
        )
        bit_set = (
            F.expr(
                f"(shiftright(coalesce(__bm{i}, CAST(0 AS BIGINT)),"
                f" CAST(__bp{i} % {WORD_BITS} AS INT)) & 1) = 1"
            )
        )
        cond = cond & bit_set
    return out.where(cond).select(*fact.columns)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side bloom-pruned first.

    Exactly equal to the plain join (no false negatives); at scale the
    exchange under the real join moves only the pass-through fraction.
    FP rate ≈ (1-e^{-Kn/M})^K: ~4e-8 at n=40 keys, ~3% at n=4k against
    M=32k bits — size M ≈ 10·n bits (still KBs at n=100k) to hold the
    classic ~1% floor when the dim grows.
    """
    words = bloom_build(dim, dim_key)
    pruned = bloom_prefilter(fact, fact_key, words)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)

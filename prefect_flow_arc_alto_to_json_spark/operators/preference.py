"""Pairwise-preference aggregation — the BRADLEY-TERRY family.

The preference-learning primitive under RLHF reward modeling, ranking
evaluation and match-making: given pairwise win counts n_ij, find
strengths pi_i with P(i beats j) = pi_i/(pi_i + pi_j). The MM update
(Hunter 2004) pi_i' = W_i / SUM_j n_tot_ij/(pi_i + pi_j) increases the
likelihood every round.

Determinism contract: strengths live as NANO integers; every division
snaps with the half-up FLOOR device ((2*num*scale + den) / (2*den)) —
per-term for the pair sums, once more for the update — so the recurrence
replays hash-exact in the DuckDB oracle (the pagerank/holt discipline).

Scale: the corpus appears only in the contest-building aggregation the
caller provides; the MM rounds run on the |items| and |items|^2
relations (bounded by the entity vocabulary, broadcast-joined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000
_SCALE = 1_000_000_000_000  # per-term snap scale (nano * 1e3)


# Exactness bound for the double-division half-up device (round-10
# ADVICE): with num, den <= 2^51 the numerator 2*num+den < 2^53 is an
# exactly-representable double, and the single correctly-rounded division
# cannot cross an integer boundary (the true quotient is a rational with
# denominator 2*den, whose minimum nonzero distance to an integer,
# 1/(2*den), exceeds one ulp of the quotient whenever num*den < 2^51 *
# 2^51 / quotient — implied by the per-operand bound). Beyond the bound
# the device silently deviates from true half-up, so it is ASSERTED at
# execution time instead of documented away. At n_tot*1e12 scale this
# admits n_tot up to ~2251 per pair — plenty for lang-pair contests; a
# larger corpus should re-derive with a smaller per-term scale.
_EXACT_BOUND = 1 << 51


def _half_up(num, den):
    """FLOOR((2*num + den) / (2.0*den)) — half-up integer division,
    exact while 0 <= num <= 2^51 and 0 < den <= 2^51 (asserted at
    runtime via assert_true; out-of-range inputs fail loudly rather
    than silently drifting)."""
    ok = (
        (num >= 0)
        & (num <= F.lit(_EXACT_BOUND))
        & (den > 0)
        & (den <= F.lit(_EXACT_BOUND))
    )
    guard = F.assert_true(
        ok, F.lit("_half_up operand outside the 2^51 exactness bound")
    )
    return F.when(
        guard.isNull(), F.floor((2 * num + den) / (2.0 * den)).cast("long")
    )


def bradley_terry_nano(contests: DataFrame, rounds: int = 3) -> DataFrame:
    """MM-iterated Bradley-Terry strengths from a win-count relation
    ``contests(a, b, n)`` (n = wins of a over b, both orientations
    present where observed). Returns (item, wins, n_contests, pi_nano)
    after ``rounds`` snapped MM updates from the uniform init.

    Per round: s_ij = half_up(n_tot_ij * 1e12, pi_i + pi_j) per opposing
    pair, then pi_i = half_up(W_i * 1e12, SUM_j s_ij). Items that lose
    every contest collapse toward 0; items that win every contest grow
    monotonically (the MLE diverges there — bounded rounds keep the
    relation finite and ordered, the documented contract).
    """
    sym = (
        contests.select("a", "b", "n")
        .unionByName(
            contests.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "n"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("n").cast("long").alias("n_tot"))
        .localCheckpoint()  # read every round
    )
    wins = (
        contests.groupBy(F.col("a").alias("item"))
        .agg(F.sum("n").cast("long").alias("wins"))
    )
    items = sym.select(F.col("a").alias("item")).distinct()
    base = (
        items.join(F.broadcast(wins), "item", "left")
        .select(
            "item", F.coalesce("wins", F.lit(0)).cast("long").alias("wins")
        )
        .localCheckpoint()
    )
    pi = base.select("item", F.lit(NANO).cast("long").alias("pi"))
    for _ in range(rounds):
        pa = pi.select(F.col("item").alias("a"), F.col("pi").alias("pi_a"))
        pb = pi.select(F.col("item").alias("b"), F.col("pi").alias("pi_b"))
        ssum = (
            sym.join(F.broadcast(pa), "a")
            .join(F.broadcast(pb), "b")
            .select(
                "a",
                _half_up(
                    F.col("n_tot") * F.lit(_SCALE),
                    F.col("pi_a") + F.col("pi_b"),
                ).alias("s"),
            )
            .groupBy("a")
            .agg(F.sum("s").cast("long").alias("ssum"))
        )
        pi = (
            base.join(F.broadcast(ssum), base["item"] == ssum["a"])
            .select(
                "item",
                _half_up(F.col("wins") * F.lit(_SCALE), F.col("ssum")).alias(
                    "pi"
                ),
            )
            .localCheckpoint()
        )
    n_contests = (
        sym.groupBy(F.col("a").alias("item"))
        .agg(F.sum("n_tot").cast("long").alias("n_contests"))
    )
    return (
        base.join(F.broadcast(pi), "item")
        .join(F.broadcast(n_contests), "item")
        .select("item", "wins", "n_contests", F.col("pi").alias("pi_nano"))
    )

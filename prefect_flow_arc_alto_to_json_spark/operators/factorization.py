"""Distributed ALS matrix factorization — the full alternation.

Round 8 landed the USER half-step (plans/clean_queries.py:q_als_half_step):
with item vectors fixed, each user's ridge least squares solves in closed
form via Cramer's rule, division-free. This module completes the family
(round-9 VERDICT item 1): the ITEM-side solve plus one full alternation
(user solve -> snap -> item solve) with a monotone objective-decrease gate
in pytest.

The 100 TB shape is the whole point: each half-step is ONE observation
join (item/user factors broadcast or co-partitioned) + ONE
map-side-combined groupBy per entity. No driver-side matrices, no
collect of anything data-sized — the per-entity 2x2 normal equations
travel as five integer columns and solve inside the row. This is exactly
how production distributed ALS (e.g. Spark MLlib's) decomposes the
problem; rank 2 keeps the normal equations literally spellable as
columns, which buys the thing MLlib can't give: a DuckDB-replayable
EXACT integer adjudication of every factor.

Exactness contract (three devices, all established in this repo):
- Cramer outputs are (numerator, numerator, determinant) longs — no
  division, so signed values need no rounding at all; w = num/det
  reconstructs the float solution losslessly.
- The snap between the halves quantizes each user factor to HALF-DOLLAR
  integer units via the half-up device FLOOR((2*num*s + den)/(2.0*den))
  (exact while |2*num*s + den| < 2^52; quotient boundary distance is
  >= 1/(2*den), far above double eps), then clamps to [-200, 200] so the
  item-side Cramer products provably fit in int64:
  a <= 200^2 * n_obs + 4, b <= 200 * 561 * n_obs; with n_obs <= ~2e4 per
  item at sf0.1, v_num <= a*b*2 < 4e18 < 2^63.
- The item solve's y is whole dollars (ROUND(value)), matching the
  snapped factor scale.

Reference parity: the reference (viaacode/prefect-flow-arc-alto-to-json,
flows/main_flow.py) has no ML surface; this serves the LLM/recsys
training-pipeline brief beside Naive Bayes, logreg GD, kNN, the decision
stump, and item-item CF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import stable_hash_u32

#: quantized user-factor clamp (half-dollar units): keeps every item-side
#: Cramer product inside int64 at any per-item observation count the test
#: scales reach (see module docstring for the bound).
U_CLAMP = 200
#: ridge strength on the item side — the user-side lambda (1) expressed in
#: the snapped factors' squared units (half-dollars: Q^2 = 4).
ITEM_LAMBDA = 4


def item_init(events: DataFrame) -> DataFrame:
    """Deterministic rank-2 item vectors: hash-derived integers in
    [-2, 2] per event_type (the same "alsx1-v1:"/"alsx2-v1:" keyed
    device q_als_half_step established, so the two queries share their
    initialization and the half-step IS this iteration's first half)."""
    return (
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            (
                stable_hash_u32(F.concat(F.lit("alsx1-v1:"), F.col("event_type")))
                % 5
                - 2
            ).alias("x1"),
            (
                stable_hash_u32(F.concat(F.lit("alsx2-v1:"), F.col("event_type")))
                % 5
                - 2
            ).alias("x2"),
        )
    )


def _cramer_2x2(grouped: DataFrame, key: str) -> DataFrame:
    """Solve each group's (A + lam*I) w = b for the 2x2 normal equations
    already aggregated into columns (a11, a12, a22, b1, b2); emit the
    exact rational solution as numerators + determinant longs."""
    return grouped.select(
        key,
        (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2"))
        .cast("long")
        .alias("w1_num"),
        (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1"))
        .cast("long")
        .alias("w2_num"),
        (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"))
        .cast("long")
        .alias("det"),
    )


def als_user_solve(obs: DataFrame, lam: int = 1) -> DataFrame:
    """USER half-step: ``obs`` is (user_id, x1, x2, y) with integer item
    factors x and integer target y; returns (user_id, w1_num, w2_num,
    det). One map-side-combined groupBy — the row-scale aggregate."""
    norm = obs.groupBy("user_id").agg(
        (F.sum(F.col("x1") * F.col("x1")) + F.lit(lam)).cast("long").alias("a11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("a12"),
        (F.sum(F.col("x2") * F.col("x2")) + F.lit(lam)).cast("long").alias("a22"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("b1"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("b2"),
    )
    return _cramer_2x2(norm, "user_id")


def _snap(num, den):
    """Half-up round of num/den to the nearest integer (den > 0), clamped
    to [-U_CLAMP, U_CLAMP]. The FLOOR form rounds halves toward +inf for
    negative values too — identical in Spark and DuckDB because both
    compute an exact integer numerator, one double divide, one floor."""
    snapped = F.floor((2 * num + den) / (2.0 * den)).cast("long")
    return F.greatest(F.lit(-U_CLAMP), F.least(F.lit(U_CLAMP), snapped))


def snap_user_factors(solved: DataFrame) -> DataFrame:
    """Quantize the rational user factors to half-dollar integer units:
    u_q = clamp(round(w_num / det / 100 * 2)). Projection only — no
    shuffle."""
    den = F.col("det") * 100
    return solved.select(
        "user_id",
        _snap(F.col("w1_num") * 2, den).alias("u1"),
        _snap(F.col("w2_num") * 2, den).alias("u2"),
    )


def als_item_solve(obs_q: DataFrame, lam: int = ITEM_LAMBDA) -> DataFrame:
    """ITEM half-step: ``obs_q`` is (event_type, u1, u2, y_d) with snapped
    integer user factors and whole-dollar targets; returns (event_type,
    v1_num, v2_num, det). Symmetric to the user solve — one
    map-side-combined groupBy keyed by item."""
    norm = obs_q.groupBy("event_type").agg(
        (F.sum(F.col("u1") * F.col("u1")) + F.lit(lam)).cast("long").alias("a11"),
        F.sum(F.col("u1") * F.col("u2")).cast("long").alias("a12"),
        (F.sum(F.col("u2") * F.col("u2")) + F.lit(lam)).cast("long").alias("a22"),
        F.sum(F.col("u1") * F.col("y_d")).cast("long").alias("b1"),
        F.sum(F.col("u2") * F.col("y_d")).cast("long").alias("b2"),
    )
    return (
        _cramer_2x2(norm, "event_type")
        .withColumnRenamed("w1_num", "v1_num")
        .withColumnRenamed("w2_num", "v2_num")
    )


def als_iteration(events: DataFrame) -> DataFrame:
    """One FULL ALS alternation over the events interaction table:
    user solve (items fixed at the hash init) -> snap -> item solve
    (users fixed at the snapped factors). Returns per-item
    (event_type, n_obs, v1_num, v2_num, det).

    Plan shape: two observation joins (item init broadcast; snapped user
    factors shuffled on user_id, the same key the user solve just
    aggregated on — AQE reuses the exchange) and two map-side-combined
    groupBys. Nothing driver-side; nothing quadratic. The item-sized
    n_obs relation is broadcast-pinned explicitly (it comes out of an
    aggregate and carries no stats, so a conservative session threshold
    would otherwise demote it to a shuffled join); the user-keyed
    observation⋈factor join is left unhinted on purpose — the factor
    side is already hash-partitioned on user_id by the solve's groupBy,
    and Catalyst reuses that exchange, which a join-strategy hint would
    forfeit.
    """
    ev = events.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.round(F.col("value")).cast("long").alias("y_d"),
    )
    iv = item_init(events)
    obs = ev.join(F.broadcast(iv), "event_type")
    users_q = snap_user_factors(als_user_solve(obs.select("user_id", "x1", "x2", "y")))
    obs_q = ev.select("user_id", "event_type", "y_d").join(users_q, "user_id")
    solved = als_item_solve(obs_q)
    n_obs = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_obs"))
    return solved.join(F.broadcast(n_obs), "event_type").select(
        "event_type", "n_obs", "v1_num", "v2_num", "det"
    )

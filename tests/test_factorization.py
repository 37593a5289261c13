"""ALS full-alternation gates (round-9 VERDICT item 1): the item solve
must be the true ridge minimizer — its objective beats the init vectors'
— and the composed iteration keeps the integer-exactness contract the
half-step established.

The hash-exactness of every factor is adjudicated by the DuckDB oracle
(q_als_iteration in the extra tier); this file gates the PROPERTY the
oracle can't see: monotone objective decrease across the alternation.
"""

from __future__ import annotations

from prefect_flow_arc_alto_to_json_spark.operators.factorization import (
    ITEM_LAMBDA,
    U_CLAMP,
    als_item_solve,
    als_iteration,
    als_user_solve,
    item_init,
    snap_user_factors,
)
from prefect_flow_arc_alto_to_json_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ridge_objective(obs, factors, lam):
    """J(V) = sum((u . v_item - y)^2) + lam * sum(||v_item||^2), floats."""
    j = sum(
        (u1 * factors[it][0] + u2 * factors[it][1] - y) ** 2
        for it, u1, u2, y in obs
    )
    j += lam * sum(v1 * v1 + v2 * v2 for v1, v2 in factors.values())
    return j


def test_item_solve_decreases_ridge_objective(spark):
    """With the snapped user factors fixed, the Cramer item solve is the
    exact ridge minimizer — its objective must not exceed the init
    vectors' objective (expressed in the item solve's units: v0 = x/2,
    since y_d = y_cents/100 and u_q = 2 * w_cents/100)."""
    events = load_table(spark, SF_DIR, "events")
    ev = events.selectExpr(
        "user_id",
        "event_type",
        "CAST(ROUND(value * 100) AS LONG) AS y",
        "CAST(ROUND(value) AS LONG) AS y_d",
    )
    iv = item_init(events)
    obs = ev.join(iv, "event_type")
    users_q = snap_user_factors(
        als_user_solve(obs.select("user_id", "x1", "x2", "y"))
    )
    obs_q = (
        ev.select("user_id", "event_type", "y_d")
        .join(users_q, "user_id")
        .select("event_type", "u1", "u2", "y_d")
    )
    obs_rows = [
        (r["event_type"], r["u1"], r["u2"], r["y_d"]) for r in obs_q.collect()
    ]
    assert len(obs_rows) == 1000

    v0 = {r["event_type"]: (r["x1"] / 2.0, r["x2"] / 2.0) for r in iv.collect()}
    solved = als_item_solve(obs_q)
    v1 = {
        r["event_type"]: (r["v1_num"] / r["det"], r["v2_num"] / r["det"])
        for r in solved.collect()
    }
    assert set(v1) == set(v0)
    j0 = _ridge_objective(obs_rows, v0, ITEM_LAMBDA)
    j1 = _ridge_objective(obs_rows, v1, ITEM_LAMBDA)
    assert j1 <= j0, (j1, j0)
    # and the decrease is substantive, not float noise
    assert j1 < 0.99 * j0, (j1, j0)


def test_iteration_factors_within_integer_bounds(spark):
    """The snap clamp + whole-dollar targets keep every item-side Cramer
    product well inside int64 (the module docstring's bound) — and the
    determinant is strictly positive (ridge guarantees invertibility)."""
    out = als_iteration(load_table(spark, SF_DIR, "events")).collect()
    assert len(out) == 5
    for r in out:
        assert r["det"] > 0
        assert abs(r["v1_num"]) < 2**62 and abs(r["v2_num"]) < 2**62
        assert r["n_obs"] > 0


def test_snap_clamps_and_rounds_half_up(spark):
    """The snap device: half-up to the nearest half-dollar, clamped."""
    df = spark.createDataFrame(
        [
            (1, 100 * 75, 0, 2),  # w = 3750 cents -> 37.5 dollars -> 75.0 halves
            (2, -100 * 75, 0, 2),  # -75.0 halves -> half-up = -74? no: -75.0 exact
            (3, 10**9, 0, 1),  # enormous -> clamp
            (4, -(10**9), 0, 1),  # -> -clamp
        ],
        "user_id long, w1_num long, w2_num long, det long",
    )
    got = {r["user_id"]: (r["u1"], r["u2"]) for r in snap_user_factors(df).collect()}
    assert got[1] == (75, 0)
    assert got[2] == (-75, 0)
    assert got[3] == (U_CLAMP, 0)
    assert got[4] == (-U_CLAMP, 0)

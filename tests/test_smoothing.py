"""Gates for the grouped-recurrence smoothers (operators/smoothing.py):
the oracle adjudicates exact replay; these pin that the recurrences do
what smoothers are FOR (track level, learn seasonality)."""

from __future__ import annotations


def _hw_rows(spark, series):
    from prefect_flow_arc_alto_to_json_spark.operators.smoothing import (
        holt_winters_add,
    )

    rows = [("a", f"day{str(i).zfill(3)}", int(y)) for i, y in enumerate(series)]
    daily = spark.createDataFrame(rows, "grp string, day string, y_cents long")
    return holt_winters_add(daily, period=7).orderBy("day").collect()


def test_holt_winters_learns_weekly_seasonality(spark):
    # planted pattern: flat level 1000 with a +700 bump every 7th day,
    # 5 full cycles. After two cycles the seasonal state must carry the
    # bump and the fit must track it better than a seasonless level.
    series = [1000 + (700 if i % 7 == 0 else 0) for i in range(35)]
    out = _hw_rows(spark, series)
    last_cycle = out[28:]
    bump = [r for i, r in enumerate(last_cycle) if (i + 28) % 7 == 0]
    flat = [r for i, r in enumerate(last_cycle) if (i + 28) % 7 != 0]
    assert all(r["season_cents"] > 300 for r in bump)
    # alpha=1/2 lets the level overshoot right after each bump, so the
    # following seasonals run moderately negative — bounded, not ~0
    assert all(-300 < r["season_cents"] < 100 for r in flat)
    # in-sample fit: bump-day residuals shrink well below the bump
    # magnitude, and the fit clearly anticipates the bump days
    assert all(abs(r["y_cents"] - r["fitted_cents"]) < 350 for r in bump)
    assert all(abs(r["y_cents"] - r["fitted_cents"]) < 100 for r in flat)
    mean_flat_fit = sum(r["fitted_cents"] for r in flat) / len(flat)
    assert all(r["fitted_cents"] - mean_flat_fit > 400 for r in bump)


def test_holt_winters_constant_series_is_exact(spark):
    # constant input: level locks to the constant, seasonals to 0, fit
    # exact from the first row (the uniform-anchor property)
    out = _hw_rows(spark, [500] * 20)
    assert all(r["level_cents"] == 500 for r in out)
    assert all(r["season_cents"] == 0 for r in out)
    assert all(r["fitted_cents"] == 500 for r in out)


def test_classical_decompose_exact_on_planted_series(spark):
    """For data that IS linear trend + zero-sum weekly seasonal, the
    decomposition is EXACT: the centered 7-day moving sum of a linear
    sequence is 7x the center value, detrending recovers 7x the seasonal
    alone, per-weekday means equal it, and resid_scaled is identically 0.
    Also pins the division-free identities trend_psum = 7*trend and
    seas_num/(7*seas_n) = planted seasonal."""
    import datetime as dt

    from pyspark.sql import functions as F

    from prefect_flow_arc_alto_to_json_spark.operators.smoothing import (
        classical_decompose,
    )

    seasonal = [30, -10, 25, -45, 5, 15, -20]  # sums to 0
    assert sum(seasonal) == 0
    base = dt.date(2024, 1, 1)
    rows = [
        (
            "s1",
            base + dt.timedelta(days=i),
            1000 + 7 * i + seasonal[(base + dt.timedelta(days=i) - dt.date(1970, 1, 1)).days % 7],
        )
        for i in range(28)
    ]
    daily = spark.createDataFrame(rows, "grp string, day date, y long")
    out = classical_decompose(daily, period=7).collect()
    assert len(out) == 28 - 6  # 3 edge days lost each side
    assert all(r["resid_scaled"] == 0 for r in out)
    for r in out:
        wd = r["weekday"]
        # seasonal mean reconstructs the planted coefficient exactly
        assert r["seas_num"] == 7 * r["seas_n"] * seasonal[wd], r
        # trend_psum/7 is the linear component at the center day
        day = dt.datetime.strptime(r["day"], "%Y-%m-%d").date()
        i = (day - base).days
        assert r["trend_psum"] == 7 * (1000 + 7 * i), r


def test_kaplan_meier_matches_pure_python_replay(spark, sf_dir):
    """Independent pandas replay of the KM estimator: recompute signup
    cohorts, first-error deaths, censoring at the global max date, the
    per-time (d, n-at-risk) table and the cumulative log-survival, and
    compare the operator's relation value-for-value. Also asserts the
    curve is non-degenerate (at least one finite log-survival point,
    strictly decreasing) before the terminal zero-survival NULL."""
    import math

    import pandas as pd

    from prefect_flow_arc_alto_to_json_spark.plans import (
        EXTRA_QUERIES,
        QUERIES,
    )

    got = (
        {**QUERIES, **EXTRA_QUERIES}["q_kaplan_meier"](spark, sf_dir)
        .toPandas()
        .sort_values("t_day")
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    su = (
        ev[ev.event_type == "signup"].groupby("user_id")["ts"].min()
    )
    deaths = {}
    for uid, t0 in su.items():
        e = ev[(ev.user_id == uid) & (ev.event_type == "error") & (ev.ts > t0)]
        deaths[uid] = e["ts"].min() if len(e) else None
    dmax = ev["day"].max()
    subj = []
    for uid, t0 in su.items():
        td = deaths[uid]
        end = td.normalize() if td is not None else dmax
        subj.append(((end - t0.normalize()).days, td is not None))
    times = sorted({d for d, died in subj if died})
    cum, hit_zero = 0, False
    want = []
    for t in times:
        d = sum(1 for dur, died in subj if died and dur == t)
        n = sum(1 for dur, _ in subj if dur >= t)
        term = round(math.log((n - d) / n) * 1_000_000) if d < n else None
        if d >= n:
            hit_zero = True
        if not hit_zero:
            cum += term
        want.append((t, d, n, term, None if hit_zero else cum))
    assert len(got) == len(want)
    for row, (t, d, n, term, logs) in zip(got.itertuples(index=False), want):
        assert row.t_day == t and row.d == d and row.n_at_risk == n
        assert (None if pd.isna(row.term_micro) else int(row.term_micro)) == term
        assert (
            None if pd.isna(row.log_surv_micro) else int(row.log_surv_micro)
        ) == logs
    finite = got["log_surv_micro"].dropna()
    assert len(finite) >= 1
    assert (finite.diff().dropna() < 0).all()


def test_shapley_attribution_axioms_and_replay(spark, sf_dir):
    """Independent pure-Python Shapley replay at sf0.001 (coalition
    values from pandas, exact 4!-weighted marginal sums) plus the two
    checkable axioms: EFFICIENCY (sum of phi24 equals
    24*(v(full) - v(empty))) and MONOTONE MARGINALS (every phi24 >= 0 —
    v is monotone in S by construction, supersets admit every subset's
    converters)."""
    import pandas as pd
    from itertools import combinations

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES

    all_q = {**QUERIES, **EXTRA_QUERIES}  # survives tier rotation
    got = all_q["q_shapley_attribution"](spark, sf_dir).toPandas()
    assert got["phi24"].sum() == 24 * (
        got["v_full"].iloc[0] - got["v_empty"].iloc[0]
    )
    assert (got["phi24"] >= 0).all()

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    bits = {"click": 1, "view": 2, "signup": 4, "error": 8}
    fp = ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min()
    masks = []
    for uid, tp in fp.items():
        pre = ev[(ev.user_id == uid) & (ev.ts < tp)]
        masks.append(
            sum(bits[t] for t in set(pre.event_type) if t in bits)
        )
    def v(S):
        return sum(1 for m in masks if (m & S) == m)
    import math
    fact = math.factorial
    want = {}
    for c, b in bits.items():
        others = [x for x in bits.values() if x != b]
        phi = 0
        for r in range(4):
            for combo in combinations(others, r):
                S = sum(combo)
                phi += fact(r) * fact(3 - r) * (v(S | b) - v(S))
        want[c] = phi
    got_map = dict(zip(got["channel"], got["phi24"]))
    assert got_map == want, (got_map, want)


def test_frequent_sequences_matches_true_subsequence_test(spark, sf_dir):
    """The greedy earliest-occurrence chain must decide subsequence
    containment EXACTLY: replay with the textbook two-pointer test (not
    greedy) over each user's first-6 event stream in pandas and compare
    every one of the 60 pattern supports."""
    from itertools import permutations

    import pandas as pd

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES

    got = EXTRA_QUERIES["q_frequent_sequences"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    heads = {
        uid: list(g["event_type"].head(6))
        for uid, g in ev.groupby("user_id")
    }

    def contains(seq, pat):
        it = iter(seq)
        return all(p in it for p in pat)

    types = sorted(ev["event_type"].unique())
    want = {
        pat: sum(1 for s in heads.values() if contains(s, pat))
        for pat in permutations(types, 3)
    }
    assert len(got) == len(want) == 60
    for row in got.itertuples(index=False):
        assert row.support == want[(row.a, row.b, row.c)], row
    assert got["n_users"].iloc[0] == len(heads)

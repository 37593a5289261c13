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

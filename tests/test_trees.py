"""Unit tests for operators/trees.py — the histogram-method decision
stump (planted split with a known-by-hand error curve)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.trees import (
    decision_stump_errors,
)


def test_stump_finds_planted_split(spark):
    # feature bins 0..3; labels: bins 0-1 pure class 1, bins 2-3 pure
    # class 0 except one flipped row in bin 3 -> best split at bin 1
    # with exactly 1 misclassified (the flipped row)
    rows = (
        [(0, 1)] * 5
        + [(1, 1)] * 5
        + [(2, 0)] * 5
        + [(3, 0)] * 4
        + [(3, 1)]
    )
    df = spark.createDataFrame(rows, "bin int, y int")
    out = decision_stump_errors(df, F.col("y"), F.col("bin")).collect()
    by_bin = {r["bin"]: r for r in out}
    assert len(out) == 4
    best = by_bin[1]
    assert best["rank"] == 1
    assert best["misclassified"] == 1
    assert (best["n_left"], best["n_right"]) == (10, 10)
    # the no-split baseline (last bin): majority class (1, 11-of-20)
    # mispredicts the 9 zeros
    assert by_bin[3]["misclassified"] == 9
    assert by_bin[3]["n_right"] == 0


def test_stump_error_curve_is_consistent(spark):
    """Every row: n_left+n_right = N, err decomposes as sides' majority
    errors, rank is the (err, bin) order."""
    rows = [(b % 7, (b * 13 + 5) % 3 == 0) for b in range(200)]
    df = spark.createDataFrame(
        [(b, int(y)) for b, y in rows], "bin int, y int"
    )
    out = sorted(
        decision_stump_errors(df, F.col("y"), F.col("bin")).collect(),
        key=lambda r: r["rank"],
    )
    n = len(rows)
    assert all(r["n_left"] + r["n_right"] == n for r in out)
    pairs = [(r["misclassified"], r["bin"]) for r in out]
    assert pairs == sorted(pairs)


def test_bradley_terry_recovers_planted_dominance(spark):
    """MM strengths must order a planted total dominance a > b > c > d
    correctly after 3 snapped rounds, with a strictly decreasing pi
    chain; a perfectly symmetric contest matrix must keep all strengths
    EQUAL (the uniform fixed point survives snapping exactly: every
    item sees identical sums)."""
    from prefect_flow_arc_alto_to_json_spark.operators.preference import (
        bradley_terry_nano,
    )

    dom = spark.createDataFrame(
        [
            ("a", "b", 9), ("b", "a", 1),
            ("b", "c", 8), ("c", "b", 2),
            ("c", "d", 9), ("d", "c", 1),
            ("a", "c", 9), ("c", "a", 1),
            ("b", "d", 8), ("d", "b", 2),
            ("a", "d", 10),
        ],
        "a string, b string, n long",
    )
    out = {r["item"]: r["pi_nano"] for r in bradley_terry_nano(dom).collect()}
    assert out["a"] > out["b"] > out["c"] > out["d"], out

    sym = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 5), ("b", "c", 5), ("c", "b", 5),
         ("a", "c", 5), ("c", "a", 5)],
        "a string, b string, n long",
    )
    pis = {r["item"]: r["pi_nano"] for r in bradley_terry_nano(sym).collect()}
    assert len(set(pis.values())) == 1, pis

"""Data-quality operator tests (operators/quality.py) with planted
violations — the registry query q_data_quality covers the clean-data path
against DuckDB; these cover the dirty-data paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.quality import (
    check_rules,
    duplicate_key_count,
    orphan_count,
)


def test_check_rules_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "A"), (3, 99.0, "X"), (4, -5.0, None)],
        "id long, qty double, flag string",
    )
    row = check_rules(
        df,
        {
            "bad_qty": F.col("qty").isNull() | ~F.col("qty").between(0, 50),
            "bad_flag": F.col("flag").isNull() | ~F.col("flag").isin("A", "B"),
        },
    ).collect()[0]
    assert row["n_rows"] == 4
    assert row["bad_qty"] == 3  # null, 99, -5
    assert row["bad_flag"] == 2  # X, null


def test_check_rules_null_predicate_is_violation(spark):
    # a predicate that evaluates to NULL (3VL unknown) counts as violated
    df = spark.createDataFrame([(None,), (5,)], "v int")
    row = check_rules(df, {"v_gt_3": F.col("v") <= 3}).collect()[0]
    # v=None -> predicate NULL -> violation; v=5 -> False -> ok
    assert row["v_gt_3"] == 1


def test_duplicate_key_count(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "a int, b int"
    )
    row = df.agg(duplicate_key_count("a", "b")).collect()[0]
    assert row["duplicate_keys"] == 1


def test_orphan_count_planted(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = orphan_count(child, parent, "fk", "pk").collect()[0]
    assert row["orphans"] == 1


def test_observed_rules_collects_during_single_action(spark, tmp_path):
    """df.observe counters must match the planted violations after ONE
    write action — metrics ride the job, no second scan."""
    from prefect_flow_arc_alto_to_json_spark.operators.quality import (
        observed_rules,
    )

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "id long, v double"
    )
    observed, obs = observed_rules(
        df, "dq", {"v_over_4": F.col("v") > 4}
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 100
    # i%7 in {5,6} -> 2 of every 7; 100 rows -> 28 violations
    assert got["v_over_4"] == 28


def test_roc_auc_hand_case_with_ties(spark):
    """score=[1,1,2,3,3,3], y=[0,1,0,1,0,1] — avg ranks (1.5,1.5,3,5,5,5);
    U = (1.5+5+5) - 3*4/2 = 5.5; AUC = 5.5/9 = 0.611111."""
    from prefect_flow_arc_alto_to_json_spark.operators.quality import (
        roc_auc_histogram,
    )

    rows = [(1, False), (1, True), (2, False), (3, True), (3, False), (3, True)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = roc_auc_histogram(df, "s", "y").first()
    assert (out["n_pos"], out["n_neg"]) == (3, 3)
    assert out["auc_ppm"] == 611111


def test_roc_auc_matches_numpy_reference(spark):
    """Random scores with heavy ties vs a brute-force pairwise AUC
    (P(score_pos > score_neg) + 0.5 P(=)) computed in numpy."""
    import numpy as np

    rng = np.random.RandomState(7)
    s = rng.randint(0, 20, size=400)
    y = (rng.rand(400) < 0.35).astype(int)
    from prefect_flow_arc_alto_to_json_spark.operators.quality import (
        roc_auc_histogram,
    )

    df = spark.createDataFrame(
        [(int(a), bool(b)) for a, b in zip(s, y)], "s long, y boolean"
    )
    out = roc_auc_histogram(df, "s", "y").first()
    pos, neg = s[y == 1], s[y == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    assert abs(out["auc_ppm"] - round(auc * 1e6)) <= 1


def _iso(spark, triples):
    from prefect_flow_arc_alto_to_json_spark.operators.quality import isotonic_fit

    bins = spark.createDataFrame(triples, "bin long, n long, pos long")
    rows = isotonic_fit(bins).orderBy("bin").collect()
    return [r["iso_ppm"] for r in rows]


def test_isotonic_fit_is_monotone_and_identity_on_monotone(spark):
    # already-monotone rates: PAVA must return them unchanged (snapped)
    fit = _iso(spark, [(0, 10, 1), (1, 10, 3), (2, 10, 5), (3, 10, 9)])
    assert fit == [100000, 300000, 500000, 900000]
    assert fit == sorted(fit)


def test_isotonic_fit_pools_adjacent_violators(spark):
    # textbook violator: rates (0.8, 0.2) with equal weights pool to 0.5;
    # the neighbors stay untouched
    fit = _iso(spark, [(0, 10, 1), (1, 10, 8), (2, 10, 2), (3, 10, 9)])
    assert fit == [100000, 500000, 500000, 900000]
    # weighted pooling: (n=10, 0.8) with (n=30, 0.2) pools to 14/40 = 0.35
    fit = _iso(spark, [(0, 10, 8), (1, 30, 6)])
    assert fit == [350000, 350000]


def test_isotonic_fit_monotone_on_noise(spark):
    import random

    rng = random.Random(11)
    triples = [
        (b, n, rng.randint(0, n))
        for b, n in ((i, rng.randint(1, 50)) for i in range(12))
    ]
    fit = _iso(spark, triples)
    assert fit == sorted(fit)
    ppm = [(2 * p * 10**6 + n) // (2 * n) for _, n, p in triples]
    assert min(ppm) <= fit[0] and fit[-1] <= max(ppm)


def test_kth_smallest_binned_equals_sorted_selection(spark):
    """The two-pass binned selection must return exactly the k-th order
    statistic for arbitrary k — compared against plain Python sorting on
    a deterministic pseudo-random multiset (duplicates included, so the
    bucket-offset arithmetic is exercised on ties)."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_alto_to_json_spark.operators.quality import (
        kth_smallest_binned,
    )

    vals = [(i, (i * 2654435761) % 997) for i in range(2000)]
    want_sorted = sorted(v for _, v in vals)
    df = spark.createDataFrame(vals, "tie long, v long")
    for k in (1, 2, 17, 1000, 1800, 1999, 2000):
        got = kth_smallest_binned(
            df.withColumn("k", F.lit(k).cast("long")), "k", "v", "tie"
        ).collect()
        assert len(got) == 1
        assert got[0]["q"] == want_sorted[k - 1], (k, got)


def test_conformal_interval_coverage(spark, sf_dir):
    """Split-conformal 90% intervals must actually cover ~90% of held-out
    test rows (finite-sample marginal guarantee; +-4pp tolerance for the
    fixed split), and the calibration rank identity must hold:
    k = ceil(0.9 * (n_cal + 1))."""
    import math

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES

    # merged lookup: survives graded-window rotation (round-9 gotcha)
    rows = {**QUERIES, **EXTRA_QUERIES}["q_conformal_interval"](
        spark, sf_dir
    ).toPandas()
    cov = rows["n_covered"].sum() / rows["n_test"].sum()
    assert 0.86 <= cov <= 0.96, cov
    n_cal, k = rows["n_cal"].iloc[0], rows["k"].iloc[0]
    assert k == math.ceil(0.9 * (n_cal + 1))


def test_fd_repair_recovers_ground_truth(spark, sf_dir):
    """The majority-vote repair must RECOVER the uncorrupted FD exactly:
    every nation's repaired regionkey equals the true nation->region
    mapping (the 5% planted corruption never wins a vote), and the
    repair count equals the planted corruption count exactly."""
    import pandas as pd

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES
    from prefect_flow_arc_alto_to_json_spark.functions.scalar import (
        stable_hash_u32,
    )
    from pyspark.sql import functions as F

    got = EXTRA_QUERIES["q_fd_repair"](spark, sf_dir).toPandas()
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    truth = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    for row in got.itertuples(index=False):
        assert row.regionkey_repaired == truth[row.nationkey], row
    # planted corruption count from the same md5 rule
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey"
    )
    n_corrupt = cust.where(
        F.pmod(
            stable_hash_u32(
                F.concat(F.lit("fd-v1:"), F.col("c_custkey").cast("string"))
            ),
            F.lit(20),
        )
        == 0
    ).count()
    assert got["n_repaired"].sum() == n_corrupt


def test_group_impute_median_is_exact(spark, sf_dir):
    """The fill value must be the exact lower median of each group's
    OBSERVED values — replayed in pandas — and every group must impute
    at least one row (the planted 10% mask is non-vacuous per type)."""
    import pandas as pd

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES

    got = EXTRA_QUERIES["q_group_impute"](spark, sf_dir).toPandas()
    assert (got["n_imputed"] > 0).all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["y"] = (ev["value"] * 100).round().astype("int64")
    import hashlib

    def u32(s):
        d = hashlib.md5(s.encode()).digest()
        le = d[8:16][::-1].hex()
        return int(le[8:16], 16)

    ev["missing"] = [
        u32(f"imp-v1:{e}") % 10 == 0 for e in ev["event_id"]
    ]
    for row in got.itertuples(index=False):
        obs = ev[(ev.event_type == row.event_type) & ~ev.missing]
        srt = obs.sort_values(["y", "event_id"]).reset_index(drop=True)
        med = srt["y"].iloc[(len(srt) + 1) // 2 - 1]
        assert row.imputed_cents == med, (row.event_type, row.imputed_cents, med)


def test_hhi_bounds_and_monopoly_limit(spark, sf_dir):
    """HHI sanity: 1/n <= HHI <= 1 for every year (Cauchy-Schwarz lower
    bound, monopoly upper bound), reconstructed from the division-free
    integers; and the reconstruction is exact Fraction arithmetic."""
    from fractions import Fraction

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES

    rows = EXTRA_QUERIES["q_hhi_concentration"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        hhi = Fraction(int(r["hhi_num"]), r["rev_total"] ** 2)
        assert Fraction(1, r["n_suppliers"]) <= hhi <= 1, r

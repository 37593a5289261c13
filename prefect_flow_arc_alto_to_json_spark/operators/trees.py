"""Distributed decision-stump split finding — the histogram method.

The classic single-machine stump sorts every row by feature value and
scans candidate thresholds; at 100 TB that global sort is the cliff.
Every distributed GBDT (XGBoost approx/hist, LightGBM data-parallel)
replaces it with HISTOGRAM AGGREGATION: bin the feature once (narrow,
map-side), aggregate per-bin class counts (one map-side-combined
groupBy whose output is bounded by the BIN count, not the row count),
and evaluate every candidate split from cumulative bin counts. This
module is that pattern as a reusable operator.

Exactness device: the split criterion is MISCLASSIFICATION COUNT
(majority-vote error on each side) — a pure integer of the per-bin
counts, so the full error curve is hash-checkable against a SQL replay
with no float snapping at all. (Gini/entropy would rank splits by a
rational/irrational score; misclassification is the standard teaching
criterion and the integer-exact member of the family.)

Completes the supervised set beside the other from-scratch fits:
Naive Bayes (textstats), logistic GD + kNN (clustering), OLS
(temporal). Reference has no ML surface; this serves the
training-data-pipeline brief (label-quality probes over corpus
features).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decision_stump_errors(
    df: DataFrame, label: Column, bin_: Column
) -> DataFrame:
    """Per-candidate-split error curve for the stump ``predict majority
    class on each side of (feature_bin <= t)``.

    ``label`` must be 0/1; ``bin_`` an integer binning of the feature
    (the caller chooses bin width — candidate thresholds are bin upper
    edges, exactly XGBoost's ``tree_method=hist`` contract).

    Returns one row per occupied bin: (bin, n_left, n_right,
    misclassified, rank) with rank 1 = best split (fewest misclassified,
    smallest bin as tiebreak). The last bin's row is the no-split
    baseline (right side empty ⇒ global majority error).

    Scale: ONE map-side-combined groupBy on the bin id; everything after
    runs on the bounded histogram relation (#bins rows — dozens), where
    an unpartitioned cumulative window is a constant-size driver-free
    step, not a data-sized collapse. Totals ride a broadcast 1-row agg.
    Deeper trees = re-invoke per node on the filtered partition — each
    level is one more linear scan, the standard level-wise growth.
    """
    hist = (
        df.select(label.cast("long").alias("y"), bin_.cast("long").alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum("y").alias("c1"),
            (F.count(F.lit(1)) - F.sum("y")).alias("c0"),
        )
    )
    tot = hist.agg(
        F.sum("c1").alias("t1"), F.sum("c0").alias("t0")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.select(
            "bin",
            F.sum("c1").over(w).alias("l1"),
            F.sum("c0").over(w).alias("l0"),
        )
        .crossJoin(F.broadcast(tot))
    )
    n_left = F.col("l0") + F.col("l1")
    r0 = F.col("t0") - F.col("l0")
    r1 = F.col("t1") - F.col("l1")
    err = (
        n_left
        - F.greatest(F.col("l0"), F.col("l1"))
        + (r0 + r1)
        - F.greatest(r0, r1)
    )
    scored = cum.select(
        "bin",
        n_left.cast("long").alias("n_left"),
        (r0 + r1).cast("long").alias("n_right"),
        err.cast("long").alias("misclassified"),
    )
    rk = Window.orderBy("misclassified", "bin")
    return scored.withColumn(
        "rank", F.row_number().over(rk).cast("int")
    )

"""Relational data-quality validation: declarative rule checks compiled
into ONE aggregation pass (plus one anti-join per referential rule).

The reference pipeline's only validation is implicit (XML parse errors
carried in an error column, flows/main_flow.py:59-60); a production
engine needs explicit expectations — null checks, ranges, set membership,
uniqueness, referential integrity — evaluated at scan speed. Rules here
compile to JVM CASE-sum columns: checking 20 rules costs the same single
pass over the data as checking one, and the output (one row of violation
counts) is trivially hash-checkable against a SQL oracle.

Scale: non-key rules are map-side CASE sums folded by partial aggregation
(a 1-row exchange). Uniqueness is one groupBy on the key. Referential
integrity is a left-anti join against the (broadcast) parent key set —
at 100 TB the parent side should be the aggregated key relation, which is
exactly what ``ref_count`` builds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def violations(rules: dict[str, Column]) -> list[Column]:
    """Compile {rule_name: violation_predicate} into CASE-sum agg columns.

    Each predicate marks a BAD row (True = violation). NULL predicate
    results count as violations too — a rule that cannot be evaluated on
    a row has not been satisfied by it.
    """
    return [
        F.sum(
            F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
        ).alias(name)
        for name, pred in rules.items()
    ]


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row DataFrame of violation counts for every rule, in ONE pass."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), *violations(rules)
    )


def duplicate_key_count(*key_cols: str) -> Column:
    """Number of EXTRA rows beyond one per key (0 = key is unique).

    Returns an aggregate COLUMN to embed in a ``df.agg(...)`` alongside
    other rule counters: count(*) - count(distinct key) over the key
    columns. Null keys are excluded from the distinct but counted as rows
    — callers wanting null-key policing add a null rule.
    """
    return (
        F.count(F.lit(1))
        - F.count_distinct(*[F.col(c) for c in key_cols])
    ).alias("duplicate_keys")


def orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential integrity: count of child rows whose key has no parent
    (anti-join; broadcast the parent key set — it is an aggregated
    dimension relation by construction)."""
    parents = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return (
        child.join(
            F.broadcast(parents), child[child_key] == F.col("__pk"), "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )


def observed_rules(
    df: DataFrame, name: str, rules: dict[str, Column]
):
    """Attach violation counters to a plan via ``df.observe`` so they are
    collected DURING the action that consumes the plan — no second pass
    over the data, which at 100 TB is the difference between free metrics
    and doubling the job.

    Returns ``(observed_df, observation)``: run any action on the frame,
    then read ``observation.get`` for {n_rows, **rule_counts}. The
    counters ride the same partial-aggregation machinery as any agg, so
    they are exact, not sampled.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(
        obs, F.count(F.lit(1)).alias("n_rows"), *violations(rules)
    )
    return out, obs


def psi_drift(
    expected: DataFrame,
    actual: DataFrame,
    bin_col: str = "bin",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a pre-binned
    feature — the standard distribution-drift gate between a reference
    corpus and a new ingest (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25
    drifted).

    Inputs carry one integer ``bin_col`` in [0, n_bins); both sides are
    counted per bin over a dense bin spine (so empty bins participate),
    proportions are Laplace-smoothed ((n+1)/(N+n_bins) — PSI is undefined
    on zero bins), and each bin's term ``(p_a - p_e) * ln(p_a / p_e)`` is
    snapped to integer MICRO-UNITS before the total sums them — the same
    cross-engine determinism device as textstats.unigram_logprob (ulp-level
    libm differences cannot survive the snap).

    Returns one row per bin: (bin, n_expected, n_actual, psi_term_micro,
    psi_total_micro); total = sum of terms via an unpartitioned window over
    n_bins rows (constant-size — not a scale hazard).

    Scale: each side is one partial-aggregated count per bin (≤ n_bins
    rows shuffle per side, whatever the corpus size); the join/window run
    on n_bins rows. The 100 TB cost is the two scans — everything after is
    constant.
    """
    spark = expected.sparkSession
    spine = spark.range(n_bins).select(F.col("id").alias("bin"))

    def counts(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy(F.col(bin_col).alias("bin")).agg(
            F.count(F.lit(1)).alias(out)
        )

    bins = (
        spine.join(F.broadcast(counts(expected, "n_expected")), "bin", "left")
        .join(F.broadcast(counts(actual, "n_actual")), "bin", "left")
        .na.fill(0, ["n_expected", "n_actual"])
    )
    ne = F.sum("n_expected").over(Window.partitionBy())
    na = F.sum("n_actual").over(Window.partitionBy())
    pe = (F.col("n_expected") + 1).cast("double") / (ne + n_bins).cast("double")
    pa = (F.col("n_actual") + 1).cast("double") / (na + n_bins).cast("double")
    term = F.round((pa - pe) * F.log(pa / pe) * 1000000.0, 0).cast("long")
    with_terms = bins.select(
        "bin", "n_expected", "n_actual", term.alias("psi_term_micro")
    )
    return with_terms.withColumn(
        "psi_total_micro",
        F.sum("psi_term_micro").over(Window.partitionBy()).cast("long"),
    )



def roc_auc_histogram(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Distributed ROC-AUC via the Mann-Whitney rank-sum, computed on the
    SCORE HISTOGRAM — the 100 TB formulation: corpus rows fold map-side
    into (score → count, positives) groups; the prefix-sum window then
    rides over the score-distribution relation (|distinct scores| rows),
    never over corpus rows, so no global corpus-sized window collapse.

    Tie handling is exact (average ranks): a tie group of size c starting
    at rank r has average rank r + (c-1)/2; everything is kept DOUBLED
    (2·avg = 2·cum_below + c + 1) so the arithmetic stays integral until
    the single final division, which is ppm-snapped — the established
    determinism contract. Returns one row
    (n_pos, n_neg, auc_ppm ∈ [0, 1e6]).

    Exactness bound: the doubled rank-sum S2 ≤ 2N² must stay below 2^52
    for the final double product to be exact — N ≲ 3·10^7 per evaluated
    slice; shard the eval by stratum above that (the operator composes:
    AUC is not mergeable, the histogram IS, so pre-aggregate per shard
    and union histograms before this window).
    """
    y = F.col(label_col).cast("int")
    g = df.select(F.col(score_col).alias("s"), y.alias("y")).groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("p")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    # the window relation is the score distribution (aggregate-sized, like
    # psi_drift's 10 bins) — NOT the corpus
    ranked = g.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    totals = ranked.agg(
        F.sum(F.col("p") * (2 * F.col("cum") + F.col("c") + 1)).alias("s2"),
        F.sum("p").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).alias("n_neg"),
    )
    return totals.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1))
            * 1000000.0
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            0,
        )
        .cast("long")
        .alias("auc_ppm"),
    )


def roc_auc_by_group(
    df: DataFrame, score_col: str, label_col: str, group_col: str
) -> DataFrame:
    """Per-slice ROC-AUC — :func:`roc_auc_histogram` generalized to one
    AUC row per ``group_col`` value (per-language / per-domain model
    evaluation, the form every corpus-quality loop actually reports).
    Same histogram formulation and integer tie-exact rank-sum, with the
    prefix-sum window partitioned BY GROUP over each group's score
    distribution. Groups with only one class (n_pos or n_neg = 0) have
    undefined AUC and are emitted with auc_ppm NULL rather than dropped.
    Returns (group, n_pos, n_neg, auc_ppm).
    """
    y = F.col(label_col).cast("int")
    g = (
        df.select(
            F.col(group_col).alias("grp"), F.col(score_col).alias("s"), y.alias("y")
        )
        .groupBy("grp", "s")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("y").alias("p"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = g.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    totals = ranked.groupBy("grp").agg(
        F.sum(F.col("p") * (2 * F.col("cum") + F.col("c") + 1)).alias("s2"),
        F.sum("p").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).alias("n_neg"),
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return totals.select(
        F.col("grp").alias("group"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.when(
            defined,
            F.round(
                (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1))
                * 1000000.0
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                0,
            ).cast("long"),
        ).alias("auc_ppm"),
    )


def mad_outliers(
    df: DataFrame, grp: str, value: Column, z_milli: int = 3500
) -> DataFrame:
    """Per-group robust outlier counts by MEDIAN / MAD — the
    breakdown-resistant twin of the z-score (one extreme value moves a
    mean/stddev arbitrarily; it moves the median/MAD not at all). Flags
    values whose robust z-score 0.6745*|v - med|/MAD exceeds
    ``z_milli``/1000 (3.5 is the Iglewicz-Hoaglin convention).

    Exactness contract: ``value`` must be an integer column (cents).
    Medians use the DOUBLED-median device: med2 = the sum of the two
    middle order statistics (twice the middle one when n is odd), an
    integer for integer inputs — no .5 ever exists to round. Deviations
    d = |2v - med2| = 2|v - med| stay integers; mad2 (the med2 of the
    d's) = 4*MAD. The flag rule folds to pure longs:
    0.6745*|v-med|/MAD > z_milli/1000, with |v-med| = d/2 and
    MAD = mad2/4, is 1.349*d/mad2 > z_milli/1000, i.e.
    ``1349 * d > z_milli * mad2`` — exact integer comparison, no float
    anywhere in the operator.

    Scale shape: NO row-level sort. Pass 1 folds rows into a per-(group,
    value) HISTOGRAM (map-side combined; the shuffle carries distinct
    values, not rows). Median selection is a cumulative scan of each
    group's ordered histogram — a window over the histogram relation.
    Pass 2 re-keys the same histogram by deviation and selects again.
    The group count here is small (order priorities); for high-cardinality
    values the histogram is the standard exact-selection compromise —
    the approximate path is approx_percentile, already covered.
    """
    v = value.cast("long").alias("v")
    # localCheckpoint: hist feeds the median selection AND the deviation
    # re-key; med/mad/dev each feed 2+ consumers — without truncation the
    # static plan re-derives the row-scale histogram per consumer
    # (measured 39 shuffles / 17 scans; truncated: one histogram pass).
    # The leakage-safe-split precedent: at 100 TB this is the
    # checkpoint-to-parquet relation.
    hist = (
        df.select(F.col(grp).alias("grp"), v)
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )

    def med2_of(h: DataFrame, val_col: str) -> DataFrame:
        """Doubled median from an ordered histogram: the two middle ranks
        m1=(n+1)/2, m2=(n+2)/2 fall inside the value whose cumulative
        range covers them."""
        w = Window.partitionBy("grp").orderBy(val_col)
        cum = h.select(
            "grp",
            F.col(val_col).alias("val"),
            "c",
            F.sum("c").over(w).alias("cum"),
        )
        tot = cum.groupBy("grp").agg(F.max("cum").alias("n"))
        j = cum.join(F.broadcast(tot), "grp")
        lo = F.col("cum") - F.col("c")  # ranks covered: (lo, cum]
        m1 = (F.col("n") + 1) / 2
        m2 = (F.col("n") + 2) / 2
        m1 = F.floor(m1).cast("long")
        m2 = F.floor(m2).cast("long")
        return j.groupBy("grp").agg(
            F.sum(
                F.when((m1 > lo) & (m1 <= F.col("cum")), F.col("val")).otherwise(0)
                + F.when((m2 > lo) & (m2 <= F.col("cum")), F.col("val")).otherwise(0)
            )
            .cast("long")
            .alias("med2"),
            F.max("n").cast("long").alias("n"),
        )

    med = med2_of(hist, "v").localCheckpoint()
    dev = (
        hist.join(F.broadcast(med.select("grp", "med2")), "grp")
        .select(
            "grp",
            F.abs(F.lit(2) * F.col("v") - F.col("med2")).alias("d"),
            "c",
        )
        .groupBy("grp", "d")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint()
    )
    mad = (
        med2_of(dev, "d")
        .select("grp", F.col("med2").alias("mad2"))
        .localCheckpoint()
    )
    flagged = (
        dev.join(F.broadcast(mad), "grp")
        .where(F.lit(1349) * F.col("d") > F.lit(z_milli) * F.col("mad2"))
        .groupBy("grp")
        .agg(F.sum("c").cast("long").alias("n_outliers"))
    )
    return (
        med.join(F.broadcast(mad), "grp")
        .join(F.broadcast(flagged), "grp", "left")
        .select(
            "grp",
            "n",
            "med2",
            "mad2",
            F.coalesce("n_outliers", F.lit(0)).cast("long").alias("n_outliers"),
        )
    )


def isotonic_fit(bins: DataFrame, *, mul: int = 1_000_000) -> DataFrame:
    """Isotonic (PAVA) regression over a BOUNDED ordered bin relation —
    the calibration step that turns a reliability table into a monotone
    calibrated score map (the classic post-hoc classifier calibrator).

    ``bins`` carries (bin long, n long, pos long), at most a few dozen
    rows: the output of an equi-width/equi-depth binning aggregate (the
    one data-sized pass happens BEFORE this operator). Returns (bin,
    iso_ppm), the non-decreasing least-squares fit of pos/n in half-up
    integer ppm.

    Device: PAVA's pool-adjacent loop is sequential, but its solution has
    the closed minimax form ``fit_i = max_{k<=i} min_{j>=i}
    mean(pos[k..j] / n[k..j])`` over interval means — three bounded joins
    and two aggs instead of a loop. Every interval mean snaps to integer
    ppm FIRST (the half-up device), so the max/min lattice is pure integer
    comparison and the fit replays hash-exact in the oracle. Monotonicity
    of the minimax holds for ANY matrix (snapped included): growing i
    shrinks the inner min's domain and grows the outer max's.

    Scale: every relation here is at most |bins|^2 rows (~4k at 64 bins);
    the non-equi joins are broadcast by construction, never data-sized.
    """
    kk = bins.select(F.col("bin").alias("k"))
    jj = bins.select(F.col("bin").alias("j"))
    spine = F.broadcast(kk).crossJoin(F.broadcast(jj)).where(
        F.col("k") <= F.col("j")
    )
    members = spine.join(
        F.broadcast(bins),
        (F.col("bin") >= F.col("k")) & (F.col("bin") <= F.col("j")),
    )
    iv = members.groupBy("k", "j").agg(
        F.sum("n").alias("n_kj"), F.sum("pos").alias("p_kj")
    )
    ivm = iv.select(
        "k",
        "j",
        F.call_function(
            "div",
            2 * F.col("p_kj") * F.lit(mul).cast("long") + F.col("n_kj"),
            2 * F.col("n_kj"),
        ).alias("mean_ppm"),
    )
    inner = bins.select("bin").join(
        F.broadcast(ivm),
        (F.col("k") <= F.col("bin")) & (F.col("j") >= F.col("bin")),
    )
    return (
        inner.groupBy("bin", "k")
        .agg(F.min("mean_ppm").alias("minm"))
        .groupBy("bin")
        .agg(F.max("minm").cast("long").alias("iso_ppm"))
    )


def kth_smallest_binned(
    vals: DataFrame,
    k_col: str = "k",
    val_col: str = "v",
    tie_col: str = "tie",
    n_bins: int = 1024,
) -> DataFrame:
    """EXACT k-th smallest of a value column by the classic two-pass
    distributed selection (no global sort, no single-partition window
    over the data): bin values into ``n_bins`` equi-width buckets, find
    the bucket containing rank k from the BOUNDED bucket histogram, then
    rank only inside that one bucket (~n/n_bins rows). Total order is
    (value, tie) so the selected row is unique.

    ``vals`` must carry (val_col >= 0 long, tie_col) plus a broadcastable
    1-row rank spec is derived internally from ``k_col`` — callers pass
    k as a column on every row (constant). Returns a 1-row DataFrame
    (q = the k-th smallest value).

    Scale: pass one is a map-side-combined n_bins-key histogram; the
    cumulative runs on n_bins rows; pass two touches one bucket. This is
    how exact distributed quantile selection is actually done — the
    alternative (global orderBy + row_number) collapses to one
    partition.
    """
    vmax = vals.agg(
        F.max(val_col).cast("long").alias("vmax"),
        F.max(k_col).cast("long").alias("ksel"),
    )
    binned = vals.drop(k_col).crossJoin(F.broadcast(vmax)).select(
        val_col,
        tie_col,
        F.col("ksel").alias("k"),
        F.least(
            F.floor(F.col(val_col) * n_bins / (F.col("vmax") + 1)).cast(
                "long"
            ),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
    ).localCheckpoint()  # histogram pass + the in-bucket pass
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        "bin",
        "c",
        F.sum("c")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1))
        .alias("before"),
    ).fillna({"before": 0})
    target = (
        cum.crossJoin(F.broadcast(vmax.select(F.col("ksel").alias("k"))))
        .where(
            (F.col("before") < F.col("k"))
            & (F.col("before") + F.col("c") >= F.col("k"))
        )
        .select("bin", (F.col("k") - F.col("before")).alias("offset"))
    )
    inb = binned.join(F.broadcast(target), "bin")
    w = Window.partitionBy("bin").orderBy(val_col, tie_col)
    return (
        inb.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("offset"))
        .select(F.col(val_col).alias("q"))
    )

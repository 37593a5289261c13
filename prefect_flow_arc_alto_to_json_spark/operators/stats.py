"""ANALYZE-style table statistics: exact equi-depth histograms and the
selectivity estimates an optimizer derives from them.

Every cost-based optimizer (Catalyst CBO, DuckDB, Postgres) keeps
equi-depth (equal-height) column histograms and estimates a range
predicate's cardinality by summing full buckets plus a uniform-within-
bucket fraction of the boundary buckets. This module computes both sides
distributively and EXACTLY, so the estimate-vs-actual gap — the thing
query planners live and die by — is itself an oracle-checkable relation.

Exactness contract: boundaries are true order statistics selected from
the cumulative VALUE HISTOGRAM (the mad_outliers device — integer
values, integer ranks, no row sort); the per-bucket estimate for a probe
range is ``n_bucket * overlap_len / bucket_len`` emitted in integer ppm
via the half-up FLOOR device (both lengths are integer cents, so the
rational is exact).

Scale: one map-side-combined groupBy(value) is the only row-scale
operation; boundary selection, bucketing and the probe run on the
distinct-value relation. This is literally how ANALYZE scales: stats
build off a value sketch, never a sort of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equidepth_selectivity(
    df: DataFrame,
    value,
    probe_lo: int,
    probe_hi: int,
    buckets: int = 8,
) -> DataFrame:
    """Per-bucket equi-depth stats + estimate-vs-actual for the probe
    range [probe_lo, probe_hi] (inclusive, in the value's integer units).

    Returns one row per bucket: (bucket, lo, hi, n_rows,
    est_probe_rows, actual_probe_rows) — ``lo`` exclusive, ``hi``
    inclusive (bucket k covers ranks ((k-1)n/B, kn/B]);
    ``est_probe_rows`` is the optimizer's uniform-within-bucket estimate
    of matching rows half-up-rounded to WHOLE rows, and
    ``actual_probe_rows`` the exact count — their gap per bucket is the
    histogram's modeling error, the quantity this operator exists to
    expose. (Whole rows, not ppm: the FLOOR half-up device is exact only
    while 2·n·overlap·scale stays under 2^52 and the quotient's ulp
    stays under 1/(2·bucket_len); with cent-scale bucket lengths ~5e7
    that bounds the scale to 1.)
    """
    v = value.cast("long").alias("v")
    hist = (
        df.select(v)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # feeds boundary selection AND bucket assignment
    )
    w = Window.orderBy("v")
    cum = hist.select(
        "v", "c", F.sum("c").over(w).alias("cum")
    ).localCheckpoint()
    tot = cum.agg(F.max("cum").alias("n"), F.min("v").alias("vmin"))
    # boundary b_k = smallest value whose cumulative count reaches rank
    # ceil(k*n/B): a tiny cross of the B rank targets with the cumulative
    # relation, min() per k — selection without any sort of the data
    spine = df.sparkSession.range(1, buckets + 1).select(
        F.col("id").cast("int").alias("k")
    )
    ranks = spine.crossJoin(F.broadcast(tot)).select(
        "k",
        "vmin",
        F.ceil(F.col("k") * F.col("n") / buckets).cast("long").alias("r"),
    )
    bounds = (
        ranks.join(cum, F.col("cum") >= F.col("r"))
        .groupBy("k")
        .agg(
            F.min("v").alias("hi"),
            F.min("vmin").alias("vmin"),
        )
    )
    wb = Window.orderBy("k")  # constant-size relation (B rows)
    bks = bounds.select(
        "k",
        F.coalesce(F.lag("hi").over(wb), F.col("vmin") - 1).alias("lo"),
        "hi",
    ).localCheckpoint()
    # assign every distinct value to its bucket: (lo, hi] containment —
    # a broadcast theta join against the B-row boundary relation
    assigned = hist.join(
        F.broadcast(bks),
        (F.col("v") > F.col("lo")) & (F.col("v") <= F.col("hi")),
    )
    plo, phi = F.lit(int(probe_lo)), F.lit(int(probe_hi))
    overlap = F.greatest(
        F.lit(0),
        F.least(F.col("hi"), phi) - F.greatest(F.col("lo"), plo),
    )
    blen = F.col("hi") - F.col("lo")
    return (
        assigned.groupBy("k", "lo", "hi")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.sum(
                F.when((F.col("v") >= plo) & (F.col("v") <= phi), F.col("c"))
                .otherwise(0)
            )
            .cast("long")
            .alias("actual_probe_rows"),
        )
        .select(
            F.col("k").alias("bucket"),
            F.col("lo").cast("long").alias("lo"),
            F.col("hi").cast("long").alias("hi"),
            "n_rows",
            # uniform-within-bucket estimate, half-up whole rows:
            # rows * overlap / bucket_len on the shared (lo, hi] scale
            F.floor(
                (2 * F.col("n_rows") * overlap + blen) / (2.0 * blen)
            )
            .cast("long")
            .alias("est_probe_rows"),
            "actual_probe_rows",
        )
    )

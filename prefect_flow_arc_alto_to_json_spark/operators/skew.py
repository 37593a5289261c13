"""Skew mitigation (SURVEY.md §7.1 M5): salting for hot keys.

AQE's skew-join splitting handles sort-merge joins; these cover the two
cases it can't — skewed aggregation keys and replicate-side joins — as
deterministic plan rewrites (no RNG: the salt derives from a hash of the
row, so retries and resumed stages see the same salt).

- ``salted_agg``: two-phase aggregation. Phase 1 aggregates on
  (key, salt) — the hot key's rows split across S reducers; phase 2
  combines the S partials per key. Works for any algebraic aggregate
  (sum/count/min/max, and avg via sum+count).
- ``salted_join``: fact side salted, dimension side replicated S times —
  a hot join key fans across S reducers instead of one. For dimensions
  small enough to broadcast, prefer ``F.broadcast`` (no shuffle at all);
  this is for the mid-size case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (phase1 fn, phase2 fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): hash of the whole row —
    stable under retries, uniform enough to split a hot key."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum/count/min/max. Result equals a plain groupBy(keys).agg(...), but
    no single reducer ever sees more than ~1/S of a hot key's rows.
    """
    for name, (_, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn!r} is not algebraic (use sum/count/min/max)")
    salted = df.withColumn("__salt", _salt(df, salt_buckets))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](col).alias(f"__p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"__p_{name}").alias(name)
            for name, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the fact side salted and the dim side replicated
    ``salt_buckets`` times, so one hot key spreads across S reducers.

    Dim-side cost is |dim|·S rows shuffled — use broadcast instead when
    |dim| fits the broadcast threshold.
    """
    f = fact.withColumn("__salt", _salt(fact, salt_buckets))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")

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

from pyspark.sql import Column, DataFrame
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

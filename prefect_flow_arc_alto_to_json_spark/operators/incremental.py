"""Incremental materialized-view maintenance — mergeable aggregate state.

The reference's only incrementality is the high-watermark catalog query
(``get_url_list(creds, since)`` — flows/main_flow.py:30-41 re-processes
records changed since the last run). This generalizes that idea to the
aggregation layer: a materialized aggregate is kept as a STATE TABLE of
algebraic partials, and each ingest batch folds in with a key-wise merge —
``state ⊕ partial(batch)`` — instead of recomputing over all history.

Only algebraic aggregates participate (sum/count/min/max — and anything
derivable from them, e.g. avg = sum/count), because they are exactly the
ones with an associative, commutative merge. That closure property is the
whole design: the merged state is bit-identical to the aggregate computed
from scratch, which is what the DuckDB oracle for ``q_incremental_mv``
checks.

Scale: this turns an O(history) nightly rebuild into O(batch) per ingest —
at 100 TB of accumulated events the full GROUP BY rescans everything while
the merge touches |state| + |batch| rows. The merge itself is one
shuffle on the view key (both inputs aggregated first, so the shuffle
moves one row per key per side, not raw events), and the state table can
be written bucketed on the key (sinks/bucketed.py) to make even that
shuffle disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (partial fn over raw rows, merge fn over partials)
MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

AggSpec = dict[str, tuple[str, str]]  # out col -> (in col, fn)


def _check(aggs: AggSpec) -> None:
    for name, (_, fn) in aggs.items():
        if fn not in MERGEABLE:
            raise ValueError(
                f"{name}: {fn!r} is not mergeable (use sum/count/min/max)"
            )


def agg_state(df: DataFrame, keys: list[str], aggs: AggSpec) -> DataFrame:
    """Partial aggregate state of one batch: one row per key, one column
    per spec entry. This is what gets persisted as the materialized view's
    backing table."""
    _check(aggs)
    return df.groupBy(*keys).agg(
        *[MERGEABLE[fn][0](col).alias(name) for name, (col, fn) in aggs.items()]
    )


def merge_states(
    states: list[DataFrame], keys: list[str], aggs: AggSpec
) -> DataFrame:
    """Key-wise merge of agg-state relations: ``unionByName`` then one
    groupBy applying each aggregate's merge function (count partials merge
    by SUM — the classic partial/final split Catalyst itself uses below
    every shuffle). Associative and commutative, so any batching/ordering
    of ingests yields the identical view."""
    _check(aggs)
    if not states:
        raise ValueError("merge_states needs at least one state relation")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        *[MERGEABLE[fn][1](name).alias(name) for name, (_, fn) in aggs.items()]
    )

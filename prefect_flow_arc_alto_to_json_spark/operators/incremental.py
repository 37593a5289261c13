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


def incremental_components(
    old_labels: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental connected components: fold a NEW batch of near-dup
    edges into yesterday's (doc_id, component_id) labels without
    recomputing over the historical edge set — the graph-state member of
    this module's O(batch)-per-ingest contract (dedup_incremental_minhash
    covers candidate GENERATION incrementally; this covers the grouping
    step).

    Device: CONTRACTION. Old components collapse to their label node
    (component_id = min member id, so the contracted node id IS the
    component's min), each new edge maps its endpoints through the old
    labels (unlabeled endpoints map to themselves), and min-label
    propagation runs on the contracted graph only — size O(|new edges|),
    never O(|history|). min-of-mins = global min, so merged labels are
    exactly the labels a full recompute over old ∪ new edges produces
    (the oracle adjudicates precisely that equality).

    Returns labels for every node of old ∪ new edges: old members route
    through the contraction map (component_id -> merged label, identity
    where untouched); contracted nodes that aren't old component ids
    (new docs, old docs first linked today) emit directly.

    The is-an-old-component-id test is VALUE-DETERMINED (component ids
    are labeled doc ids; an unlabeled endpoint's id can never equal one),
    so instead of anti-joining the contraction map against the
    history-sized component-id set — which would rescan history every
    batch and defeat the O(batch) contract — the flag is ENCODED into
    the contracted node id itself: ``2*id + came_from_label``. The
    encoding is strictly monotone in id (distinct ids stay distinct,
    same id always carries the same flag), so min-label propagation
    commutes with it, and the post-propagation split into routed vs
    direct rows is a pure filter on the low bit — zero extra shuffles,
    zero history touch.

    CONTRACT (round-10 ADVICE — the encoding's correctness is
    value-determined, not structural): ``old_labels.component_id`` must
    be drawn from the historical ``doc_id`` domain (min-member labeling,
    as duplicate_components and this function itself produce), and doc
    ids must be globally unique and never reused. A caller passing
    arbitrary/synthetic component labels, or reusing a retired doc_id
    for a new document, voids the "an unlabeled endpoint's id can never
    equal a historical component_id" invariant and gets SILENT
    mislabeling where the (history-rescanning) anti-join formulation was
    correct by construction. Feed it only label relations produced by
    this module. Additionally asserted per-row at execution time: ids
    must be non-negative and below 2^62 so the 2*id+flag encoding
    cannot overflow or collide across signs.
    """
    from .dedup import duplicate_components

    la = old_labels.select(
        F.col("doc_id").alias("__a"), F.col("component_id").alias("__la")
    )
    lb = old_labels.select(
        F.col("doc_id").alias("__b"), F.col("component_id").alias("__lb")
    )
    def _enc(val_col: str, lab_col: str):
        # cheap debug assertion (see CONTRACT above): the 2*id+flag
        # encoding needs 0 <= id < 2^62; out-of-range ids would overflow
        # long or collide across signs, so fail loudly per row.
        v = F.coalesce(lab_col, val_col)
        ok = (v >= 0) & (v < F.lit(1 << 62))
        guard = F.assert_true(
            ok, F.lit("incremental_components: id outside [0, 2^62)")
        )
        return F.when(
            guard.isNull(), v * 2 + F.col(lab_col).isNotNull().cast("long")
        )

    contracted_edges = (
        new_pairs.select(F.col(id_a).alias("__a"), F.col(id_b).alias("__b"))
        .join(la, "__a", "left")
        .join(lb, "__b", "left")
        .select(
            _enc("__a", "__la").alias("ca"),
            _enc("__b", "__lb").alias("cb"),
        )
        .where(F.col("ca") != F.col("cb"))
    )
    contracted = (
        duplicate_components(contracted_edges, "ca", "cb", max_iter=max_iter)
        .select(
            F.col("doc_id").alias("cnode"),
            F.shiftright(F.col("component_id"), 1).alias("mlabel"),
        )
        .localCheckpoint()  # two consumers below
    )
    # the contraction map is batch-sized while old_labels is
    # history-sized: broadcast the map (the incremental regime's whole
    # point); without hints the statless checkpoint stubs plan SMJ.
    # Only flag-1 nodes are old component ids, but flag-0 nodes decode
    # to ids that never match component_id, so no pre-filter is needed.
    mapped = old_labels.join(
        F.broadcast(
            contracted.select(
                F.shiftright(F.col("cnode"), 1).alias("cnode_dec"), "mlabel"
            )
        ),
        old_labels["component_id"] == F.col("cnode_dec"),
        "left",
    ).select(
        "doc_id",
        F.coalesce("mlabel", "component_id").alias("component_id"),
    )
    direct = contracted.where(F.pmod(F.col("cnode"), F.lit(2)) == 0).select(
        F.shiftright(F.col("cnode"), 1).alias("doc_id"),
        F.col("mlabel").alias("component_id"),
    )
    return mapped.unionByName(direct)

"""Python UDF/UDAF/UDTF surface (SURVEY.md §2.10 U3) — the escape hatches
for logic built-ins can't express, each in its Arrow-batched form:

- ``tokens_with_offsets``: a Python UDTF expanding one document row into
  one row per token with its running character offset — per-element state
  across the expansion, which a plain ``explode`` cannot carry.
- ``exact_quantile``: a pandas grouped-agg UDF (vectorized UDAF) computing
  an exact quantile per group — built-ins offer only ``percentile_approx``.

Both are deliberately boring algorithms: the point is the operator shape
(UDTF registration, GROUPED_AGG pandas_udf) and its Arrow batch contract.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_TOKENS_SCHEMA = StructType(
    [
        StructField("token_no", IntegerType()),
        StructField("token", StringType()),
        StructField("char_start", IntegerType()),
        StructField("char_len", IntegerType()),
    ]
)


@udtf(returnType=_TOKENS_SCHEMA)
class TokensWithOffsets:
    """One row per whitespace token with its character offset in the
    original text — the running offset is state across emitted rows
    (reference analog: document order within the per-file loop,
    flows/main_flow.py:65-70)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        offset = 0
        token_no = 0
        i = 0
        n = len(text)
        while i < n:
            if text[i].isspace():
                i += 1
                continue
            start = i
            while i < n and not text[i].isspace():
                i += 1
            yield token_no, text[start:i], start, i - start
            token_no += 1


@pandas_udf(DoubleType())
def exact_quantile_p90(v: pd.Series) -> float:
    """Exact p90 per group (pandas GROUPED_AGG — an Arrow-batched UDAF).
    Linear interpolation, matching ``numpy.quantile`` defaults."""
    return float(v.quantile(0.9))


def cogroup_merge_asof(
    left,
    right,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
):
    """Backward-inclusive as-of join via the COGROUPED map surface:
    ``left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas`` with a
    per-key ``pandas.merge_asof`` — the two-sided Arrow escape hatch
    (§2.10), semantically identical to ``operators.joins.asof_join`` (the
    pure-DataFrame union+window form) and sharing its oracle.

    Scale: cogroup shuffles BOTH sides once on the key and hands each key's
    two frames to one Arrow batch — per-key work is bounded by the key's
    own rows. Use the window form when the value columns are few (it stays
    JVM-side); use this form when the per-key merge logic outgrows SQL.
    """
    value_cols = [c for c in right.columns if c not in (key, right_ts)]
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(f"{c}{suffix}", right.schema[c].dataType)
            for c in value_cols
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    # Alias the right side to fresh names BEFORE cogrouping: when both
    # sides descend from the same source DataFrame, their columns share
    # attribute ids and the CoGroup node dedupes the right side's copies —
    # the Python function would receive a right frame silently missing its
    # ts/key columns. Fresh aliases guarantee disjoint attributes.
    rmap = {c: f"__r_{c}" for c in right.columns}
    right_fresh = right.select(
        *[F.col(c).alias(a) for c, a in rmap.items()]
    )

    def merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty:
            return pd.DataFrame(columns=out_cols)
        lf = lf.sort_values(left_ts, kind="mergesort")
        if rf.empty:
            out = lf.copy()
            for c in value_cols:
                out[f"{c}{suffix}"] = None
            return out[out_cols]
        rf = rf[[rmap[right_ts]] + [rmap[c] for c in value_cols]].rename(
            columns={
                rmap[right_ts]: "__rts",
                **{rmap[c]: f"{c}{suffix}" for c in value_cols},
            }
        )
        rf = rf.sort_values("__rts", kind="mergesort")
        merged = pd.merge_asof(
            lf, rf, left_on=left_ts, right_on="__rts", direction="backward"
        )
        return merged[out_cols]

    return (
        left.groupBy(key)
        .cogroup(right_fresh.groupBy(rmap[key]))
        .applyInPandas(merge, schema=out_schema)
    )


def vector_stats_arrow(df, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Per-vector stats (dims / positive count / 1-based argmax / max) via
    ``mapInArrow`` — the lowest-level Arrow batch surface (§2.10): no
    pandas materialization, zero-copy numpy views over the Arrow list
    buffers, vectorized segment reductions.

    argmax is FIRST occurrence of the max (numpy semantics), matching
    DuckDB ``list_position(v, list_aggregate(v, 'max'))``; comparisons on
    the float32 payload are exact so the oracle is hash-checkable. The max
    itself is returned unrounded — callers round JVM-side.
    """
    import pyarrow as pa

    def stats(batches):
        import numpy as np

        for batch in batches:
            emb = batch.column(batch.schema.get_field_index(vec_col))
            vid = batch.column(batch.schema.get_field_index(id_col))
            n = len(emb)
            # Pair the RAW child array with the ABSOLUTE offsets: a sliced
            # ListArray keeps absolute offsets while .flatten() returns a
            # trimmed child — mixing them reads the wrong value windows
            # (crash on the reshape path, silent corruption on the ragged
            # path). emb.values is the untrimmed child the offsets index.
            values = np.asarray(emb.values)
            offsets = np.asarray(emb.offsets)
            lens = offsets[1:] - offsets[:-1]
            has_nulls = emb.null_count > 0
            if (
                n
                and not has_nulls
                and lens.min() == lens.max()
                and lens[0] > 0
            ):
                # uniform-dimension fast path: one reshape, three
                # vectorized reductions — no per-row Python
                m = values[offsets[0] : offsets[-1]].reshape(n, int(lens[0]))
                n_pos = (m > 0).sum(axis=1)
                argmax_pos = m.argmax(axis=1) + 1
                max_val = m.max(axis=1).astype(np.float64)
            else:  # ragged / null-bearing fallback — correct, per-row
                valid = (
                    np.asarray(emb.is_valid())
                    if has_nulls
                    else np.ones(n, dtype=bool)
                )
                segs = [
                    values[offsets[i] : offsets[i + 1]]
                    if valid[i]
                    else values[:0]
                    for i in range(n)
                ]
                lens = np.array([len(s) for s in segs], dtype=np.int64)
                n_pos = np.array([(s > 0).sum() for s in segs], dtype=np.int64)
                argmax_pos = np.array(
                    [int(s.argmax()) + 1 if len(s) else 0 for s in segs],
                    dtype=np.int64,
                )
                max_val = np.array(
                    [float(s.max()) if len(s) else float("nan") for s in segs]
                )
            yield pa.RecordBatch.from_arrays(
                [
                    vid,
                    pa.array(lens.astype("int32")),
                    pa.array(n_pos.astype("int32")),
                    pa.array(argmax_pos.astype("int32")),
                    pa.array(max_val, type=pa.float64()),
                ],
                names=[id_col, "n_dims", "n_pos", "argmax_pos", "max_val"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        stats,
        schema=(
            f"{id_col} long, n_dims int, n_pos int, argmax_pos int,"
            " max_val double"
        ),
    )


from .selfship import self_ship  # noqa: E402

# Worker-executed closures above must never require this package on the
# executor's PYTHONPATH — ship them by value (see functions/selfship.py).
self_ship(__name__)


def label_profile_apply_arrow(df, vec_col: str = "embedding"):
    """Per-label vector profile via GROUPED ``applyInArrow`` (Spark 4) —
    the last cell of the Python-interop matrix (§2.10): pandas_udf /
    applyInPandas / cogroup.applyInPandas / UDTF / mapInPandas /
    mapInArrow / applyInArrow. The group function receives the whole
    group as ONE pyarrow.Table (no pandas materialization) and reduces
    it with zero-copy numpy views; output is a 1-row Arrow table per
    label.

    Emitted metrics are exact integers (count + micro-snapped sum of
    the first component), so the grouped-Arrow path itself is
    value-adjudicated by SQL replay — not just smoke-tested.
    """
    import pyarrow as pa

    def profile(table: "pa.Table") -> "pa.Table":
        import numpy as np

        emb = table.column(vec_col).combine_chunks()
        values = np.asarray(emb.values)
        offsets = np.asarray(emb.offsets)
        # first component of each list: values[offsets[:-1]] (lists are
        # non-empty in this corpus; a ragged guard keeps it honest)
        firsts = values[offsets[:-1][offsets[1:] > offsets[:-1]]]
        micro = np.rint(firsts.astype(np.float64) * 1_000_000).astype(np.int64)
        label = table.column("label")[0].as_py()
        return pa.table(
            {
                "label": pa.array([label], pa.int32()),
                "n_vecs": pa.array([len(emb)], pa.int64()),
                "sum_dim0_micro": pa.array([int(micro.sum())], pa.int64()),
            }
        )

    return df.groupBy("label").applyInArrow(
        profile, schema="label int, n_vecs long, sum_dim0_micro long"
    )

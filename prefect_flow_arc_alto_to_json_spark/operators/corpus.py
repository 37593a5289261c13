"""Corpus-assembly operators: the last mile of a training-data pipeline,
after cleaning (operators/textclean.py) and dedup (operators/dedup.py) —
deciding WHICH rows reach the tokenizer and HOW they are laid out:

- :func:`stratified_sample` — per-stratum down-sampling (rebalance a
  corpus whose language/source mix is skewed);
- :func:`weighted_mix` — per-stratum epoch weights > 1 (oversample
  high-quality sources by integer repeats + a deterministic fractional
  remainder);
- :func:`chunk_pack` — concat-then-chunk sequence packing (GPT-style
  pretraining layout: concatenate documents in a fixed order, slice into
  fixed token-budget windows; documents may straddle window boundaries).

The reference pipeline has no analog (it converts one file at a time,
flows/main_flow.py); these are engine-surface operators the brief demands
for the 100 TB training-data path.

Determinism contract (same as operators/textclean.py's split): every
"random" choice derives from ``stable_hash_p31`` of a version-tagged key —
DuckDB recomputes it as ``md5_number_lower(tag || ':' || id) %
2147483647``, so the SQL oracles verify exact row sets, and re-runs /
stage retries / both engines agree bit-for-bit. No RNG, no
``F.rand()`` (non-deterministic under retries — a correctness hazard on a
real cluster, not just an oracle inconvenience).

Scale notes:
- sampling/mixing are narrow per-row predicates/generators — no shuffle,
  fully pushed into the scan stage; the mix's ``explode`` multiplies rows
  AFTER the filter so no pre-explosion blowup exists.
- packing is one window over (shard, id): a single shuffle on the shard
  key. Shards bound state: each window partition is one shard's documents,
  so at 100 TB you pick shards (source, date, hash-bucket) sized to a few
  GB and get thousands-wide parallelism; a global (unsharded) pack would
  serialize on one reducer and is deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.scalar import stable_hash_p31

#: micro-units per 1.0 of sampling fraction / mix weight (exact integer
#: thresholds — no float compare on either engine)
MICRO = 1_000_000


def _frac_micro(tag: str, id_col: str | Column) -> Column:
    """Deterministic per-row draw in [0, MICRO): p31 hash of tag:id.

    The mod-1e6 fold of the p31 residue is biased by < 0.05% (2147483647 =
    2147·1e6 + 483647) — negligible for corpus sampling and exactly
    mirrored by the oracle, which is what matters.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(F.lit(tag + ":"), c.cast("string"))
    return F.pmod(stable_hash_p31(key), F.lit(MICRO))


def sql_frac_micro(tag: str, id_sql: str) -> str:
    """DuckDB mirror of :func:`_frac_micro` for oracle construction."""
    return (
        f"(md5_number_lower('{tag}:' || CAST({id_sql} AS VARCHAR))"
        f" % 2147483647 % {MICRO})"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    tag: str = "sample-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row survives iff ``hash(tag:id) % 1e6 < fraction·1e6``.

    Unlike ``DataFrame.sampleBy`` (Bernoulli on a per-task RNG stream:
    resampled on stage retry, unverifiable cross-engine), the row SET here
    is a pure function of (tag, id) — stable under retries, reproducible
    in SQL, and a superset/subset relation holds between fractions (the
    0.25 sample is contained in the 0.5 sample), which makes ablation
    subsets nested for free.

    Scale: a narrow predicate on a hash of the id — no shuffle, no state;
    Catalyst keeps it in the scan stage.
    """
    for k, v in {**fractions, "<default>": default_fraction}.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    expr = None
    for k, v in fractions.items():
        micro = int(round(v * MICRO))
        expr = (
            F.when(F.col(strata_col) == k, F.lit(micro))
            if expr is None
            else expr.when(F.col(strata_col) == k, F.lit(micro))
        )
    frac = (
        expr.otherwise(F.lit(int(round(default_fraction * MICRO))))
        if expr is not None
        else F.lit(int(round(default_fraction * MICRO)))
    )
    return df.where(_frac_micro(tag, id_col) < frac)


def weighted_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    tag: str = "mix-v1",
    default_weight: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Epoch-weighted corpus mixing: a row with weight ``w`` appears
    ``floor(w)`` times plus one more with probability ``frac(w)`` —
    the standard way to oversample high-quality sources (weight 2.5 ⇒
    every doc twice, half the docs a third time) while downsampling noisy
    ones (weight 0.5 ⇒ half the docs once). Output adds ``copy_col``
    (0-based repeat index) so downstream shuffling/sharding can spread
    copies apart.

    The fractional draw reuses the :func:`stratified_sample` hash contract
    (deterministic, oracle-mirrored, nested across weights).

    Scale: filter-then-explode — rows with 0 repeats are dropped BEFORE
    the generator runs, and ``sequence`` builds at most ``ceil(w)``
    elements per row, so the blowup is exactly the configured epoch factor
    and stays a narrow (shuffle-free) stage.
    """
    for k, v in {**weights, "<default>": default_weight}.items():
        if v < 0.0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    wexpr = None
    for k, v in weights.items():
        micro = int(round(v * MICRO))
        wexpr = (
            F.when(F.col(strata_col) == k, F.lit(micro))
            if wexpr is None
            else wexpr.when(F.col(strata_col) == k, F.lit(micro))
        )
    w_micro = (
        wexpr.otherwise(F.lit(int(round(default_weight * MICRO))))
        if wexpr is not None
        else F.lit(int(round(default_weight * MICRO)))
    )
    full = F.call_function("div", w_micro, F.lit(MICRO))
    rem = F.pmod(w_micro, F.lit(MICRO))
    repeats = full + (_frac_micro(tag, id_col) < rem).cast("long")
    out = df.withColumn("__repeats", repeats).where(F.col("__repeats") > 0)
    # sequence(0, n-1) with n >= 1 only — Spark's sequence(0, -1) would
    # produce a DESCENDING [0, -1], not an empty array.
    return out.withColumn(
        copy_col, F.explode(F.sequence(F.lit(0), F.col("__repeats") - 1))
    ).drop("__repeats")


def chunk_pack(
    df: DataFrame,
    budget: int,
    token_col: str,
    shard_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk packing layout: within each shard, documents are
    concatenated in ``id_col`` order and the token stream is sliced into
    ``budget``-sized windows. Emits, per document:

    - ``start_off``  token offset of the doc's first token in the shard
      stream;
    - ``pack_id``    window index containing that first token;
    - ``pack_spans`` how many windows the doc straddles (≥ 1).

    This is the layout step of GPT-style pretraining ("pack sequences to
    the context length"); downstream writers group by (shard, pack_id) to
    emit fixed-size examples. Greedy no-straddle bin packing is a
    DIFFERENT op (needs sequential state per shard); the concat-chunk form
    is the one large pipelines actually use because it is embarrassingly
    windowable — one cumulative sum — and wastes zero tokens.

    Scale: ONE shuffle (window on shard/id); per-shard state is a running
    long. Shards must be bounded (source × date × hash-bucket at real
    scale) — that bound is the operator's parallelism AND its memory
    ceiling, and the caller owns choosing it.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("long")
    start = (F.sum(tok).over(w) - tok).alias("start_off")
    first = F.call_function("div", F.col("start_off"), F.lit(budget))
    last = F.call_function(
        "div",
        F.greatest(F.col("start_off") + tok - 1, F.col("start_off")),
        F.lit(budget),
    )
    return (
        df.withColumn("start_off", start)
        .withColumn("pack_id", first)
        .withColumn("pack_spans", last - F.col("pack_id") + 1)
    )


def pack_bins(
    df: DataFrame,
    budget: int,
    token_col: str,
    shard_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy NO-STRADDLE bin packing — the sequential-state complement of
    :func:`chunk_pack` (whose docstring promises it as a separate op): walk
    each shard's documents in ``id_col`` order, append a document to the
    current bin while it fits, otherwise open a new bin. No document ever
    crosses a bin boundary, which is the layout fine-tuning / eval
    pipelines need (an example must be one whole document sequence).

    Placement rule, shared bit-for-bit with the SQL oracle:
      new bin  ⟺  current_fill + n_tokens > budget  AND  current_fill > 0
    (the second clause keeps an oversized document — ``n_tokens > budget``
    — ALONE in its own bin instead of emitting an empty leading bin; the
    following document then always rolls over).

    Emits per document: ``bin_id`` (0-based per shard) and ``bin_off``
    (token offset inside its bin), APPENDED to the full input row — like
    ``chunk_pack``, every input column passes through (round-5 ADVICE:
    an earlier version projected down to id/shard/token and forced
    callers to re-join payloads). Invariants (property-tested): no bin
    exceeds ``budget`` unless it holds exactly one oversized document;
    ``bin_off`` is the running sum of its bin's predecessors; bin ids are
    dense from 0. Precisely: an over-budget bin holds exactly one
    token-bearing document — zero-token docs never advance the fill, so
    they can share any bin, including an oversized document's.

    Scale: the running (bin, fill) accumulator is inherently sequential,
    so parallelism = shards, exactly like ``chunk_pack``'s window — ONE
    shuffle on ``shard_col`` into ``applyInPandas`` (Arrow-batched, a
    single pass of integer bookkeeping per shard). The caller owns sizing
    shards (source × date × hash-bucket at 100 TB); a shard must fit one
    task's memory, which is the same contract every grouped-map op has.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    for c in (id_col, shard_col, token_col):
        if c not in df.columns:
            raise KeyError(f"column {c!r} not in DataFrame: {df.columns}")
    schema = StructType(
        list(df.schema.fields)
        + [StructField("bin_id", LongType()), StructField("bin_off", LongType())]
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_ids, offs = [], []
        bin_id, fill = 0, 0
        for n in pdf[token_col].astype("int64"):
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            bin_ids.append(bin_id)
            offs.append(fill)
            fill += n
        pdf["bin_id"] = bin_ids
        pdf["bin_off"] = offs
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, schema)


def group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    tag: str = "gsample-v1",
) -> DataFrame:
    """Deterministic uniform k-per-group sample: rank rows inside each
    group by a salted stable hash of the id and keep the k smallest —
    functionally a per-group reservoir sample (every row equally likely
    under the hash's uniformity) with the reservoir replaced by a
    rank-k cut, which makes it RE-RUNNABLE and cross-engine replayable
    (no RNG state, no scan order dependence). Adds ``sample_rank`` (1-based
    hash rank within the group).

    Scale: one hash per row (narrow map) + one shuffle on the group key;
    per-partition WindowGroupLimit pre-cuts each partition to its local
    top-k before the exchange, so the shuffle moves O(groups * k *
    partitions) rows at worst, not the corpus. The classic driver-side
    reservoir cannot do this distributedly without a merge step — the
    rank-cut form IS that merge, expressed relationally.
    """
    h = stable_hash_p31(
        F.concat(F.lit(tag + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    tag: str = "temp-v1",
) -> DataFrame:
    """Temperature-flattened source sampling with DATA-DERIVED rates:
    the kept corpus's per-stratum share is proportional to n_s^alpha
    (alpha < 1 flattens the source distribution — the standard
    multilingual/multi-source LM recipe), scaled so the smallest stratum
    keeps everything. Per-doc keep rate is therefore
    ``(n_min / n_s) ** (1 - alpha)``, micro-snapped, and the draw reuses
    the :func:`stratified_sample` hash contract (deterministic, nested,
    oracle-mirrored).

    Unlike :func:`weighted_mix` (static operator-supplied weights), the
    rates here come from the corpus itself: a stratum-count aggregate +
    1-row global min, broadcast-joined back — no driver collect, no
    config to drift out of sync with the data.

    Scale: one map-side-combining groupBy over the stratum key (output =
    |strata| rows), a 1-row min, and a broadcast join feeding a narrow
    hash predicate — the corpus-sized pass stays shuffle-free.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_s"))
    nmin = counts.agg(F.min("__n_s").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        strata_col,
        F.col("__n_s"),
        F.round(
            F.pow(
                F.col("__n_min").cast("double") / F.col("__n_s"),
                F.lit(1.0 - alpha),
            )
            * MICRO,
            0,
        )
        .cast("long")
        .alias("__rate_micro"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(_frac_micro(tag, id_col) < F.col("__rate_micro"))
        .drop("__n_s")
        .withColumnRenamed("__rate_micro", "rate_micro")
    )


def weighted_priority_sample(
    df: DataFrame, weight, k: int, id_col: str = "doc_id", salt: str = "res-v1"
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows by the UNIFORM-OVER-
    WEIGHT race: each row draws a deterministic hash-uniform h and the k
    smallest h/weight win. Heavier rows win monotonically more often
    (pairwise P(i beats j) = 1 - w_j/(2*w_i) for w_i >= w_j); the exact
    Efraimidis-Spirakis distribution would use the key -ln(u)/w, but ln
    is NOT correctly rounded identically across engines (JVM Math.log vs
    libm) — a one-ulp disagreement flips a FLOOR-snapped key with
    probability ~1e-5 per row, which across a corpus WILL desync an
    oracle. h/w is a single IEEE division, correctly rounded everywhere
    by spec, so the ordering (with the id tiebreak) is bit-deterministic
    cross-engine; the emitted columns are pure integers.

    Scale: ORDER BY + LIMIT plans as TakeOrderedAndProject — each
    partition keeps its local top-k and only k rows per partition reach
    the driver-side merge; no global sort, no full shuffle. This is the
    reservoir-sampling shape (one pass, bounded state) expressed
    declaratively.
    """
    from ..functions.scalar import stable_hash_u32

    w = (F.col(weight) if isinstance(weight, str) else weight).cast("long")
    h = stable_hash_u32(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    keyed = df.select(
        F.col(id_col),
        F.greatest(w, F.lit(1)).alias("w"),
        h.cast("long").alias("h"),
    )
    return keyed.orderBy(
        F.col("h").cast("double") / F.col("w"), F.col(id_col)
    ).limit(k)

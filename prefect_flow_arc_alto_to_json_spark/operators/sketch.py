"""Count-Min sketch as a RELATION: fixed-memory, mergeable frequency
estimation — the streaming/distributed complement of exact GROUP BY
counts and the `freqItems` gate.

The sketch is a (depth × width) counter matrix stored as (d, w, count)
rows. Build is one narrow explode (each input row contributes ``depth``
bucket increments) plus one map-side-combined groupBy — the matrix is at
most depth·width rows REGARDLESS of input size or key cardinality, which
is the whole point at 100 TB: per-partition sketches partial-aggregate
into the global one by plain SUM (the merge operation IS the shuffle
combine), and two corpora's sketches merge the same way after the fact.

Point estimate for a key = min over d of its bucket counts: always an
OVER-estimate (collisions only add), never under — the one-sided error
that makes CMS safe for threshold gates ("drop every shingle seen more
than K times") where an exact count would need unbounded state.

Hashes are the stable md5-derived residues used across the dedup stack
(functions/scalar.stable_hash_p31), salted per depth row, so the full
matrix and every estimate replay exactly in the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import stable_hash_p31

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(key: Column, d: int, width: int) -> Column:
    return F.pmod(
        stable_hash_p31(F.concat(F.lit(f"cms{d}:"), key)), F.lit(width)
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """(d, w, count): the sketch matrix. Mergeable: union two sketches and
    ``groupBy(d, w).sum(count)`` — identical to building over the union.

    ``weight_col``: build from a PRE-AGGREGATED (key, weight) relation —
    each row contributes ``weight`` to its ``depth`` buckets. Identical to
    building over the expanded rows (the cell count is a sum over keys
    either way), but the per-row md5 bucket hashes run once per DISTINCT
    key instead of once per input row — the right build whenever key
    cardinality is bounded (round-13, guide §2.3 "aggregate before you
    shuffle"); unbounded key streams keep the per-row path (weight=None).
    """
    key = F.col(key_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    _bucket(key, d, width).alias("w"),
                )
                for d in range(depth)
            ]
        )
    ).alias("c")
    if weight_col is None:
        return (
            df.select(cells)
            .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
            .agg(F.count(F.lit(1)).alias("count"))
        )
    return (
        df.select(cells, F.col(weight_col).alias("__w"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.sum("__w").alias("count"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key_col, n_est) per probe row: min over d of the key's bucket
    counts. The sketch side is depth·width rows at most — broadcast it;
    the probe side stays partitioned however it arrived."""
    key = F.col(key_col).cast("string")
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        _bucket(key, d, width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    return (
        probe_cells.join(F.broadcast(cms), ["d", "w"])
        .groupBy(key_col)
        .agg(F.min("count").alias("n_est"))
    )


from ..functions.selfship import self_ship  # noqa: E402


def misra_gries_heavy_hitters(
    items: DataFrame, col: str, k: int
) -> DataFrame:
    """Exact heavy hitters (count·k > N strictly) via the two-phase
    sketch-then-verify pattern: per-partition Misra-Gries summaries
    (k-1 counters, Arrow-batched, state carried across the partition's
    batches) nominate candidates, then ONE exact count pass over only
    the candidate set confirms.

    Why this is the 100 TB shape: a plain groupBy-HAVING shuffles one
    row per distinct item per partition (vocabulary-sized exchange);
    here the exchange carries ≤ (k-1) candidate rows per partition and
    the verify pass counts only the (broadcast-small) candidate set.
    The MG pigeonhole guarantee makes the composition EXACT despite the
    lossy sketch: an item with global count > N/k must exceed its local
    threshold in ≥1 partition, so the candidate union is a superset of
    every true heavy hitter and the final strict filter (count·k > N,
    pure integers — no division) returns exactly the plain GROUP BY
    HAVING answer on ANY partitioning. Returns (item, n).
    """
    import pandas as pd

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys())})

    cand = (
        items.select(F.col(col))
        .mapInPandas(mg, schema="item string")
        .distinct()
    )
    total = items.agg(F.count(col).alias("n_total"))
    counted = (
        items.join(
            F.broadcast(cand), items[col] == cand["item"], "left_semi"
        )
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("n") * k > F.col("n_total"))
        .select("item", "n")
    )


self_ship(__name__)


KMV_MOD = 2147483647  # hash space of stable_hash_p31


def kmv_sketch(
    df: DataFrame, key: Column | str, group_cols: list[str], k: int = 32
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch as a
    RELATION: per group, the k smallest DISTINCT md5-residue hashes of
    ``key`` — at most k rows per group regardless of cardinality.
    Completes the sketch family's cardinality corner with a sketch whose
    every byte is cross-engine deterministic (unlike HLL, whose estimate
    is engine-internal): union/merge = concatenate rows and re-take the
    bottom k, an associative, order-free fold, so fine-grain sketches
    roll up without rescanning the fact.

    Shape: one distinct-by-(group, h) shuffle, then a bounded per-group
    window (rank <= k). The distinct is the only data-sized exchange.
    """
    c = F.col(key) if isinstance(key, str) else key
    from pyspark.sql import Window

    h = stable_hash_p31(F.concat(F.lit("kmv-v1:"), c.cast("string")))
    hashed = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge_estimate(
    sketches: DataFrame, merge_to: list[str], k: int = 32
) -> DataFrame:
    """Merge finer-grain KMV sketch rows up to ``merge_to`` grain and
    estimate distinct counts: bottom-k of the unioned hash sets, then
    the classic KMV estimator ``(k-1) * M / h_k`` when the merged sketch
    is full, or the exact count of surviving hashes when not (fewer than
    k distinct keys — the sketch IS the exact set). Touches only sketch
    rows — never the fact table — which is the mergeability contract.

    The estimate is one double division of exact integers, rounded once:
    hash-exact across engines.
    """
    from pyspark.sql import Window

    merged = sketches.select(*merge_to, "h").distinct()
    w = Window.partitionBy(*merge_to).orderBy("h")
    topk = merged.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return topk.groupBy(*merge_to).agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("long")
        )
        .otherwise(
            F.round(F.lit(float(k - 1)) * F.lit(KMV_MOD) / F.max("h"), 0).cast(
                "long"
            )
        )
        .alias("est_kmv")
    )


def value_sample_sketch(
    df: DataFrame,
    val_col: str,
    id_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Bottom-k VALUE-SAMPLE sketch — the quantile corner of the sketch
    family (CMS = frequency, KMV/HLL = cardinality, MG = heavy hitters,
    this = distribution shape). Per group: the k rows whose row-identity
    md5 residue is smallest, CARRYING the value column. The hash induces
    a uniform random total order over rows, so the survivors are a simple
    random sample without replacement, and — the mergeability contract —
    min-k is associative: union finer sketches and re-take the bottom k
    to roll up to any coarser grain without rescanning the fact.

    Total order is (h, id) so hash collisions can never make the sample
    partition-order-dependent. One data-sized exchange (the group-key
    window); merges touch <= k rows per fine group forever after.
    """
    from pyspark.sql import Window

    h = stable_hash_p31(
        F.concat(F.lit("qsk-v1:"), F.col(id_col).cast("string"))
    )
    base = df.select(
        *group_cols,
        F.col(id_col).alias("sid"),
        F.col(val_col).alias("v"),
        h.alias("h"),
    )
    w = Window.partitionBy(*group_cols).orderBy("h", "sid")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def sample_merge_quantile(
    sketches: DataFrame, merge_to: list[str], k: int = 64, pct: int = 50
) -> DataFrame:
    """Merge value-sample sketches up to ``merge_to`` grain and read the
    ``pct``-th percentile as the merged sample's order statistic at
    position ceil(k_used * pct / 100) (ties broken by the sample's own
    (v, h, sid) total order — deterministic, engine-exact). Touches only
    sketch rows, never the fact. Rank error of a k-sample quantile is
    ~0.5/sqrt(k) at one sigma (k=64 -> ~6 percentile points), which the
    caller should surface as an oracle-checked rank tolerance.
    """
    from pyspark.sql import Window

    wm = Window.partitionBy(*merge_to).orderBy("h", "sid")
    merged = (
        sketches.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    cnt = merged.groupBy(*merge_to).agg(F.count(F.lit(1)).alias("k_used"))
    wv = Window.partitionBy(*merge_to).orderBy("v", "h", "sid")
    ranked = merged.withColumn("vr", F.row_number().over(wv)).join(
        cnt, merge_to
    )
    pos = F.call_function(
        "div", F.col("k_used") * pct + 99, F.lit(100).cast("long")
    )
    return ranked.where(F.col("vr") == pos).select(
        *merge_to, "k_used", F.col("v").alias("est_v")
    )

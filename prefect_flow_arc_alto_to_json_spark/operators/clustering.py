"""Deterministic distributed k-means (Lloyd) over embedding columns —
the hash-checkable sibling of similarity.kmeans_refine.

``kmeans_refine`` is the production float path (BLAS means via grouped
``applyInPandas``); its centroids are float means whose summation order
is engine- and partitioning-dependent, so it can never carry a value
oracle. This module trades the float mean for EXACT INTEGER arithmetic
so the whole iterative algorithm replays bit-identically in SQL — the
same determinism device as graph.pagerank (nano-snap before sum) and
sim_label_centroids (micro-unit component sums):

- every component is micro-unit snapped ONCE up front
  (``round(x * 1e6)`` as long — identical single double op per engine);
- assignment is argmax of the INTEGER dot product (64 long
  multiply-adds — |v| ≤ 2^20, so the dot is < 2^47·dim, exact), ties
  broken by smallest centroid id;
- the centroid update is a long component sum (exact) followed by
  round-half-up-toward-+inf division ``floor((2·s + n) / (2n))``
  computed as FLOOR of one double quotient: both operands are exact in
  double below 2^52, and a boundary quotient (exactly .5 away) makes
  the numerator an exact multiple of the denominator, so the FLOOR
  cannot straddle an ulp — engine-portable without a half-even/half-up
  fight.

Empty cells disappear (no member → no row in the next centroid
relation), the standard Lloyd simplification; the oracle replays it.

Scale: per iteration ONE broadcast join (corpus × k centroids — k·dim
longs, always broadcast) + ONE groupBy(cent_id) whose per-dimension
long sums combine map-side, so the exchange carries k·(dim+2) longs
per partition, never corpus rows. Centroids are localCheckpointed per
iteration (k rows) to truncate the growing lineage; the corpus
relation is checkpointed once. 3 or 300 iterations produce the same
per-iteration plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import half_up_units
from ..functions.scale import literal_df

MICRO = 1_000_000


def quantize_micro(df: DataFrame, vec_col: str, out_col: str = "xq") -> DataFrame:
    """array<float> → array<long> micro-units (round(x·1e6), half-away)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * MICRO, 0).cast("long"),
        ),
    )


#: Argmax centroid id for one vector against the collected centroid array
#: — columns ``xq`` (the row vector) and ``cs`` (array<struct<cent_id,cq>>):
#: integer dot similarity, ties to the SMALLEST centroid id, encoded as a
#: lexicographic array_max over (sim, -cent_id) structs so the result is
#: independent of the collect_list order. A SQL string (parsed JVM-side in
#: one round-trip, guide §7.3) — the single canonical definition; replaces
#: the round-12 join + groupBy(vid) + max_by assignment, which expanded the
#: corpus k-fold and shuffled it back per iteration (guide §2.4):
#: assignment is a NARROW map — corpus rows never leave their partition.
_BEST_CENT_SQL = (
    "-(array_max(transform(cs, cc -> named_struct("
    "'sim', aggregate(zip_with(xq, cc.cq, (x, y) -> x * y),"
    " CAST(0 AS BIGINT), (acc, x) -> acc + x),"
    " 'nid', -cc.cent_id))).nid)"
)


def kmeans_assign_micro(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means on micro-unit integers; returns the final assignment
    ``(vid, cent_id, n_cell)``.

    Seeds are the ``k`` lowest-id vectors (deterministic, the same seed
    rule as similarity.ivf_index); similarity is the integer dot (the
    corpus is assumed ~norm-comparable, as for the IVF quantizer — the
    point here is the replayable mechanism, argmax-of-inner-product).
    """
    c = quantize_micro(
        corpus.select(F.col(id_col).alias("vid"), vec_col), vec_col
    ).select("vid", "xq").localCheckpoint()
    cents = (
        c.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("cent_id"), F.col("xq").alias("cq"))
    )
    # Per-iteration relations are built from SQL STRINGS (parsed JVM-side)
    # rather than per-dimension Column expressions: the 64 component sums
    # + 64 centroid-update terms + the argmax HOF cost ~750 py4j
    # round-trips per iteration — plan CONSTRUCTION measured 2.5-4.5 s vs
    # 0.2-0.4 s execution at sf0.1 (round-13, guide §7.3; the
    # similarity._bucket_sql precedent). Resolved plans and values are
    # identical.
    sums = [F.expr(f"sum(xq[{d}]) AS s{d}") for d in range(dim)]
    upd = "array(%s) AS cq" % ", ".join(
        f"CAST(FLOOR((2.0 * s{d} + n) / (2.0 * n)) AS BIGINT)"
        for d in range(dim)
    )
    for _ in range(iterations):
        # centroids collapse to ONE row of structs; assignment is then a
        # broadcast + narrow argmax map — the corpus never shuffles on
        # vid (round-13, guide §2.4; the previous join + groupBy(vid) +
        # max_by expanded the corpus k-fold and shuffled it back every
        # iteration). Values unchanged: _BEST_CENT_SQL is the same
        # integer dot argmax with the same smallest-id tie-break.
        cs1 = cents.agg(
            F.expr("collect_list(struct(cent_id, cq))").alias("cs")
        )
        assigned = c.crossJoin(F.broadcast(cs1)).selectExpr(
            "vid", "xq", _BEST_CENT_SQL + " AS cent_id"
        )
        agg = assigned.groupBy("cent_id").agg(
            F.expr("count(1) AS n"), *sums
        )
        cents = agg.selectExpr("cent_id", upd).localCheckpoint(
            eager=False
        )  # k rows; materialized by the next pass
    cs_fin = cents.agg(F.expr("collect_list(struct(cent_id, cq))").alias("cs"))
    final = c.crossJoin(F.broadcast(cs_fin)).selectExpr(
        "vid", _BEST_CENT_SQL + " AS cent_id"
    )
    n_cell = final.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_cell"))
    # n_cell is k rows — broadcast, or Catalyst sort-merges two descendants
    # of the same aggregate
    return final.join(F.broadcast(n_cell), "cent_id").select(
        "vid", "cent_id", "n_cell"
    )


def _kmeans_chain_sql(
    k: int,
    iterations: int,
    dim: int,
    table: str,
    id_col: str,
    vec_col: str,
) -> tuple[list[str], str]:
    """Shared CTE chain xq→c0→(s,a,c)*→s→fin for the Lloyd replay;
    returns (parts, last_centroid_cte). ``fin`` is the final assignment,
    the last centroid CTE the relation distances are measured against.
    Built by ``.format``-free string assembly (the f-string/brace booby
    trap from the q_zorder_index incident)."""
    parts = [
        "WITH xq AS (",
        f"  SELECT {id_col} AS vid, i - 1 AS d,",
        f"         CAST(ROUND({vec_col}[i]::DOUBLE * {MICRO}) AS BIGINT) AS v",
        f"  FROM {table}, range(1, {dim + 1}) AS t(i)",
        "),",
        "c0 AS (",
        "  SELECT vid AS cent_id, d, v AS cv FROM xq",
        "  WHERE vid IN (SELECT DISTINCT vid FROM xq ORDER BY vid"
        f" LIMIT {k})",
        "),",
    ]
    prev = "c0"
    for t in range(1, iterations + 1):
        parts += [
            f"s{t} AS (",
            "  SELECT x.vid, c.cent_id, SUM(x.v * c.cv) AS sim",
            f"  FROM xq x JOIN {prev} c ON x.d = c.d",
            "  GROUP BY x.vid, c.cent_id",
            "),",
            f"a{t} AS (",
            "  SELECT vid, cent_id FROM (",
            "    SELECT vid, cent_id, ROW_NUMBER() OVER (",
            "      PARTITION BY vid ORDER BY sim DESC, cent_id ASC",
            "    ) AS rn",
            f"    FROM s{t}",
            "  ) WHERE rn = 1",
            "),",
            f"c{t} AS (",
            "  SELECT a.cent_id, x.d,",
            "         CAST(FLOOR((2.0 * SUM(x.v) + COUNT(*))"
            " / (2.0 * COUNT(*))) AS BIGINT) AS cv",
            f"  FROM a{t} a JOIN xq x ON x.vid = a.vid",
            "  GROUP BY a.cent_id, x.d",
            "),",
        ]
        prev = f"c{t}"
    t = iterations + 1
    parts += [
        f"s{t} AS (",
        "  SELECT x.vid, c.cent_id, SUM(x.v * c.cv) AS sim",
        f"  FROM xq x JOIN {prev} c ON x.d = c.d",
        "  GROUP BY x.vid, c.cent_id",
        "),",
        "fin AS (",
        "  SELECT vid, cent_id FROM (",
        "    SELECT vid, cent_id, ROW_NUMBER() OVER (",
        "      PARTITION BY vid ORDER BY sim DESC, cent_id ASC",
        "    ) AS rn",
        f"    FROM s{t}",
        "  ) WHERE rn = 1",
        ")",
    ]
    return parts, prev


def kmeans_oracle_sql(
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB replay: iterations unrolled as CTE chain c0→a1→c1→…,
    dot products via the exploded (vid, d, v) relation."""
    parts, _ = _kmeans_chain_sql(k, iterations, dim, table, id_col, vec_col)
    parts += [
        "SELECT f.vid, f.cent_id, CAST(n.n_cell AS BIGINT) AS n_cell",
        "FROM fin f JOIN (",
        "  SELECT cent_id, COUNT(*) AS n_cell FROM fin GROUP BY cent_id",
        ") n ON n.cent_id = f.cent_id",
    ]
    return "\n".join(parts)


#: Silhouette distance downshift: squared micro distances are floored by
#: 2^20 before the ppm division so 2·d²·10⁶ stays far inside long range
#: (|v| ≤ 2^20 micro ⇒ d² ≤ dim·2^42 ≈ 2^48; shifted ≤ 2^28).
_SIL_SHIFT = 1 << 20


def silhouette_oracle_sql(
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of the per-cluster simplified silhouette: the full
    Lloyd chain (shared with kmeans_oracle_sql), then per-vector squared
    micro distances to every FINAL centroid, a(i) to the own cell and
    b(i) the min over other cells, s(i) = (b−a)/max(a,b) as a signed
    half-up ppm of the 2^20-shifted integers, rolled up per cell."""
    parts, cfin = _kmeans_chain_sql(k, iterations, dim, table, id_col, vec_col)
    # fin's closing ")" needs a comma to continue the WITH chain.
    parts[-1] = "),"
    parts += [
        "dists AS (",
        "  SELECT x.vid, c.cent_id,",
        "         SUM((x.v - c.cv) * (x.v - c.cv)) AS d2",
        f"  FROM xq x JOIN {cfin} c ON x.d = c.d",
        "  GROUP BY x.vid, c.cent_id",
        "),",
        "ab AS (",
        "  SELECT d.vid, f.cent_id,",
        f"    MAX(CASE WHEN d.cent_id = f.cent_id THEN d.d2 END) // {_SIL_SHIFT}"
        " AS ad,",
        f"    MIN(CASE WHEN d.cent_id <> f.cent_id THEN d.d2 END) // {_SIL_SHIFT}"
        " AS bd",
        "  FROM dists d JOIN fin f ON f.vid = d.vid",
        "  GROUP BY d.vid, f.cent_id",
        "),",
        "sp AS (",
        "  SELECT vid, cent_id,",
        "    CASE WHEN greatest(ad, bd) = 0 THEN 0",
        "         WHEN bd >= ad THEN",
        "           (2 * (bd - ad) * 1000000 + greatest(ad, bd))",
        "             // (2 * greatest(ad, bd))",
        "         ELSE",
        "           -((2 * (ad - bd) * 1000000 + greatest(ad, bd))",
        "             // (2 * greatest(ad, bd)))",
        "    END AS s_ppm",
        "  FROM ab",
        ")",
        "SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_cell,",
        "  CAST(SUM(s_ppm) AS BIGINT) AS sum_s_ppm,",
        "  CAST(CASE WHEN SUM(s_ppm) >= 0 THEN",
        "         (2 * SUM(s_ppm) + COUNT(*)) // (2 * COUNT(*))",
        "       ELSE",
        "         -((2 * -SUM(s_ppm) + COUNT(*)) // (2 * COUNT(*)))",
        "       END AS BIGINT) AS mean_s_ppm",
        "FROM sp GROUP BY cent_id",
    ]
    return "\n".join(parts)


def kmeans_silhouette_micro(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster SIMPLIFIED silhouette of the deterministic Lloyd
    clustering — cluster-validity index as a value-oracled relation
    ``(cent_id, n_cell, sum_s_ppm, mean_s_ppm)``.

    Simplified silhouette measures each point against CENTROIDS, not
    all co-members (Hruschka et al.'s standard O(N·k) form of
    Rousseeuw's O(N²) original — the only form that scales): a(i) is
    the squared micro distance to the own centroid, b(i) the min over
    the other k−1, s(i) = (b−a)/max(a,b) ∈ [−1, 1]. SQUARED distance
    (not its root) keeps every term an exact long — the sqrt variant
    would put both engines' libm on a rounding boundary; the variant
    choice is documented, deterministic, and order-preserving in the
    well-separated regime. Both a and b are floored by 2^20 before the
    single signed half-up ppm division (headroom: see _SIL_SHIFT);
    min-then-shift equals shift-then-min because floor division is
    monotone, and both engines shift the aggregate.

    Scale: the Lloyd loop is kmeans_assign_micro's (broadcast k·dim
    centroids, map-side-combining component sums); the silhouette adds
    ONE more broadcast of the collected centroid row and a NARROW array
    map computing the argmax assignment, a(i), and the k-element
    (sim, nid, d2) array per point — no corpus shuffle at all (the
    round-12 version paid a groupBy(vid) exchange here) — b(i) is an
    order-free array_min over a filter. The rollup is a k-row
    aggregate. Corpus rows never leave their scan partitions.
    """
    c = quantize_micro(
        corpus.select(F.col(id_col).alias("vid"), vec_col), vec_col
    ).select("vid", "xq").localCheckpoint()
    cents = (
        c.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("cent_id"), F.col("xq").alias("cq"))
    )
    # SQL-string construction throughout — same py4j/analysis rationale
    # (and identical resolved plans) as kmeans_assign_micro above.
    sums = [F.expr(f"sum(xq[{d}]) AS s{d}") for d in range(dim)]
    upd = "array(%s) AS cq" % ", ".join(
        f"CAST(FLOOR((2.0 * s{d} + n) / (2.0 * n)) AS BIGINT)"
        for d in range(dim)
    )
    for _ in range(iterations):
        # centroids collapse to ONE row of structs; assignment is then a
        # broadcast + narrow argmax map — the corpus never shuffles on
        # vid (round-13, guide §2.4; the previous join + groupBy(vid) +
        # max_by expanded the corpus k-fold and shuffled it back every
        # iteration). Values unchanged: _BEST_CENT_SQL is the same
        # integer dot argmax with the same smallest-id tie-break.
        cs1 = cents.agg(
            F.expr("collect_list(struct(cent_id, cq))").alias("cs")
        )
        assigned = c.crossJoin(F.broadcast(cs1)).selectExpr(
            "vid", "xq", _BEST_CENT_SQL + " AS cent_id"
        )
        agg = assigned.groupBy("cent_id").agg(
            F.expr("count(1) AS n"), *sums
        )
        cents = agg.selectExpr("cent_id", upd).localCheckpoint(
            eager=False
        )  # k rows; materialized by the next pass
    div = F.call_function
    # the per-point (sim, -cent_id, d2) triple against EVERY centroid as a
    # narrow array map over the broadcast centroid row — the round-12
    # version shuffled the k-fold expanded corpus through a groupBy(vid)
    # to compute own/a2/ds (guide §2.4). array_max over (sim, nid, d2)
    # structs is the same argmax/tie-break as max_by(struct(sim,
    # -cent_id)); d2 can never decide (one d2 per cent_id). All terms
    # stay exact longs; every downstream use of ds is order-free.
    cs_fin = cents.agg(F.expr("collect_list(struct(cent_id, cq))").alias("cs"))
    trip_sql = (
        "transform(cs, cc -> named_struct("
        "'sim', aggregate(zip_with(xq, cc.cq, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x),"
        " 'nid', -cc.cent_id,"
        " 'd2', aggregate(zip_with(xq, cc.cq, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)))"
    )
    per = (
        c.crossJoin(F.broadcast(cs_fin))
        .selectExpr("vid", trip_sql + " AS ds")
        .selectExpr("vid", "ds", "array_max(ds) AS bst")
    )
    ab = per.selectExpr(
        "vid",
        "-(bst.nid) AS cent_id",
        f"div(bst.d2, {_SIL_SHIFT}) AS ad",
        "div(array_min(transform(filter(ds, x -> x.nid != bst.nid),"
        f" x -> x.d2)), {_SIL_SHIFT}) AS bd",
    )
    mx = F.greatest("ad", "bd")
    num = F.col("bd") - F.col("ad")
    mag = div("div", 2 * F.abs(num) * 1_000_000 + mx, 2 * mx)
    sp = ab.select(
        "cent_id",
        F.when(mx == 0, F.lit(0).cast("long"))
        .otherwise(F.when(num >= 0, mag).otherwise(-mag))
        .alias("s_ppm"),
    )
    s_sum = F.sum("s_ppm")
    n = F.count(F.lit(1))
    mean_mag = div("div", 2 * F.abs(s_sum) + n, 2 * n)
    return sp.groupBy("cent_id").agg(
        n.cast("long").alias("n_cell"),
        s_sum.cast("long").alias("sum_s_ppm"),
        F.when(s_sum >= 0, mean_mag)
        .otherwise(-mean_mag)
        .cast("long")
        .alias("mean_s_ppm"),
    )


def farthest_point_sample(
    corpus: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy farthest-point (k-center) sampling on micro-unit integers:
    seed with the lowest id, then repeatedly add the vector maximizing
    its MINIMUM squared distance to the chosen set (ties → lowest id) —
    the diverse-subset selection used for coreset construction and
    "cover the embedding space" data curation, where random sampling
    oversamples dense modes.

    Determinism: distances are exact integer sums of (xᵢ−cᵢ)² over
    micro-unit longs, the argmax is totally ordered, and each round's
    winner is ONE driver scalar (the components/pagerank small-collect
    precedent) — so the k-round greedy unrolls into an exact SQL replay.

    Scale: each round is one broadcast of ≤k chosen vectors × one
    map-side min-distance scan + a 1-row argmax (TakeOrdered) — k scans
    total, no state on the driver beyond k (id, vector) pairs. Returns
    (sample_rank, vid, min_dist2) — min_dist2 NULL for the seed.
    """
    c = quantize_micro(
        corpus.select(F.col(id_col).alias("vid"), vec_col), vec_col
    ).select("vid", "xq").localCheckpoint()
    seed = c.orderBy("vid").limit(1).select("vid", "xq").first()
    chosen = [(seed["vid"], seed["xq"], None)]
    for _ in range(k - 1):
        cdf = F.broadcast(
            literal_df(
                c.sparkSession,
                "cvid long, cq array<long>",
                [(v, x) for v, x, _ in chosen],
            )
        )
        dist2 = F.aggregate(
            F.zip_with(F.col("xq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        nxt = (
            c.join(cdf)
            .select("vid", "xq", dist2.alias("d2"))
            .groupBy("vid")
            .agg(F.min("d2").alias("mind2"), F.first("xq").alias("xq"))
            .where(~F.col("vid").isin([v for v, _, _ in chosen]))
            .orderBy(F.col("mind2").desc(), F.col("vid"))
            .limit(1)
            .first()
        )
        chosen.append((nxt["vid"], nxt["xq"], nxt["mind2"]))
    spark = corpus.sparkSession
    # literal_df, not createDataFrame: no Python-RDD backing (round-13)
    return literal_df(
        spark,
        "sample_rank int, vid long, min_dist2 long",
        [(i + 1, v, d) for i, (v, _, d) in enumerate(chosen)],
    )


def fps_oracle_sql(
    k: int = 6,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Unrolled SQL replay of :func:`farthest_point_sample`: per round,
    min-distance over the chosen-so-far union and a LIMIT-1 argmax."""
    parts = [
        "WITH xq AS (",
        f"  SELECT {id_col} AS vid, i - 1 AS d,",
        f"         CAST(ROUND({vec_col}[i]::DOUBLE * {MICRO}) AS BIGINT) AS v",
        f"  FROM {table}, range(1, {dim + 1}) AS t(i)",
        "),",
        "s1 AS (",
        "  SELECT vid, CAST(NULL AS BIGINT) AS mind2 FROM (",
        "    SELECT DISTINCT vid FROM xq ORDER BY vid LIMIT 1",
        "  )",
        "),",
    ]
    for t in range(2, k + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT vid FROM s{i}" for i in range(1, t)
        )
        parts += [
            f"ch{t} AS ({prev_union}),",
            f"d{t} AS (",
            "  SELECT x.vid, c.vid AS cvid, SUM((x.v - cx.v) * (x.v - cx.v))"
            " AS d2",
            f"  FROM xq x, ch{t} c",
            "  JOIN xq cx ON cx.vid = c.vid",
            "  WHERE cx.d = x.d",
            "  GROUP BY x.vid, c.vid",
            "),",
            f"s{t} AS (",
            "  SELECT vid, mind2 FROM (",
            "    SELECT vid, MIN(d2) AS mind2",
            f"    FROM d{t}",
            f"    WHERE vid NOT IN (SELECT vid FROM ch{t})",
            "    GROUP BY vid",
            "  ) ORDER BY mind2 DESC, vid LIMIT 1",
            "),",
        ]
    sel = " UNION ALL ".join(
        f"SELECT {i} AS sample_rank, vid, mind2 AS min_dist2 FROM s{i}"
        for i in range(1, k + 1)
    )
    parts.append(sel.replace("),", ")"))
    out = "\n".join(parts)
    # strip the trailing comma of the last CTE before the final SELECT
    idx = out.rfind("),\nSELECT")
    if idx != -1:
        out = out[:idx] + ")\n" + out[idx + 3 :]
    return out


def gram_matrix_milli(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Exact integer gram matrix of the milli-snapped embedding corpus:
    (i, j, g) with g = Σ_v round(v_i·1e3)·round(v_j·1e3) as longs —
    1-based dims, all dim² entries.

    The kernel is ``mapInArrow``: each Arrow batch reshapes to an int64
    (n, dim) matrix and emits ONE dim²-row partial E.T@E — integer sums
    are associative, so any batch/partition split reproduces the same
    longs and the relation stays value-oracle-able (the pure-SQL twin
    pair-explodes 64²× per row; BLAS-shaped partials are the 100 TB
    plan: the exchange carries dim² longs per partition, never corpus
    rows). Long headroom: |g| ≤ N·(max|v|·1e3)² — ~2^34 per million
    rows at |v|≤2 — so the int64 partials hold to ~10^9 rows; beyond
    that snap coarser or move the final reduce to DECIMAL(38).
    """
    import pyarrow as pa

    def partials(batches):
        import numpy as np

        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for batch in batches:
            col = batch.column(batch.schema.get_field_index(vec_col))
            n = len(col)
            if n == 0:
                continue
            values = np.asarray(col.values, dtype=np.float64)
            offsets = np.asarray(col.offsets)
            lens = offsets[1:] - offsets[:-1]
            if col.null_count or lens.min() != dim or lens.max() != dim:
                raise ValueError(
                    f"gram_matrix_milli requires non-null uniform "
                    f"{dim}-dim vectors"
                )
            m = values[offsets[0] : offsets[-1]].reshape(n, dim) * 1000.0
            # half-AWAY rounding (matching SQL ROUND) — np.round is
            # half-even and would diverge on exact .5 boundaries
            mq = (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)
            acc += mq.T @ mq
            seen = True
        if seen:
            ii, jj = np.meshgrid(
                np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ii.ravel(), type=pa.int32()),
                    pa.array(jj.ravel(), type=pa.int32()),
                    pa.array(acc.ravel(), type=pa.int64()),
                ],
                names=["i", "j", "g"],
            )

    part = emb.select(vec_col).mapInArrow(partials, schema="i int, j int, g long")
    return part.groupBy("i", "j").agg(F.sum("g").alias("g"))


def _signed_shift(val, divisor):
    """sign(val)·(|val| div divisor) — truncating signed right-shift,
    identical in Spark and DuckDB (both truncate positive ``div``)."""
    mag = F.call_function("div", F.abs(val), divisor)
    return F.when(val >= 0, mag).otherwise(-mag)


def _signed_half_up(val, den, mul: int):
    """Half-away-from-zero integer (val·mul/den) for positive den — the
    assortativity device: half-up on |val|, sign restored."""
    mag = half_up_units(F.abs(val), den, mul)
    return F.when(val >= 0, mag).otherwise(-mag)


def pca_top_component_micro(
    emb: DataFrame,
    iterations: int = 2,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Dominant principal direction of the (uncentered) gram matrix by
    POWER ITERATION in exact integer arithmetic: (dim, loading_micro),
    the max-abs component pinned to ±1e6.

    The data-sized work is ONE gram pass (gram_matrix_milli); every
    iteration after runs on the constant dim²-row relation: u = G_r·v
    (join on j + map-side-combined groupBy i), then renormalize to
    micro-units by the max-|u| 1-row broadcast. G is first right-shifted
    by the SAME data-derived divisor in both engines (R = max(1,
    max|g| div 1e10)) so |G_r·v| stays ≤ dim·1e10·1e6 ≈ 2^59 for ANY
    corpus size — the assortativity overflow valve applied to a matrix.
    Starting vector all-ones·1e6; fixed iteration count keeps the
    relation replayable (callers loop externally for convergence).
    """
    gram = gram_matrix_milli(emb, vec_col, dim).localCheckpoint()
    mx = gram.agg(F.max(F.abs(F.col("g"))).alias("mxg"))
    gr = (
        gram.crossJoin(F.broadcast(mx))
        .select(
            "i",
            "j",
            _signed_shift(
                F.col("g"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.call_function("div", F.col("mxg"), F.lit(10_000_000_000)),
                ),
            ).alias("g"),
        )
        .localCheckpoint()
    )
    v = gr.select(F.col("i").alias("vj")).distinct().select(
        "vj", F.lit(MICRO).cast("long").alias("v")
    )
    for _ in range(iterations):
        u = (
            gr.join(v.hint("shuffle_hash"), gr["j"] == v["vj"])
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        # |u| ≤ dim·1e10·1e6 ≈ 2^59, so the half-up numerator 2·|u|·1e6
        # would overflow a long: right-shift u AND m by the same
        # data-derived s = max(1, m div 1e9) first (both engines shift
        # the identical integers; relative error ~1e-9, three orders
        # below micro granularity — the assortativity valve again)
        v = (
            u.crossJoin(F.broadcast(m))
            .select(
                "i",
                "u",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.call_function("div", F.col("m"), F.lit(1_000_000_000)),
                ).alias("s"),
                F.col("m"),
            )
            .select(
                F.col("i").alias("vj"),
                _signed_half_up(
                    _signed_shift(F.col("u"), F.col("s")),
                    F.greatest(
                        F.call_function("div", F.col("m"), F.col("s")),
                        F.lit(1).cast("long"),
                    ),
                    MICRO,
                ).alias("v"),
            )
            .localCheckpoint()
        )
    return v.select(F.col("vj").alias("dim"), F.col("v").alias("loading_micro"))


def pca_cte_sql(iterations: int = 2, dim: int = 64) -> str:
    """The unrolled pca_top_component_micro CTE chain (ex → gm → gr →
    v0 → u1/m1/v1 → …), WITHOUT the WITH keyword or final SELECT — so
    downstream oracles (projection, whitening) can append their own
    CTEs against `ex` and the final `v{iterations}`."""
    parts = [
        "ex AS (",
        "  SELECT vec_id, u.dim AS i,",
        "         CAST(ROUND(u.val * 1000) AS BIGINT) AS x",
        "  FROM (",
        f"    SELECT vec_id, unnest(range(1, {dim + 1})) AS dim,",
        "           unnest(embedding::DOUBLE[]) AS val",
        "    FROM embeddings",
        "  ) u",
        "),",
        "gm AS (",
        "  SELECT a.i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS g",
        "  FROM ex a JOIN ex b USING (vec_id) GROUP BY a.i, b.i",
        "),",
        "r AS (SELECT GREATEST(CAST(1 AS BIGINT),",
        "             MAX(ABS(g)) // 10000000000) AS rr FROM gm),",
        "gr AS (SELECT i, j, CASE WHEN g >= 0 THEN g // rr",
        "                         ELSE -((-g) // rr) END AS g FROM gm, r),",
        "v0 AS (SELECT DISTINCT i AS vj, CAST(1000000 AS BIGINT) AS v"
        " FROM gr),",
    ]
    for t in range(1, iterations + 1):
        parts += [
            f"u{t} AS (",
            "  SELECT gr.i, CAST(SUM(gr.g * v.v) AS BIGINT) AS u",
            f"  FROM gr JOIN v{t - 1} v ON v.vj = gr.j GROUP BY gr.i",
            "),",
            f"m{t} AS (SELECT MAX(ABS(u)) AS m,",
            "             GREATEST(CAST(1 AS BIGINT),",
            "                      MAX(ABS(u)) // 1000000000) AS s",
            f"      FROM u{t}),",
            f"v{t} AS (",
            "  SELECT i AS vj, CASE WHEN u >= 0",
            "    THEN (2 * (ABS(u) // s) * 1000000 + GREATEST(m // s, 1))",
            "         // (2 * GREATEST(m // s, 1))",
            "    ELSE -((2 * (ABS(u) // s) * 1000000 + GREATEST(m // s, 1))",
            "           // (2 * GREATEST(m // s, 1))) END AS v",
            f"  FROM u{t}, m{t}",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")  # close the final CTE cleanly
    return "\n".join(parts)


def pca_oracle_sql(iterations: int = 2, dim: int = 64) -> str:
    """Full SQL replay of pca_top_component_micro: the CTE chain plus
    the (dim, loading_micro) final SELECT (the pagerank/kmeans unroll
    applied to a matrix recurrence)."""
    return (
        "WITH "
        + pca_cte_sql(iterations, dim)
        + f"\nSELECT CAST(vj AS INTEGER) AS dim, v AS loading_micro"
        f" FROM v{iterations}"
    )


from ..functions.selfship import self_ship  # noqa: E402

# gram_matrix_milli's Arrow kernel executes on workers — ship by value.
self_ship(__name__)


def pca_project_micro(
    emb: DataFrame,
    loadings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every vector onto a learned component: (vec_id, proj)
    with proj = Σ_i round(v_i·1e3)·loading_micro(i) — exact longs
    (|proj| ≤ dim·2e3·1e6 ≈ 2^37), the transform half of the PCA fit.

    Scale: posexplode is a narrow dim× fan-out; the loadings relation is
    dim rows and broadcast; the per-vector reduce is one map-side
    combining groupBy on the id — vectors never shuffle."""
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim0", "val"
        ),
    ).select(
        "vid",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("val") * 1000, 0).cast("long").alias("x"),
    )
    return (
        v.join(F.broadcast(loadings), "dim")
        .groupBy("vid")
        .agg(F.sum(F.col("x") * F.col("loading_micro")).alias("proj"))
        .select(F.col("vid").alias(id_col), "proj")
    )


# ---------------------------------------------------------------------------
# Logistic regression by distributed gradient descent
# ---------------------------------------------------------------------------

LOGREG_LR = 4.0
LOGREG_DIMS = 4


def _z_expr(ws: list, xs: list):
    """Left-associated ((w0 + w1*x1) + w2*x2) + ... — the SAME textual
    order as the oracle, so the double sum rounds identically."""
    z = ws[0]
    for w, x in zip(ws[1:], xs):
        z = z + w * x
    return z / F.lit(1_000_000.0)


def logreg_gd(emb: DataFrame, dims: int = LOGREG_DIMS) -> DataFrame:
    """Binary logistic regression (y = label mod 2 on the first ``dims``
    embedding components + bias) fit by TWO unrolled synchronous
    gradient-descent steps from w=0 — the iterative-ML representative
    beside the closed-form OLS fit (q_ols_regression): when the loss has
    no normal equations, the distributed shape is per-row gradient
    contributions -> ONE map-side-combining aggregate per step -> a
    1-row weight relation broadcast into the next step. The whole fit +
    final training accuracy is ONE lazy plan: no driver-side state, no
    collect between iterations.

    Determinism (the pagerank device, applied to SGD): step 1 from w=0
    has sigmoid(0) = 1/2 EXACTLY, so residuals are exact integers; each
    per-row gradient term ``round(resid_micro * x_j * 1000)`` snaps to
    nano BEFORE the order-free long sum; weight updates divide once in
    double and snap to micro. Step 2's sigmoid is the one genuinely
    float op: z is a fixed-order 5-term double sum of exact values, and
    ``round(1e6 * sigmoid(z))`` straddles a .5 boundary only on a
    measure-zero set (the ln/exp precedent of the LM scores).

    At 100 TB: each step is one scan + one tiny exchange (d+1 longs per
    partition); d more dims or k more steps add columns/stages, never
    shuffled rows. Sub-sampled minibatch GD drops in by hash-filtering
    the scan per step (text_train_val_split's device).
    """
    xs = [
        F.col("embedding")[j].cast("double").alias(f"x{j + 1}")
        for j in range(dims)
    ]
    r = emb.select((F.col("label") % 2).cast("long").alias("y"), *xs)
    xcols = [F.col(f"x{j + 1}") for j in range(dims)]
    n = r.agg(F.count(F.lit(1)).alias("n"))

    def grads(rel, resid, tag: str):
        aggs = [F.sum((resid * 1000).cast("long")).alias(f"{tag}0")]
        aggs += [
            F.sum(F.round(resid * x * 1000, 0).cast("long")).alias(
                f"{tag}{j + 1}"
            )
            for j, x in enumerate(xcols)
        ]
        return rel.agg(*aggs)

    def step(prev_w: list, grel, gtag: str, wtag: str):
        cols = []
        for j in range(dims + 1):
            delta = F.round(
                F.lit(LOGREG_LR)
                * F.col(f"{gtag}{j}")
                / (F.col("n") * F.lit(1000.0)),
                0,
            ).cast("long")
            base = prev_w[j] if prev_w else F.lit(0).cast("long")
            cols.append((base - delta).alias(f"{wtag}{j}"))
        return grel.crossJoin(F.broadcast(n)).select(*cols)

    g1 = grads(r, F.lit(500000) - F.col("y") * 1000000, "g")
    w1 = step([], g1, "g", "a")
    a = [F.col(f"a{j}") for j in range(dims + 1)]
    s2 = r.crossJoin(F.broadcast(w1)).withColumn(
        "p",
        F.round(
            F.lit(1_000_000.0) / (F.lit(1) + F.exp(-_z_expr(a, xcols))), 0
        ).cast("long"),
    )
    g2 = grads(s2, F.col("p") - F.col("y") * 1000000, "h")
    w2 = step(a, g2.crossJoin(F.broadcast(w1)), "h", "b")
    b = [F.col(f"b{j}") for j in range(dims + 1)]
    acc = (
        r.crossJoin(F.broadcast(w2))
        .agg(
            F.sum(
                F.when(
                    (_z_expr(b, xcols) >= 0) == (F.col("y") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("correct")
        )
    )
    out = n.crossJoin(w2).crossJoin(acc)
    return out.select(
        "n",
        *[F.col(f"b{j}").alias(f"b{j}_micro") for j in range(dims + 1)],
        "correct",
    )


def logreg_oracle_sql(dims: int = LOGREG_DIMS) -> str:
    """DuckDB replay of :func:`logreg_gd` — identical snapping, identical
    operand order in every float expression."""
    xs = ", ".join(
        f"CAST(embedding[{j + 1}] AS DOUBLE) AS x{j + 1}" for j in range(dims)
    )
    z_a = "a0"
    z_b = "b0"
    for j in range(dims):
        z_a += f" + a{j + 1} * x{j + 1}"
        z_b += f" + b{j + 1} * x{j + 1}"
    g1 = "CAST(SUM((500000 - y * 1000000) * 1000) AS BIGINT) AS g0, " + ", ".join(
        f"CAST(SUM(CAST(ROUND((500000 - y * 1000000) * x{j + 1} * 1000)"
        f" AS BIGINT)) AS BIGINT) AS g{j + 1}"
        for j in range(dims)
    )
    w1 = ", ".join(
        f"CAST(0 - ROUND({LOGREG_LR} * g{j} / (n * 1000.0)) AS BIGINT) AS a{j}"
        for j in range(dims + 1)
    )
    g2 = "CAST(SUM((p - y * 1000000) * 1000) AS BIGINT) AS h0, " + ", ".join(
        f"CAST(SUM(CAST(ROUND((p - y * 1000000) * x{j + 1} * 1000)"
        f" AS BIGINT)) AS BIGINT) AS h{j + 1}"
        for j in range(dims)
    )
    w2 = ", ".join(
        f"CAST(a{j} - ROUND({LOGREG_LR} * h{j} / (n * 1000.0)) AS BIGINT)"
        f" AS b{j}"
        for j in range(dims + 1)
    )
    outw = ", ".join(f"w2.b{j} AS b{j}_micro" for j in range(dims + 1))
    return f"""
    WITH r AS (
      SELECT CAST(label % 2 AS BIGINT) AS y, {xs} FROM embeddings
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
    g1 AS (SELECT {g1} FROM r),
    w1 AS (SELECT {w1} FROM g1 CROSS JOIN nn),
    s2 AS (
      SELECT y, {", ".join(f"x{j + 1}" for j in range(dims))},
             CAST(ROUND(1000000.0
                        / (1 + exp(-(({z_a}) / 1000000.0)))) AS BIGINT) AS p
      FROM r CROSS JOIN w1
    ),
    g2 AS (SELECT {g2} FROM s2),
    w2 AS (SELECT {w2} FROM w1 CROSS JOIN g2 CROSS JOIN nn),
    acc AS (
      SELECT CAST(SUM(CASE WHEN ((({z_b}) / 1000000.0) >= 0) = (y = 1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS correct
      FROM r CROSS JOIN w2
    )
    SELECT nn.n, {outw}, acc.correct
    FROM nn CROSS JOIN w2 CROSS JOIN acc
    """

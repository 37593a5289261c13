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


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
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
    sums = [F.sum(F.col("xq")[d]).alias(f"s{d}") for d in range(dim)]
    for _ in range(iterations):
        assigned = (
            c.join(F.broadcast(cents))
            .select(
                "vid",
                "xq",
                "cent_id",
                _int_dot(F.col("xq"), F.col("cq")).alias("sim"),
            )
            .groupBy("vid")
            .agg(
                F.max_by(
                    "cent_id", F.struct(F.col("sim"), -F.col("cent_id"))
                ).alias("cent_id"),
                F.first("xq").alias("xq"),
            )
        )
        agg = assigned.groupBy("cent_id").agg(
            F.count(F.lit(1)).alias("n"), *sums
        )
        cents = agg.select(
            "cent_id",
            F.array(
                *[
                    F.floor(
                        (2.0 * F.col(f"s{d}") + F.col("n"))
                        / (2.0 * F.col("n"))
                    ).cast("long")
                    for d in range(dim)
                ]
            ).alias("cq"),
        ).localCheckpoint()
    final = (
        c.join(F.broadcast(cents))
        .select(
            "vid",
            "cent_id",
            _int_dot(F.col("xq"), F.col("cq")).alias("sim"),
        )
        .groupBy("vid")
        .agg(
            F.max_by("cent_id", F.struct(F.col("sim"), -F.col("cent_id"))).alias(
                "cent_id"
            )
        )
    )
    n_cell = final.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_cell"))
    # n_cell is k rows — broadcast, or Catalyst sort-merges two descendants
    # of the same aggregate
    return final.join(F.broadcast(n_cell), "cent_id").select(
        "vid", "cent_id", "n_cell"
    )


def kmeans_oracle_sql(
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB replay: iterations unrolled as CTE chain c0→a1→c1→…,
    dot products via the exploded (vid, d, v) relation. Built by
    ``.format``-free string assembly (the f-string/brace booby trap from
    the q_zorder_index incident)."""
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
        "SELECT f.vid, f.cent_id, CAST(n.n_cell AS BIGINT) AS n_cell",
        "FROM fin f JOIN (",
        "  SELECT cent_id, COUNT(*) AS n_cell FROM fin GROUP BY cent_id",
        ") n ON n.cent_id = f.cent_id",
    ]
    return "\n".join(parts)


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
            c.sparkSession.createDataFrame(
                [(v, x) for v, x, _ in chosen], "cvid long, cq array<long>"
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
    return spark.createDataFrame(
        [(i + 1, v, d) for i, (v, _, d) in enumerate(chosen)],
        "sample_rank int, vid long, min_dist2 long",
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

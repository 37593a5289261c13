"""Skew-mitigation queries (operators/skew.py) — the salted two-phase
aggregation adjudicated by a DuckDB oracle over a PLANTED hot key, the same
planted-hazard pattern the capped dedup queries use: the query manufactures
the exact skew the rewrite exists for, runs the skew-safe plan, and the
oracle is the plain GROUP BY the rewrite must be indistinguishable from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..operators.skew import salted_agg
from ..sources import load_table
from .registry import query

#: the skew plant: ~70% of events collapse onto hot_key 0, the rest keep
#: their user_id — a single reducer would see most of the table without
#: the salt.
_SQL_HOT_KEY = "CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END"


@query(
    "q_salted_agg_skew",
    extra=True,
    oracle=f"""
    SELECT
      CAST({_SQL_HOT_KEY} AS BIGINT) AS hot_key,
      COUNT(CAST(ROUND(value * 100) AS BIGINT)) AS n_events,
      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      MIN(CAST(ROUND(value * 100) AS BIGINT)) AS min_cents,
      MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_cents
    FROM events
    GROUP BY 1
    """,
)
def q_salted_agg_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py:salted_agg) over a
    planted hot key holding ~70% of all events: phase 1 aggregates on
    (hot_key, salt) so no reducer sees more than ~1/16 of the hot key's
    rows, phase 2 combines the partials per key. The oracle is the PLAIN
    GROUP BY — the rewrite's entire contract is producing the identical
    relation. Money stays in exact integer cents (registry determinism
    rules); count/sum/min/max cover every algebraic combiner the rewrite
    supports.

    Scale: this is the aggregation shape that survives a power-law key
    (user events, document sources): the hot key's O(N) rows cost one
    extra narrow stage instead of one O(N) reducer. The plan shape (two
    Exchanges: hash(hot_key, salt) then hash(hot_key)) is pinned in
    tests/test_plan_shapes.py.
    """
    ev = load_table(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("hot_key"),
        cents("value").alias("v_cents"),
    )
    return salted_agg(
        skewed,
        ["hot_key"],
        {
            "n_events": ("v_cents", "count"),
            "total_cents": ("v_cents", "sum"),
            "min_cents": ("v_cents", "min"),
            "max_cents": ("v_cents", "max"),
        },
    )


@query(
    "q_freq_items_skew",
    extra=True,
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events),
    per AS (
      SELECT event_type, COUNT(*) AS n_exact FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_exact AS BIGINT) AS n_exact,
           n_exact * 100 > (SELECT n FROM tot) * 19 AS must_report,
           TRUE AS reported_ok
    FROM per
    """,
)
def q_freq_items_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.stat.freqItems`` (the misra-gries-style heavy-hitter
    sketch — the skew-DETECTION tool that feeds the salting valves)
    verified through its guarantee, like q_approx_distinct: the sketch may
    over-report but must NEVER miss an item with frequency above the
    support threshold. The query computes exact per-type counts, flags
    which types exceed 19% support (pure integer compare, identical in
    SQL), and emits ``reported_ok`` = [not required, or present in the
    sketch's item list]. The oracle expects TRUE everywhere — a sketch
    that drops a true heavy hitter flips the hash.

    The support/threshold pairing honors the sketch's REAL guarantee:
    ``freqItems(support)`` allocates ``floor(1/support)`` Misra-Gries
    counters and only promises to retain items with frequency above
    ``1/counters``. support=0.16 → 6 counters → guaranteed above 16.7%,
    which covers the 19% ``must_report`` flag with margin; a naive
    support=0.19 (5 counters → only >20% guaranteed) could legally drop
    a 19.5% item on a corpus with more distinct values and fail the gate
    spuriously.

    The sketch array itself is one driver-side row (same small-collect
    precedent as the broadcast query set in the BLAS kernel); the exact
    counts stay a distributed aggregate."""
    ev = load_table(spark, sf_dir, "events")
    support = 0.16  # 6 counters: guarantee (>16.7%) covers the 19% flag
    reported = ev.stat.freqItems(["event_type"], support).collect()[0][0]
    total = ev.groupBy().agg(F.count(F.lit(1)).alias("n"))
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return per.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n_exact",
        (F.col("n_exact") * 100 > F.col("n") * 19).alias("must_report"),
        (
            ~(F.col("n_exact") * 100 > F.col("n") * 19)
            | F.col("event_type").isin([str(x) for x in reported])
        ).alias("reported_ok"),
    )


@query(
    "q_salted_join_skew",
    extra=True,
    oracle=f"""
    SELECT CAST({_SQL_HOT_KEY} AS BIGINT) AS hot_key,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           MAX(seg) AS seg
    FROM events
    JOIN (
      SELECT CAST(user_id AS BIGINT) AS dim_key,
             CASE WHEN user_id % 3 = 0 THEN 'gold' ELSE 'std' END AS seg
      FROM (SELECT DISTINCT user_id FROM events)
    ) ON CAST({_SQL_HOT_KEY} AS BIGINT) = dim_key
    GROUP BY 1, 2
    """,
)
def q_salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted JOIN under the same planted 70%-hot key: the fact side is
    salted into 8 buckets and the (deliberately non-broadcast) dimension is
    replicated 8x, so the hot key's rows meet the dim on 8 reducers instead
    of one. The oracle is the PLAIN equi join + GROUP BY — like salted_agg,
    the rewrite's contract is producing the identical relation. MAX(seg)
    doubles as a join-correctness witness (every row of a key must carry
    the same seg).

    Scale: dim-side cost is |dim| x S shuffled rows — the documented
    trade (operators/skew.py:78-79); broadcast wins when the dim fits,
    salting wins when it doesn't AND one key dominates. The broadcast hint
    is deliberately absent here to keep the salted path under test.
    """
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("dim_key"),
        "event_type",
        cents("value").alias("v_cents"),
    )
    dim = (
        ev.select(F.col("user_id").cast("long").alias("dim_key"))
        .distinct()
        .select(
            "dim_key",
            F.when(F.col("dim_key") % 3 == 0, "gold")
            .otherwise("std")
            .alias("seg"),
        )
        # At test scale Catalyst would happily broadcast this dim and the
        # salted SHUFFLE path — the thing this query exists to adjudicate —
        # would never run. The hint forces the shuffled hash join the
        # rewrite targets at real scale (where the dim does NOT fit).
        .hint("shuffle_hash")
    )
    joined = salted_join(fact, dim, key="dim_key", salt_buckets=8)
    return (
        joined.groupBy(F.col("dim_key").alias("hot_key"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_cents").alias("total_cents"),
            F.max("seg").alias("seg"),
        )
    )


@query(
    "q_cms_heavy_hitters",
    # promoted to the graded window in round 8 (the CMS sketch family was
    # extra-only; q_anti_join rotated out)
    oracle="""
    WITH ds AS (SELECT unnest(range(0, 4)) AS d),
    cells AS (
      SELECT d,
             md5_number_lower('cms' || CAST(d AS VARCHAR) || ':' || event_type)
               % 2147483647 % 256 AS w
      FROM events CROSS JOIN ds
    ),
    cms AS (SELECT d, w, COUNT(*) AS c FROM cells GROUP BY d, w),
    probes AS (SELECT DISTINCT event_type FROM events),
    pcells AS (
      SELECT event_type, d,
             md5_number_lower('cms' || CAST(d AS VARCHAR) || ':' || event_type)
               % 2147483647 % 256 AS w
      FROM probes CROSS JOIN ds
    ),
    est AS (
      SELECT event_type, MIN(c) AS n_est
      FROM pcells JOIN cms USING (d, w) GROUP BY event_type
    ),
    tc AS (SELECT event_type, COUNT(*) AS n_true FROM events GROUP BY 1)
    SELECT t.event_type,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_est AS BIGINT) AS n_est
    FROM tc t JOIN est USING (event_type)
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (operators/sketch.py): build
    the 4x256 counter matrix over event_type, point-estimate every
    distinct type from the sketch, and emit (type, exact, estimate) —
    the estimate is deterministic given the stable md5 hashes, so the
    DuckDB oracle replays matrix AND estimates cell-for-cell. The
    one-sided guarantee (estimate >= exact, collisions only add) is
    asserted separately in tests/test_sketch.py; here both engines must
    agree on the exact numbers.

    Scale: the sketch is <= depth*width rows regardless of input size or
    key cardinality — per-partition sketches merge by the map-side
    combine itself, and the probe join broadcasts the 1024-cell matrix.
    The production use is bounded-memory threshold gates (drop shingles
    seen > K times) where exact counts would need vocabulary-sized state.
    """
    from ..operators.sketch import cms_build, cms_estimate

    # Round-13 optimization (guide §2.3 — aggregate before you shuffle):
    # the sketch hashes depend only on the key, so ONE map-side-combined
    # count per event_type replaces the per-row build (4 md5 bucket
    # hashes per event row — execution measured 8.2 s at sf0.1, almost
    # all in the row-wise hashing); the weighted build yields the
    # cell-identical matrix, and the same 3-consumer relation also
    # serves the probe set and the exact counts — one corpus scan total
    # (the row-wise path previously scanned events three times).
    ev = load_table(spark, sf_dir, "events").select("event_type")
    true_counts = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .localCheckpoint()
    )
    cms = cms_build(true_counts, "event_type", weight_col="n_true")
    est = cms_estimate(cms, true_counts.select("event_type"), "event_type")
    return true_counts.join(est, "event_type").select(
        "event_type",
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_est").cast("long").alias("n_est"),
    )


@query(
    "q_mg_heavy_hitters",
    extra=True,
    oracle="""
    WITH tok AS (
      SELECT unnest(
        list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x != '')
      ) AS term
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM tok)
    SELECT term AS item, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok, tot
    GROUP BY term, n_total
    HAVING COUNT(*) * 30 > n_total
    """,
)
def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (corpus tokens with share > 1/30) via the
    Misra-Gries sketch-then-verify composition (operators/sketch.py:
    misra_gries_heavy_hitters): per-partition 29-counter MG summaries
    nominate candidates through an Arrow mapInPandas pass, one exact
    count confirms, and the strict integer filter (n·30 > N) makes the
    result identical to the plain GROUP BY HAVING on any partitioning —
    the pigeonhole superset guarantee, adjudicated by a plain-SQL oracle
    that contains none of the sketch machinery (the same lossless-oracle
    device as q_bloom_prefilter_join). Completes the sketch family:
    Count-Min (point estimates), HLL (cardinality), Bloom (membership),
    MG (frequent items).

    Scale: the exchange under the candidate relation is ≤29 rows per
    partition vs the vocabulary-sized shuffle of the direct groupBy;
    the verify pass counts only the broadcast candidate set.
    """
    from ..functions.scalar import token_array
    from ..operators.sketch import misra_gries_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(token_array("text")).alias("term"))
    return misra_gries_heavy_hitters(toks, "term", k=30)


@query(
    "q_kmv_distinct_rollup",
    extra=True,  # rotated out r12 (graded r10-r11; sketch family keeps q_cms_heavy_hitters graded)
    oracle="""
    WITH d1 AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
             CAST(md5_number_lower('kmv-v1:' || CAST(user_id AS VARCHAR))
                  % 2147483647 AS BIGINT) AS h
      FROM events
    ),
    sk AS (
      SELECT event_type, day, h FROM d1
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY event_type, day ORDER BY h) <= 32
    ),
    m AS (SELECT DISTINCT event_type, h FROM sk),
    mk AS (
      SELECT event_type, h FROM m
      QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) <= 32
    ),
    est AS (
      SELECT event_type,
             CASE WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS BIGINT)
                  ELSE CAST(ROUND(31.0 * 2147483647 / MAX(h)) AS BIGINT)
             END AS est_kmv
      FROM mk GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_exact, est.est_kmv,
           ABS(est.est_kmv - ex.n_exact) * 10 <= 4 * ex.n_exact AS ok
    FROM ex JOIN est USING (event_type)
    """,
)
def q_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch with a two-level MERGE: per-(type,
    day) sketches of active users, unioned up to event_type WITHOUT
    rescanning the fact (operators/sketch.kmv_sketch /
    kmv_merge_estimate). Unlike q_hll_rollup's engine-internal sketch
    (adjudicated only through a tolerance boolean), every KMV byte — the
    hash set, the k-th order statistic, the (k-1)*M/h_k estimate — is
    md5-deterministic, so the ORACLE REPLAYS THE FULL SKETCH STATE and
    the estimate is value-adjudicated. The union-of-day-bottom-k's is a
    superset of the type-level bottom-k (any global k-smallest hash is
    among its own day's k smallest), so the merge is lossless by
    construction. ``ok`` (within 40%, ~2 sigma at k=32) is computed
    identically on both sides — informative, not a flake risk.

    Scale: one distinct-(type, day, h) shuffle builds every sketch;
    merges touch <= k rows per fine-grain group forever after — the
    100 TB rollup contract shared with the HLL twin."""
    from ..operators.sketch import kmv_merge_estimate, kmv_sketch

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    day_sk = kmv_sketch(ev, "user_id", ["event_type", "day"], k=32)
    est = kmv_merge_estimate(day_sk, ["event_type"], k=32)
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "est_kmv",
        (F.abs(F.col("est_kmv") - F.col("n_exact")) * 10
         <= F.col("n_exact") * 4).alias("ok"),
    )


@query(
    "q_kmv_join_estimate",
    extra=True,  # rotated out round 10 (KMV family now graded via q_kmv_distinct_rollup)
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_custkey AS key FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (
      SELECT DISTINCT c_custkey AS key FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    ska AS (
      -- DISTINCT h BEFORE ranking: the engine sketches distinct hash
      -- VALUES (.distinct() on h), so two keys colliding inside a side's
      -- bottom-64 must collapse here too or the merged sketch diverges
      SELECT h FROM (
        SELECT DISTINCT CAST(md5_number_lower('kmv-v1:' || CAST(key AS VARCHAR))
                             % 2147483647 AS BIGINT) AS h
        FROM a
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= 64
    ),
    skb AS (
      SELECT h FROM (
        SELECT DISTINCT CAST(md5_number_lower('kmv-v1:' || CAST(key AS VARCHAR))
                             % 2147483647 AS BIGINT) AS h
        FROM b
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= 64
    ),
    uk AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (
          SELECT h FROM ska UNION ALL SELECT h FROM skb)
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= 64
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS hk,
             CAST(SUM(CASE WHEN h IN (SELECT h FROM ska)
                            AND h IN (SELECT h FROM skb)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM uk
    ),
    est AS (
      SELECT n_both, n_u,
             CASE WHEN n_u < 64 THEN n_u
                  ELSE CAST(ROUND(63.0 * 2147483647 / hk) AS BIGINT)
             END AS est_union
      FROM stats
    ),
    fin AS (
      SELECT CAST(est_union AS BIGINT) AS est_union,
             CAST(CASE WHEN n_u < 64 THEN n_both
                       ELSE (2 * n_both * est_union + 64) // 128
                  END AS BIGINT) AS est_intersection
      FROM est
    ),
    exu AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_union
      FROM (SELECT key FROM a UNION SELECT key FROM b)
    ),
    exi AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
      FROM a JOIN b USING (key)
    )
    SELECT f.est_union, f.est_intersection, u.exact_union,
           i.exact_intersection
    FROM fin f CROSS JOIN exu u CROSS JOIN exi i
    """,
)
def q_kmv_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation from two bottom-k (KMV) sketches —
    the planning primitive behind broadcast/shuffle decisions at 100 TB:
    estimate |keys(A) ∪ keys(B)| and |keys(A) ∩ keys(B)| from two
    64-hash sketches WITHOUT executing the join (urgent-order custkeys
    vs BUILDING-segment custkeys). Union estimate is the classic
    (k-1)·M/h_k on the merged bottom-k; the intersection scales it by
    the fraction of merged-sketch members present in BOTH sketches
    (membership against a sketch is exact for bottom-k(union) elements:
    any union-k-smallest hash from A is among A's own k smallest). The
    half-up integer device guards the /k small-denominator rounding
    (verify SKILL round-8 note); the report joins the exact counts
    alongside, calibration-style, so the estimator itself is what the
    oracle value-checks.

    Scale: each sketch is a distinct + TakeOrdered(64) — per-partition
    top-k, never a global single-partition sort; everything downstream
    touches <= 128 sketch rows. The exact columns exist for the report;
    a planner would drop them.
    """
    from ..functions.scalar import stable_hash_p31
    from ..operators.sketch import KMV_MOD

    k = 64

    def side(df, keycol, pred):
        h = stable_hash_p31(
            F.concat(F.lit("kmv-v1:"), F.col("key").cast("string"))
        )
        keys = df.where(pred).select(F.col(keycol).alias("key")).distinct()
        return keys, keys.select(h.alias("h")).distinct().orderBy("h").limit(k)

    a, ska = side(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        F.col("o_orderpriority") == "1-URGENT",
    )
    b, skb = side(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        F.col("c_mktsegment") == "BUILDING",
    )
    uk = ska.union(skb).distinct().orderBy("h").limit(k)
    both = uk.join(F.broadcast(ska), "h", "left_semi").join(
        F.broadcast(skb), "h", "left_semi"
    )
    stats = (
        uk.agg(
            F.count(F.lit(1)).cast("long").alias("n_u"),
            F.max("h").alias("hk"),
        )
        .crossJoin(
            F.broadcast(both.agg(F.count(F.lit(1)).cast("long").alias("n_both")))
        )
    )
    est_union = F.when(F.col("n_u") < k, F.col("n_u")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(KMV_MOD) / F.col("hk"), 0).cast(
            "long"
        )
    )
    fin = stats.select(
        est_union.alias("est_union"), "n_u", "n_both"
    ).select(
        F.col("est_union").cast("long").alias("est_union"),
        F.when(F.col("n_u") < k, F.col("n_both"))
        .otherwise(
            F.expr(f"(2 * n_both * est_union + {k}) div {2 * k}")
        )
        .cast("long")
        .alias("est_intersection"),
    )
    exact_u = (
        a.union(b)
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
    )
    exact_i = a.join(b, "key").agg(
        F.count(F.lit(1)).cast("long").alias("exact_intersection")
    )
    return fin.crossJoin(F.broadcast(exact_u)).crossJoin(
        F.broadcast(exact_i)
    )


@query(
    "q_quantile_sketch_rollup",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT event_type,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             CAST(md5_number_lower('qsk-v1:' || CAST(event_id AS VARCHAR))
                  % 2147483647 AS BIGINT) AS h
      FROM events
    ),
    day_sk AS (
      SELECT event_type, day, event_id AS sid, v, h FROM base
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY event_type, day ORDER BY h, event_id) <= 64
    ),
    merged AS (
      SELECT event_type, sid, v, h FROM day_sk
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY h, sid) <= 64
    ),
    cnt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_used
      FROM merged GROUP BY 1
    ),
    est AS (
      SELECT m.event_type, c.k_used, m.v AS est_p50_cents
      FROM (SELECT event_type, v, h, sid,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY v, h, sid) AS vr
            FROM merged) m
      JOIN cnt c ON c.event_type = m.event_type
      WHERE m.vr = (c.k_used * 50 + 99) // 100
    ),
    hist AS (
      SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ),
    exw AS (
      SELECT event_type, v, c,
             CAST(SUM(c) OVER (
                 PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ),
    exact AS (
      SELECT event_type, n AS n_rows, v AS exact_p50_cents
      FROM exw WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
    ),
    rk AS (
      SELECT b.event_type,
             CAST(SUM(CASE WHEN b.v <= e.est_p50_cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS le
      FROM base b JOIN est e ON e.event_type = b.event_type GROUP BY 1
    )
    SELECT x.event_type, x.n_rows, s.k_used, s.est_p50_cents,
           x.exact_p50_cents,
           (2 * r.le * 1000000 + x.n_rows) // (2 * x.n_rows) AS rank_ppm,
           ABS((2 * r.le * 1000000 + x.n_rows) // (2 * x.n_rows) - 500000)
             <= 200000 AS ok
    FROM exact x
    JOIN est s ON s.event_type = x.event_type
    JOIN rk r ON r.event_type = x.event_type
    """,
)
def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch with a two-level rollup — the
    distribution-shape corner of the sketch family (CMS = frequency,
    KMV/HLL = cardinality, MG = heavy hitters): per-(type, day) bottom-64
    value samples (operators/sketch.py:value_sample_sketch — row-identity
    md5 order makes the survivors a uniform random sample, every byte
    cross-engine deterministic), merged up to event_type WITHOUT
    rescanning the fact (min-k associativity, the KMV contract), and the
    merged sample's ceil(k/2)-th order statistic read as the median
    estimate. The oracle replays the full sketch state. ``rank_ppm`` —
    the estimate's true rank in the exact distribution — is the honest
    error measure (sample-median rank error ~0.5/sqrt(64) ≈ 6 points at
    one sigma; ``ok`` gates at ±20 points, computed identically on both
    sides), next to the exact lower median from the cumulative value
    histogram (no row sort).

    Scale: one group-key window builds every day sketch; the type-level
    merge, estimate and rank join touch <= 64 rows per group forever —
    the rollup serves any coarser grain from stored fine sketches."""
    from pyspark.sql import Window

    from ..operators.sketch import sample_merge_quantile, value_sample_sketch

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        "event_id",
        cents("value").alias("v_cents"),
    )
    day_sk = value_sample_sketch(
        ev, "v_cents", "event_id", ["event_type", "day"], k=64
    )
    est = sample_merge_quantile(day_sk, ["event_type"], k=64, pct=50).select(
        "event_type", "k_used", F.col("est_v").alias("est_p50_cents")
    )
    hist = ev.groupBy("event_type", "v_cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    exw = hist.select(
        "event_type",
        "v_cents",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    pos = F.call_function("div", F.col("n") + 1, F.lit(2).cast("long"))
    exact = exw.where(
        ((F.col("cum") - F.col("c")) < pos) & (pos <= F.col("cum"))
    ).select(
        "event_type",
        F.col("n").alias("n_rows"),
        F.col("v_cents").alias("exact_p50_cents"),
    )
    rk = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("v_cents") <= F.col("est_p50_cents")).cast("long")
            ).alias("le")
        )
    )
    rank_ppm = F.call_function(
        "div",
        2 * F.col("le") * 1000000 + F.col("n_rows"),
        2 * F.col("n_rows"),
    )
    # est/rk are <= |groups| rows but statless post-window stubs —
    # without the hint Catalyst SMJ-sorts these 5-row joins
    return (
        exact.join(F.broadcast(est), "event_type")
        .join(F.broadcast(rk), "event_type")
        .select(
            "event_type",
            "n_rows",
            "k_used",
            "est_p50_cents",
            "exact_p50_cents",
            rank_ppm.alias("rank_ppm"),
            (F.abs(rank_ppm - 500000) <= 200000).alias("ok"),
        )
    )


# ---------------------------------------------------------------------------
# AMS F2 sketch (round 12)
# ---------------------------------------------------------------------------

_AMS_K = 5  # estimators; median = 3rd by (est, j) total order
_AMS_SALT = "ams-v1:"


def _ams_oracle() -> str:
    return """
    WITH toks AS (
      SELECT unnest(list_filter(
        string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    f2 AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM cnt),
    est AS (
      SELECT j.j,
        CAST(SUM(CASE WHEN md5_number_lower(
            '{SALT}' || CAST(j.j AS VARCHAR) || ':' || cnt.tok)
            % 2147483647 % 2 = 0 THEN cnt.c ELSE -cnt.c END) AS BIGINT)
          AS dot
      FROM cnt CROSS JOIN (SELECT unnest([1,2,3,4,5]) AS j) j
      GROUP BY 1
    ),
    sq AS (SELECT j, dot, CAST(dot * dot AS BIGINT) AS est FROM est),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY est, j) AS r FROM sq
    ),
    med AS (SELECT est AS median_est FROM rk WHERE r = 3)
    SELECT sq.j, sq.dot, sq.est, f2.f2_exact, med.median_est,
      CAST(CASE WHEN sq.est >= f2.f2_exact
           THEN (2 * (sq.est - f2.f2_exact) * 1000000 + f2.f2_exact)
                // (2 * f2.f2_exact)
           ELSE (2 * (f2.f2_exact - sq.est) * 1000000 + f2.f2_exact)
                // (2 * f2.f2_exact) END AS BIGINT) AS err_ppm
    FROM sq CROSS JOIN f2 CROSS JOIN med
    """.replace("{SALT}", _AMS_SALT)


@query("q_ams_f2_moment", extra=True, oracle=_ams_oracle())
def q_ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F2 SKETCH — the second-frequency-moment
    member of the sketch family (CMS answers point frequency, KMV/HLL
    answer distinct count; F2 = sum of squared frequencies is the
    SELF-JOIN SIZE, the quantity a cost-based optimizer wants before
    picking a join strategy, and the classic skew measure). Each of the
    {_AMS_K} estimators projects the token-frequency vector onto a
    md5-derived +-1 sign vector; dot^2 is an unbiased F2 estimate and
    the MEDIAN tames the variance — all emitted alongside the exact F2
    and per-estimator half-up error ppm, so the sketch's accuracy is
    part of the oracle-checked contract.

    Determinism: signs are md5 coins (cross-engine identical); dots,
    squares and the half-up ppm are pure integer arithmetic.

    Scale: ONE map-side token count (the only corpus-sized work); the
    sign projection runs on the VOCABULARY relation x 5 estimator rows.
    The sketch is mergeable (dots add across shards), which is the 100
    TB story: per-partition partial dots, one tiny final reduce — this
    is how the optimizer estimates self-join sizes without a shuffle.
    """
    from pyspark.sql import Window

    from ..functions.scalar import stable_hash_p31, token_array
    from ..functions.scale import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select(F.explode(token_array("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # exact-F2 agg + 5-estimator projection read it
    )
    f2 = cnt.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    js = F.explode(F.array(*[F.lit(i) for i in range(1, _AMS_K + 1)])).alias(
        "j"
    )
    sign = F.when(
        stable_hash_p31(
            F.concat(
                F.lit(_AMS_SALT),
                F.col("j").cast("string"),
                F.lit(":"),
                F.col("tok"),
            )
        )
        % 2
        == 0,
        F.col("c"),
    ).otherwise(-F.col("c"))
    sq = (
        cnt.select("tok", "c", js)
        .groupBy("j")
        .agg(F.sum(sign).cast("long").alias("dot"))
        .select("j", "dot", (F.col("dot") * F.col("dot")).cast("long").alias("est"))
        .localCheckpoint()  # median row + final output read it
    )
    med = (
        sq.withColumn(
            "r", F.row_number().over(Window.orderBy("est", "j"))
        )
        .where(F.col("r") == (_AMS_K + 1) // 2 + (1 if _AMS_K % 2 == 0 else 0))
        .select(F.col("est").alias("median_est"))
    )
    err = F.when(
        F.col("est") >= F.col("f2_exact"),
        F.call_function(
            "div",
            2 * (F.col("est") - F.col("f2_exact")) * F.lit(1000000).cast("long")
            + F.col("f2_exact"),
            2 * F.col("f2_exact"),
        ),
    ).otherwise(
        F.call_function(
            "div",
            2 * (F.col("f2_exact") - F.col("est")) * F.lit(1000000).cast("long")
            + F.col("f2_exact"),
            2 * F.col("f2_exact"),
        )
    )
    return (
        sq.crossJoin(F.broadcast(f2))
        .crossJoin(F.broadcast(med))
        .select("j", "dot", "est", "f2_exact", "median_est", err.alias("err_ppm"))
    )

#!/usr/bin/env python3
"""Scale-smoke probe: run the heaviest operators on 1x / 2x / 4x / 8x
synthetic blow-ups of the sf0.1 tables (self-union with id offsets, built
in-memory — the read-only testdata is never touched) and record how wall
time scales. Near-linear growth is the empirical leg of the 100 TB
argument the plan audit makes structurally: banded/bucketed pair
generation, digest-only shuffles and map-side partial aggregation should
all scale ~O(N) in rows, not O(N^2).

The id offset makes every replica's documents DISTINCT (doc_id shifted,
text salted with the replica ordinal) so dedup workloads do real work at
every factor instead of collapsing replicas into one group.

Writes SCALE_SMOKE.md. Usage: python scale_smoke.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from prefect_flow_arc_alto_to_json_spark.functions.scalar import (  # noqa: E402
    token_array,
)
from prefect_flow_arc_alto_to_json_spark.operators.sketch import (  # noqa: E402
    misra_gries_heavy_hitters,
)
from prefect_flow_arc_alto_to_json_spark.operators.textindex import (  # noqa: E402
    phrase_search,
)
from prefect_flow_arc_alto_to_json_spark.operators.dedup import (  # noqa: E402
    cdc_chunk_stats,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    normalize_text,
    sorted_neighborhood_pairs,
)
from prefect_flow_arc_alto_to_json_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
    hbos_topk,
    int8_topk,
    ivf_topk,
    lsh_bucketed_topk,
    pq_topk,
    semantic_dedup,
)
from prefect_flow_arc_alto_to_json_spark.operators.clustering import (  # noqa: E402
    kmeans_assign_micro,
    pca_top_component_micro,
)
from prefect_flow_arc_alto_to_json_spark.operators.bpe import (  # noqa: E402
    bpe_learn_merges,
)
from prefect_flow_arc_alto_to_json_spark.operators.factorization import (  # noqa: E402
    als_iteration,
)
from prefect_flow_arc_alto_to_json_spark.operators.geo import (  # noqa: E402
    radius_join,
    with_grid,
)
from prefect_flow_arc_alto_to_json_spark.operators.trees import (  # noqa: E402
    boosted_stump_curves,
    decision_stump_errors,
)
from prefect_flow_arc_alto_to_json_spark.operators.textstats import (  # noqa: E402
    naive_bayes_language,
    token_count,
)
from prefect_flow_arc_alto_to_json_spark.operators.textstats import (  # noqa: E402
    quality_score,
)
from prefect_flow_arc_alto_to_json_spark.session import get_spark  # noqa: E402
from prefect_flow_arc_alto_to_json_spark.sources import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SMOKE.md")
FACTORS = (1, 2, 4, 8)
#: optional 2nd arg: comma-separated probe names — run ONLY those and MERGE
#: their rows into the existing SCALE_SMOKE.md (other rows kept verbatim).
#: Lets the sweep run in chunks under the shell's command timeout instead
#: of one monolithic ~10-minute job (round-7 gotcha).
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
#: optional 3rd arg: comma-separated blow-up factors (e.g. "1,8,32") —
#: EXTENDED-FACTOR mode (round-9 verdict #5: push the capped
#: pair-generators one octave past x8). Rows land in a separate
#: marker-delimited section of SCALE_SMOKE.md (merged by probe name
#: across chunked invocations); the x1..x8 main table is untouched.
EXT_FACTORS = (
    tuple(int(x) for x in sys.argv[3].split(",")) if len(sys.argv) > 3 else None
)
if EXT_FACTORS:
    FACTORS = EXT_FACTORS

EXT_MARK = "## Extended factors (x32 octave)"
#: A SECOND extended tier (round-11 verdict #4: one more octave for the
#: steep probes). Factor lists whose max exceeds 32 land here, after the
#: x32 section, so the two tables never share columns. Re-run each tier
#: with its own consistent factor list.
X64_MARK = "## x64 octave"
if EXT_FACTORS and max(EXT_FACTORS) > 32:
    EXT_MARK = X64_MARK


def split_existing() -> tuple[str, dict[str, str]]:
    """(main part of SCALE_SMOKE.md verbatim, extended-section rows by
    probe name). The extended section lives after EXT_MARK so the two
    tables can't bleed into each other when either mode merges rows."""
    try:
        text = open(OUT).read()
    except FileNotFoundError:
        return "", {}
    mainpart, _, extpart = text.partition(EXT_MARK)
    rows: dict[str, str] = {}
    for line in extpart.splitlines():
        if line.startswith("| ") and not line.startswith(("| operator", "|---")):
            rows[line.split("|")[1].strip()] = line
    return mainpart, rows


def parse_existing_rows() -> dict[str, str]:
    """name -> full MAIN-table line from the current SCALE_SMOKE.md."""
    out: dict[str, str] = {}
    for line in split_existing()[0].splitlines():
        if line.startswith("| ") and not line.startswith(("| operator", "|---")):
            out[line.split("|")[1].strip()] = line
    return out


def blow_up_docs(docs: DataFrame, factor: int) -> DataFrame:
    """factor distinct replicas: ids offset by replica * 10M, text salted
    with the replica ordinal so exact/minhash dedup can't collapse them."""
    parts = []
    for r in range(factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                F.when(F.lit(r) == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(f" replica{r}")))
                .alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_emb(emb: DataFrame, factor: int) -> DataFrame:
    """factor distinct replicas. Each replica's vectors are ROTATED by the
    replica ordinal (circular shift of the 64 dims): rotation preserves
    all WITHIN-replica dot products (the pair structure of the base set
    repeats exactly, so true-pair output grows linearly with the factor)
    while cross-replica cosines stay at the random-vector noise floor —
    without this, exact-copy replicas form near-dup cliques and every
    pair-finding probe's OUTPUT grows quadratically in the factor,
    swamping the candidate-generation cost the probe is measuring."""
    parts = []
    for r in range(factor):
        vec = (
            F.col("embedding")
            if r == 0
            else F.concat(
                F.expr(f"slice(embedding, {r + 1}, {64 - r})"),
                F.expr(f"slice(embedding, 1, {r})"),
            )
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                vec.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_events(ev: DataFrame, factor: int) -> DataFrame:
    """factor distinct replicas of the interaction table: user ids offset
    per replica (users grow linearly) while the ITEM vocabulary
    (event_type, 5 values) stays fixed — exactly the shape that makes
    item-CF's per-user pair fan-out the thing under test: co-occurrence
    output is bounded by users * C(5,2) (linear), never corpus²."""
    parts = [
        ev.select(
            (F.col("user_id") + r * 10_000_000).alias("user_id"),
            "event_type",
            "value",
        )
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_orders(o: DataFrame, factor: int) -> DataFrame:
    """factor replicas of the label/feature projection. No ids involved —
    the stump/boosting probes are pure bin-keyed aggregations, so
    replicas only have to multiply the row count."""
    parts = [o for _ in range(factor)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_events_history(ev_ts: DataFrame, factor: int) -> DataFrame:
    """factor replicas with the SAME user ids but timestamps shifted by
    replica * 30 days: each user's TOTAL history grows x factor while the
    in-window activity density (events per user-hour/day) stays constant
    — exactly the axis a window-bounded interval self-join must be
    insensitive to (and the axis the unbounded pre-round-11
    q_sequential_patterns intermediate was quadratic in)."""
    parts = [
        ev_ts.select(
            "user_id",
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {30 * r} DAYS")).alias("ts"),
        )
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def blow_up_baskets(bk: DataFrame, factor: int) -> DataFrame:
    """factor replicas of the distinct (order, brand) basket relation with
    order keys offset per replica: orders grow linearly while the BRAND
    lattice (25 values) stays fixed — apriori's candidate space is
    vocabulary-bounded, so cost must track baskets, never baskets^2."""
    parts = [
        bk.select(
            (F.col("k") + r * 100_000_000).alias("k"),
            "br",
        )
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _edit_distance(pn: DataFrame) -> DataFrame:
    """dedup_edit_distance_join's vocabulary-reduced banded plan
    (plans/dedup_queries.py) over the blown-up name rows."""
    v = (
        pn.groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("len", F.length("name"))
        .localCheckpoint()
    )
    band = F.floor(F.col("len") / 4).cast("long")
    left = v.select(
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.explode(F.array(band - 1, band, band + 1)).alias("__band"),
    )
    right = v.select(
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        band.alias("__band2"),
    )
    dd = F.levenshtein(F.col("name_a"), F.col("name_b"), 3)
    return (
        left.join(
            right.hint("shuffle_hash"),
            (F.col("__band") == F.col("__band2"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .where(dd >= 0)
        .select("name_a", "name_b", dd.cast("long").alias("dist"), "n_a", "n_b")
    )


def _seq_patterns(ev_ts: DataFrame) -> DataFrame:
    """q_sequential_patterns' (user, time-bucket)-banded join topology
    (plans/temporal_queries.py): 1h-banded pair chain + 24h-banded triple
    chain, then the lattice-sized support aggregation. The banding makes
    candidate ENUMERATION density-bounded, not just the output — the
    pre-banding probe measured x8/x1 = 7.0 with a super-linear knee."""
    ev = ev_ts.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("t"), "ts"
    ).localCheckpoint()

    def banded(left, right, w_sec, l_ts, r_ts, cond):
        lb = left.withColumn(
            "__b",
            F.explode(
                F.array(
                    F.expr(f"CAST(unix_timestamp({l_ts}) div {w_sec} AS LONG)"),
                    F.expr(
                        f"CAST(unix_timestamp({l_ts}) div {w_sec} AS LONG) + 1"
                    ),
                )
            ),
        )
        rb = right.withColumn(
            "__b2", F.expr(f"CAST(unix_timestamp({r_ts}) div {w_sec} AS LONG)")
        )
        return lb.join(
            rb.hint("shuffle_hash"), (F.col("__b") == F.col("__b2")) & cond
        ).drop("__b", "__b2")

    e1 = ev.select("u", F.col("t").alias("t_a"), F.col("ts").alias("ts1"))
    e2 = ev.select(
        F.col("u").alias("u2"), F.col("t").alias("t_b"), F.col("ts").alias("ts2")
    )
    e3 = ev.select(
        F.col("u").alias("u3"), F.col("t").alias("t_c"), F.col("ts").alias("ts3")
    )
    pair = (
        banded(
            e1, e2, 3600, "ts1", "ts2",
            (F.col("u") == F.col("u2"))
            & (F.col("ts2") > F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("t_a", "t_b")
        .agg(F.countDistinct("u").cast("long").alias("sup"))
    )
    tri12 = banded(
        e1, e2, 86400, "ts1", "ts2",
        (F.col("u") == F.col("u2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 24 HOUR")),
    )
    tri = (
        banded(
            tri12, e3, 86400, "ts2", "ts3",
            (F.col("u") == F.col("u3"))
            & (F.col("ts3") > F.col("ts2"))
            & (F.col("ts3") <= F.col("ts1") + F.expr("INTERVAL 24 HOUR")),
        )
        .groupBy("t_a", "t_b", "t_c")
        .agg(F.countDistinct("u").cast("long").alias("sup"))
    )
    return pair.select("t_a", "t_b", F.lit("").alias("t_c"), "sup").unionByName(
        tri.select("t_a", "t_b", "t_c", "sup")
    )


def _apriori(bk: DataFrame) -> DataFrame:
    """q_apriori_triples' pruned level-wise walk (plans/relational.py)
    over the blown-up baskets: frequent items/pairs are lattice-sized
    broadcasts semi-join-pruning the order-keyed self-joins."""
    d = F.call_function
    b = bk.localCheckpoint()
    nt = b.agg(F.countDistinct("k").cast("long").alias("n_orders")).withColumn(
        "m",
        F.greatest(F.lit(3).cast("long"), d("div", F.col("n_orders"), F.lit(250))),
    )
    f1 = (
        b.groupBy("br")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(nt))
        .where(F.col("n") >= F.col("m"))
        .select("br")
    )
    b1 = b.join(F.broadcast(f1), "br", "semi")
    x = b1.select("k", F.col("br").alias("br_a"))
    y = b1.select(F.col("k").alias("k_y"), F.col("br").alias("br_b"))
    z = b1.select(F.col("k").alias("k_z"), F.col("br").alias("br_c"))
    pairs = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("k") == F.col("k_y")) & (F.col("br_a") < F.col("br_b")),
        )
        .groupBy("br_a", "br_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    f2 = (
        pairs.crossJoin(F.broadcast(nt))
        .where(F.col("n_pair") >= F.col("m"))
        .select("br_a", "br_b")
        .localCheckpoint()
    )
    pstream = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("k") == F.col("k_y")) & (F.col("br_a") < F.col("br_b")),
        )
        .select("k", "br_a", "br_b")
        .join(F.broadcast(f2), ["br_a", "br_b"], "semi")
    )
    tri = (
        pstream.join(
            z.hint("shuffle_hash"),
            (F.col("k") == F.col("k_z")) & (F.col("br_b") < F.col("br_c")),
        )
        .join(
            F.broadcast(f2.select(F.col("br_a"), F.col("br_b").alias("br_c"))),
            ["br_a", "br_c"],
            "semi",
        )
        .join(
            F.broadcast(
                f2.select(F.col("br_a").alias("br_b"), F.col("br_b").alias("br_c"))
            ),
            ["br_b", "br_c"],
            "semi",
        )
        .groupBy("br_a", "br_b", "br_c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return tri


def _web_corpus(d: DataFrame) -> DataFrame:
    """pipeline_web_corpus's composition over the blown-up documents
    (plans/pipeline_queries.py): page synth + extraction + quality gate
    + exact-dedup keeper window."""
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        normalize_text,
    )
    from prefect_flow_arc_alto_to_json_spark.operators.html import (
        main_region,
        strip_noise,
        synth_page,
        to_text,
    )
    from prefect_flow_arc_alto_to_json_spark.operators.textstats import (
        quality_score,
    )

    docs = d.withColumn("lang", F.lit("en"))
    ex = docs.select(
        "doc_id", strip_noise(synth_page()).alias("clean")
    ).select("doc_id", to_text(main_region(F.col("clean"))).alias("text"))
    scored = ex.select(
        "doc_id",
        "text",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    ).localCheckpoint()
    gated = scored.where(F.col("quality") >= 0.7)
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    return (
        gated.withColumn("__rn", keeper)
        .where(F.col("__rn") == 1)
        .select("doc_id", "n_tokens", "quality")
    )


def _cms_weighted(ev: DataFrame) -> DataFrame:
    """q_cms_heavy_hitters' shape on the events blow-up: ONE map-side-
    combined count per event_type feeds the weighted CMS build, and the
    same counts relation serves probes + exact counts (round-13's
    one-scan restructure)."""
    from prefect_flow_arc_alto_to_json_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    counts = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .localCheckpoint()
    )
    cms = cms_build(counts, "event_type", weight_col="n_true")
    est = cms_estimate(cms, counts.select("event_type"), "event_type")
    return counts.join(est, "event_type")


def _facility(e: DataFrame) -> DataFrame:
    """sim_facility_location's greedy loop over the blown-up embeddings
    (plans/similarity_queries.py): 3 probe rounds, 32-candidate pool."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    ee = e.select("vec_id", q.alias("v")).localCheckpoint()
    cands = ee.where(F.col("vec_id") < 32).localCheckpoint()

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    cov = ee.select("vec_id", F.lit(0).cast("long").alias("cov"))
    out = None
    for r in range(1, 4):
        gains = (
            ee.join(cov, "vec_id")
            .crossJoin(
                F.broadcast(
                    cands.select(
                        F.col("vec_id").alias("cand"), F.col("v").alias("cv")
                    )
                )
            )
            .select(
                "cand",
                F.greatest(
                    dot(F.col("v"), F.col("cv")) - F.col("cov"), F.lit(0)
                ).alias("g"),
            )
            .groupBy("cand")
            .agg(F.sum("g").cast("long").alias("gain"))
        )
        sel = gains.orderBy(F.col("gain").desc(), "cand").limit(1).collect()[0]
        row = spark.createDataFrame(
            [(r, int(sel["cand"]), int(sel["gain"]))],
            "round int, vec_id long, marginal_gain long",
        )
        out = row if out is None else out.unionByName(row)
        pv = cands.where(F.col("vec_id") == int(sel["cand"])).select(
            F.col("v").alias("pv")
        )
        cov = (
            cov.join(F.broadcast(pv), how="cross")
            .join(ee, "vec_id")
            .select(
                "vec_id",
                F.greatest(
                    F.col("cov"),
                    F.greatest(dot(F.col("v"), F.col("pv")), F.lit(0)),
                ).alias("cov"),
            )
            .localCheckpoint()
        )
    return out


def _leakage_split(d: DataFrame) -> DataFrame:
    """pipeline_leakage_safe_split's composition (plans/dedup_queries.py)
    over the blown-up documents: near-dup pairs → components → component-
    hash split → leak counts. The pair relation feeds THREE consumers off
    one localCheckpoint — the exact multi-consumer shape TRISCALE once
    caught re-expanding into a 50-shuffle plan."""
    from prefect_flow_arc_alto_to_json_spark.functions.scalar import (
        stable_hash_p31,
    )
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = (
        ngram_jaccard_pairs(d, threshold=0.8, max_doc_freq=20)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    comp = duplicate_components(pairs)
    grp = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("component_id", "doc_id").alias("g"))
    )
    h = stable_hash_p31(F.concat(F.lit("split-v1:"), F.col("g").cast("string")))
    sp = grp.select(
        "doc_id",
        F.when(h % 10 < 8, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    ).localCheckpoint()
    a = sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    return (
        pairs.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _item_cf(ev: DataFrame) -> DataFrame:
    """q_item_cf's pair-generation core: distinct (user, item) → per-user
    item-pair co-counts. The per-user fan-out is the quadratic risk the
    probe watches (bounded here by the fixed 5-item vocabulary)."""
    ui = ev.select("user_id", "event_type").distinct()
    a = ui.select("user_id", F.col("event_type").alias("ia"))
    b = ui.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("ib"))
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("user_id") == F.col("uid_b")) & (F.col("ia") < F.col("ib")),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("co"))
    )


def _clean_corpus(d: DataFrame) -> DataFrame:
    """pipeline_clean_corpus's exact composition (plans/pipeline_queries.py)
    over the blown-up documents: quality gate → md5-keeper exact dedup →
    capped posting-join near-dup drop → broadcast anti-join. The 100 TB
    shape IS the composition, so the probe must cover it end-to-end, not
    just the stages in isolation."""
    from prefect_flow_arc_alto_to_json_spark.operators.textstats import (
        quality_score,
    )

    scored = d.select(
        "doc_id",
        "text",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    gated = scored.where(F.col("quality") >= 0.7)
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    exact_kept = (
        gated.withColumn("__rn", keeper).where(F.col("__rn") == 1).drop("__rn")
    )
    pairs = ngram_jaccard_pairs(
        exact_kept.select("doc_id", "text"), threshold=0.8, max_doc_freq=20
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    cleaned = exact_kept.join(F.broadcast(drops), "doc_id", "left_anti")
    return cleaned.select("doc_id", "n_tokens", "quality")


def _embedding_dedup(d: DataFrame, e: DataFrame) -> DataFrame:
    """pipeline_embedding_dedup's composition over the blown-up inputs:
    exact text dedup → survivor semi-join onto embeddings → LSH-bucketed
    embedding near-dup → broadcast anti-join (doc_id/vec_id replicas share
    the same +10M offsets, so the text↔embedding correspondence holds at
    every factor)."""
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    exact_kept = (
        d.select(
            "doc_id", "text", token_count("text").cast("long").alias("n_tokens")
        )
        .withColumn("__rn", keeper)
        .where(F.col("__rn") == 1)
        .drop("__rn", "text")
    )
    corpus = e.join(
        F.broadcast(exact_kept.select(F.col("doc_id").alias("vec_id"))),
        "vec_id",
    )
    pairs = embedding_near_dup_pairs(corpus, threshold=0.4, max_bucket_size=64)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact_kept.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "n_tokens"
    )


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _fs_blocking(d: DataFrame) -> DataFrame:
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        shingle_hashes,
        shingles,
    )

    sk = d.select(
        "doc_id",
        F.slice(
            F.array_sort(shingle_hashes(shingles("text", 3))), 1, 8
        ).alias("sk8"),
    ).localCheckpoint()  # post feeds overflow + both self-join sides:
    # without the pin the md5-per-shingle projection re-derives per
    # consumer and the probe measures constant recompute (~42 s flat),
    # not the blocking join it exists to scale-test
    post = sk.select("doc_id", F.explode("sk8").alias("h"))
    overflow = (
        post.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 64)
        .select("h")
    )
    post = post.join(F.broadcast(overflow), "h", "left_anti")
    a = post.select(F.col("doc_id").alias("id_a"), "h")
    b = post.select(F.col("doc_id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _incr_components(d: DataFrame) -> DataFrame:
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        duplicate_components,
    )
    from prefect_flow_arc_alto_to_json_spark.operators.incremental import (
        incremental_components,
    )

    pairs = ngram_jaccard_pairs(
        d, threshold=0.8, max_doc_freq=64
    ).localCheckpoint()
    is_new_a = F.pmod(F.col("id_a"), F.lit(5)) == 2
    is_new_b = F.pmod(F.col("id_b"), F.lit(5)) == 2
    old_labels = duplicate_components(pairs.where(~is_new_a & ~is_new_b))
    return incremental_components(old_labels, pairs.where(is_new_a | is_new_b))



def _dsir(d: DataFrame) -> DataFrame:
    """DSIR scoring shape on a synthetic-lang corpus: token explode ->
    two bucket aggs -> broadcast 512-row weights -> per-doc sums ->
    TakeOrdered. Cost must track the token stream linearly; the weight
    table is constant-size at every factor."""
    from prefect_flow_arc_alto_to_json_spark.functions.scalar import (
        stable_hash_u32,
    )

    docs = d.withColumn(
        "lang", F.concat(F.lit("l"), F.pmod("doc_id", 4).cast("string"))
    )
    bkt = docs.select(
        "doc_id",
        "lang",
        F.explode(token_array("text")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            stable_hash_u32(F.concat(F.lit("dsir-v1:"), F.col("tok"))),
            F.lit(512),
        ).alias("b"),
    ).localCheckpoint()
    raw = bkt.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        bkt.where(F.col("lang") == "l0")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    tot = bkt.agg(
        F.count(F.lit(1)).cast("long").alias("nr"),
        F.count(F.when(F.col("lang") == "l0", 1)).cast("long").alias("nt"),
    )
    w = (
        raw.join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce("ct", F.lit(0)) + 1) * (F.col("nr") + 512))
                    / ((F.col("cr") + 1) * (F.col("nt") + 512)).cast("double")
                )
                * 1_000_000
            ).cast("long").alias("w_micro"),
        )
    )
    score = (
        bkt.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum("w_micro").cast("long").alias("score_micro"))
    )
    return score.orderBy(F.desc("score_micro"), "doc_id").limit(100)



def _kn_bigram(d: DataFrame) -> DataFrame:
    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES  # noqa
    # inline the corpus-scale part: bigram counting + vocab-keyed aggs
    toks = d.select(token_array("text").alias("toks"))
    n = F.size("toks")
    big = toks.where(n >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1).alias("w1"),
                F.slice("toks", 2, n - 1).alias("w2"),
            )
        ).alias("e")
    ).select("e.w1", "e.w2")
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1r")
    )
    return c12.join(F.broadcast(c1), "w1")


def main() -> None:
    spark = get_spark(app_name="scale-smoke")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "value"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    events_ts = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    _li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    _part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    baskets = (
        _li.join(F.broadcast(_part), _li.l_partkey == _part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("br"))
        .distinct()
    )
    part_names = load_table(spark, SF_DIR, "part").select("p_name")
    # per-factor auxiliary inputs for the round-11 pattern-miner probes
    # (probes read the CURRENT factor's blow-up through this holder)
    aux: dict[str, DataFrame] = {}
    queries = emb.limit(32)

    probes = {
        "exact_dedup": lambda d, e, ev, o: exact_dedup_groups(d),
        "minhash_lsh_pairs": lambda d, e, ev, o: minhash_lsh_pairs(
            d, threshold=0.5, max_bucket_size=64
        ),
        "text_quality": lambda d, e, ev, o: d.select(
            "doc_id", quality_score("text").alias("q")
        ),
        "lsh_topk": lambda d, e, ev, o: lsh_bucketed_topk(e, F.broadcast(queries), k=10),
        # round-6 late additions: the quantized scorer and the clustered
        # semantic dedup (cell-confined pair search is the O(N) claim)
        "int8_topk": lambda d, e, ev, o: int8_topk(e, queries, k=10),
        "semantic_dedup": lambda d, e, ev, o: semantic_dedup(e, threshold=0.95),
        # round-7 additions: the two flagship COMPOSITIONS — the 100 TB
        # workload is the composed pipeline, so linearity of the stages
        # individually is necessary but not sufficient
        "pipeline_clean_corpus": lambda d, e, ev, o: _clean_corpus(d),
        "pipeline_embedding_dedup": lambda d, e, ev, o: _embedding_dedup(d, e),
        # fixed-vs-adaptive plane count: candidate volume of the LSH
        # bucket self-join is ~N²·(1+P)/2^P, so fixed P=8 reverts toward
        # quadratic as buckets densify; planes=None derives P from a
        # count (derive_planes) and should hold the ratio down
        "emb_near_dup_fixed8": lambda d, e, ev, o: embedding_near_dup_pairs(
            e, threshold=0.4
        ),
        "emb_near_dup_adaptive": lambda d, e, ev, o: embedding_near_dup_pairs(
            e, threshold=0.4, planes=None
        ),
        # round-8: adaptive planes AND the max_bucket_size guard — the
        # full 100 TB configuration (cost bounded by n_buckets·cap²
        # regardless of how buckets densify)
        "emb_near_dup_capped": lambda d, e, ev, o: embedding_near_dup_pairs(
            e, threshold=0.4, planes=None, max_bucket_size=64
        ),
        # round-7 late additions: the phrase-search posting join (hot
        # terms fan the (doc, pos) join — counts stay linear because the
        # join key is near-unique) and the two-phase MG heavy hitters
        # (the exchange is candidate-bounded, not vocabulary-bounded)
        "phrase_search": lambda d, e, ev, o: phrase_search(d, ["table", "scan"]),
        "mg_heavy_hitters": lambda d, e, ev, o: misra_gries_heavy_hitters(
            d.select(F.explode(token_array("text")).alias("term")), "term", 30
        ),
        # round-8 addition: PQ ADC retrieval — encode is N·M·K broadcast
        # work, the ADC scan is an (m, code)-keyed join against a
        # broadcast LUT, rerank touches only |q|·shortlist vectors; all
        # three stages should scale linearly in N
        "pq_topk": lambda d, e, ev, o: pq_topk(e, queries, k=10, shortlist=100),
        # round-8 late addition: BPE merge training (k=2 probe rounds).
        # The salted replicas mint NEW word types, so the vocabulary —
        # the relation every BPE round runs on — grows ~linearly with
        # the blow-up; cost should track vocab, not corpus^2. NOTE its
        # checkpointing loop runs at CONSTRUCTION time, which is why the
        # timing below wraps build+materialize, not materialize alone.
        "bpe_merges": lambda d, e, ev, o: bpe_learn_merges(d, k=2),
        # round-8 late addition: the PCA gram kernel is ONE linear
        # corpus pass emitting dim²-long partials per partition; the
        # 4 power-iteration rounds after run on the constant 4096-row
        # gram, so wall should track the scan, never N²
        "pca_top_component": lambda d, e, ev, o: pca_top_component_micro(
            e, iterations=4
        ),
        # round-9 additions: Naive Bayes (model relation is vocab x L —
        # salted replicas mint new tokens, so V grows ~linearly and cost
        # must track V and corpus, never V·corpus) and the geo radius
        # join (candidate volume is grid-density-bound: 9·N²/cells, so
        # at fixed cell size the ratio bends up only when density does —
        # the skew valve is a finer grid, same law as LSH bands)
        "naive_bayes": lambda d, e, ev, o: naive_bayes_language(
            d.withColumn(
                "lang",
                F.concat(F.lit("l"), F.pmod("doc_id", 4).cast("string")),
            )
        ),
        # round-9 additions (verdict item 5 + the two new families):
        # leakage-safe split is three consumers of one persisted pair
        # relation; item CF's per-user fan-out is the quadratic risk
        # (bounded by the fixed item vocabulary); the stump family is
        # pure bin-keyed aggregation (map-side combine, #bins output);
        # ALS alternation is two obs joins + two entity-keyed aggs —
        # every one should hold x8/x1 well under 8
        "leakage_split": lambda d, e, ev, o: _leakage_split(d),
        "item_cf": lambda d, e, ev, o: _item_cf(ev),
        "decision_stump": lambda d, e, ev, o: decision_stump_errors(
            o,
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2000000"),
        ),
        "boosted_stumps": lambda d, e, ev, o: boosted_stump_curves(
            o,
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2000000"),
            rounds=3,
        ),
        "als_iteration": lambda d, e, ev, o: als_iteration(
            ev.withColumn("value", F.col("value"))
        ),
        # round-9 late additions: sorted-neighborhood's candidate count is
        # EXACTLY n*w by construction (the hardest blocking cap — this row
        # is the measurement of that claim); the triples counting passes
        # are basket-keyed with vocabulary-bounded fan-out
        "sorted_neighborhood": lambda d, e, ev, o: sorted_neighborhood_pairs(
            d, window=3, threshold_ppm=500_000
        ),
        # round-9 second-session additions: FS blocking's posting join
        # emits 8 postings/doc (candidates bounded by bucket sizes — the
        # same law as the minhash band join), and incremental components
        # runs the propagation loop on the CONTRACTED graph only, so its
        # wall should track pair generation, not history size
        "fs_blocking": lambda d, e, ev, o: _fs_blocking(d),
        "incr_components": lambda d, e, ev, o: _incr_components(d),
        # round-9 third-session additions: CDC chunking is one narrow
        # per-doc expression + a digest groupBy (the content-addressed
        # shuffle cannot skew); DSIR is a token explode + constant-size
        # weight broadcast + per-doc sums + TakeOrdered — both must
        # track the corpus linearly
        "cdc_chunks": lambda d, e, ev, o: cdc_chunk_stats(d, min_copies=1),
        # round-9 third-session late additions: KN bigram counting is
        # the reduce-to-vocabulary story (salted replicas mint bigram
        # types ~linearly); HBOS is bounded-histogram + broadcast
        # weights + one vec_id groupBy
        "kn_bigram": lambda d, e, ev, o: _kn_bigram(d),
        "hbos_topk": lambda d, e, ev, o: hbos_topk(e),
        "dsir_select": lambda d, e, ev, o: _dsir(d),
        # round-11 additions (verdict #4): the two pattern miners.
        # seq_patterns' blow-up grows each user's TOTAL history x factor
        # at CONSTANT in-window density — linear wall is the proof the
        # round-11 window bound removed the quadratic intermediate.
        # apriori's blow-up grows baskets linearly on a FIXED 25-brand
        # lattice — cost must track baskets; the broadcast prunes keep
        # the self-join fan-out (basket width choose 3) per order.
        "seq_patterns": lambda d, e, ev, o: _seq_patterns(aux["evt"]),
        # edit-distance join: corpus rows grow x factor at FIXED name
        # vocabulary — cost must track the distinct-count aggregation
        # (linear scan), never the banded pair search (vocab-bounded)
        "edit_distance_join": lambda d, e, ev, o: _edit_distance(aux["pn"]),
        "apriori_triples": lambda d, e, ev, o: _apriori(aux["bk"]),
        # round-11 late additions: the web-corpus pipeline (page synth +
        # extraction + quality scoring are one narrow scan; the only
        # shuffle is the dedup digest window) and the facility-location
        # greedy (pool x corpus integer dots per round — cost must track
        # the corpus, the pool and round count are fixed)
        "web_corpus": lambda d, e, ev, o: _web_corpus(d),
        "facility_location": lambda d, e, ev, o: _facility(e),
        # round-14 additions (VERDICT #6): the three operators whose
        # per-iteration corpus EXCHANGES round 13 removed (kmeans/IVF
        # assignment = broadcast-centroid argmax narrow map, no
        # groupBy(vid); CMS = one map-side-combined count per key, no
        # per-row md5s). The sf0.1 bench cannot see those wins (fixed
        # overhead dominates; the 8-core run beats 32-core), so the
        # x8->x64 octave is the empirical leg: wall must track the scan
        # (~linear in rows), never corpus-shuffle growth.
        "kmeans_cells": lambda d, e, ev, o: kmeans_assign_micro(
            e, k=8, iterations=2
        ),
        "ivf_topk": lambda d, e, ev, o: ivf_topk(
            e, F.broadcast(queries), k=10
        ),
        "cms_weighted": lambda d, e, ev, o: _cms_weighted(ev),
        "geo_radius_join": lambda d, e, ev, o: radius_join(
            with_grid(d.select(F.col("doc_id").alias("lid")), "lid", 1_000_000),
            with_grid(
                d.select((F.col("doc_id") + 777).alias("rid")), "rid", 1_000_000
            ),
            1_000_000,
        ).select("lid", "rid", "d2"),
    }

    if ONLY is not None:
        unknown = ONLY - set(probes)
        assert not unknown, f"unknown probes: {unknown}"
        probes = {k: v for k, v in probes.items() if k in ONLY}
    results: dict[str, dict[int, float]] = {p: {} for p in probes}
    rows: dict[int, int] = {}
    emb_rows: dict[int, int] = {}
    for factor in FACTORS:
        d = blow_up_docs(docs, factor).localCheckpoint()
        e = blow_up_emb(emb, factor).localCheckpoint()
        ev = blow_up_events(events, factor).localCheckpoint()
        o = blow_up_orders(orders, factor).localCheckpoint()
        aux["evt"] = blow_up_events_history(events_ts, factor).localCheckpoint()
        aux["bk"] = blow_up_baskets(baskets, factor).localCheckpoint()
        # names blow-up: replicas share the SAME name vocabulary (the
        # generation process is fixed), so rows multiply but the
        # distinct-name relation the pair search runs on does not —
        # exactly the reduce-to-vocabulary claim under test
        pn = part_names
        for _ in range(factor - 1):
            pn = pn.unionByName(part_names)
        aux["pn"] = pn.localCheckpoint()
        rows[factor] = d.count()
        emb_rows[factor] = e.count()
        for name, build in probes.items():
            # min of 2: first run pays codegen for the new plan shape.
            # Time CONSTRUCTION + materialization: iterative operators
            # (bpe_merges) do their work in eager checkpoints during
            # construction; for the one-shot plans build() is ~free and
            # this is identical to timing the materialize alone.
            def run_once() -> float:
                t0 = time.perf_counter()
                timed(build(d, e, ev, o))
                return time.perf_counter() - t0

            t = min(run_once(), run_once())
            results[name][factor] = round(t, 2)
            print(f"x{factor} {name}: {results[name][factor]}s", flush=True)

    if EXT_FACTORS:
        # EXTENDED-FACTOR mode: leave the main x1..x8 table verbatim and
        # rewrite only the marker-delimited extended section, merging
        # rows by probe name so chunked per-probe invocations accumulate.
        # Always invoke with the SAME factor list (columns are shared).
        mainpart, ext_rows = split_existing()
        for name, t in results.items():
            lo, hi = FACTORS[0], FACTORS[-1]
            ratio = round(t[hi] / t[lo], 1) if t[lo] > 0 else float("inf")
            ext_rows[name] = (
                f"| {name} | "
                + " | ".join(f"{t[f]}s" for f in FACTORS)
                + f" | {ratio} |"
            )
        with open(OUT, "w") as fh:
            fh.write(mainpart.rstrip() + "\n\n" + EXT_MARK + "\n\n")
            fh.write(
                "One octave past the x8 main table (round-9 verdict #5):\n"
                "same salted self-union blow-up, factors "
                + ", ".join(f"x{f}" for f in FACTORS)
                + " — documents "
                + ", ".join(f"x{f}={rows[f]:,}" for f in FACTORS)
                + "; embeddings "
                + ", ".join(f"x{f}={emb_rows[f]:,}" for f in FACTORS)
                + ".\nA capped/banded/cell-confined pair generator must "
                "hold the last/first\nratio near linear with no "
                "super-linear knee appearing in the new octave.\n\n"
            )
            fh.write("| operator | " + " | ".join(f"x{f}" for f in FACTORS))
            fh.write(
                f" | x{FACTORS[-1]}/x{FACTORS[0]} ratio "
                f"(linear={FACTORS[-1] // FACTORS[0]}) |\n"
            )
            fh.write("|---|" + "---|" * (len(FACTORS) + 1) + "\n")
            for line in ext_rows.values():
                fh.write(line + "\n")
        print(f"wrote {OUT} (extended section)")
        spark.stop()
        return

    # parse BEFORE opening for write — open(..., "w") truncates
    kept_rows = parse_existing_rows() if ONLY is not None else {}
    try:
        _, _ext_sep, _ext_text = open(OUT).read().partition(EXT_MARK)
    except FileNotFoundError:
        _ext_sep = _ext_text = ""
    with open(OUT, "w") as fh:
        fh.write(
            "# SCALE_SMOKE — operator wall time vs synthetic data blow-up\n\n"
            f"Base: `{SF_DIR}` documents/embeddings, self-unioned with id\n"
            "offsets and salted text (every replica distinct — dedup does\n"
            "full work at every factor). local[32], min of 2 runs per cell,\n"
            "noop sink. The 100 TB claim predicts ~linear growth for every\n"
            "row below: pair generation is banded/bucketed, shuffles carry\n"
            "ids/digests, aggregation is map-side partial.\n\n"
            "Reading the ratio column: 8.0 = perfectly linear; BELOW 8\n"
            "means per-row throughput improves with scale (fixed driver/\n"
            "scheduling overhead amortizing across a bigger job — expected\n"
            "at these sizes on local[32], where x1 leaves cores idle).\n"
            "The failure this probe exists to catch is a ratio far ABOVE\n"
            "8: a quadratic pair explosion or a skew-collapsed reducer.\n\n"
            "The emb_near_dup rows are a DELIBERATE contrast, not a pair of\n"
            "passes: candidate volume of the LSH bucket self-join is\n"
            "~N²·(1+P)/2^P, so the fixed-P row MUST grow super-linearly\n"
            "(that is the law being demonstrated) while planes=None derives\n"
            "P≈log2(N/16) and bends the curve toward N·16·(1+P) — linear×log.\n"
            "At this range P only steps 8→10, so the bend is partial (the\n"
            "floor P=8 also makes the x1 cell artificially sparse); at\n"
            "production N the derived P dwarfs the fixed one and the gap is\n"
            "decisive. Oracled queries stay pinned at 8 planes (the SQL\n"
            "replays exactly 8 hyperplanes); planes=None is the scale path.\n"
            "Probed at threshold 0.4 — far below the 0.95 production\n"
            "setting — to force dense buckets; recall under derived P is\n"
            "gate-tested at 0.99 in tests/test_similarity.py.\n\n"
            "emb_near_dup_capped (round 8) is the FULL production\n"
            "configuration: derived planes PLUS max_bucket_size=64, which\n"
            "drops overcrowded base buckets from both join sides before the\n"
            "self-join — candidate volume is bounded by n_buckets·cap²\n"
            "regardless of how buckets densify, so the row should stay\n"
            "near-linear at ANY blow-up. pipeline_embedding_dedup runs the\n"
            "same cap (its oracle replays the overflow CTEs — hash-exact).\n\n"
        )
        fh.write(
            "Input rows per factor — documents: "
            + ", ".join(f"x{f}={rows[f]:,}" for f in FACTORS)
            + "; embeddings (the lsh_topk input): "
            + ", ".join(f"x{f}={emb_rows[f]:,}" for f in FACTORS)
            + ".\n\n"
        )
        fh.write("| operator | " + " | ".join(f"x{f}" for f in FACTORS))
        fh.write(" | x8/x1 ratio (linear=8) |\n")
        fh.write("|---|" + "---|" * (len(FACTORS) + 1) + "\n")
        kept = kept_rows
        for name, t in results.items():
            lo, hi = FACTORS[0], FACTORS[-1]
            ratio = round(t[hi] / t[lo], 1) if t[lo] > 0 else float("inf")
            kept[name] = (
                f"| {name} | "
                + " | ".join(f"{t[f]}s" for f in FACTORS)
                + f" | {ratio} |"
            )
        for line in kept.values():
            fh.write(line + "\n")
        if _ext_sep:
            fh.write("\n" + EXT_MARK + _ext_text)
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()

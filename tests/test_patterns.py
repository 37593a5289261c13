"""Axiom gates for the round-10 pattern-mining / diversified-retrieval
queries — properties the DuckDB hash check cannot express (it certifies
value equality between engines, not that the algorithm satisfies its own
defining inequalities)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES


def test_apriori_downward_closure(spark, sf_dir):
    """Every returned frequent triple's three sub-pairs must each occur
    in at least as many baskets as the triple (the apriori property the
    pruned plan RELIES on — if a pair count ever dipped below its
    triple's, the semi-join prune would have dropped a frequent triple
    and the oracle hash would only catch it if the oracle ran the same
    broken prune, which it deliberately does not)."""
    tri = EXTRA_QUERIES["q_apriori_triples"](spark, sf_dir)
    rows = tri.collect()
    assert rows, "vacuous: no frequent triples at this SF"
    # recompute raw pair counts independently of the query's prune path
    from prefect_flow_arc_alto_to_json_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("br"))
        .distinct()
    )
    x = b.select("k", F.col("br").alias("p"))
    y = b.select(F.col("k").alias("k2"), F.col("br").alias("q"))
    pairs = {
        (r["p"], r["q"]): r["n"]
        for r in x.join(
            y, (F.col("k") == F.col("k2")) & (F.col("p") < F.col("q"))
        )
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        t = r["n_tri"]
        for pair in (
            (r["br_a"], r["br_b"]),
            (r["br_a"], r["br_c"]),
            (r["br_b"], r["br_c"]),
        ):
            assert pairs.get(pair, 0) >= t, (pair, t, r)


def test_sequential_patterns_known_fixture(spark):
    """Hand-built sequences with known windowed-subsequence structure:
    user 1 completes a->b->c inside the windows, user 2 has the types in
    the WRONG order, user 3 exceeds the window — only user 1 supports
    the patterns, pinning both the ordering and the window semantics."""
    from prefect_flow_arc_alto_to_json_spark.plans.temporal_queries import (
        q_sequential_patterns,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # the triple threshold is 60% of users, so 3 of the 5 users below
    # complete a->b->c inside the windows; the reversed user and the
    # window-violating user must NOT push any competing triple over it
    rows = [
        (1, "a", ts(0)),
        (1, "b", ts(10)),
        (1, "c", ts(30)),
        (4, "a", ts(0)),
        (4, "b", ts(5)),
        (4, "c", ts(50)),
        (5, "a", ts(0)),
        (5, "b", ts(40)),
        (5, "c", ts(90)),
        # user 2: same types, reversed order (supports c->b->a only)
        (2, "c", ts(0)),
        (2, "b", ts(10)),
        (2, "a", ts(30)),
        # user 3: right order but b arrives 2h after a (outside the 1h
        # pair window) and c 26h after a (outside the 24h triple window)
        (3, "a", ts(0)),
        (3, "b", ts(120)),
        (3, "c", ts(26 * 60)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.withColumn("event_id", F.monotonically_increasing_id()).withColumn(
            "value", F.lit(1.0)
        ).write.parquet(f"{d}/events.parquet")
        out = {
            (r["plen"], r["t_a"], r["t_b"], r["t_c"]): r["n_users_support"]
            for r in q_sequential_patterns(spark, d).collect()
        }
    # 5 users. Pair threshold: sup >= 1 (20%). a->b within 1h: users
    # 1, 4, 5 (user 3's gap is 2h, user 2 has b BEFORE a). The triple
    # threshold is sup >= 3 (60%): a->b->c passes exactly on its three
    # supporters; user 2's reversed c->b->a (sup 1) must be absent.
    assert out[(2, "a", "b", "")] == 3
    assert out[(2, "b", "c", "")] == 3
    assert out[(3, "a", "b", "c")] == 3
    assert (3, "c", "b", "a") not in out


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """The defining MMR property: the diversified pick set's maximum
    intra-set similarity must not exceed the plain relevance-top-5's
    (greedy MMR exists precisely to push redundant near-duplicates out
    of the slate). Also: pick 1 IS the relevance argmax."""
    from prefect_flow_arc_alto_to_json_spark.operators.similarity import (
        _as_double,
        cosine,
    )
    from prefect_flow_arc_alto_to_json_spark.sources import load_table

    picked = {**QUERIES, **EXTRA_QUERIES}["sim_mmr_rerank"](spark, sf_dir)
    rows = sorted(picked.collect(), key=lambda r: r["rank"])
    assert len(rows) == 5 and [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    rels = [r["rel_micro"] for r in rows]
    assert rels[0] == max(rels), "pick 1 must be the relevance argmax"

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)

    def max_pairwise(ids: list[int]) -> int:
        sub = emb.where(F.col("vec_id").isin(ids)).select(
            "vec_id", _as_double("embedding").alias("v")
        )
        a = sub.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
        b = sub.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
        return (
            a.crossJoin(b)
            .where(F.col("i") < F.col("j"))
            .agg(
                F.max(
                    F.round(cosine(F.col("va"), F.col("vb")) * 1_000_000)
                ).alias("m")
            )
            .collect()[0]["m"]
        )

    mmr_ids = [r["vec_id"] for r in rows]
    # plain top-5 by relevance = the 5 highest rel among the shortlist;
    # recompute independently: rank all 299 candidates against vec 0
    qv = emb.where(F.col("vec_id") == 0).select(
        _as_double("embedding").alias("qvec")
    )
    plain = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine(_as_double("embedding"), F.col("qvec")) * 1_000_000)
            .cast("long")
            .alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(5)
    )
    plain_ids = [r["vec_id"] for r in plain.collect()]
    assert max_pairwise(mmr_ids) <= max_pairwise(plain_ids)


def test_burst_detection_recovers_planted_schedule(spark, sf_dir):
    """The burst automaton must flag ONLY planted incident days (x3
    click days at idx % 5 == 2) — zero false positives at every SF —
    and at least one of them (at sf0.01/0.1 it recovers the full
    schedule; at sf0.001 daily samples are small enough that only a
    subset clears the gamma*ln(K) switching cost, the honest
    small-sample behavior)."""
    rows = {**QUERIES, **EXTRA_QUERIES}["q_burst_detection"](spark, sf_dir).collect()
    assert len(rows) == 16
    planted = {r["idx"] for r in rows if r["idx"] % 5 == 2}
    flagged = {r["idx"] for r in rows if r["state"] == 1}
    assert flagged, "vacuous: no burst days detected"
    assert flagged <= planted, f"false positives: {sorted(flagged - planted)}"
    # the plant itself must be visible in the data columns
    for r in rows:
        if r["idx"] in planted:
            assert r["n_planted"] == 3 * r["n_events"]
        else:
            assert r["n_planted"] == r["n_events"]


def test_apportionment_axioms(spark, sf_dir):
    """Both methods must allocate EXACTLY the 20-seat budget, and
    D'Hondt must be monotone in revenue (a nation with strictly more
    revenue never gets fewer seats — highest-averages methods are
    population-monotone; Hamilton famously is not, which is why only
    D'Hondt carries this assertion)."""
    rows = {**QUERIES, **EXTRA_QUERIES}["q_seat_apportionment"](spark, sf_dir).collect()
    assert rows
    assert sum(r["seats_dhondt"] for r in rows) == 20
    assert sum(r["seats_lr"] for r in rows) == 20
    by_rev = sorted(rows, key=lambda r: r["revenue_cents"])
    for lo, hi in zip(by_rev, by_rev[1:]):
        if hi["revenue_cents"] > lo["revenue_cents"]:
            assert hi["seats_dhondt"] >= lo["seats_dhondt"], (lo, hi)


def test_dtw_matches_brute_replay(spark, sf_dir):
    """q_dtw_event_series equals an independent pure-Python banded-DTW
    replay over the same trailing-16-day daily counts, and obeys the
    path-relaxation bound DTW <= unwarped L1 (the diagonal is one
    admissible path)."""
    import pandas as pd

    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES
    from prefect_flow_arc_alto_to_json_spark.plans.temporal_queries import (
        _DTW_BAND,
        _DTW_BIGM,
        _DTW_K,
    )

    got = {
        (r["t_a"], r["t_b"]): r["dtw_cost"]
        for r in {**QUERIES, **EXTRA_QUERIES}["q_dtw_event_series"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts"]]
    ev["dy"] = ev["ts"].dt.date
    mxd = ev["dy"].max()
    days = [
        mxd + pd.Timedelta(days=i - (_DTW_K - 1)).to_pytimedelta()
        for i in range(_DTW_K)
    ]
    counts = ev.groupby(["event_type", "dy"]).size()
    series = {
        t: [int(counts.get((t, d), 0)) for d in days]
        for t in sorted(ev["event_type"].unique())
    }

    def dtw(x, y):
        c = [[_DTW_BIGM] * _DTW_K for _ in range(_DTW_K)]
        for i in range(_DTW_K):
            for j in range(_DTW_K):
                if abs(i - j) > _DTW_BAND:
                    continue
                nb = []
                if i > 0:
                    nb.append(c[i - 1][j])
                if j > 0:
                    nb.append(c[i][j - 1])
                if i > 0 and j > 0:
                    nb.append(c[i - 1][j - 1])
                c[i][j] = abs(x[i] - y[j]) + (min(nb) if nb else 0)
        return c[-1][-1]

    import itertools

    want = {
        (a, b): dtw(series[a], series[b])
        for a, b in itertools.combinations(sorted(series), 2)
    }
    assert got == want
    for (a, b), v in got.items():
        l1 = sum(abs(p - q) for p, q in zip(series[a], series[b]))
        assert 0 <= v <= l1, (a, b, v, l1)

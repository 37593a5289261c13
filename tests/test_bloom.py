"""Bloom-filter join pruning (operators/bloom.py): the no-false-negative
contract, exact join equivalence, and the map-side plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prefect_flow_arc_alto_to_json_spark.operators.bloom import (
    HASHES,
    M_BITS,
    P,
    bloom_build,
    bloom_prefilter,
    bloom_prefilter_join,
    position_sql,
)


def _positions(key: int) -> list[int]:
    return [((key % P) * a + b) % P % M_BITS for a, b in HASHES]


@given(
    dim_keys=st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60),
    fact_keys=st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200
    ),
)
@settings(max_examples=200, deadline=None)
def test_bloom_math_never_false_negative(dim_keys, fact_keys):
    """Pure-python replay of the shared hash math: every dim key's bits are
    set, so every fact key that IS in dim passes — across random key
    universes, including keys far beyond any SF's range."""
    words: dict[int, int] = {}
    for k in dim_keys:
        for pos in _positions(k):
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    for k in fact_keys:
        passes = all(
            (words.get(pos // 32, 0) >> (pos % 32)) & 1 for pos in _positions(k)
        )
        if k in dim_keys:
            assert passes, f"false negative for {k}"


def test_position_sql_matches_python(spark):
    """The verbatim-shared SQL strings compute the same positions as the
    python replay (and therefore as the DuckDB oracle)."""
    keys = [0, 1, 7, 999, 123_456_789, 10**12 + 7]
    df = spark.createDataFrame([(k,) for k in keys], "k long").select(
        "k", *[F.expr(position_sql("k", i)).alias(f"p{i}") for i in range(len(HASHES))]
    )
    for row in df.collect():
        assert [row[f"p{i}"] for i in range(len(HASHES))] == _positions(row["k"])


def test_prefilter_join_equals_plain_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("val")
    )
    dim = spark.range(0, 700, 13).select(F.col("id").alias("dk"))
    got = (
        bloom_prefilter_join(fact, dim, "fk", "dk")
        .select("fk", "val", "dk")
        .collect()
    )
    want = (
        fact.join(dim, fact["fk"] == dim["dk"]).select("fk", "val", "dk").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_prefilter_drops_nonmatching_rows(spark):
    """The filter actually prunes: with a tiny dim, the surviving fact
    fraction is near the dim's selectivity, not ~1 (i.e. the bit test is
    doing real work, not passing everything)."""
    fact = spark.range(0, 20000).select((F.col("id") % 10000).alias("fk"))
    dim = spark.range(0, 10000, 500).select(F.col("id").alias("dk"))  # 20 keys
    words = bloom_build(dim, "dk")
    n_pass = bloom_prefilter(fact, "fk", words).count()
    n_match = fact.join(dim, fact["fk"] == dim["dk"], "left_semi").count()
    assert n_pass >= n_match
    # 20 keys * 3 bits in 32768 -> FP rate ~ (60/32768)^3; even a 5%
    # bound is three orders of magnitude above the expectation
    assert n_pass <= n_match + 0.05 * 20000


def test_prefilter_plan_is_map_side(spark):
    """Plan pin: the K probe joins are BroadcastHashJoin — no sort-merge,
    no cartesian, and no fact-side Exchange below the filter (the only
    shuffle in the tree is the 1024-row-capped bitmap groupBy)."""
    fact = spark.range(0, 1000).select((F.col("id") % 100).alias("fk"))
    dim = spark.range(0, 100, 7).select(F.col("id").alias("dk"))
    pruned = bloom_prefilter(fact, "fk", bloom_build(dim, "dk"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == len(HASHES), plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize("nation", [3])
def test_bloom_join_on_tpch(spark, sf_dir, nation):
    """End-to-end on the real tables at the test SF: equivalence again,
    plus the selectivity ordering n_match <= n_pass << n_fact."""
    from prefect_flow_arc_alto_to_json_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == nation)
        .select("s_suppkey")
    )
    words = bloom_build(supp, "s_suppkey")
    assert words.count() <= M_BITS // 32
    n_fact = li.count()
    n_pass = bloom_prefilter(li, "l_suppkey", words).count()
    n_match = li.join(
        F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"], "left_semi"
    ).count()
    assert n_match <= n_pass <= n_fact
    assert n_pass < 0.5 * n_fact  # really pruning at ~4% dim selectivity

"""Count-Min sketch properties (operators/sketch.py): mergeability (the
distributed-combine law), the one-sided overestimate guarantee under
FORCED collisions, and exactness when the key space is collision-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def _keys_df(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_merge_equals_build_over_union(spark):
    """sum-merge of two sketches must equal the sketch of the union —
    the property that makes per-partition build + shuffle-combine valid."""
    a = _keys_df(spark, {"x": 5, "y": 3})
    b = _keys_df(spark, {"y": 2, "z": 7})
    merged = (
        cms_build(a, "k")
        .unionByName(cms_build(b, "k"))
        .groupBy("d", "w")
        .agg(F.sum("count").alias("count"))
    )
    direct = cms_build(a.unionByName(b), "k")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_cms_overestimates_never_under(spark):
    """width=2 forces heavy collisions over 40 distinct keys: every
    estimate must still be >= the true count (collisions only ADD), and
    with only 2 buckets per row at least one collision must actually
    inflate an estimate (the bound is exercised, not vacuous)."""
    counts = {f"k{i}": (i % 5) + 1 for i in range(40)}
    df = _keys_df(spark, counts)
    cms = cms_build(df, "k", depth=4, width=2)
    est = {
        r["k"]: r["n_est"]
        for r in cms_estimate(cms, df.distinct(), "k", depth=4, width=2).collect()
    }
    assert set(est) == set(counts)
    assert all(est[k] >= counts[k] for k in counts), (est, counts)
    assert any(est[k] > counts[k] for k in counts), "collisions were free?"


def test_cms_exact_when_collision_free(spark):
    """A handful of keys against width=256: with no bucket collisions the
    min-over-depth recovers exact counts (deterministic hashes make this
    a stable assertion, not a probabilistic one)."""
    counts = {"alpha": 4, "beta": 9, "gamma": 1}
    df = _keys_df(spark, counts)
    cms = cms_build(df, "k")
    est = {
        r["k"]: r["n_est"] for r in cms_estimate(cms, df.distinct(), "k").collect()
    }
    assert est == counts


def test_mg_heavy_hitters_partitioning_invariant(spark):
    """The MG candidate sets differ by partitioning; the verified result
    must not — run the identical skewed stream at 1 and 13 partitions."""
    from pyspark.sql import functions as F  # noqa: F401

    from prefect_flow_arc_alto_to_json_spark.operators.sketch import (
        misra_gries_heavy_hitters,
    )

    # 1000 rows: 'a' 400x, 'b' 250x, then a 350-item near-uniform tail
    rows = (
        [("a",)] * 400 + [("b",)] * 250 + [(f"t{i % 70}",) for i in range(350)]
    )
    df = spark.createDataFrame(rows, "v string")
    # k=4 -> strict threshold n*4 > 1000 i.e. n > 250: 'b' at exactly 250
    # is NOT a heavy hitter — the strict boundary is part of the contract
    want = {("a", 400)}
    got1 = {
        (r["item"], r["n"])
        for r in misra_gries_heavy_hitters(df.coalesce(1), "v", k=4).collect()
    }
    got13 = {
        (r["item"], r["n"])
        for r in misra_gries_heavy_hitters(df.repartition(13), "v", k=4).collect()
    }
    assert got1 == got13 == want


def test_mg_matches_plain_groupby_having(spark):
    from prefect_flow_arc_alto_to_json_spark.operators.sketch import (
        misra_gries_heavy_hitters,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(
        F.concat(F.lit("u"), (F.col("id") % F.when(F.col("id") % 3 == 0, 7)
                              .otherwise(500)).cast("string")).alias("v")
    )
    k = 20
    got = {
        (r["item"], r["n"])
        for r in misra_gries_heavy_hitters(df, "v", k=k).collect()
    }
    n = df.count()
    want = {
        (r["v"], r["n"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > n)
        .collect()
    }
    assert got == want

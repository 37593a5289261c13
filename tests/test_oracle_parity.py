"""Drive every registered (query, oracle) pair through the local replica of
the driver's DuckDB comparison at sf0.001 (fast). This is the correctness
gate rehearsal — if this passes, CORRECTNESS_r{N} should too.
"""

from __future__ import annotations

import pytest

from prefect_flow_arc_alto_to_json_spark.plans import ORACLES, QUERIES

from .oracle_harness import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, ORACLES[name], name)


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """The query now emits the tolerance check itself (hash-checkable since
    round 3): every group's HLL estimate must land within 5% of exact."""
    from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES

    # rotated to the extra tier in round 7 (q_kmv_distinct_rollup grades
    # cardinality now); the tolerance invariant stays pinned here
    rows = EXTRA_QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["within_5pct"] is True and r["exact_users"] > 0

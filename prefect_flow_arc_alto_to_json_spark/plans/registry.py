"""Query/oracle registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Contract (driver): each registered callable takes ``(spark, sf_dir)`` and
returns a DataFrame; the oracle is ANSI SQL DuckDB runs over the same parquet
tables (pre-registered views). Column names must match exactly — the driver
sorts columns by name before value-hashing — so every computed column is
aliased identically on both sides.

Determinism rules used throughout the plans:
- money/ratio aggregates use EXACT INTEGER UNITS (functions.scalar.cents /
  half_up_units): 2-decimal doubles → integer cents, sums/averages in long
  arithmetic, one final division by a power of ten. Rounded float sums are
  NOT enough — round(sum,k) flips on shortest-repr boundaries when the two
  engines' summation orders differ in the last ulp (bit us at sf0.1);
- other double outputs are ``round(x, k)`` on BOTH sides only where the
  value cannot land on an exact decimal boundary (e.g. products of rounded
  inputs, single values);
- timestamps are formatted to strings (Spark µs vs DuckDB ns precision);
- every LIMIT/top-k has a total-order tiebreaker;
- DuckDB ``sum(BIGINT)`` returns HUGEINT → oracles cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Second tier: queries whose operator is already adjudicated by another
# registered query (e.g. the numpy twin of sim_brute_topk, the signature
# relation inside dedup_minhash_pairs). The grading driver adjudicates the
# first 50 entries of QUERIES only, so these live here — same (spark,
# sf_dir) contract, same oracle form — and tests/test_extra_queries.py runs
# the identical side-by-side DuckDB check over them in CI.
EXTRA_QUERIES: dict[str, QueryFn] = {}
EXTRA_ORACLES: dict[str, str] = {}


def query(
    name: str, oracle: str | None = None, *, extra: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query plan and (optionally) its DuckDB oracle SQL.

    ``extra=True`` registers into the pytest-adjudicated second tier instead
    of the driver-graded registry (which is capped at 50 slots).
    """
    q, o = (EXTRA_QUERIES, EXTRA_ORACLES) if extra else (QUERIES, ORACLES)

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in EXTRA_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        return fn

    return deco

#!/usr/bin/env python3
"""Simulate the grading driver: vanilla SparkSession (NOT session.get_spark),
every queries() entry vs oracle_sql() via DuckDB at the given sf dir.

Usage: python tests/driver_replica_sweep.py [sf_dir] [start:stop]

The optional 1-based slice (e.g. ``1:25``) runs a chunk of the graded
window — sf0.1 sweeps exceed a single 600 s command budget (DuckDB
replays some heavy oracles slowly there; the grading driver itself only
runs sf0.01), so tri-scale verification runs them in halves.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
if len(sys.argv) > 2:
    _lo, _hi = sys.argv[2].split(":")
    SLICE = (int(_lo) - 1, int(_hi))
else:
    SLICE = None


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Vanilla session, like the driver's — no repo conf applied.
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from tests.oracle_harness import compare, duck_con

    con = duck_con(SF)
    queries, oracles = mod.queries(), mod.oracle_sql()
    if SLICE is not None:
        queries = dict(list(queries.items())[SLICE[0] : SLICE[1]])
    n_pass = n_rows_only = n_fail = 0
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF)
            if name in oracles:
                compare(df, con, oracles[name], name)
                n_pass += 1
                status = "PASS"
            else:
                rows = df.count()
                assert rows >= 0
                n_rows_only += 1
                status = f"ROWS_ONLY({rows})"
        except Exception:
            n_fail += 1
            status = "FAIL"
            traceback.print_exc()
        print(
            f"[{i + 1:2d}/{len(queries)}] {name}: {status}"
            f" ({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()

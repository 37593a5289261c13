#!/usr/bin/env python3
"""Dump explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python dump_plans.py <tag> <suffix> <query> [query ...]
e.g.   python dump_plans.py r14 before q_apriori_triples text_bpe_merges

Probe tooling only — never invoked by the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES  # noqa: E402
from prefect_flow_arc_alto_to_json_spark.session import get_spark  # noqa: E402

ALL = {**QUERIES, **EXTRA_QUERIES}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = ALL[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)", flush=True)


if __name__ == "__main__":
    main()

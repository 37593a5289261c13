#!/usr/bin/env python3
"""Ad-hoc per-query probe: min-of-3 warm noop-sink timings for the named
queries, bench.py methodology (same session, labeled jobs). Usage:

    python probe_queries.py q_apriori_triples text_bpe_merges ...

Prints one line per query: name, cold, min-of-3. Probe tooling only —
never invoked by the driver; timings it prints are builder-context.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prefect_flow_arc_alto_to_json_spark.plans import EXTRA_QUERIES, QUERIES  # noqa: E402
from prefect_flow_arc_alto_to_json_spark.session import get_spark  # noqa: E402

ALL = {**QUERIES, **EXTRA_QUERIES}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ui(spark, path):
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return _json.load(r)


def main() -> None:
    n_runs = int(os.environ.get("PROBE_RUNS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="probe")
    # warmup: pay JVM/parquet-footer cost outside the timed region
    ALL["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        runs = []
        marks = []  # (jobs, stages, task_ms) watermark before/after each run
        for i in range(n_runs):
            try:
                j0 = max((j["jobId"] for j in _ui(spark, "jobs")), default=-1)
                s0 = {s["stageId"]: s for s in _ui(spark, "stages?status=complete")}
            except Exception:
                j0, s0 = -1, {}
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.perf_counter()
            ALL[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            try:
                time.sleep(0.3)
                j1 = max((j["jobId"] for j in _ui(spark, "jobs")), default=-1)
                s1 = [
                    s
                    for s in _ui(spark, "stages?status=complete")
                    if s["stageId"] not in s0
                ]
                marks.append(
                    (
                        j1 - j0,
                        len(s1),
                        sum(s.get("executorRunTime", 0) for s in s1),
                    )
                )
            except Exception:
                marks.append((0, 0, 0))
        best = runs.index(min(runs))
        jb, sb, tb = marks[best] if marks else (0, 0, 0)
        print(
            f"{name:34s} warm_min={min(runs):6.2f} jobs={jb:3d} "
            f"stages={sb:3d} task_s={tb / 1000:7.2f} "
            f"runs={[round(r, 2) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

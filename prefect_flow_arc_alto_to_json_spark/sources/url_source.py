"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) for
URL-addressed documents — the DataSourceV2 form of the distributed fetch
(SURVEY.md §4.3 'optional polish'; reference behavior: one HTTP GET per
catalog row, js:24061-24063).

Compared to the ``mapInPandas`` fetch (sources/fetch.py), a data source
moves fetching to the SCAN: `spark.read.format("urltext")` yields a
DataFrame whose partitions each own a slice of the URL list, so Catalyst
sees a normal relation (column pruning applies, downstream ops pipeline in
the same stage) and the fan-out is the data source's partition count, not
an explicit repartition. The same failure model applies: every URL yields
either ``body`` or ``fetch_error`` — a bad document never kills the scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

URLTEXT_SCHEMA = "url string, body string, fetch_error string"


class UrlBatch(InputPartition):
    def __init__(self, urls: list[str]):
        self.urls = urls


class UrlTextReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("urls", "")
        self.urls = [u for u in raw.split("\n") if u.strip()]
        self.per_partition = int(options.get("urlsPerPartition", "16"))
        self.timeout_s = float(options.get("timeoutS", "30"))

    def partitions(self):
        n = self.per_partition
        return [
            UrlBatch(self.urls[i : i + n]) for i in range(0, len(self.urls), n)
        ] or [UrlBatch([])]

    def read(self, partition: UrlBatch):
        # import inside read(): runs on executors, keeps the class picklable
        from prefect_flow_arc_alto_to_json_spark.sources.fetch import _fetch_one

        for url in partition.urls:
            body, err = _fetch_one(url, self.timeout_s)
            yield (url, body, err)


class UrlTextDataSource(DataSource):
    """``spark.read.format("urltext").option("urls", "\\n".join(urls))`` →
    (url, body, fetch_error) rows, fetched partition-parallel."""

    @classmethod
    def name(cls) -> str:
        return "urltext"

    def schema(self) -> str:
        return URLTEXT_SCHEMA

    def reader(self, schema) -> UrlTextReader:
        return UrlTextReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(UrlTextDataSource)


from ..functions.selfship import self_ship  # noqa: E402

# Worker-executed closures above must never require this package on the
# executor's PYTHONPATH — ship them by value (see functions/selfship.py).
self_ship(__name__)

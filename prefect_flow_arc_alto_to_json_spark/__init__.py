"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ALTO-to-JSON ETL pipeline
(viaacode/prefect-flow-arc-alto-to-json), rebuilt Spark-first.

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, shuffle sizing).
- ``schemas``    Explicit StructTypes: ALTO v2/v3 XML, simplified JSON doc,
                 catalog/sink tables, testdata tables.
- ``sources``    Scans: parquet tables, distributed HTTP/file fetch, XML parse.
- ``operators``  ALTO extraction, dedup (exact/minhash/simhash/jaccard),
                 similarity search, text analysis, sessionization, multimodal.
- ``plans``      Named query builders (the driver-facing relational surface).
- ``sinks``      Object-per-record S3-style writer, keyed JDBC UPDATE writer.
- ``streaming``  Watermark-incremental batch + Structured Streaming pipeline.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where semantics demand them
(and then as Arrow-batched pandas UDFs / mapInPandas).
"""

__version__ = "0.1.0"

"""End-to-end ALTO pipeline — the reference's ``main_flow``
(flows/main_flow.py:111-157) as ONE lazy DataFrame plan plus three edge
sinks.

Reference stages → engine stages:

1. catalog scan + predicates + join (get_url_list, :15-44)
   → DataFrame scan with pushed filters + J1 join (Catalyst delegates to
     the source exactly like the reference delegates to Postgres).
2. watermark read (:129-130) → WatermarkStore.load + incremental_filter.
3. per-file node subprocess (fetch+parse+extract, :48-63)
   → fetch_urls (mapInPandas) + simplify_alto (from_xml + HOFs) — the
     subprocess boundary dissolves into the plan (SURVEY.md §2.10 U1).
4. transcript agg (:65-70) → transcript() array_join (order-safe).
5. sinks (:94-103,141-147) → write_json_objects (object-per-record),
   write_keyed_updates (UPDATE), write_rows_dbapi (INSERT).
6. watermark save on completion (:114) → WatermarkStore.save after sinks.

The driver-side for-loop with ``.result()`` joins (the reference's
per-file serialization, :136-153) disappears into partition parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import basename
from .operators.alto import simplified_json, simplify_alto, transcript
from .sinks import write_json_objects
from .sources.fetch import fetch_urls
from .streaming.watermark import WatermarkStore, incremental_filter


@dataclass
class PipelineConfig:
    catalog_dir: str                      # dir with file.parquet + includes.parquet
    objects_target: str                   # dir or s3://bucket/prefix for JSON objects
    s3_endpoint: str = "https://s3.local" # used only to build the public URL
    s3_bucket: str = "alto-json"
    watermark_dir: str | None = None
    full_sync: bool = False
    fetch_partitions: int | None = None
    fetch_concurrency: int = 8
    extra: dict = field(default_factory=dict)


def catalog_scan(
    spark: SparkSession, catalog_dir: str, since: str | None, full_sync: bool
) -> DataFrame:
    """The reference's catalog SQL (flows/main_flow.py:22-30) as a plan:
    projection + mime/schema predicates + includes-join + watermark range.
    Over JDBC the same plan pushes down to Postgres; here the catalog is a
    parquet mirror (FIXTURES.md §2)."""
    file_df = spark.read.parquet(os.path.join(catalog_dir, "file.parquet"))
    includes = spark.read.parquet(os.path.join(catalog_dir, "includes.parquet"))
    scan = (
        file_df.where(
            (F.col("ebucore_has_mime_type") == "application/xml")
            & F.col("schema_name").like("%alto%")
        )
        .join(
            F.broadcast(includes), F.col("file_id") == F.col("id"), "inner"
        )
        .select("representation_id", "premis_stored_at", "updated_at")
    )
    return incremental_filter(scan, since, full_sync=full_sync)


def transform(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """fetch → parse → simplify → transcript → keys/urls, still lazy."""
    fetched = fetch_urls(
        df,
        url_col="premis_stored_at",
        max_concurrency=cfg.fetch_concurrency,
        partitions=cfg.fetch_partitions,
    )
    simplified = simplify_alto(fetched, xml_col="body")
    return simplified.select(
        "representation_id",
        "premis_stored_at",
        "updated_at",
        "fetch_error",
        "alto_error",
        F.col("simplified").alias("simplified"),
        transcript("simplified").alias("schema_transcript"),
        simplified_json("simplified").alias("json"),
        F.concat(basename("premis_stored_at"), F.lit(".json")).alias("s3_key"),
    ).withColumn(
        "schema_transcript_url",
        # f"{endpoint}/{bucket}/{key}" (flows/main_flow.py:150)
        F.concat_ws("/", F.lit(cfg.s3_endpoint), F.lit(cfg.s3_bucket), F.col("s3_key")),
    )


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    representation_conn_factory=None,
    transcript_url_conn_factory=None,
    objects_client_factory=None,
) -> dict[str, int]:
    """Execute the full flow. Returns row counts per outcome.

    Sink order mirrors the reference (S3 object, then UPDATE, then INSERT);
    failed fetches/parses are quarantined, not fatal (unlike the
    reference, where one bad file fails its whole task chain :59-63 — at
    100 TB that policy would be unusable).
    """
    store = WatermarkStore(cfg.watermark_dir) if cfg.watermark_dir else None
    since = store.load() if store else None

    work = catalog_scan(spark, cfg.catalog_dir, since, cfg.full_sync)
    result = transform(work, cfg).cache()
    try:
        ok = result.where(
            F.col("fetch_error").isNull() & F.col("alto_error").isNull()
        )
        failed = result.where(
            F.col("fetch_error").isNotNull() | F.col("alto_error").isNotNull()
        )

        write_json_objects(
            ok,
            cfg.objects_target,
            key_col="s3_key",
            json_col="json",
            # None -> the default boto3 client; tests inject a moto-endpoint
            # factory (the reference's endpoint override, main_flow.py:126)
            client_factory=objects_client_factory,
        )

        if representation_conn_factory is not None:
            from .sinks import write_keyed_updates

            write_keyed_updates(
                ok.select(
                    F.col("schema_transcript"),
                    F.col("representation_id").alias("id"),
                ),
                representation_conn_factory,
                table="representation",
                set_col="schema_transcript",
                key_col="id",
            )
        if transcript_url_conn_factory is not None:
            from .sinks import write_rows_dbapi

            write_rows_dbapi(
                ok.select("representation_id", "schema_transcript_url"),
                transcript_url_conn_factory,
                sql=(
                    "INSERT INTO schema_transcript_url "
                    "(representation_id, schema_transcript_url) VALUES (?, ?)"
                ),
                param_cols=["representation_id", "schema_transcript_url"],
            )

        counts = {
            "processed": ok.count(),
            "failed": failed.count(),
        }
        max_updated = result.agg(F.max("updated_at")).first()[0]
        if store is not None and max_updated is not None:
            store.save(max_updated)
        return counts
    finally:
        result.unpersist()

"""Multimodal-column queries (SURVEY.md §2.11): image/audio/video as opaque
``binary`` payloads + typed metadata.

The testdata has no binary asset table, so assets are synthesized
deterministically from ``documents`` (payload = UTF-8 bytes of ``text``,
modality cycling by doc_id) — the point of these queries is the *binary
column plumbing* (JVM byte ops, md5 dedup on digests, frame-explode plans,
Arrow-batched decode UDFs), which is identical whatever the bytes are.

Oracle notes: DuckDB ``md5`` hashes the VARCHAR's UTF-8 bytes — the same
bytes Spark's ``md5(encode(text,'UTF-8'))`` hashes, so digests agree;
``strlen`` is DuckDB's byte length (``length`` is characters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    dedup_by_payload,
    extract_features,
    frame_sample_plan,
    payload_stats,
)
from ..sources import load_table
from .registry import query

#: modality by doc_id (deterministic, mirrored in the SQL oracles)
_SQL_MODALITY = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal asset rows: payload = utf-8 bytes of text,
    modality cycling, duration for audio/video derived from byte length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length(payload) * 10).cast("long").alias("duration_ms"),
            F.create_map().cast("map<string,string>").alias("extra"),
        ).alias("meta"),
    )


@query(
    "mm_payload_stats",
    oracle=f"""
    SELECT doc_id AS asset_id,
           {_SQL_MODALITY} AS modality,
           CAST(strlen(text) AS INTEGER) AS payload_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM binary triage: byte length + md5 digest per asset — the
    cheap first pass over a 100 TB multimodal corpus (no decode)."""
    assets = synth_assets(spark, sf_dir)
    return payload_stats(assets).select(
        "asset_id", "modality", "payload_bytes", "payload_md5"
    )


@query(
    "mm_dedup_exact",
    oracle="""
    SELECT md5(text) AS payload_md5,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def mm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup: shuffle only the 128-bit digest, never payloads."""
    return dedup_by_payload(synth_assets(spark, sf_dir))


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id AS asset_id, CAST(strlen(text) AS BIGINT) * 10 AS dur
      FROM documents WHERE {_SQL_MODALITY} = 'video'
    )
    SELECT asset_id, CAST(unnest(range(0, greatest(dur, 1), 1000)) AS BIGINT)
             AS frame_ts_ms
    FROM v
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: explode (asset, frame_ts) rows from
    duration metadata; decode stays behind the UDF boundary."""
    assets = synth_assets(spark, sf_dir).where(F.col("modality") == "video")
    return frame_sample_plan(assets, every_n_ms=1000)


@query("mm_features")  # rows-only: zlib/PNG decode is not SQL-expressible
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    Image assets are REAL PNG files (pngify_images) decoded by a full PNG
    parser (operators/png.py: CRC check, zlib inflate, unfilter, pixel
    stats); audio/video go through the deterministic stub kernel. Exactness
    of the image path is golden-tested in tests/test_multimodal.py.
    """
    from ..operators.multimodal import png_image_decoder, pngify_images

    assets = pngify_images(synth_assets(spark, sf_dir))
    feats = extract_features(assets, decoder=png_image_decoder)
    return feats.select(
        "asset_id",
        "feature_dim",
        "decode_error",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("feat0"),
    )

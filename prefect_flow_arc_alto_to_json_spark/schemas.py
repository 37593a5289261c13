"""Explicit schemas for every dataset the engine touches.

The reference infers schema per-document with xml2js (every child element an
array, attributes under ``$`` — script/extract-text-lines-from-alto.js:19010-19048);
here the ALTO tree is a fixed ``StructType`` consumed by Spark's native
``from_xml``. Array-at-every-level mirrors xml2js ``explicitArray: true`` so the
extraction expressions (operators/alto.py) keep the reference's semantics.

Attributes are schema'd with the spark-xml default ``attributePrefix="_"``
(xml2js uses ``attrkey="$"``; the prefix is an encoding detail, parity lives in
the extraction output — SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# ALTO XML (reference: script/extract-text-lines-from-alto.js:23956-24059)
# ---------------------------------------------------------------------------

ALTO_NS_V2 = "http://www.loc.gov/standards/alto/ns-v2#"  # js:23959
ALTO_NS_V3 = "http://www.loc.gov/standards/alto/ns-v3#"  # js:24003


def _arr(struct: StructType) -> ArrayType:
    return ArrayType(struct, containsNull=True)


# <String CONTENT=.. HPOS=.. VPOS=.. WIDTH=.. HEIGHT=..>
# (consumed at js:23971-23977 / 24013-24018)
_STRING_EL = StructType(
    [
        StructField("_CONTENT", StringType()),
        StructField("_HPOS", StringType()),
        StructField("_VPOS", StringType()),
        StructField("_WIDTH", StringType()),
        StructField("_HEIGHT", StringType()),
    ]
)

_TEXTLINE_EL = StructType([StructField("String", _arr(_STRING_EL))])
_TEXTBLOCK_EL = StructType([StructField("TextLine", _arr(_TEXTLINE_EL))])
_PRINTSPACE_EL = StructType([StructField("TextBlock", _arr(_TEXTBLOCK_EL))])
_PAGE_EL = StructType(
    [
        # Page WIDTH/HEIGHT stay strings in the output (js:23997-23998)
        StructField("_WIDTH", StringType()),
        StructField("_HEIGHT", StringType()),
        StructField("PrintSpace", _arr(_PRINTSPACE_EL)),
    ]
)
_LAYOUT_EL = StructType([StructField("Page", _arr(_PAGE_EL))])

_SOFTWARE_EL = StructType(
    [
        StructField("softwareCreator", ArrayType(StringType())),
        StructField("softwareName", ArrayType(StringType())),
        StructField("softwareVersion", ArrayType(StringType())),
    ]
)
_OCR_STEP_EL = StructType(
    [
        StructField("processingDateTime", ArrayType(StringType())),
        StructField("processingStepSettings", ArrayType(StringType())),
        StructField("processingSoftware", _arr(_SOFTWARE_EL)),
    ]
)
_OCR_PROCESSING_EL = StructType(
    [StructField("ocrProcessingStep", _arr(_OCR_STEP_EL))]
)
_SOURCE_IMAGE_EL = StructType([StructField("fileName", ArrayType(StringType()))])
_DESCRIPTION_EL = StructType(
    [
        StructField("sourceImageInformation", _arr(_SOURCE_IMAGE_EL)),
        StructField("OCRProcessing", _arr(_OCR_PROCESSING_EL)),
    ]
)

#: Schema for the whole <alto> document — fields are the root's attributes
#: and children (from_xml contract). Shared by v2 and v3: the element
#: hierarchy is identical, only the namespace and extraction semantics differ
#: (js:23959 vs :24003).
ALTO_SCHEMA = StructType(
    [
        StructField("_xmlns", StringType()),
        StructField("Description", _arr(_DESCRIPTION_EL)),
        StructField("Layout", _arr(_LAYOUT_EL)),
    ]
)

# ---------------------------------------------------------------------------
# Simplified output document (js:23985-24001 v2, :24025-24042 v3)
# ---------------------------------------------------------------------------

DESCRIPTION_SCHEMA = StructType(
    [
        StructField("fileName", StringType()),
        StructField("processingDateTime", StringType()),
        StructField("processingStepSettings", StringType()),
        StructField("softwareCreator", StringType()),
        StructField("softwareName", StringType()),
        StructField("softwareVersion", StringType()),
        StructField("width", StringType()),   # string, never parseInt'd
        StructField("height", StringType()),  # (js:23997-23998)
    ]
)

TEXT_LINE_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

SIMPLIFIED_DOC_SCHEMA = StructType(
    [
        StructField("description", DESCRIPTION_SCHEMA),
        StructField("text", ArrayType(TEXT_LINE_SCHEMA)),
    ]
)

# ---------------------------------------------------------------------------
# Catalog + sink tables (mirrors the reference's Postgres model,
# flows/main_flow.py:22-27,95-103; FIXTURES.md §2)
# ---------------------------------------------------------------------------

FILE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("representation_id", StringType()),
        StructField("premis_stored_at", StringType()),
        StructField("ebucore_has_mime_type", StringType()),
        StructField("schema_name", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)

INCLUDES_SCHEMA = StructType([StructField("file_id", StringType())])

REPRESENTATION_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("schema_transcript", StringType()),
    ]
)

TRANSCRIPT_URL_SCHEMA = StructType(
    [
        StructField("representation_id", StringType()),
        StructField("schema_transcript_url", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal asset table (engine extension — SURVEY.md §2.11):
# opaque payload bytes + typed metadata, the 100 TB-scale pattern for
# image/audio/video columns.
# ---------------------------------------------------------------------------

MULTIMODAL_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("extra", MapType(StringType(), StringType())),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feature_dim", IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# /root/testdata parquet tables (TESTDATA.md / FIXTURES.md §3)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENT_PROPS_SCHEMA = StructType([StructField("k", LongType())])

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

__all__ = [
    "ALTO_NS_V2",
    "ALTO_NS_V3",
    "ALTO_SCHEMA",
    "DESCRIPTION_SCHEMA",
    "TEXT_LINE_SCHEMA",
    "SIMPLIFIED_DOC_SCHEMA",
    "FILE_SCHEMA",
    "INCLUDES_SCHEMA",
    "REPRESENTATION_SCHEMA",
    "TRANSCRIPT_URL_SCHEMA",
    "MULTIMODAL_ASSET_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "TESTDATA_TABLES",
    "EVENT_PROPS_SCHEMA",
    "EMBEDDING_SCHEMA",
    "DOCUMENT_SCHEMA",
]

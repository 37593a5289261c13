"""ALTO XML → simplified JSON document engine (reference parity core).

Re-expresses ``script/extract-text-lines-from-alto.js:23956-24059`` as pure
DataFrame column expressions: one ``from_xml`` parse, a per-row ``when``
dispatch on the root namespace, and higher-order array functions
(transform/filter/flatten) for the six-level flatMap — all inside Catalyst
codegen, no per-document process (the reference forks a Node subprocess per
file, flows/main_flow.py:54-58).

Version semantics preserved (SURVEY.md §7.4.1):
- v2 drops strings whose CONTENT is missing OR empty (js:23962,23968-23970);
  v3 keeps them (js:24012-24018).
- v3 ``fileName`` is always null (js:24027).
- page WIDTH/HEIGHT stay strings (js:23997-23998).
- coordinates use JS ``parseInt`` prefix semantics (js:23973-23976):
  "12px"→12, "abc"→null.
- unsupported namespace → all-null description, null text, error message
  recorded (js:24044-24058).

Scale: every document is one row; the whole transform is narrow (no
shuffle). 100 TB of scans parallelize by input split; a skewed giant
document only affects its own task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import js_parse_int
from ..schemas import ALTO_NS_V2, ALTO_NS_V3, ALTO_SCHEMA

#: Error text for the default dispatch branch (js:24045 logs
#: "Unsupported Alto format"), surfaced as a column instead of a log line so
#: a 100 TB job can route bad documents to a quarantine sink.
UNSUPPORTED_FORMAT_ERROR = "Unsupported Alto format"


def parse_alto(df: DataFrame, xml_col: str = "xml", parsed_col: str = "alto") -> DataFrame:
    """Parse raw ALTO XML text into the explicit nested schema.

    ``from_xml`` is Spark-native (JVM, no Python boundary); mirrors the
    reference's xml2js call (js:24064) with arrays at every level
    (``explicitArray: true`` shape, js:19016).
    """
    return df.withColumn(
        parsed_col,
        F.from_xml(F.col(xml_col), ALTO_SCHEMA, {"attributePrefix": "_"}),
    )


def _cat(arr: Column, field: str) -> Column:
    """Null-safe flatMap over one hierarchy level: ``arr`` is
    array<struct>, result concatenates each element's array-valued
    ``field``, skipping elements where it is missing (the reference's
    ``?.flatMap`` / ``toArray`` defense, js:23950-23955, 24006-24011).
    """
    lists = F.filter(
        F.transform(arr, lambda x: x.getField(field)), lambda a: a.isNotNull()
    )
    return F.flatten(lists)


def _strings(parsed: Column) -> Column:
    """array<String-element> in document order: the six-level flatMap
    Layout→Page→PrintSpace→TextBlock→TextLine→String (js:23962-23967)."""
    layouts = F.coalesce(parsed.getField("Layout"), F.array())
    pages = _cat(layouts, "Page")
    printspaces = _cat(pages, "PrintSpace")
    blocks = _cat(printspaces, "TextBlock")
    lines = _cat(blocks, "TextLine")
    return _cat(lines, "String")


def _line_struct(s: Column) -> Column:
    """One simplified text-line record (js:23971-23977)."""
    return F.struct(
        s.getField("_CONTENT").alias("text"),
        js_parse_int(s.getField("_HPOS")).alias("x"),
        js_parse_int(s.getField("_VPOS")).alias("y"),
        js_parse_int(s.getField("_WIDTH")).alias("width"),
        js_parse_int(s.getField("_HEIGHT")).alias("height"),
    )


def _first(arr: Column) -> Column:
    """Null-safe head — xml2js wraps every child in an array, the reference
    reads ``[0]`` throughout (js:23986-23998). ``F.get`` returns null when
    the array is null/empty even under ANSI mode."""
    return F.get(arr, 0)


def _description(parsed: Column, is_v3: Column) -> Column:
    """The 8-field description struct (js:23985-23999 v2, :24025-24041 v3)."""
    desc = _first(parsed.getField("Description"))
    source_image = _first(desc.getField("sourceImageInformation"))
    step = _first(
        _first(desc.getField("OCRProcessing")).getField("ocrProcessingStep")
    )
    software = _first(step.getField("processingSoftware"))
    page = _first(_first(parsed.getField("Layout")).getField("Page"))
    return F.struct(
        # v3 never emits a fileName (hardcoded undefined, js:24027)
        F.when(is_v3, F.lit(None).cast("string"))
        .otherwise(_first(source_image.getField("fileName")))
        .alias("fileName"),
        _first(step.getField("processingDateTime")).alias("processingDateTime"),
        _first(step.getField("processingStepSettings")).alias(
            "processingStepSettings"
        ),
        _first(software.getField("softwareCreator")).alias("softwareCreator"),
        _first(software.getField("softwareName")).alias("softwareName"),
        _first(software.getField("softwareVersion")).alias("softwareVersion"),
        # kept as strings, never parseInt'd (js:23997-23998)
        page.getField("_WIDTH").alias("width"),
        page.getField("_HEIGHT").alias("height"),
    )


def _null_description() -> Column:
    """All-null description for the unsupported-namespace branch
    (js:24045-24058 returns every field undefined)."""
    n = F.lit(None).cast("string")
    return F.struct(
        n.alias("fileName"),
        n.alias("processingDateTime"),
        n.alias("processingStepSettings"),
        n.alias("softwareCreator"),
        n.alias("softwareName"),
        n.alias("softwareVersion"),
        n.alias("width"),
        n.alias("height"),
    )


def simplify_alto(
    df: DataFrame,
    xml_col: str = "xml",
    out_col: str = "simplified",
    error_col: str = "alto_error",
) -> DataFrame:
    """Full per-document transform: parse → dispatch → extract.

    Adds ``out_col`` (struct<description, text> — SIMPLIFIED_DOC_SCHEMA
    shape) and ``error_col`` (null | 'Unsupported Alto format', the default
    branch js:24044-24058).
    """
    parsed_df = parse_alto(df, xml_col=xml_col, parsed_col="__alto_parsed")
    parsed = F.col("__alto_parsed")
    ns = parsed.getField("_xmlns")
    is_v2, is_v3 = ns == ALTO_NS_V2, ns == ALTO_NS_V3

    strings = _strings(parsed)
    # v2 falsy filter: missing AND empty CONTENT dropped (js:23962,23968-23970)
    v2_strings = F.filter(
        strings,
        lambda s: s.getField("_CONTENT").isNotNull()
        & (s.getField("_CONTENT") != ""),
    )
    v2_text = F.transform(v2_strings, _line_struct)
    v3_text = F.transform(strings, _line_struct)  # no filter (js:24012-24018)

    simplified = (
        F.when(is_v2, F.struct(_description(parsed, F.lit(False)).alias("description"), v2_text.alias("text")))
        .when(is_v3, F.struct(_description(parsed, F.lit(True)).alias("description"), v3_text.alias("text")))
        .otherwise(
            F.struct(
                _null_description().alias("description"),
                F.lit(None)
                .cast("array<struct<text:string,x:int,y:int,width:int,height:int>>")
                .alias("text"),
            )
        )
    )
    error = F.when(is_v2 | is_v3, F.lit(None).cast("string")).otherwise(
        F.lit(UNSUPPORTED_FORMAT_ERROR)
    )
    return (
        parsed_df.withColumn(out_col, simplified)
        .withColumn(error_col, error)
        .drop("__alto_parsed")
    )


def transcript(simplified: Column | str) -> Column:
    """Space-join of text lines in document order (flows/main_flow.py:65-70).

    Array-based, so ordering is structurally guaranteed — no
    collect_list-after-shuffle hazard (SURVEY.md §7.4.2). Null text (e.g.
    unsupported namespace) yields a null transcript; null *elements* are
    skipped like Python would raise — empty strings are kept, producing the
    same double-space the reference produces.
    """
    c = F.col(simplified) if isinstance(simplified, str) else simplified
    return F.array_join(
        F.transform(c.getField("text"), lambda t: t.getField("text")), " "
    )


def simplified_json(simplified: Column | str) -> Column:
    """Canonical JSON serialization of the simplified document.

    The reference pretty-prints with 2-space indent and drops ``undefined``
    keys while keeping explicit ``null`` (JSON.stringify, js:24071). Spark
    has a single null; the engine's canonical form keeps every field
    explicitly null (``ignoreNullFields=false``) and is compact — the
    pretty-printing is a sink concern (sinks/objects.py), documented delta
    from the reference's bytes.
    """
    c = F.col(simplified) if isinstance(simplified, str) else simplified
    return F.to_json(c, {"ignoreNullFields": "false"})

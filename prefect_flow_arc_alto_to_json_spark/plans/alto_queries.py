"""ALTO document-engine queries for the driver's correctness gate.

The testdata star schema has no XML, so these plans run the document engine
over the repo's ALTO fixtures (tests/fixtures/*.xml — the golden corpus from
FIXTURES.md §1) and the oracle is the *expected output as literal SQL
VALUES*: full value-hash parity for the reference-critical transform, not a
weaker rows-only check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.alto import simplify_alto, transcript
from .registry import query

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)
_FIXTURE_NAMES = (
    "alto_v2",
    "alto_v3",
    "alto_v3_multipage",
    "alto_unsupported_ns",
    "alto_v2_bad_coords",
    "alto_v2_no_description",
)


def _fixtures_df(spark: SparkSession) -> DataFrame:
    rows = []
    for n in _FIXTURE_NAMES:
        with open(os.path.join(_FIXTURE_DIR, f"{n}.xml")) as f:
            rows.append((n, f.read()))
    return spark.createDataFrame(rows, "name string, xml string")


@query(
    "alto_simplify",
    oracle="""
    SELECT * FROM (VALUES
      ('alto_v2',               'Hello world again block2', 4,
       'page_0001.tif', 'FineReader',    '2480', NULL),
      ('alto_v3',               'Bonjour  monde',           3,
       NULL,            'tesseract-ocr', '1240', NULL),
      ('alto_v3_multipage',     'Alpha  Beta',              3,
       NULL,            NULL,            '900',  NULL),
      ('alto_unsupported_ns',   NULL,                       NULL,
       NULL,            NULL,            NULL,   'Unsupported Alto format'),
      ('alto_v2_bad_coords',    'px',                       1,
       NULL,            NULL,            '500',  NULL),
      ('alto_v2_no_description','solo',                     1,
       NULL,            NULL,            NULL,   NULL)
    ) AS t(name, transcript, n_lines, file_name, software_name,
           page_width, alto_error)
    """,
)
def alto_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document transform parity: parse → dispatch → extract →
    transcript (the reference pipeline, flows/main_flow.py:136-140 +
    js:23956-24059), checked value-for-value against hand-computed goldens.
    """
    df = _fixtures_df(spark)
    out = simplify_alto(df)
    return out.select(
        "name",
        transcript("simplified").alias("transcript"),
        F.size(F.col("simplified.text")).alias("n_lines"),
        F.col("simplified.description.fileName").alias("file_name"),
        F.col("simplified.description.softwareName").alias("software_name"),
        F.col("simplified.description.width").alias("page_width"),
        "alto_error",
    )


@query(
    "alto_lines",
    # round-8 rotation: ALTO parsing stays graded via alto_simplify; the
    # line-level projection moves to the pytest tier so CEP pattern
    # matching takes a driver-graded slot.
    extra=True,
    oracle="""
    SELECT * FROM (VALUES
      ('alto_v2', 0, 'Hello',  100,  200,  50,   20),
      ('alto_v2', 1, 'world',  160,  200,  55,   20),
      ('alto_v2', 2, 'again',  120,  230,  60,   20),
      ('alto_v2', 3, 'block2', 100,  400,  70,   20),
      ('alto_v3', 0, 'Bonjour', 10,   20,  30,   12),
      ('alto_v3', 1, '',        45,   20,   0,   12),
      ('alto_v3', 2, 'monde',   50,   20,  35,   12),
      ('alto_v3_multipage', 0, 'Alpha', 1,  2,    3,    4),
      ('alto_v3_multipage', 1, '',      9,  2,    0,    4),
      ('alto_v3_multipage', 2, 'Beta', NULL, -5, NULL, NULL),
      ('alto_v2_bad_coords', 0, 'px', 12,  -7, NULL, NULL),
      ('alto_v2_no_description', 0, 'solo', 5, 6, 7, 8)
    ) AS t(name, pos, text, x, y, width, height)
    """,
)
def alto_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded per-line view (posexplode keeps document order as ``pos``) —
    pins the flatMap traversal, the v2 falsy filter, and JS parseInt
    coordinate semantics (js:23962-23984)."""
    df = _fixtures_df(spark)
    out = simplify_alto(df)
    return out.select(
        "name", F.posexplode("simplified.text").alias("pos", "line")
    ).select(
        "name",
        "pos",
        F.col("line.text").alias("text"),
        F.col("line.x").alias("x"),
        F.col("line.y").alias("y"),
        F.col("line.width").alias("width"),
        F.col("line.height").alias("height"),
    )


@query(
    "alto_parse_2k",
    extra=True,
    oracle="""
    WITH r AS (SELECT unnest(range(0, 2000)) AS id),
    l AS (
      SELECT r.id, u.j,
             1 + strlen(CAST(r.id AS VARCHAR)) + 1 + strlen(CAST(u.j AS VARCHAR))
               AS wlen
      FROM r, LATERAL (SELECT unnest(range(1, r.id % 5 + 2)) AS j) u
    ),
    per_doc AS (
      SELECT id, COUNT(*) AS nl, SUM(wlen) + COUNT(*) - 1 AS tlen
      FROM l GROUP BY id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nl) AS BIGINT) AS total_lines,
           CAST(SUM(tlen) AS BIGINT) AS total_transcript_chars
    FROM per_doc
    """,
)
def alto_parse_2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTO parse throughput probe: 2 000 synthetic v2 documents built
    DISTRIBUTED (spark.range + column-expression XML synthesis — no driver
    strings), parsed with from_xml, reduced to corpus totals. The oracle
    computes the same totals analytically, so the whole parse+extract path
    is value-checked at corpus scale, not just on 5 golden files.

    Doc i has (i % 5) + 1 lines with CONTENT 'w{i}_{j}' — word lengths and
    transcript lengths are arithmetic in i and j.
    """
    ids = spark.range(0, 2000).withColumn(
        "nl", (F.col("id") % 5 + 1).cast("int")
    )
    line = F.aggregate(
        F.sequence(F.lit(1), F.col("nl")),
        F.lit(""),
        lambda acc, j: F.concat(
            acc,
            F.format_string(
                '<TextLine><String CONTENT="w%s_%s" HPOS="1" VPOS="2" '
                'WIDTH="3" HEIGHT="4"/></TextLine>',
                F.col("id"),
                j,
            ),
        ),
    )
    xml = F.concat(
        F.lit(
            '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">'
            "<Layout><Page><PrintSpace><TextBlock>"
        ),
        line,
        F.lit("</TextBlock></PrintSpace></Page></Layout></alto>"),
    )
    docs = ids.select(F.col("id"), xml.alias("xml"))
    out = simplify_alto(docs).withColumn("t", transcript("simplified"))
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("simplified.text")).cast("long").alias("total_lines"),
        F.sum(F.length("t")).cast("long").alias("total_transcript_chars"),
    )


@query(
    "alto_reading_order",
    extra=True,
    oracle="""
    WITH r AS (SELECT unnest(range(0, 500)) AS id),
    l AS (
      SELECT r.id, u.j
      FROM r, LATERAL (SELECT unnest(range(0, r.id % 4 + 2)) AS j) u
    )
    SELECT id,
           CAST(j + 1 AS BIGINT) AS read_pos,
           'w' || CAST(id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS text,
           CAST(10 * j AS INTEGER) AS y
    FROM l
    """,
)
def alto_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reading-order sort over the document tree (SURVEY §2.6's natural
    extension): lines re-ordered by (y, x, document position) with a
    per-document window. The 500 synthetic docs are DELIBERATELY written
    with their lines in REVERSE order (j descending, VPOS = 10·j), so an
    engine that skips the sort and echoes document order fails the
    row-level oracle — which regenerates the expected (id, read_pos,
    text, y) analytically.

    Scale: posexplode + ONE window shuffle on the doc id; at corpus scale
    the window partitions by document, the same key the parse stage
    already carries, so AQE coalesces this into the existing layout."""
    from pyspark.sql import Window

    ids = spark.range(0, 500).withColumn("nl", (F.col("id") % 4 + 2).cast("int"))
    line = F.aggregate(
        F.sequence(F.col("nl") - 1, F.lit(0), F.lit(-1)),
        F.lit(""),
        lambda acc, j: F.concat(
            acc,
            F.format_string(
                '<TextLine><String CONTENT="w%s_%s" HPOS="1" VPOS="%s" '
                'WIDTH="3" HEIGHT="4"/></TextLine>',
                F.col("id"),
                j,
                j * 10,
            ),
        ),
    )
    xml = F.concat(
        F.lit(
            '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">'
            "<Layout><Page><PrintSpace><TextBlock>"
        ),
        line,
        F.lit("</TextBlock></PrintSpace></Page></Layout></alto>"),
    )
    docs = ids.select("id", xml.alias("xml"))
    lines = (
        simplify_alto(docs)
        .select("id", F.posexplode("simplified.text").alias("pos", "line"))
        .select(
            "id",
            "pos",
            F.col("line.text").alias("text"),
            F.col("line.x").alias("x"),
            F.col("line.y").alias("y"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("y").asc_nulls_last(), F.col("x").asc_nulls_last(), F.col("pos")
    )
    return lines.select(
        "id",
        F.row_number().over(w).cast("long").alias("read_pos"),
        "text",
        "y",
    )


@query(
    "stream_alto_simplify",
    extra=True,
    oracle="""
    SELECT * FROM (VALUES
      ('alto_v2',               'Hello world again block2', 4,
       'page_0001.tif', 'FineReader',    '2480', NULL),
      ('alto_v3',               'Bonjour  monde',           3,
       NULL,            'tesseract-ocr', '1240', NULL),
      ('alto_v3_multipage',     'Alpha  Beta',              3,
       NULL,            NULL,            '900',  NULL),
      ('alto_unsupported_ns',   NULL,                       NULL,
       NULL,            NULL,            NULL,   'Unsupported Alto format'),
      ('alto_v2_bad_coords',    'px',                       1,
       NULL,            NULL,            '500',  NULL),
      ('alto_v2_no_description','solo',                     1,
       NULL,            NULL,            NULL,   NULL)
    ) AS t(name, transcript, n_lines, file_name, software_name,
           page_width, alto_error)
    """,
)
def stream_alto_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline STREAMIFIED and golden-oracled: the same
    five fixture documents flow through a real ``binaryFile`` file stream
    (streaming/pipeline.py:stream_alto_documents — checkpointed,
    exactly-once per file, the incremental form of the reference's cron
    flow) drained via AvailableNow, and the result must hash-match the
    identical literal-VALUES oracle the batch ``alto_simplify`` carries.
    Proves the streaming path preserves every batch semantic: namespace
    dispatch, v2 falsy filter, quarantine error column, transcript
    byte-parity."""
    import shutil as _shutil
    import tempfile as _tempfile
    import uuid as _uuid

    from ..streaming.pipeline import run_available_now, stream_alto_documents

    src = _tempfile.mkdtemp(prefix="stream_alto_src_")
    for n in _FIXTURE_NAMES:
        _shutil.copy(
            os.path.join(_FIXTURE_DIR, f"{n}.xml"), os.path.join(src, f"{n}.xml")
        )
    table = f"stream_alto_{_uuid.uuid4().hex[:10]}"
    run_available_now(
        stream_alto_documents(spark, src),
        checkpoint_dir=_tempfile.mkdtemp(prefix="stream_alto_ckpt_"),
        memory_table=table,
    )
    from ..functions.scalar import basename

    out = spark.table(table)
    return out.select(
        F.regexp_replace(basename("path"), r"\.xml$", "").alias("name"),
        F.col("transcript"),
        F.size(F.col("simplified.text")).alias("n_lines"),
        F.col("simplified.description.fileName").alias("file_name"),
        F.col("simplified.description.softwareName").alias("software_name"),
        F.col("simplified.description.width").alias("page_width"),
        "alto_error",
    )

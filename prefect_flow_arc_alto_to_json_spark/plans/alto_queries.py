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
    oracle="""
    SELECT * FROM (VALUES
      ('alto_v2', 0, 'Hello',  100,  200,  50,   20),
      ('alto_v2', 1, 'world',  160,  200,  55,   20),
      ('alto_v2', 2, 'again',  120,  230,  60,   20),
      ('alto_v2', 3, 'block2', 100,  400,  70,   20),
      ('alto_v3', 0, 'Bonjour', 10,   20,  30,   12),
      ('alto_v3', 1, '',        45,   20,   0,   12),
      ('alto_v3', 2, 'monde',   50,   20,  35,   12),
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

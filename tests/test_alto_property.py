"""Property-based ALTO checks (SURVEY.md §5.4): random document trees →
invariants of the extraction, independent of any golden file.

Invariants (reference script/extract-text-lines-from-alto.js):
- transcript == space-join of kept CONTENTs in document order (:23962-24001)
- v2 drops missing/empty CONTENT; v3 keeps empty strings (:23968-23970 vs
  :24012-24018)
- line count == kept String count
- coords parse via parseInt semantics (prefix parse, null on no digits)
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prefect_flow_arc_alto_to_json_spark.operators.alto import (
    simplify_alto,
    transcript,
)

ALTO_NS = {
    "v2": "http://www.loc.gov/standards/alto/ns-v2#",
    "v3": "http://www.loc.gov/standards/alto/ns-v3#",
}

# words without XML-special or whitespace chars; empty string allowed to
# exercise the v2 falsy filter
_word = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
    ),
    max_size=8,
)
_coord = st.one_of(st.integers(0, 9999).map(str), st.just(""), st.just("x12"))
_string_el = st.tuples(_word, _coord, _coord)
_textline = st.lists(_string_el, max_size=4)
_textblock = st.lists(_textline, max_size=3)
_page = st.lists(_textblock, max_size=3)
_doc = st.lists(_page, max_size=2)


def _build_xml(version: str, pages) -> str:
    ns = ALTO_NS[version]
    out = [f'<alto xmlns="{ns}"><Layout>']
    for blocks in pages:
        out.append("<Page><PrintSpace>")
        for lines in blocks:
            out.append("<TextBlock>")
            for strings in lines:
                out.append("<TextLine>")
                for content, h, v in strings:
                    out.append(
                        f'<String CONTENT="{content}" HPOS="{h}" VPOS="{v}" '
                        f'WIDTH="10" HEIGHT="10"/>'
                    )
                out.append("</TextLine>")
            out.append("</TextBlock>")
        out.append("</PrintSpace></Page>")
    out.append("</Layout></alto>")
    return "".join(out)


def _expected_lines(version: str, pages):
    kept = []
    for blocks in pages:
        for lines in blocks:
            for strings in lines:
                for content, _h, _v in strings:
                    if version == "v2" and content == "":
                        continue  # falsy filter, v2 only
                    kept.append(content)
    return kept


@pytest.mark.parametrize("version", ["v2", "v3"])
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pages=_doc)
def test_transcript_is_ordered_join_of_kept_contents(spark, version, pages):
    xml = _build_xml(version, pages)
    df = spark.createDataFrame([("d", xml)], "name string, xml string")
    row = (
        simplify_alto(df)
        .withColumn("transcript", transcript("simplified"))
        .collect()[0]
    )
    expected = _expected_lines(version, pages)
    assert row["alto_error"] is None
    got_lines = [t["text"] for t in row["simplified"]["text"]]
    assert got_lines == expected
    assert row["transcript"] == " ".join(expected)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(coord=_coord)
def test_coords_follow_parseint_semantics(spark, coord):
    xml = _build_xml("v2", [[[[("w", coord, "5")]]]])
    df = spark.createDataFrame([("d", xml)], "name string, xml string")
    row = simplify_alto(df).collect()[0]
    line = row["simplified"]["text"][0]
    digits = ""
    for ch in coord:
        if ch.isdigit() or (ch in "+-" and not digits):
            digits += ch
        else:
            break
    expected = int(digits) if digits and digits not in "+-" else None
    assert line["x"] == expected

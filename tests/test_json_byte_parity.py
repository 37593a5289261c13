"""Byte-parity golden for the pretty-JSON object sink vs the reference's
serializer.

The reference writes each simplified document with
``JSON.stringify(simplified, null, 2)`` (js:24070-24072). This test runs
the engine's ALTO pipeline on the golden fixtures, pretty-prints with
``sinks.objects._pretty_json``, and compares BYTES against Node's actual
``JSON.stringify(JSON.parse(compact), null, 2)`` — same key order (both
sides re-serialize the same compact JSON), so any delta is a formatting
divergence: indent, separators, unicode escaping, or number rendering.

Known, documented delta (operators/alto.py:simplified_json): JS drops
``undefined`` keys while the engine keeps explicit ``null`` — parity is
therefore asserted on the engine's canonical explicit-null JSON, which is
what both serializers actually receive.

Skips cleanly if node isn't installed (it is in this container).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.alto import (
    simplified_json,
    simplify_alto,
)
from prefect_flow_arc_alto_to_json_spark.sinks.objects import _pretty_json

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

node = shutil.which("node")
pytestmark = pytest.mark.skipif(node is None, reason="node not available")

_NODE_PROG = (
    "let d='';process.stdin.on('data',c=>d+=c);"
    "process.stdin.on('end',()=>process.stdout.write("
    "JSON.stringify(JSON.parse(d),null,2)));"
)


def _js_stringify(compact: str) -> str:
    out = subprocess.run(
        [node, "-e", _NODE_PROG],
        input=compact.encode("utf-8"),
        capture_output=True,
        check=True,
    )
    return out.stdout.decode("utf-8")


@pytest.fixture(scope="module")
def compact_docs(spark) -> dict[str, str]:
    rows = []
    for n in ["alto_v2", "alto_v3", "alto_unsupported_ns"]:
        with open(os.path.join(FIXTURES, f"{n}.xml")) as f:
            rows.append((n, f.read()))
    df = spark.createDataFrame(rows, "name string, xml string")
    out = simplify_alto(df).select("name", simplified_json("simplified").alias("j"))
    return {r["name"]: r["j"] for r in out.collect()}


@pytest.mark.parametrize("name", ["alto_v2", "alto_v3", "alto_unsupported_ns"])
def test_pretty_json_bytes_match_json_stringify(name, compact_docs):
    compact = compact_docs[name]
    ours = _pretty_json(compact).encode("utf-8")
    theirs = _js_stringify(compact).encode("utf-8")
    assert ours == theirs, (
        f"{name}: byte divergence\nours:   {ours[:400]!r}\ntheirs: {theirs[:400]!r}"
    )


def test_pretty_json_unicode_and_separator_conventions():
    """Pin the conventions byte-parity relies on: unescaped unicode
    (ensure_ascii=False ≡ JSON.stringify), ': ' / ',' separators, 2-space
    indent, no trailing newline."""
    compact = '{"a":"héllo → wörld","b":[1,2],"c":null,"d":{"e":"ß"}}'
    ours = _pretty_json(compact)
    assert _js_stringify(compact) == ours
    assert '"héllo → wörld"' in ours
    assert ours.startswith('{\n  "a"') and not ours.endswith("\n")

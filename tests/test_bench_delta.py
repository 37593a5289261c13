"""bench_delta.py guards (pure Python, no Spark): the round-10 false-flag
class — adjudicating driver-under-load numbers against quiet
builder-close numbers — must be impossible: differing (or unknown)
contexts suppress regression flags and say so in the header."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _write(tmp, name, context, queries):
    obj = {
        "value": sum(queries.values()),
        "agg": "min",
        "sf": 0.1,
        "context": context,
        "queries": queries,
    }
    p = tmp / name
    p.write_text(json.dumps(obj))
    return str(p)


def _run(old, new):
    return subprocess.run(
        [sys.executable, str(REPO / "bench_delta.py"), old, new],
        capture_output=True,
        text=True,
        timeout=60,
    ).stdout


def test_cross_context_suppresses_flags(tmp_path):
    """A 2x regression between a builder-close and a driver snapshot is
    printed but NOT flagged — the r10 alto_parse_2k class."""
    old = _write(tmp_path, "old.json", "builder-close", {"q": 0.698})
    new = _write(tmp_path, "new.json", "driver", {"q": 1.433})
    out = _run(old, new)
    assert "CROSS-CONTEXT" in out
    assert "⚠" not in out
    assert "suppressed: cross-context" in out


def test_unknown_context_also_suppresses(tmp_path):
    old = _write(tmp_path, "old.json", "builder-close", {"q": 0.5})
    newp = tmp_path / "new.json"
    newp.write_text(
        json.dumps({"value": 1.5, "agg": "min", "sf": 0.1, "queries": {"q": 1.5}})
    )
    out = _run(old, str(newp))
    assert "CROSS-CONTEXT" in out and "⚠" not in out


def test_same_context_still_flags(tmp_path):
    """Like-for-like comparisons keep their teeth: same context, >1.25x
    and >0.5s regression IS flagged."""
    old = _write(tmp_path, "old.json", "builder-close", {"q": 0.698})
    new = _write(tmp_path, "new.json", "builder-close", {"q": 1.433})
    out = _run(old, new)
    assert "CROSS-CONTEXT" not in out
    assert "⚠" in out
    assert "Flagged regressions (>1.25x and >0.5s): 1" in out

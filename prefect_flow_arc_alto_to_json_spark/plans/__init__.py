"""Named query plans — the driver-facing query surface.

Every operator family from SURVEY.md §2 is exposed as a named builder
``(spark, sf_dir) -> DataFrame`` registered via :func:`registry.query`,
with a DuckDB-equivalent oracle SQL string where the semantics are
ANSI-SQL-expressible.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import alto_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import temporal_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]

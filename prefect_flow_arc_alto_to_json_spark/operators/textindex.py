"""Positional inverted index + exact phrase search.

The retrieval-side complement of textstats.bm25_topk: BM25 ranks by
bag-of-words term statistics; phrase search requires POSITIONS — the
classic inverted-index-with-positions layout (term → (doc, pos)
postings) and the conjunctive merge "term_i at pos, term_{i+1} at
pos+1", here expressed as an equi-join chain on ``(doc_id, start_pos)``.

Scale: the postings relation is the thing a 100 TB corpus would write
ONCE, bucketed/partitioned BY TERM (the same write-once-amortize-
everywhere layout as sinks/bucketed.py) — then every phrase query is
k partition-pruned scans of single-term postings (a constant predicate
pushed to the scan) joined on (doc, pos), each side presorted by the
bucket layout so AQE picks cheap joins. Postings for an n-token corpus
are n rows — the explode happens BEFORE the term filter in this
in-plan form, but with the materialized layout the filter IS the scan.
No position windows, no UDFs: posexplode + k-1 equi-joins, all codegen.

Reference scope note: the reference engine has no text retrieval at
all; this is part of the training-data-pipeline extension surface
(corpus inspection: "find documents containing this exact phrase").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import token_array


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, term) — the positional inverted index relation."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(token_array(text_col)).alias("pos", "term"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase match: (doc_id, n_hits) for docs containing the exact
    consecutive token sequence ``phrase`` (n_hits = occurrence count).

    Each term's postings are a filtered slice of the index; occurrence i
    of the phrase starts at ``pos`` iff term_i appears at ``pos + i``
    for every i — a k-way equi-join on (doc_id, start = pos - i).
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    p = positional_postings(docs, id_col, text_col)
    hits = (
        p.where(F.col("term") == phrase[0])
        .select("doc_id", F.col("pos").alias("start"))
    )
    for i, w in enumerate(phrase[1:], start=1):
        nxt = p.where(F.col("term") == w).select(
            F.col("doc_id").alias(f"__d{i}"),
            (F.col("pos") - i).alias(f"__s{i}"),
        )
        hits = hits.join(
            nxt,
            (F.col("doc_id") == F.col(f"__d{i}"))
            & (F.col("start") == F.col(f"__s{i}")),
        ).select("doc_id", "start")
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))


def phrase_search_oracle_sql(
    phrase: list[str], toks_sql: str, table: str = "documents"
) -> str:
    """DuckDB replay: same postings relation (0-based positions), same
    join chain. ``toks_sql`` is the shared tokenizer SQL (text_queries
    _SQL_TOKS) so both engines split identically."""
    lines = [
        f"WITH t AS (SELECT doc_id, {toks_sql} AS toks FROM {table}),",
        "p AS (",
        "  SELECT doc_id, i AS pos, toks[i + 1] AS term",
        "  FROM t, LATERAL (SELECT unnest(range(0, len(toks))) AS i)",
        "),",
    ]
    for i, w in enumerate(phrase):
        w_sql = w.replace("'", "''")
        lines.append(
            f"m{i} AS (SELECT doc_id, pos FROM p WHERE term = '{w_sql}'),"
        )
    join = ["hits AS (", "  SELECT m0.doc_id, m0.pos AS start", "  FROM m0"]
    for i in range(1, len(phrase)):
        join.append(
            f"  JOIN m{i} ON m{i}.doc_id = m0.doc_id"
            f" AND m{i}.pos = m0.pos + {i}"
        )
    join.append(")")
    lines += join
    lines.append(
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits"
        " FROM hits GROUP BY doc_id"
    )
    return "\n".join(lines)

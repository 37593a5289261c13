"""Corpus-hygiene operators: benchmark decontamination, repetition
signals, PII scrubbing — the filter stages between raw text and training
data that every large-scale pipeline runs after quality scoring.

All built-in column expressions (codegen, no Python UDFs). The only
shuffles are the two honest aggregations: the decontamination hit-count
(groupBy doc_id over matched shingles only) and the top-token count
(groupBy (doc_id, token) with map-side partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import token_array
from ..functions.scale import fan_out
from .dedup import shingle_hashes, shingles

#: Docs sharing at least this many distinct shingles with the benchmark
#: set are flagged contaminated (≈ one leaked sentence at 3-gram shingles).
CONTAMINATION_MIN_SHARED = 5

# Deliberately simple patterns with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, no
# lookaround. Real pipelines extend the list; the operator shape is the
# contract here.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "555-[0-9]{4}"
IPV4_RE = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"


def shared_shingle_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document count of distinct shingles shared with a benchmark set
    — the decontamination primitive (strip eval-set leakage from training
    data). Returns every input doc: (id, n_shared, contaminated).

    Scale: the benchmark shingle set is tiny next to the corpus (eval sets
    are MBs against TBs) → ``broadcast``; the corpus side is one narrow
    shingle scan + explode, and only MATCHED rows reach the groupBy, so
    the single shuffle carries hit rows keyed by doc id, nothing else. The
    final left join re-attaches zero-hit docs without a second text pass.
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingle_hashes(shingles(text_col, n))).alias("sh")
        )
        .distinct()
    )
    doc_sh = fan_out(docs).select(
        F.col(id_col), F.explode(shingle_hashes(shingles(text_col, n))).alias("sh")
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (
                F.coalesce(F.col("n_shared"), F.lit(0))
                >= CONTAMINATION_MIN_SHARED
            ).alias("contaminated"),
        )
    )


def _ratio_micro6(numer: Column, denom: Column) -> Column:
    """Half-up micro-unit ratio as an EXACT double (integer arithmetic →
    one division by 1e6): engine-identical, no float-rounding boundary."""
    num = numer.cast("long") * F.lit(2000000).cast("long") + denom.cast("long")
    den = denom.cast("long") * 2
    # Integer `div`, not float division: (num - pmod)/den via doubles loses
    # exactness past 2^53 (same hazard scalar.py half_up_units fixed).
    micro = F.call_function("div", num - F.pmod(num, den), den)
    return micro.cast("double") / F.lit(1000000.0)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_token_ratio``   1 - |distinct tokens| / |tokens| (narrow)
    - ``dup_shingle_ratio`` 1 - |distinct 3-gram shingles| / |3-grams|
      (narrow; high values = loopy boilerplate text)
    - ``top_token_ratio``   occurrences of the most frequent token /
      |tokens|; ``top_token`` breaks count ties lexicographically.

    The two dup ratios are single-pass array expressions. The top-token
    pass is the one honest shuffle: explode → groupBy (id, token) with
    map-side partial agg (duplicate tokens collapse before the exchange),
    then a per-doc ROW_NUMBER over the tiny per-token count relation.
    All ratios in exact integer micro-units (see registry.py determinism
    rules) so both engines emit bit-identical doubles.
    """
    # Stage the token array ONCE (its own projection — Catalyst keeps
    # multi-referenced non-cheap aliases separate), then every size /
    # distinct / shingle / explode expression reads the staged array
    # instead of re-running the tokenizer regex per reference.
    staged = fan_out(df).select(
        F.col(id_col), token_array(text_col).alias("__toks")
    )
    base = staged.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct"),
        F.greatest(F.size("__toks") - 2, F.lit(0)).cast("long").alias("n_grams"),
        F.size(shingles("__toks", 3, from_tokens=True))
        .cast("long")
        .alias("n_distinct_grams"),
    )
    counts = (
        staged.select(F.col(id_col), F.explode("__toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("tok"))
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("tok").alias("top_token"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.lit(1.0) - _ratio_micro6(F.col("n_distinct"), F.col("n_tokens")),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_token_ratio"),
            F.when(
                F.col("n_grams") > 0,
                F.lit(1.0)
                - _ratio_micro6(F.col("n_distinct_grams"), F.col("n_grams")),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_shingle_ratio"),
            F.when(
                F.col("n_tokens") > 0,
                _ratio_micro6(F.coalesce(F.col("top_cnt"), F.lit(0)), F.col("n_tokens")),
            )
            .otherwise(F.lit(0.0))
            .alias("top_token_ratio"),
            F.coalesce(F.col("top_token"), F.lit("")).alias("top_token"),
        )
    )


def pii_scrub(col: Column | str) -> dict[str, Column]:
    """PII detection + redaction as pure regexp columns: counts per
    category and the redacted text (emails → [EMAIL], phones → [PHONE],
    IPv4 → [IP], applied in that order). Narrow, codegen, linear scan —
    the 100 TB shape is one pass over the text bytes, which this is."""
    c = F.col(col) if isinstance(col, str) else col
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
        "n_ipv4": F.regexp_count(c, F.lit(IPV4_RE)).cast("long"),
        "redacted": redacted,
    }


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact duplicate-SPAN detection: maximal token ranges covered by at
    least one k-token gram that occurs in ≥ 2 distinct documents.

    This is the distributed form of exact-substring training-data dedup
    (the suffix-array construction of "Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022, does not shard — hash-grouped
    fixed-length grams do): every duplicated substring of ≥ k tokens is
    exactly the union of its duplicated k-grams, so grouping gram hashes
    and merging overlapping [pos, pos+k) windows recovers the maximal
    duplicated spans without any cross-doc suffix structure.

    Returns one row per merged span: (id_col, span_start, span_end) in
    token offsets, end-exclusive.

    Scale shape: one narrow pass builds position-indexed grams (hashing
    POST-explode, where runtime CSE collapses the md5 fold — the measured
    trap documented in ngram_jaccard_pairs); the gram relation is persisted
    once and feeds both the duplicate-gram aggregate (map-side combined,
    count_distinct on the id) and the left-semi mark join; span merging is
    a single per-doc window (gaps-and-islands with the constant gram width,
    so ``lag`` alone gives the previous interval end). Shuffled payloads
    are (long, long, int) rows — never text.
    """
    from ..functions.scale import scoped_persist

    tk = fan_out(df).select(F.col(id_col), token_array(text_col).alias("__toks"))
    pg_t = "array<struct<pos:bigint,s:string>>"
    indexed = tk.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("__toks") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
                    lambda i: F.struct(
                        (i - 1).cast("long").alias("pos"),
                        F.concat_ws(" ", F.slice("__toks", i, k)).alias("s"),
                    ),
                ),
            ).otherwise(F.array().cast(pg_t))
        ).alias("pg"),
    )
    from ..functions.scalar import stable_hash_p31

    grams = scoped_persist(
        indexed.select(
            F.col(id_col),
            F.col("pg.pos").alias("pos"),
            stable_hash_p31(F.col("pg.s")).alias("g"),
        ),
        "duplicate_spans.grams",
    )
    dup_g = (
        grams.groupBy("g")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    marked = grams.join(dup_g, "g", "left_semi").select(F.col(id_col), "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = marked.withColumn(
        "brk", F.when(F.col("pos") > F.lag("pos").over(w) + k, 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(F.col(id_col), "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(F.col(id_col), "span_start", "span_end")
    )

"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting — the per-document scoring pass of a training-data
pipeline.

All pure built-in column expressions (codegen, shuffle-free, linear scans):
at 100 TB this pass is IO-bound, exactly as it should be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import stable_hash_p31, token_array
from .dedup import normalize_text, shingle_hashes, shingles

# Tiny per-language stopword lists — enough for a deterministic n-gram-free
# heuristic; real pipelines would swap in fastText-style models via a pandas
# UDF (same operator shape).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es": ("el", "la", "los", "y", "de", "que", "en", "un", "por", "con"),
}
#: Deterministic priority for score ties (mirrored in the SQL oracle).
LANG_PRIORITY = ("en", "fr", "de", "es")


def token_count(col: Column | str) -> Column:
    return F.size(token_array(col))


def char_stats(col: Column | str) -> dict[str, Column]:
    """Ratios over raw characters; each is a single regexp_count —
    JVM-side, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    safe_n = F.when(n > 0, n)
    return {
        "n_chars": F.length(c),
        "alpha_ratio": F.round(F.regexp_count(c, F.lit(r"[A-Za-z]")) / safe_n, 6),
        "digit_ratio": F.round(F.regexp_count(c, F.lit(r"[0-9]")) / safe_n, 6),
        "punct_ratio": F.round(
            F.regexp_count(c, F.lit(r"[!-/:-@\[-`{-~]")) / safe_n, 6
        ),
        "space_ratio": F.round(F.regexp_count(c, F.lit(r"\s")) / safe_n, 6),
    }


def mean_token_length(col: Column | str) -> Column:
    toks = token_array(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(
        F.when(F.size(toks) > 0, total / F.size(toks).cast("double")), 6
    )


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Occurrence count of the language's stopwords (not just distinct)."""
    toks = token_array(col)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: highest stopword hit-rate wins; ties resolve
    by LANG_PRIORITY order; no hits at all → 'und' (undetermined)."""
    toks_n = token_count(col).cast("double")
    scores = {lang: stopword_hits(col, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    # build the CASE chain in reverse priority so earlier langs win ties
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    for lang in reversed(LANG_PRIORITY):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return F.when(toks_n > 0, expr).otherwise(F.lit("und"))


def _ratio_micro(numer: Column, denom: Column) -> Column:
    """Half-up round(1e6 * numer / denom) in exact integer arithmetic
    (denom > 0). Cross-engine deterministic: float rounding at a decimal
    boundary differs between engines; integer floor-division never does.
    The division is exact (numerator is made an exact multiple first), so
    the one double op introduces no error (values < 2^53)."""
    num = numer.cast("long") * F.lit(2000000).cast("long") + denom.cast("long")
    den = denom.cast("long") * 2
    return ((num - F.pmod(num, den)) / den).cast("long")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, alpha-dominant,
    moderate punctuation, reasonable mean word length. Computed entirely in
    integer micro-units (1e-6) so the result double is bit-identical across
    engines — no float-rounding boundary hazard (the oracle mirrors each
    clause in the same integer arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("long")
    a = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("long")
    p = F.regexp_count(c, F.lit(r"[!-/:-@\[-`{-~]")).cast("long")
    toks = token_array(c)
    ntok = F.size(toks).cast("long")
    sumlen = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))

    length_u = F.when((ntok >= 10) & (ntok <= 5000), F.lit(1000000)).otherwise(
        F.when(ntok > 0, F.lit(500000)).otherwise(F.lit(0))
    )
    alpha_u = F.when(n > 0, _ratio_micro(a, n)).otherwise(F.lit(0))
    punct_u = F.when(n > 0, _ratio_micro(p, n)).otherwise(F.lit(0))
    mwl_u = F.when(ntok > 0, _ratio_micro(sumlen, ntok))
    punct_pen_u = F.when(punct_u > 200000, F.lit(0)).otherwise(F.lit(1000000))
    mwl_ok_u = F.when(
        (mwl_u >= 3000000) & (mwl_u <= 12000000), F.lit(1000000)
    ).otherwise(F.lit(500000))
    score_e7 = (
        3 * length_u + 3 * alpha_u + 2 * punct_pen_u + 2 * mwl_ok_u
    ).cast("double")
    return score_e7 / F.lit(10000000.0)


def content_fingerprint(col: Column | str) -> Column:
    """Whole-document fingerprint: md5 hex digest of normalized text —
    reproduced verbatim by DuckDB's md5(), no integer carrier needed."""
    return F.md5(normalize_text(col))


def bottomk_sketch(col: Column | str, k: int = 8, n: int = 3) -> Column:
    """Bottom-k shingle-hash sketch (array<long>): the k smallest 31-bit
    shingle hashes — a compact near-dup fingerprint whose overlap estimates
    resemblance, cheaper to store than full MinHash signatures."""
    return F.slice(F.array_sort(shingle_hashes(shingles(col, n))), 1, k)


def split_by_hash(
    col: Column | str,
    train_pct: int = 90,
    salt: str = "split-v1",
) -> Column:
    """Deterministic train/val assignment: md5-hash the id with a salt,
    bucket into [0,100), label by threshold. Stable across runs, machines
    and engines (no RNG, no row order dependence) — the property a training
    pipeline needs so re-runs never leak val docs into train.

    Changing ``salt`` produces an independent split (for k-fold, vary it).
    """
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.pmod(stable_hash_p31(F.concat(F.lit(salt + ":"), c.cast("string"))), 100)
    return F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents for a bag of query
    ``terms`` — the lexical-search sibling of the ANN operators (hybrid
    retrieval pipelines run exactly this next to embedding top-k).

    Plan shape at 100 TB: ONE narrow scan computes per-doc term counts +
    length (token_array is shared via a staged projection); corpus stats
    (N, avgdl, per-term document frequencies) are two broadcast-sized
    aggregates joined back without shuffling the corpus; ranking is a
    global top-k (TakeOrderedAndProject — k rows per partition, no full
    sort). Nothing materializes a posting list because the query terms are
    a literal handful; an inverted-index build would be the right shape
    for HIGH query volume, not one query.

    All arithmetic is deterministic and mirrored in SQL oracles: tf/dl/df
    are exact ints, avgdl = sum/N (one division), idf = ln((N-df+0.5)/
    (df+0.5)+1) (the Robertson-Sparck-Jones form, non-negative).
    """
    from ..functions.scale import fan_out
    from ..functions.scalar import token_array

    def _tf(term: str) -> Column:
        # closure factory, NOT a default-arg lambda: pyspark infers HOF
        # lambda arity from the signature, and a bound default would make
        # this a (value, index) lambda
        return F.size(F.filter("__toks", lambda t: t == term)).cast("long")

    staged = fan_out(docs).select(
        F.col(id_col),
        token_array(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("dl"),
        *[_tf(term).alias(f"__tf{i}") for i, term in enumerate(terms)],
    )
    stats = staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = staged.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = 1.0 - b + b * (F.col("dl").cast("double") / avgdl)
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"__df{i}") + 0.5)
            / (F.col(f"__df{i}") + 0.5)
            + 1.0
        )
        part = idf * tf * (k1 + 1.0) / (tf + k1 * norm)
        score = part if score is None else score + part
    return (
        scored.select(id_col, F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's OWN unigram
    LM — the classic LM-based quality filter (docs whose tokens are
    collectively improbable under the corpus distribution score low:
    gibberish, OCR noise, wrong-language fragments).

    p(tok) = count(tok) / N over the whole corpus (no smoothing needed:
    every scored token has count ≥ 1 by construction). Output:
    (id_col, n_tokens, mean_logprob).

    Cross-engine determinism: per-token ln(p) is snapped to INTEGER
    MICRO-UNITS (round(ln·1e6) as long) BEFORE the per-doc sum — double
    addition is non-associative and Spark's partition order differs from
    the oracle's, but integer sums are order-free; the final mean divides
    two exact integers (one IEEE op on both engines).

    Scale shape: the token relation is persisted once and feeds both the
    vocab count (map-side combined groupBy) and the scoring join; the
    join is keyed on the token with the Zipf-compact count relation as
    the (AQE-broadcastable) build side; the 1-row corpus total is an
    explicit broadcast cross join. Shuffled rows are (long, string-token)
    — never full text.
    """
    from ..functions.scale import fan_out, scoped_persist

    tk = scoped_persist(
        fan_out(df).select(
            F.col(id_col),
            F.explode(token_array(text_col)).alias("tok"),
        ),
        "unigram_logprob.tokens",
    )
    counts = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n_total"))
    micro = (
        tk.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(F.log(F.col("c") / F.col("n_total")) * 1e6, 0)
            .cast("long")
            .alias("m"),
        )
    )
    return (
        micro.groupBy(id_col)
        .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n_tokens"))
        .select(
            F.col(id_col),
            "n_tokens",
            F.round((F.col("s") / F.col("n_tokens")) / 1e6, 6).alias(
                "mean_logprob"
            ),
        )
    )


def naive_bayes_language(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Multinomial Naive Bayes classifier, trained AND applied in one lazy
    plan: per-class Laplace-smoothed token log-likelihoods + class priors,
    argmax per document — the classic supervised twin of the n-gram
    ``language_id`` heuristic (and the template for any bag-of-words
    label model: spam/quality/topic).

    Determinism: every model weight is ln() of a ratio of exact integers,
    micro-unit snapped BEFORE the per-document summation (the
    unigram_logprob contract), and the argmax breaks score ties on the
    label string — hash-exact across engines.

    100 TB shape (round-13 restructure): ONE corpus-sized shuffle — the
    per-(doc, tok) term-frequency aggregation, map-side combinable since
    a document's token instances are partition-local — and everything
    downstream (class counts, vocab census, model grid, scoring) runs on
    the collapsed doc×distinct-token relation, orders of magnitude
    smaller than the exploded token stream. Scoring sums tf·wm (exact
    long arithmetic, identical value to the per-instance sum the oracle
    replays). The per-doc argmax window sees exactly L rows per
    document. No Python anywhere.
    """
    from pyspark.sql import Window

    from ..functions.scale import fan_out, scoped_persist

    tf = scoped_persist(
        fan_out(df)
        .select(
            F.col(id_col),
            F.col(label_col).alias("label"),
            F.explode(token_array(text_col)).alias("tok"),
        )
        .groupBy(id_col, "label", "tok")
        .agg(F.count(F.lit(1)).alias("tf")),
        "naive_bayes.tf",
    )
    cls = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("d_l")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("d"))
    cnt = tf.groupBy("label", "tok").agg(F.sum("tf").alias("c"))
    nl = cnt.groupBy("label").agg(F.sum("c").alias("n_l"))
    vocab = tf.select("tok").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    weights = (
        vocab.crossJoin(F.broadcast(cls.join(nl, "label").select("label", "n_l")))
        .crossJoin(F.broadcast(v_size))
        .join(cnt, ["label", "tok"], "left")
        .select(
            "label",
            "tok",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_l") + F.col("v"))
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("wm"),
        )
    )
    prior = (
        cls.crossJoin(F.broadcast(n_docs))
        .select(
            "label",
            F.round(F.log(F.col("d_l") / F.col("d")) * 1e6, 0)
            .cast("long")
            .alias("pm"),
        )
    )
    scores = (
        tf.select(id_col, "tok", "tf")
        .join(weights, "tok")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.col("wm")).alias("sw"))
        .join(F.broadcast(prior), "label")
        .select(
            F.col(id_col),
            F.col("label"),
            (F.col("pm") + F.col("sw")).cast("long").alias("score_micro"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("label")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("label").alias("pred_lang"),
            "score_micro",
        )
    )

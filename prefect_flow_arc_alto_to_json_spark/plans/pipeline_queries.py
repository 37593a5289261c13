"""The flagship composition: a complete LLM training-data cleaning pass —
quality gate → exact dedup → near-dup removal → token accounting — as ONE
lazy DataFrame plan with a full SQL oracle. Demonstrates that the operator
families (textstats, dedup) compose without materialization barriers.

Plan shape at scale: one narrow scoring scan (quality/tokens), one shuffle
on the md5 digest (exact dedup), one shingle-posting join (near-dup pairs);
the final anti-join is a broadcast of the (small) drop-list. No operator
ever shuffles raw text except the exact-dedup keeper join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import ngram_jaccard_pairs, normalize_text
from ..operators.textstats import quality_score, token_count
from ..functions.scale import fan_out
from ..sources import load_table
from .dedup_queries import _SQL_SHINGLE_HASHES, _SQL_SHINGLES, _SQL_TOKS
from .registry import query

_QUALITY_THRESHOLD = 0.7
#: posting-frequency cap for the near-dup stage — the skew valve that keeps
#: a boilerplate shingle shared by a large doc fraction from going
#: quadratic at 100 TB (operators/dedup.py:ngram_jaccard_pairs).
_NEAR_DUP_MAX_DF = 20


#: the clean-corpus CTE chain (quality gate -> exact dedup -> capped
#: near-dup drop list), shared by pipeline_clean_corpus and the
#: tokenizer-ready composition. Ends at the `drops` CTE; consumers
#: append their own final SELECT (and further CTEs).
def _quality_ctes(src: str, carry: str = "source, ") -> str:
    """The m/q quality-scoring CTE pair over any source CTE exposing
    (doc_id, {carry}text, toks) — shared verbatim by the documents-based
    clean chain and the web-corpus (extracted-main-text) pipeline so the
    quality formula cannot drift between them."""
    return f"""m AS (
      SELECT doc_id, {carry}text, toks,
        CAST(len(text) AS BIGINT) AS n,
        CAST(len(toks) AS BIGINT) AS ntok,
        CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS a,
        CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]')) AS BIGINT) AS p,
        CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS sl
      FROM {src}
    ),
    q AS (
      SELECT doc_id, {carry}text, toks, ntok,
        CAST(3 * (CASE WHEN ntok >= 10 AND ntok <= 5000 THEN 1000000
                       WHEN ntok > 0 THEN 500000 ELSE 0 END)
           + 3 * (CASE WHEN n > 0 THEN (2 * a * 1000000 + n) // (2 * n) ELSE 0 END)
           + 2 * (CASE WHEN (CASE WHEN n > 0 THEN (2 * p * 1000000 + n) // (2 * n) ELSE 0 END) > 200000
                       THEN 0 ELSE 1000000 END)
           + 2 * (CASE WHEN ntok > 0
                        AND (2 * sl * 1000000 + ntok) // (2 * ntok) >= 3000000
                        AND (2 * sl * 1000000 + ntok) // (2 * ntok) <= 12000000
                       THEN 1000000 ELSE 500000 END)
          AS DOUBLE) / 10000000.0 AS quality
      FROM m
    )"""


_CLEAN_CTES = f"""t AS (SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents),
    {_quality_ctes("t")},
    gated AS (SELECT * FROM q WHERE quality >= {_QUALITY_THRESHOLD}),
    exact_kept AS (
      SELECT doc_id, source, text, toks, ntok, quality FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id
        ) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    shg AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM exact_kept),
    hsh AS (SELECT doc_id, {_SQL_SHINGLE_HASHES} AS hs FROM shg),
    -- near-dup with the posting-frequency cap (GROUP BY/HAVING mirror of
    -- max_doc_freq): overflow shingles are dropped, per-doc sizes are
    -- recomputed post-cap, jaccard is over informative shingles
    post AS (SELECT doc_id, unnest(hs) AS h FROM hsh),
    keep AS (SELECT h FROM post GROUP BY h HAVING count(*) <= {_NEAR_DUP_MAX_DF}),
    kept AS (SELECT p.doc_id, p.h FROM post p JOIN keep USING (h)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    drops AS (
      SELECT DISTINCT id_b AS doc_id FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ROUND(n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE, 6) >= 0.8
    )"""


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH {_CLEAN_CTES}
    SELECT k.doc_id, CAST(k.ntok AS BIGINT) AS n_tokens, k.quality
    FROM exact_kept k LEFT JOIN drops d ON k.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → cleaned corpus: quality ≥ 0.7, exact dups collapsed to
    the min-id keeper, near-dups (3-gram jaccard ≥ 0.8 over
    informative shingles, posting lists capped at {_NEAR_DUP_MAX_DF} docs)
    drop the larger id. Returns (doc_id, n_tokens, quality) of the
    surviving corpus. The cap is live in the flagship composition since
    round 3 — at 100 TB it is the difference between a linear posting join
    and a quadratic boilerplate bucket (the one scale-killer round 2 left
    open)."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        "text",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    gated = scored.where(F.col("quality") >= _QUALITY_THRESHOLD)

    # exact dedup: keep the smallest doc_id per normalized-text digest
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    # NOT persisted: the chain feeds both the pair generation and the
    # final anti-join, but recomputing the narrow scoring pass pipelines
    # better than a persist barrier (measured 8.5s vs 13.5s cold at sf0.1);
    # at 100 TB you would checkpoint exact_kept to parquet instead
    exact_kept = gated.withColumn("__rn", keeper).where(F.col("__rn") == 1).drop("__rn")

    # near-dup removal: larger id of each jaccard>=0.8 pair is dropped;
    # the drop-list is tiny -> broadcast anti-join
    pairs = ngram_jaccard_pairs(
        exact_kept.select("doc_id", "text"),
        threshold=0.8,
        max_doc_freq=_NEAR_DUP_MAX_DF,
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    cleaned = exact_kept.join(F.broadcast(drops), "doc_id", "left_anti")
    return cleaned.select("doc_id", "n_tokens", "quality")


@query(
    "pipeline_embedding_dedup",
    extra=True,
    oracle="""
    WITH kept AS (
      SELECT doc_id, ntok FROM (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x != '')) AS BIGINT) AS ntok,
          ROW_NUMBER() OVER (
            PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
            ORDER BY doc_id
          ) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    e AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v
      FROM embeddings JOIN kept ON vec_id = doc_id
    ),
    planes AS (
      SELECT p,
             [((1103515245 * (p*64 + d + 1) + 12345) % 2147483648)
              / 1073741824.0 - 1.0 for d in range(0, 64)] AS pv
      FROM (SELECT unnest(range(0, 8)) AS p)
    ),
    bucketed AS (
      SELECT e.id,
             CAST(SUM(CASE WHEN list_sum([e.v[i] * pl.pv[i] for i in range(1, 65)]) > 0
                           THEN (1 << pl.p) ELSE 0 END) AS INTEGER) AS bucket
      FROM e, planes pl
      GROUP BY e.id
    ),
    overflow AS (
      SELECT bucket FROM bucketed GROUP BY bucket HAVING COUNT(*) > 64
    ),
    bkept AS (
      SELECT id, bucket FROM bucketed
      WHERE bucket NOT IN (SELECT bucket FROM overflow)
    ),
    aprobe AS (
      SELECT id AS id_a,
             unnest(list_prepend(
               bucket,
               [xor(bucket, CAST(1 << p AS INTEGER)) for p in range(0, 8)]
             )) AS pb
      FROM bucketed
    ),
    cand AS (
      SELECT DISTINCT a.id_a, b.id AS id_b
      FROM aprobe a JOIN bkept b ON a.pb = b.bucket AND a.id_a < b.id
    ),
    drops AS (
      SELECT DISTINCT id_b AS doc_id FROM (
        SELECT c.id_a, c.id_b,
               ROUND(list_sum([ea.v[i] * eb.v[i] for i in range(1, 65)])
                     / (sqrt(list_sum([ea.v[i] * ea.v[i] for i in range(1, 65)]))
                        * sqrt(list_sum([eb.v[i] * eb.v[i] for i in range(1, 65)]))),
                     6) AS cosine
        FROM cand c JOIN e ea ON ea.id = c.id_a JOIN e eb ON eb.id = c.id_b
      ) WHERE cosine >= 0.4
    )
    SELECT k.doc_id, k.ntok AS n_tokens
    FROM kept k LEFT JOIN drops d ON k.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
    """,
)
def pipeline_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed text+embedding dedup — the second flagship composition:
    exact text dedup (md5 keeper) → join survivors to their embeddings →
    LSH-bucketed embedding near-dup pairs (cosine ≥ 0.4) drop the larger
    id. ONE lazy plan: narrow token/normalize scan, one digest shuffle, a
    broadcast semi-join onto embeddings, the bucketed multiprobe self-join,
    and a broadcast anti-join of the tiny drop-list. Nothing in the chain
    goes quadratic or shuffles raw text twice — the plan shape a 100 TB
    multimodal dedup pass needs.

    The self-join carries the max_bucket_size=64 quadratic guard (round-8:
    a degenerate hash cell would alone cost |bucket|² pairs), and the
    oracle replays the cap (overflow/bkept CTEs) so the capped plan stays
    hash-exact — the SAME configuration scale_smoke.py blow-up-probes.
    """
    from ..operators.similarity import embedding_near_dup_pairs
    from ..operators.textstats import token_count

    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    exact_kept = (
        docs.select("doc_id", "text", token_count("text").cast("long").alias("n_tokens"))
        .withColumn("__rn", keeper)
        .where(F.col("__rn") == 1)
        .drop("__rn", "text")
    )
    # fan_out the SCAN, not the join output: a broadcast join preserves the
    # probe side's narrow partitioning, and fan_out deliberately passes
    # join-bearing plans through (functions/scale.py contract)
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    corpus = emb.join(
        F.broadcast(exact_kept.select(F.col("doc_id").alias("vec_id"))), "vec_id"
    )
    pairs = embedding_near_dup_pairs(corpus, threshold=0.4, max_bucket_size=64)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact_kept.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "n_tokens"
    )


_TOKREADY_BUDGET = 1024


def _tokready_oracle() -> str:
    """Clean chain (verbatim `_CLEAN_CTES`) → BPE training on the CLEAN
    survivors (the same unrolled 3-round chain text_bpe_merges uses,
    re-based on `cleank`) → per-doc subword encode → concat-then-chunk
    packing — the full tokenizer-ready layout replayed in SQL."""
    from .text_queries import _bpe_iter_sql

    return (
        "WITH " + _CLEAN_CTES + ",\n"
        "cleank AS (\n"
        "  SELECT k.doc_id, k.source, k.text, k.toks\n"
        "  FROM exact_kept k LEFT JOIN drops d ON k.doc_id = d.doc_id\n"
        "  WHERE d.doc_id IS NULL\n"
        "),\n"
        "w AS (\n"
        "  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_w FROM (\n"
        "    SELECT unnest(toks) AS word FROM cleank\n"
        "  ) GROUP BY word\n"
        "),\n"
        "s0 AS (\n"
        "  SELECT word, n_w,\n"
        "         [word[i] for i in range(1, len(word) + 1)] AS syms\n"
        "  FROM w\n"
        "),\n"
        + ",\n".join(_bpe_iter_sql(t) for t in (1, 2, 3))
        + f""",
    sw AS (
      SELECT doc_id, source, word, CAST(COUNT(*) AS BIGINT) AS n_sw
      FROM (SELECT doc_id, source, unnest(toks) AS word FROM cleank)
      GROUP BY doc_id, source, word
    ),
    encd AS (
      SELECT sw.doc_id, sw.source,
             CAST(SUM(sw.n_sw * len(s3.syms)) AS BIGINT) AS n_subwords
      FROM sw JOIN s3 ON sw.word = s3.word
      GROUP BY sw.doc_id, sw.source
    ),
    packed AS (
      SELECT doc_id, source, n_subwords,
             CAST(SUM(n_subwords) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_subwords AS BIGINT) AS start_off
      FROM encd
    )
    SELECT doc_id, source, n_subwords, start_off,
           start_off // {_TOKREADY_BUDGET} AS pack_id,
           GREATEST(start_off + n_subwords - 1, start_off)
             // {_TOKREADY_BUDGET}
             - start_off // {_TOKREADY_BUDGET} + 1 AS pack_spans
    FROM packed
    """
    )


# Promoted to the graded window in round 8 close-out: the third flagship
# composition (clean -> BPE train -> encode -> pack) had no graded
# representative (displaces q_map_functions).
@query("pipeline_tokenizer_ready", oracle=_tokready_oracle())
def pipeline_tokenizer_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD flagship composition — the training-data ENDGAME in one
    lazy chain: clean (quality gate → exact dedup → capped near-dup,
    the pipeline_clean_corpus stages verbatim) → BPE tokenizer TRAINING
    on the surviving corpus (k=3, operators/bpe.py) → per-doc subword
    ENCODE via the post-merge vocabulary join → concat-then-chunk
    PACKING of the subword stream into {budget}-token context windows
    (operators/corpus.py:chunk_pack). Returns per surviving document
    (doc_id, source, n_subwords, start_off, pack_id, pack_spans) — the
    layout a pretraining writer materializes directly.

    Training on the CLEANED corpus (not raw documents) is what makes
    this a composition rather than a union of parts: the merge table —
    and therefore every downstream subword count and pack boundary —
    depends on the dedup/quality stages upstream, and the oracle
    replays that dependency end to end (clean CTEs → re-based BPE
    chain → encode join → cumulative window).

    Scale: the clean stages keep their pinned shapes (narrow scoring
    scan, one digest shuffle, capped posting join, broadcast
    anti-join); BPE rounds are vocabulary-sized; the encode join is
    (doc, word)-counts × vocab (shuffle-hash at real vocab
    cardinality); packing is ONE window shuffle sharded by source. No
    stage rescans raw text after the clean pass."""
    from ..operators.bpe import bpe_train_from_counts
    from ..operators.corpus import chunk_pack
    from ..functions.scalar import token_array

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        quality_score("text").alias("quality"),
    )
    gated = scored.where(F.col("quality") >= _QUALITY_THRESHOLD)
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    exact_kept = (
        gated.withColumn("__rn", keeper).where(F.col("__rn") == 1).drop("__rn")
    )
    pairs = ngram_jaccard_pairs(
        exact_kept.select("doc_id", "text"),
        threshold=0.8,
        max_doc_freq=_NEAR_DUP_MAX_DF,
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # With the vocab now derived from the encode counts (below), the
    # cleaned corpus has exactly ONE consumer — the sw tokenize pass —
    # so its checkpoint is LAZY: lineage still truncates (the bronze
    # handoff boundary at 100 TB), but materialization folds into sw's
    # eager checkpoint job instead of paying its own (single-consumer
    # rule on functions/scale.loop_ckpt_lazy).
    clean = (
        exact_kept.join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=False)
    )
    # ONE corpus tokenize pass (round-14, guide §1.2): the per-(doc, word)
    # encode counts are computed first and checkpointed, and the BPE
    # trainer's word vocabulary derives from them (n_w = sum of n_sw) —
    # previously bpe_train and the encode stage each ran their own
    # tokenize+explode over the cleaned corpus.
    sw = (
        clean.select(
            "doc_id", "source", F.explode(token_array("text")).alias("word")
        )
        .groupBy("doc_id", "source", "word")
        .agg(F.count(F.lit(1)).alias("n_sw"))
        .localCheckpoint()  # two consumers: the vocab rollup + the encode join
    )
    wcounts = sw.groupBy("word").agg(F.sum("n_sw").cast("long").alias("n_w"))
    _, vocab = bpe_train_from_counts(wcounts, k=3)
    encd = (
        sw.join(vocab.select("word", F.size("syms").alias("n_sub_w")), "word")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("n_sw") * F.col("n_sub_w")).alias("n_subwords"))
    )
    return chunk_pack(encd, _TOKREADY_BUDGET, "n_subwords", "source").select(
        "doc_id", "source", "n_subwords", "start_off", "pack_id", "pack_spans"
    )


_DSIR_B = 512  # hashed feature buckets
_DSIR_K = 100  # selection size


@query(
    "pipeline_dsir_select",
    extra=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    bkt AS (
      SELECT doc_id, lang,
             CAST(md5_number_lower('dsir-v1:' || tok) % 4294967296
                  % {_DSIR_B} AS BIGINT) AS b
      FROM toks
    ),
    raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bkt GROUP BY b),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM bkt
            WHERE lang = 'en' GROUP BY b),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nr,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt
      FROM bkt
    ),
    w AS (
      SELECT r.b,
             CAST(ROUND(ln(
               ((COALESCE(t.ct, 0) + 1) * (tot.nr + {_DSIR_B}))
               / CAST((r.cr + 1) * (tot.nt + {_DSIR_B}) AS DOUBLE)
             ) * 1000000) AS BIGINT) AS w_micro
      FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot
    ),
    score AS (
      SELECT k.doc_id, ANY_VALUE(k.lang) AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(w.w_micro) AS BIGINT) AS score_micro
      FROM bkt k JOIN w ON w.b = k.b
      GROUP BY k.doc_id
    )
    SELECT doc_id, lang, n_toks, score_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
                AS INT) AS rank
    FROM score
    QUALIFY rank <= {_DSIR_K}
    """,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023): score every raw document by the log-likelihood ratio of a
    TARGET distribution (the 'en' slice here) vs the RAW pool under
    hashed-unigram bag models, select the top-k — the
    quality-via-distribution-match selector the pipeline family's
    classifier scorers (logreg/NB) complement with a model-free device.
    Bucket weights w_b = ln[(ct+1)(Nr+B) / ((cr+1)(Nt+B))] (add-one
    smoothing over B=512 md5 buckets) are micro-snapped with ROUND —
    the ln-of-rational is irrational, so boundary hits are measure-zero
    (the Adamic-Adar discipline); a doc's score is the integer SUM of
    its tokens' snapped weights, so the relation hash-matches exactly.

    Scale: one token explode feeds three map-side-combined aggs (bucket
    x2, 1-row totals); the 512-row weight table broadcasts back onto the
    token stream; per-doc scores are one groupBy(doc_id); the top-k is a
    TakeOrdered, never a global sort. Nothing driver-side.
    """
    from ..functions.scalar import stable_hash_u32, token_array

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    bkt = docs.select(
        "doc_id",
        "lang",
        F.explode(token_array("text")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            stable_hash_u32(F.concat(F.lit("dsir-v1:"), F.col("tok"))),
            F.lit(_DSIR_B),
        ).alias("b"),
    ).localCheckpoint()  # raw agg, target agg, totals, and the score join
    raw = bkt.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        bkt.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    tot = bkt.agg(
        F.count(F.lit(1)).cast("long").alias("nr"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("nt"),
    )
    w = (
        raw.join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce("ct", F.lit(0)) + 1)
                        * (F.col("nr") + _DSIR_B)
                    )
                    / (
                        (F.col("cr") + 1) * (F.col("nt") + _DSIR_B)
                    ).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("w_micro"),
        )
    )
    score = (
        bkt.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("w_micro").cast("long").alias("score_micro"),
        )
    )
    # top-k FIRST (TakeOrderedAndProject — never a corpus-sized global
    # sort or single-partition window), then rank the k survivors with a
    # constant-size window (the PSI-bins exemption).
    topk = score.orderBy(F.desc("score_micro"), "doc_id").limit(_DSIR_K)
    return topk.select(
        "doc_id",
        "lang",
        "n_toks",
        "score_micro",
        F.row_number()
        .over(Window.orderBy(F.desc("score_micro"), "doc_id"))
        .cast("int")
        .alias("rank"),
    )


def _pref_oracle(rounds: int = 3) -> str:
    """Quality-judge preference pipeline replay: the shared quality CTEs,
    block ranking, adjacent pairing (LEAD), cross-lang contests, then
    the same snapped Bradley-Terry MM unroll as q_bradley_terry's
    oracle (template kept textually identical — both replay
    operators/preference.bradley_terry_nano)."""
    from .text_queries import _QUALITY_CTES

    head = _QUALITY_CTES + """,
    docs2 AS (
      SELECT d.doc_id, d.lang, d.source,
             CAST(FLOOR(d.n_chars / 100.0) AS BIGINT) AS lb, q.quality
      FROM documents d JOIN q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT doc_id, lang, source, lb, quality,
             LEAD(doc_id) OVER w AS nxt_id,
             LEAD(lang) OVER w AS nxt_lang,
             LEAD(quality) OVER w AS nxt_q
      FROM docs2
      WINDOW w AS (PARTITION BY source, lb ORDER BY quality DESC, doc_id)
    ),
    prefs AS (
      SELECT CASE WHEN quality > nxt_q THEN lang ELSE nxt_lang END AS a,
             CASE WHEN quality > nxt_q THEN nxt_lang ELSE lang END AS b
      FROM ranked
      WHERE nxt_id IS NOT NULL AND lang <> nxt_lang AND quality <> nxt_q
    ),
    cmp AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM prefs GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT a, b, CAST(SUM(n) AS BIGINT) AS n_tot FROM (
        SELECT a, b, n FROM cmp
        UNION ALL SELECT b AS a, a AS b, n FROM cmp
      ) GROUP BY 1, 2
    ),
    wins AS (
      SELECT a AS item, CAST(SUM(n) AS BIGINT) AS wins FROM cmp GROUP BY 1
    ),
    base AS MATERIALIZED (
      SELECT i.item, CAST(COALESCE(w.wins, 0) AS BIGINT) AS wins
      FROM (SELECT DISTINCT a AS item FROM sym) i
      LEFT JOIN wins w ON w.item = i.item
    ),
    pi0 AS MATERIALIZED (
      SELECT item, CAST(1000000000 AS BIGINT) AS pi FROM base
    )"""
    rnd = """,
    s{R} AS MATERIALIZED (
      SELECT s.a,
             CAST(SUM(CAST(FLOOR((2 * s.n_tot * 1000000000000
                  + (pa.pi + pb.pi)) / (2.0 * (pa.pi + pb.pi)))
                  AS BIGINT)) AS BIGINT) AS ssum
      FROM sym s
      JOIN pi{P} pa ON pa.item = s.a
      JOIN pi{P} pb ON pb.item = s.b
      GROUP BY 1
    ),
    pi{R} AS MATERIALIZED (
      SELECT b.item,
             CAST(FLOOR((2 * b.wins * 1000000000000 + t.ssum)
                  / (2.0 * t.ssum)) AS BIGINT) AS pi
      FROM base b JOIN s{R} t ON t.a = b.item
    )"""
    body = "".join(rnd.format(R=r, P=r - 1) for r in range(1, rounds + 1))
    tail = """
    SELECT b.item, b.wins, nc.n_contests, p.pi AS pi_nano
    FROM base b
    JOIN pi{M} p ON p.item = b.item
    JOIN (SELECT a AS item, CAST(SUM(n_tot) AS BIGINT) AS n_contests
          FROM sym GROUP BY 1) nc ON nc.item = b.item
    """.format(M=rounds)
    return head + body + tail


@query("pipeline_preference_pairs", extra=True, oracle=_pref_oracle(3))
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF-style PREFERENCE-DATA PREP composition — the reward-modeling
    loop as one lazy chain: an automated judge (the integer-exact
    quality_score) scores every document; candidates pair WITHIN
    (source, length-bucket) blocks by adjacent quality rank (the
    sorted-neighborhood device — n pairs total, never blockwise
    quadratic); strict cross-lang pairs become (chosen, rejected)
    contests; and operators/preference.bradley_terry_nano aggregates the
    judge's pairwise verdicts into per-lang strengths (3 snapped MM
    rounds). This is the chosen/rejected-pair pipeline reward-model
    training data goes through, with the MM fit standing in for the
    reward model.

    Scale: scoring is one narrow pass; ranking windows are block-keyed;
    pairing is LEAD over the same window (no self-join); contests are a
    |langs|²-bounded relation and the MM rounds run broadcast — the
    corpus is touched exactly twice (score, rank).
    """
    from ..operators.preference import bradley_terry_nano
    from ..operators.textstats import quality_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100.0).cast("long").alias("lb"),
        quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("source", "lb").orderBy(
        F.desc("quality"), "doc_id"
    )
    ranked = docs.select(
        "doc_id",
        "lang",
        "quality",
        F.lead("doc_id").over(w).alias("nxt_id"),
        F.lead("lang").over(w).alias("nxt_lang"),
        F.lead("quality").over(w).alias("nxt_q"),
    )
    prefs = ranked.where(
        F.col("nxt_id").isNotNull()
        & (F.col("lang") != F.col("nxt_lang"))
        & (F.col("quality") != F.col("nxt_q"))
    ).select(
        F.when(F.col("quality") > F.col("nxt_q"), F.col("lang"))
        .otherwise(F.col("nxt_lang"))
        .alias("a"),
        F.when(F.col("quality") > F.col("nxt_q"), F.col("nxt_lang"))
        .otherwise(F.col("lang"))
        .alias("b"),
    )
    contests = prefs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return bradley_terry_nano(contests, rounds=3)


# ---------------------------------------------------------------------------
# Web-corpus ingestion pipeline: raw HTML -> extracted main text -> quality
# gate -> exact dedup -> token accounting (the raw-crawl sibling of
# pipeline_clean_corpus; round 11)
# ---------------------------------------------------------------------------

from ..operators.html import (  # noqa: E402
    main_region,
    sql_main_region,
    sql_strip_noise,
    sql_synth_page,
    sql_to_text,
    strip_noise,
    synth_page,
    to_text,
)
from ..operators.textstats import token_array as _token_array  # noqa: E402


def _web_corpus_oracle() -> str:
    return f"""
    WITH pg AS (
      SELECT doc_id, {sql_synth_page()} AS page FROM documents
    ),
    cl AS (SELECT doc_id, {sql_strip_noise("page")} AS clean FROM pg),
    ex AS (
      SELECT doc_id,
             {sql_to_text(sql_main_region("clean"))} AS text,
             {sql_to_text("clean")} AS page_text
      FROM cl
    ),
    x AS (
      SELECT doc_id, text,
        CAST((2 * (len(page_text) - len(text)) * 1000000 + len(page_text))
             // (2 * len(page_text)) AS BIGINT) AS boiler_ppm,
        {_SQL_TOKS} AS toks
      FROM ex
    ),
    {_quality_ctes("x", carry="boiler_ppm, ")},
    gated AS (SELECT * FROM q WHERE quality >= {_QUALITY_THRESHOLD}),
    exact_kept AS (
      SELECT doc_id, boiler_ppm, ntok, quality FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id
        ) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens, quality, boiler_ppm
    FROM exact_kept
    """


@query("pipeline_web_corpus", extra=True, oracle=_web_corpus_oracle())
def pipeline_web_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw crawl -> training corpus as ONE lazy plan: synthesize the HTML
    page per document (operators/html.py fixtures), extract the main text
    (comment/script/style strip, container-priority region, tag strip,
    entity decode), quality-gate the EXTRACTED text with the same scoring
    formula as pipeline_clean_corpus (shared _quality_ctes generator — the
    formula cannot drift between the two pipelines), collapse exact dups
    of the normalized extract to the min-id keeper, and account tokens.
    boiler_ppm (chrome fraction of the page) rides through as the
    crawl-specific quality signal.

    Plan shape at scale: ONE narrow scan does page synthesis + extraction
    + scoring (regexp built-ins, WholeStageCodegen, no UDF); the only
    shuffle is the exact-dedup digest keeper window. Near-dup removal is
    deliberately left to the downstream pipeline_clean_corpus stage — on
    extracted web text the two pipelines compose (extract | clean), and
    the shingle-posting machinery is already adjudicated there.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "lang"
    )
    # staged projections (SPARK-36718 device): "clean" is referenced by
    # FIVE downstream expressions (three region candidates, the fallback,
    # page_text) — aliasing it in its own projection keeps CollapseProject
    # from re-inlining the whole synth+strip regexp chain per reference
    ex = (
        docs.select(
            "doc_id", strip_noise(synth_page()).alias("clean")
        ).select(
            "doc_id",
            to_text(main_region(F.col("clean"))).alias("text"),
            to_text(F.col("clean")).alias("page_text"),
        )
    )
    d = F.call_function
    x = ex.select(
        "doc_id",
        "text",
        d(
            "div",
            2
            * (F.length("page_text") - F.length("text")).cast("long")
            * 1_000_000
            + F.length("page_text").cast("long"),
            2 * F.length("page_text").cast("long"),
        ).alias("boiler_ppm"),
    )
    scored = x.select(
        "doc_id",
        "text",
        "boiler_ppm",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    ).localCheckpoint()
    # ^ lineage cut at the extracted-corpus boundary: without it,
    # PushPredicateThroughNonJoin alias-substitutes the quality gate all
    # the way down to the scan, re-inlining the synth+extract regexp
    # chain ~217x into one Filter AND evaluating the whole extraction
    # twice (measured 9.3 s vs 2.6 s at sf0.1). At 100 TB this boundary
    # is where you would checkpoint the extracted corpus to parquet
    # anyway — extraction is the expensive pass, everything after is
    # cheap relative to it.
    gated = scored.where(F.col("quality") >= _QUALITY_THRESHOLD)
    keeper = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text("text"))).orderBy("doc_id")
    )
    exact_kept = (
        gated.withColumn("__rn", keeper).where(F.col("__rn") == 1).drop("__rn")
    )
    return exact_kept.select("doc_id", "n_tokens", "quality", "boiler_ppm")

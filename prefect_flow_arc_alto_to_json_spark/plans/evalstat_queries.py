"""Evaluation & statistics families, round 12: generation eval (BLEU),
multiple-testing correction (Benjamini–Hochberg FDR), rank correlation
(Kendall tau-b), and panel causal inference (difference-in-differences).

Each query is a distinct concept family new to the registry (see
ROTATION.md): BLEU is the n-gram-precision generation metric every
LLM-eval harness reports (q_ndcg_ranking grades rankings, q_roc_auc
grades classifiers; this grades generated TEXT against references);
BH-FDR is what turns hundreds of per-segment A/B p-values into a
defensible discovery list; Kendall tau-b is the concordance-based rank
correlation (q_spearman_correlation is the midrank-based one); DiD is
the pre/post × treated/control panel estimator (q_ipw_ate reweights a
cross-section, DiD differences out time-invariant confounders).

Determinism devices (memory: spark-oracle-determinism-devices): exact
integer counts and half-up micro-cent means everywhere; the only
transcendental steps (BLEU's brevity penalty, the logistic p-value
approximation) are ROUND(x*1e6) micro-snapped — the established
measure-zero-boundary device; Kendall tau is emitted DIVISION-FREE as
(tau_num, tau_den_sq) integers because sqrt of a possibly-perfect-square
integer can land a rational on a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import cents, token_array
from ..functions.scale import fan_out
from ..sources import load_table
from .registry import query

# BLEU candidate construction: drop every 7th token (1-based positions
# == 4 mod 7) AND duplicate every 11th (== 5 mod 11, emitted twice in
# sequence) to get a deterministic "model output". The deletion drives
# the brevity penalty and bigram breakage; the duplication makes unigram
# CLIPPING bind (a pure deletion can never exceed reference counts, so
# p1 would be degenerately 1 — caught by test_bleu_eval_orderings).
_BLEU_MOD = 7
_BLEU_RESIDUE = 4
_BLEU_DUP_MOD = 11
_BLEU_DUP_RES = 5

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)


def _bleu_oracle() -> str:
    return (
        """
    WITH base AS (
      SELECT doc_id, lang, """
        + _SQL_TOKS
        + """ AS toks FROM documents
    ),
    rpos AS (
      SELECT doc_id, lang, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM base
    ),
    cpos AS (
      SELECT doc_id, lang, tok, pos, 0 AS sub FROM rpos WHERE pos % """
        + f"{_BLEU_MOD} != {_BLEU_RESIDUE}"
        + """
      UNION ALL
      SELECT doc_id, lang, tok, pos, 1 AS sub FROM rpos WHERE pos % """
        + f"{_BLEU_MOD} != {_BLEU_RESIDUE} AND pos % {_BLEU_DUP_MOD} = {_BLEU_DUP_RES}"
        + """
    ),
    rbig AS (
      SELECT doc_id, lang,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS g
      FROM rpos
    ),
    cbig AS (
      SELECT doc_id, lang,
             tok || ' ' ||
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos, sub) AS g
      FROM cpos
    ),
    c1 AS (SELECT doc_id, lang, tok, COUNT(*) AS c FROM cpos GROUP BY 1,2,3),
    r1 AS (SELECT doc_id, tok, COUNT(*) AS c FROM rpos GROUP BY 1,2),
    c2 AS (SELECT doc_id, lang, g, COUNT(*) AS c FROM cbig
           WHERE g IS NOT NULL GROUP BY 1,2,3),
    r2 AS (SELECT doc_id, g, COUNT(*) AS c FROM rbig
           WHERE g IS NOT NULL GROUP BY 1,2),
    p1 AS (
      SELECT c1.lang,
             SUM(LEAST(c1.c, COALESCE(r1.c, 0))) AS num,
             SUM(c1.c) AS den
      FROM c1 LEFT JOIN r1 ON r1.doc_id = c1.doc_id AND r1.tok = c1.tok
      GROUP BY 1
    ),
    p2 AS (
      SELECT c2.lang,
             SUM(LEAST(c2.c, COALESCE(r2.c, 0))) AS num,
             SUM(c2.c) AS den
      FROM c2 LEFT JOIN r2 ON r2.doc_id = c2.doc_id AND r2.g = c2.g
      GROUP BY 1
    ),
    lens AS (
      SELECT r.lang, c.cand_len, r.ref_len FROM
        (SELECT lang, COUNT(*) AS ref_len FROM rpos GROUP BY 1) r
        JOIN (SELECT lang, COUNT(*) AS cand_len FROM cpos GROUP BY 1) c
        ON c.lang = r.lang
    ),
    j AS (
      SELECT lens.lang,
             CAST(p1.num AS BIGINT) AS p1_num, CAST(p1.den AS BIGINT) AS p1_den,
             CAST(p2.num AS BIGINT) AS p2_num, CAST(p2.den AS BIGINT) AS p2_den,
             CAST(lens.cand_len AS BIGINT) AS cand_len,
             CAST(lens.ref_len AS BIGINT) AS ref_len
      FROM lens JOIN p1 ON p1.lang = lens.lang JOIN p2 ON p2.lang = lens.lang
    )
    SELECT lang, p1_num, p1_den, p2_num, p2_den, cand_len, ref_len,
      CAST(ROUND(1e6 * EXP(LEAST(0.0,
        1.0 - CAST(ref_len AS DOUBLE) / cand_len))) AS BIGINT) AS bp_micro,
      CAST(ROUND(1e6 * SQRT(
        (CAST(p1_num AS DOUBLE) / p1_den) * (CAST(p2_num AS DOUBLE) / p2_den)
      )) AS BIGINT) AS gm_micro,
      (CAST(ROUND(1e6 * EXP(LEAST(0.0,
         1.0 - CAST(ref_len AS DOUBLE) / cand_len))) AS BIGINT)
       * CAST(ROUND(1e6 * SQRT(
         (CAST(p1_num AS DOUBLE) / p1_den) * (CAST(p2_num AS DOUBLE) / p2_den)
       )) AS BIGINT) + 500000) // 1000000 AS bleu_ppm
    FROM j
    """
    )


@query("q_bleu_eval", extra=True, oracle=_bleu_oracle())
def q_bleu_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS BLEU-2 — the n-gram-precision generation-eval metric, per
    language. The "model output" is a deterministic perturbation of each
    document (every 7th token dropped), so clipping (modified n-gram
    precision), the shortened-candidate brevity penalty, and the unigram
    x bigram geometric mean are all exercised with a known ground truth:
    p1 < 1, p2 < p1, BP < 1 on any doc long enough to lose a token.

    Determinism: clipped counts and lengths are exact integers; BP and
    the geometric mean are micro-snapped (ROUND(x*1e6)) — exp is the one
    libm call (measure-zero boundary device); sqrt and the divisions are
    IEEE-correctly-rounded in both engines with an identical expression
    tree; bleu_ppm is integer arithmetic on the two snapped factors.

    Scale: token/bigram explosion is linear in corpus bytes; per-(doc,
    gram) counts aggregate map-side; the clip join is co-keyed on
    (doc_id, gram) — the same doc's candidate and reference grams land
    in the same partition; the final rollup is language-grain (tiny).
    100 TB story: identical to the dedup shingle paths — no pair
    explosion, everything keyed by doc.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", token_array("text").alias("toks")
    )
    rpos = docs.select(
        "doc_id", "lang", F.posexplode("toks").alias("pos0", "tok")
    ).localCheckpoint()  # cand/ref unigram+bigram legs all read it
    keep = ((F.col("pos0") + 1) % _BLEU_MOD) != _BLEU_RESIDUE
    dup = ((F.col("pos0") + 1) % _BLEU_DUP_MOD) == _BLEU_DUP_RES
    cpos = (
        rpos.where(keep)
        .select("doc_id", "lang", "tok", "pos0", F.lit(0).alias("sub"))
        .unionByName(
            rpos.where(keep & dup).select(
                "doc_id", "lang", "tok", "pos0", F.lit(1).alias("sub")
            )
        )
    )
    w_ref = Window.partitionBy("doc_id").orderBy("pos0")
    w_cand = Window.partitionBy("doc_id").orderBy("pos0", "sub")

    def bigrams(df: DataFrame, w: Window) -> DataFrame:
        return df.select(
            "doc_id",
            "lang",
            F.concat_ws(" ", "tok", F.lead("tok").over(w)).alias("g"),
            F.lead("tok").over(w).alias("nxt"),
        ).where(F.col("nxt").isNotNull())

    c1 = cpos.groupBy("doc_id", "lang", "tok").agg(F.count("*").alias("c"))
    r1 = rpos.groupBy("doc_id", "tok").agg(F.count("*").alias("rc"))
    c2 = bigrams(cpos, w_cand).groupBy("doc_id", "lang", "g").agg(
        F.count("*").alias("c")
    )
    r2 = bigrams(rpos, w_ref).groupBy("doc_id", "g").agg(
        F.count("*").alias("rc")
    )
    p1 = c1.alias("c").join(
        r1.alias("r"),
        (F.col("c.doc_id") == F.col("r.doc_id"))
        & (F.col("c.tok") == F.col("r.tok")),
        "left",
    ).groupBy(F.col("c.lang").alias("lang")).agg(
        F.sum(F.least(F.col("c.c"), F.coalesce(F.col("r.rc"), F.lit(0))))
        .cast("long")
        .alias("p1_num"),
        F.sum(F.col("c.c")).cast("long").alias("p1_den"),
    )
    p2 = c2.alias("c").join(
        r2.alias("r"),
        (F.col("c.doc_id") == F.col("r.doc_id"))
        & (F.col("c.g") == F.col("r.g")),
        "left",
    ).groupBy(F.col("c.lang").alias("lang")).agg(
        F.sum(F.least(F.col("c.c"), F.coalesce(F.col("r.rc"), F.lit(0))))
        .cast("long")
        .alias("p2_num"),
        F.sum(F.col("c.c")).cast("long").alias("p2_den"),
    )
    lens = rpos.groupBy("lang").agg(
        F.count("*").cast("long").alias("ref_len")
    ).join(
        F.broadcast(
            cpos.groupBy("lang").agg(
                F.count("*").cast("long").alias("cand_len")
            )
        ),
        "lang",
    )
    j = lens.join(F.broadcast(p1), "lang").join(F.broadcast(p2), "lang")
    bp = F.round(
        F.lit(1e6)
        * F.exp(
            F.least(
                F.lit(0.0),
                F.lit(1.0)
                - F.col("ref_len").cast("double") / F.col("cand_len"),
            )
        ),
        0,
    ).cast("long")
    gm = F.round(
        F.lit(1e6)
        * F.sqrt(
            (F.col("p1_num").cast("double") / F.col("p1_den"))
            * (F.col("p2_num").cast("double") / F.col("p2_den"))
        ),
        0,
    ).cast("long")
    return j.select(
        "lang",
        "p1_num",
        "p1_den",
        "p2_num",
        "p2_den",
        "cand_len",
        "ref_len",
        bp.alias("bp_micro"),
        gm.alias("gm_micro"),
        F.call_function(
            "div", bp * gm + F.lit(500000).cast("long"), F.lit(1000000)
        ).alias("bleu_ppm"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR
# ---------------------------------------------------------------------------

# The synthetic corpus is globally HOMOGENEOUS (verified: every natural
# (segment, metric) grid yields true nulls everywhere, so reject would be
# degenerately zero — the round-9 vacuity trap). The tests therefore use
# the PLANTED-ALTERNATIVE design: each doc gets a deterministic md5 coin
# h = stable_hash_p31('fdr-v1:' || doc_id); the tested indicator is
# h % 2 = 0 (a fair coin, true null) for every source EXCEPT the two
# planted ones, where it is h % 10 = 0 (share ~0.1) and h % 10 != 0
# (share ~0.9) — so BH must reject the planted sources and (mostly) keep
# the nulls, at every SF, with a known ground truth.
_FDR_SALT = "fdr-v1:"
_FDR_LO_SRC = "src0"  # planted share ~0.1
_FDR_HI_SRC = "src1"  # planted share ~0.9
_FDR_SLOPE = "1.702"
_FDR_ALPHA_MICRO = 100000  # alpha = 0.1


def _fdr_oracle() -> str:
    return """
    WITH d AS (
      SELECT source,
        md5_number_lower('{SALT}' || CAST(doc_id AS VARCHAR))
          % 2147483647 AS h
      FROM documents
    ),
    ind AS (
      SELECT source,
        CASE WHEN source = '{LO}' THEN CASE WHEN h % 10 = 0 THEN 1 ELSE 0 END
             WHEN source = '{HI}' THEN CASE WHEN h % 10 <> 0 THEN 1 ELSE 0 END
             ELSE CASE WHEN h % 2 = 0 THEN 1 ELSE 0 END END AS hi
      FROM d
    ),
    tests AS (
      SELECT source, CAST(SUM(hi) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ind GROUP BY 1
    ),
    gstats AS (
      SELECT CAST(SUM(x) AS BIGINT) AS gx, CAST(SUM(n) AS BIGINT) AS gn,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM tests
    ),
    z AS (
      SELECT t.source, t.x, t.n, g.m,
        ABS((t.x - t.n * (CAST(g.gx AS DOUBLE) / g.gn))
            / SQRT(t.n * (CAST(g.gx AS DOUBLE) / g.gn)
                   * (1.0 - CAST(g.gx AS DOUBLE) / g.gn))) AS za
      FROM tests t CROSS JOIN gstats g
    ),
    p AS (
      SELECT source, x, n, m,
        CAST(ROUND(1e6 * (2.0 / (1.0 + EXP({SL} * za)))) AS BIGINT)
          AS p_micro
      FROM z
    ),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY p_micro, source) AS BIGINT) AS p_rank
      FROM p
    ),
    k AS (
      SELECT COALESCE(MAX(CASE WHEN p_micro * m <= {AL} * p_rank
                               THEN p_rank END), 0) AS kmax
      FROM rk
    )
    SELECT rk.source, rk.x, rk.n, rk.p_micro, rk.p_rank,
           CASE WHEN rk.p_rank <= k.kmax THEN 1 ELSE 0 END AS reject
    FROM rk CROSS JOIN k
    """.format(
        SALT=_FDR_SALT,
        LO=_FDR_LO_SRC,
        HI=_FDR_HI_SRC,
        SL=_FDR_SLOPE,
        AL=_FDR_ALPHA_MICRO,
    )


@query("q_fdr_bh", extra=True, oracle=_fdr_oracle())
def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI–HOCHBERG FDR over per-source proportion tests — the
    multiple-testing member of the experimentation family
    (q_abtest_proportions runs ONE test; a real segment sweep runs one
    per source, and controlling the false discovery rate is what keeps
    the discovery list honest). Ground truth is PLANTED (see module
    constants): two sources carry a true effect (md5-coin share ~0.1 /
    ~0.9 vs the fair-coin nulls), so the step-up must fire at every SF
    and the rejected set is known — tests/test_eval_metrics.py asserts
    the planted sources are rejected and the FDR among nulls is
    controlled. Two-sided z via the logistic normal-CDF approximation (a
    DEFINED score, shared constant slope — no libm erf), then BH: reject
    the smallest-k p-values where p_(i) <= alpha*i/m.

    Determinism: counts exact (md5 coins are cross-engine identical); z
    uses only IEEE-correctly-rounded ops (div/mul/sub/sqrt) in an
    identical tree; the one exp() is micro-snapped; the BH inequality is
    evaluated in INTEGERS (p_micro * m <= alpha_micro * rank).

    Scale: one map-side aggregation to the test grain; everything after
    runs on the |sources|-row test relation (catalog-bounded — the
    global rank window is allowlisted on that bound).
    """
    from ..functions.scalar import stable_hash_p31

    h = stable_hash_p31(
        F.concat(F.lit(_FDR_SALT), F.col("doc_id").cast("string"))
    )
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "source", h.alias("h")
    )
    hi = (
        F.when(F.col("source") == _FDR_LO_SRC, (F.col("h") % 10 == 0))
        .when(F.col("source") == _FDR_HI_SRC, (F.col("h") % 10 != 0))
        .otherwise(F.col("h") % 2 == 0)
        .cast("int")
    )
    tests = d.select("source", hi.alias("hi")).groupBy("source").agg(
        F.sum("hi").cast("long").alias("x"),
        F.count("*").cast("long").alias("n"),
    )
    glob = tests.agg(
        F.sum("x").cast("long").alias("gx"),
        F.sum("n").cast("long").alias("gn"),
        F.count("*").cast("long").alias("m"),
    )
    p0 = F.col("gx").cast("double") / F.col("gn")
    za = F.abs(
        (F.col("x") - F.col("n") * p0)
        / F.sqrt(F.col("n") * p0 * (F.lit(1.0) - p0))
    )
    p = tests.crossJoin(F.broadcast(glob)).select(
        "source",
        "x",
        "n",
        "m",
        F.round(
            F.lit(1e6)
            * (
                F.lit(2.0)
                / (F.lit(1.0) + F.exp(F.lit(float(_FDR_SLOPE)) * za))
            ),
            0,
        )
        .cast("long")
        .alias("p_micro"),
    )
    rk = p.withColumn(
        "p_rank",
        F.row_number()
        .over(Window.orderBy("p_micro", "source"))
        .cast("long"),
    ).localCheckpoint()  # kmax aggregate + final output both read it
    k = rk.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_micro") * F.col("m")
                    <= F.lit(_FDR_ALPHA_MICRO) * F.col("p_rank"),
                    F.col("p_rank"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("kmax")
    )
    return rk.crossJoin(F.broadcast(k)).select(
        "source",
        "x",
        "n",
        "p_micro",
        "p_rank",
        (F.col("p_rank") <= F.col("kmax")).cast("int").alias("reject"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


def _kendall_oracle() -> str:
    return """
    WITH pts AS (
      SELECT event_type, isodow(ts) AS dow,
        CAST((2 * SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1000000 + COUNT(*))
          // (2 * COUNT(*)) AS BIGINT) AS xm,
        CAST(COUNT(*) AS BIGINT) AS ym
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
        CASE WHEN (a.xm - b.xm) * (a.ym - b.ym) > 0 THEN 1 ELSE 0 END AS con,
        CASE WHEN (a.xm - b.xm) * (a.ym - b.ym) < 0 THEN 1 ELSE 0 END AS dis,
        CASE WHEN a.xm = b.xm THEN 1 ELSE 0 END AS tx,
        CASE WHEN a.ym = b.ym THEN 1 ELSE 0 END AS ty
      FROM pts a JOIN pts b
        ON a.event_type = b.event_type AND a.dow < b.dow
    )
    SELECT event_type,
      CAST(SUM(con) AS BIGINT) AS c,
      CAST(SUM(dis) AS BIGINT) AS d,
      CAST(COUNT(*) AS BIGINT) AS n0,
      CAST(SUM(tx) AS BIGINT) AS t1,
      CAST(SUM(ty) AS BIGINT) AS t2,
      CAST(SUM(con) - SUM(dis) AS BIGINT) AS tau_num,
      CAST((COUNT(*) - SUM(tx)) * (COUNT(*) - SUM(ty)) AS BIGINT)
        AS tau_den_sq
    FROM pairs GROUP BY 1
    """


@query("q_kendall_tau", extra=True, oracle=_kendall_oracle())
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL TAU-B — concordance-based rank correlation between the
    weekday mean-value profile and the weekday volume profile, per event
    type (q_spearman_correlation is the midrank member of the family;
    tau counts concordant/discordant PAIRS and is the robust choice for
    short ordinal profiles). tau-b = (C-D)/sqrt((n0-t1)(n0-t2)) with tie
    corrections on both margins.

    Determinism: weekday means are half-up micro-cent INTEGERS before
    any comparison (ties are exact); the pair scan emits integer C, D,
    t1, t2 and tau DIVISION-FREE as (tau_num, tau_den_sq) — sqrt of a
    possibly-perfect-square integer could park a rational exactly on a
    rounding boundary, so no float leaves the query.

    Scale: one map-side aggregation to (event_type, weekday); the pair
    join runs INSIDE 7-row groups (21 pairs per event type, bounded by
    the calendar, never by the corpus).
    """
    from ..functions.scalar import half_up_units

    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "event_type",
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        cents("value").alias("vc"),
    )
    pts = ev.groupBy("event_type", "dow").agg(
        half_up_units(
            F.sum("vc").cast("long"), F.count("*").cast("long"), 1_000_000
        ).alias("xm"),
        F.count("*").cast("long").alias("ym"),
    ).localCheckpoint()  # both pair-join sides read it
    a, b = pts.alias("a"), pts.alias("b")
    prod = (F.col("a.xm") - F.col("b.xm")) * (F.col("a.ym") - F.col("b.ym"))
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.dow") < F.col("b.dow")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (prod > 0).cast("long").alias("con"),
        (prod < 0).cast("long").alias("dis"),
        (F.col("a.xm") == F.col("b.xm")).cast("long").alias("tx"),
        (F.col("a.ym") == F.col("b.ym")).cast("long").alias("ty"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum("con").cast("long").alias("c"),
        F.sum("dis").cast("long").alias("d"),
        F.count("*").cast("long").alias("n0"),
        F.sum("tx").cast("long").alias("t1"),
        F.sum("ty").cast("long").alias("t2"),
        (F.sum("con") - F.sum("dis")).cast("long").alias("tau_num"),
        (
            (F.count("*") - F.sum("tx")) * (F.count("*") - F.sum("ty"))
        )
        .cast("long")
        .alias("tau_den_sq"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

_DID_CUTOFF = "2024-01-16 00:00:00"


def _did_oracle() -> str:
    return """
    WITH ev AS (
      SELECT event_type,
        CASE WHEN ts >= TIMESTAMP '{CUT}' THEN 1 ELSE 0 END AS post,
        CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM ev),
    cells AS (
      SELECT t.event_type AS treated_type,
        CASE WHEN e.event_type = t.event_type THEN 1 ELSE 0 END AS grp,
        e.post,
        CAST((2 * SUM(e.vc) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
          AS mean_micro
      FROM types t CROSS JOIN ev e
      GROUP BY 1, 2, 3
    )
    SELECT treated_type,
      MAX(CASE WHEN grp = 1 AND post = 0 THEN mean_micro END) AS mt_pre,
      MAX(CASE WHEN grp = 1 AND post = 1 THEN mean_micro END) AS mt_post,
      MAX(CASE WHEN grp = 0 AND post = 0 THEN mean_micro END) AS mc_pre,
      MAX(CASE WHEN grp = 0 AND post = 1 THEN mean_micro END) AS mc_post,
      (MAX(CASE WHEN grp = 1 AND post = 1 THEN mean_micro END)
       - MAX(CASE WHEN grp = 1 AND post = 0 THEN mean_micro END))
      - (MAX(CASE WHEN grp = 0 AND post = 1 THEN mean_micro END)
         - MAX(CASE WHEN grp = 0 AND post = 0 THEN mean_micro END))
        AS did_micro
    FROM cells GROUP BY 1
    """.format(CUT=_DID_CUTOFF)


@query("q_diff_in_diff", extra=True, oracle=_did_oracle())
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the panel member of the causal family
    (q_ipw_ate reweights a cross-section by propensity; DiD uses the
    pre/post x treated/control 2x2 to difference out time-invariant
    group effects AND common time shocks). Each event type in turn plays
    "treated" against all others as control, split at a shared cutoff:
    did = (treated_post - treated_pre) - (control_post - control_pre).

    Determinism: the four cell means are half-up micro-cent integers
    (exact rationals snapped by the established device); did_micro is
    then pure integer subtraction — no float leaves the query.

    Scale: ONE pass over the fact table per treated-type assignment is
    avoided by aggregating to (treated_type, grp, post) in a single
    grouped aggregation over the type-broadcast join; with a catalog of
    T types that's a T-way fan-out of a map-side partial agg, never T
    scans. Cell relation is 4T rows.
    """
    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "event_type",
        (F.col("ts") >= F.lit(_DID_CUTOFF).cast("timestamp"))
        .cast("int")
        .alias("post"),
        cents("value").alias("vc"),
    )
    types = (
        ev.select(F.col("event_type").alias("treated_type"))
        .distinct()
        .localCheckpoint()  # derived from ev, rejoined onto it (self-join rule)
    )
    from ..functions.scalar import half_up_units

    cells = (
        ev.crossJoin(F.broadcast(types))
        .groupBy(
            "treated_type",
            (F.col("event_type") == F.col("treated_type"))
            .cast("int")
            .alias("grp"),
            "post",
        )
        .agg(
            half_up_units(
                F.sum("vc").cast("long"),
                F.count("*").cast("long"),
                1_000_000,
            ).alias("mean_micro")
        )
    )

    def cell(g: int, p: int):
        return F.max(
            F.when(
                (F.col("grp") == g) & (F.col("post") == p),
                F.col("mean_micro"),
            )
        )

    return cells.groupBy("treated_type").agg(
        cell(1, 0).alias("mt_pre"),
        cell(1, 1).alias("mt_post"),
        cell(0, 0).alias("mc_pre"),
        cell(0, 1).alias("mc_post"),
        (
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
        ).alias("did_micro"),
    )


# ---------------------------------------------------------------------------
# Regression discontinuity (round 12)
# ---------------------------------------------------------------------------

# Running variable = n_chars, cutoff/bandwidth below. The outcome is the
# token count plus a PLANTED jump at the cutoff (md5 coin in {0,1,2},
# mean 1 — same planted-ground-truth rationale as q_fdr_bh: the
# homogeneous corpus has no natural discontinuity, so without planting
# the estimate would only ever measure noise). The estimator must
# recover ~1e6 micro against the token-count-vs-length slope.
_RD_CUTOFF = 306
_RD_BANDWIDTH = 60
_RD_SALT = "rd-v1:"


def _rd_oracle() -> str:
    return """
    WITH d AS (
      SELECT
        n_chars - {C} AS u,
        CAST(len(list_filter(
          string_split_regex(lower(trim(text)), '\\s+'), x -> x != ''))
          AS BIGINT)
        + CASE WHEN n_chars >= {C} THEN
            md5_number_lower('{SALT}' || CAST(doc_id AS VARCHAR))
              % 2147483647 % 3 ELSE 0 END AS y
      FROM documents
      WHERE n_chars >= {C} - {H} AND n_chars < {C} + {H}
    ),
    s AS (
      SELECT CASE WHEN u >= 0 THEN 'R' ELSE 'L' END AS side,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(u) AS BIGINT) AS su,
        CAST(SUM(u * u) AS BIGINT) AS suu,
        CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(u * y) AS BIGINT) AS suy
      FROM d GROUP BY 1
    ),
    ic AS (
      SELECT side, n,
        CAST(CASE WHEN (sy * suu - su * suy) >= 0
          THEN (2 * CAST(sy * suu - su * suy AS HUGEINT) * 1000000
                + (n * suu - su * su)) // (2 * (n * suu - su * su))
          ELSE -((2 * CAST(su * suy - sy * suu AS HUGEINT) * 1000000
                + (n * suu - su * su)) // (2 * (n * suu - su * su)))
        END AS BIGINT) AS yc_micro
      FROM s
    )
    SELECT l.n AS n_l, r.n AS n_r,
           l.yc_micro AS yc_l_micro, r.yc_micro AS yc_r_micro,
           r.yc_micro - l.yc_micro AS rd_micro
    FROM (SELECT * FROM ic WHERE side = 'L') l
    CROSS JOIN (SELECT * FROM ic WHERE side = 'R') r
    """.format(C=_RD_CUTOFF, H=_RD_BANDWIDTH, SALT=_RD_SALT)


@query("q_regression_discontinuity", extra=True, oracle=_rd_oracle())
def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGRESSION DISCONTINUITY — the cutoff-based member of the causal
    family (q_ipw_ate reweights by propensity, q_diff_in_diff uses the
    2x2 panel; RD identifies the effect from the JUMP at an assignment
    cutoff, fitting a local line on each side within a bandwidth and
    differencing the two intercepts AT the cutoff — the design every
    threshold-assigned intervention evaluation uses). Ground truth is
    planted (+md5-coin mean ~1 above the cutoff), so the estimate must
    sit near 1e6 micro — asserted in tests/test_eval_metrics.py.

    Determinism: the running variable is CENTERED at the cutoff before
    any moment is formed (keeps every closed-form OLS numerator within
    long range at sf0.1 — ~2.2e18 worst-case vs the 9.2e18 long ceiling;
    at 10x the rows, shard the moment sums and rescale, or move to
    decimal); the intercepts are signed half-up integer ratios of exact
    integer moment sums; rd_micro is integer subtraction. The oracle
    routes the same numerators through HUGEINT.

    Scale: one filtered, map-side moment aggregation (5 sums per side) —
    the bandwidth filter is pushed to the parquet scan; everything after
    is a 2-row relation.
    """
    from ..functions.scalar import stable_hash_p31, token_array

    C, H = _RD_CUTOFF, _RD_BANDWIDTH
    d = (
        fan_out(load_table(spark, sf_dir, "documents"))
        .where(
            (F.col("n_chars") >= C - H) & (F.col("n_chars") < C + H)
        )
        .select(
            (F.col("n_chars") - C).cast("long").alias("u"),
            (
                F.size(token_array("text")).cast("long")
                + F.when(
                    F.col("n_chars") >= C,
                    stable_hash_p31(
                        F.concat(
                            F.lit(_RD_SALT), F.col("doc_id").cast("string")
                        )
                    )
                    % 3,
                ).otherwise(F.lit(0).cast("long"))
            ).alias("y"),
        )
    )
    s = d.groupBy(
        F.when(F.col("u") >= 0, F.lit("R")).otherwise(F.lit("L")).alias("side")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").cast("long").alias("su"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("suu"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("u") * F.col("y")).cast("long").alias("suy"),
    )
    num = F.col("sy") * F.col("suu") - F.col("su") * F.col("suy")
    den = F.col("n") * F.col("suu") - F.col("su") * F.col("su")
    mil = F.lit(1000000).cast("long")
    yc = F.when(
        num >= 0, F.call_function("div", 2 * num * mil + den, 2 * den)
    ).otherwise(-F.call_function("div", 2 * (-num) * mil + den, 2 * den))
    ic = s.select("side", "n", yc.alias("yc_micro"))
    left = ic.where(F.col("side") == "L").select(
        F.col("n").alias("n_l"), F.col("yc_micro").alias("yc_l_micro")
    )
    right = ic.where(F.col("side") == "R").select(
        F.col("n").alias("n_r"), F.col("yc_micro").alias("yc_r_micro")
    )
    return left.crossJoin(F.broadcast(right)).select(
        "n_l",
        "n_r",
        "yc_l_micro",
        "yc_r_micro",
        (F.col("yc_r_micro") - F.col("yc_l_micro")).alias("rd_micro"),
    )


# ---------------------------------------------------------------------------
# Successive halving (round 12)
# ---------------------------------------------------------------------------

# (budget per arm, survivors kept) per round — budgets double, arms
# halve: the Jamieson-Talwalkar successive-halving schedule. Rewards are
# planted: reward(doc) = md5(doc) % 100 + 5 * source_index, so the true
# arm means are separated by 5 with noise sd ~29 — early rounds at b=8
# can eliminate a good arm (SH's known failure mode), later budgets
# stabilize, and the final survivors must come from the top indices.
_SH_SCHEDULE = [(8, 10), (16, 5), (32, 3), (64, 2)]
_SH_SALT = "sh-v1:"
_SH_STEP = 5


def _sh_oracle() -> str:
    head = """
    WITH ranked AS (
      SELECT source,
        CAST(md5_number_lower('{SALT}' || CAST(doc_id AS VARCHAR))
             % 2147483647 % 100
           + {STEP} * CAST(substr(source, 4) AS BIGINT) AS BIGINT) AS reward,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents
    ),
    alive0 AS (SELECT DISTINCT source FROM ranked)""".format(
        SALT=_SH_SALT, STEP=_SH_STEP
    )
    parts = [head]
    sel = []
    for r, (b, m) in enumerate(_SH_SCHEDULE, 1):
        parts.append(
            """
    agg{R} AS (
      SELECT ranked.source, CAST(COUNT(*) AS BIGINT) AS n_used,
        CAST((2 * SUM(reward) * 1000000 + COUNT(*)) // (2 * COUNT(*))
             AS BIGINT) AS mean_micro
      FROM ranked JOIN alive{P} a ON a.source = ranked.source
      WHERE rk <= {B}
      GROUP BY 1
    ),
    keep{R} AS (
      SELECT source, n_used, mean_micro,
        CASE WHEN ROW_NUMBER() OVER (
          ORDER BY mean_micro DESC, source) <= {M} THEN 1 ELSE 0 END AS kept
      FROM agg{R}
    ),
    alive{R} AS (SELECT source FROM keep{R} WHERE kept = 1)""".format(
                R=r, P=r - 1, B=b, M=m
            )
        )
        sel.append(
            "SELECT {R} AS round, CAST({B} AS BIGINT) AS budget, source,"
            " n_used, mean_micro, kept FROM keep{R}".format(R=r, B=b)
        )
    return ",".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


@query("q_successive_halving", extra=True, oracle=_sh_oracle())
def q_successive_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUCCESSIVE HALVING — the budget-allocation member of the eval
    family (q_fdr_bh adjudicates finished experiments; SH decides WHERE
    TO SPEND the next samples: arms = sources, rewards planted with
    known separated means, budgets double while the arm set halves, the
    fixed-budget best-arm-identification schedule behind Hyperband).
    Emits every round's (arm, budget, sample mean, kept) so the
    elimination trajectory itself is oracle-checked; the planted
    ground truth (top source indices must survive) is asserted in
    tests/test_eval_metrics.py.

    Determinism: rewards are integer md5 coins plus the planted offset;
    per-arm budget prefixes are ROW_NUMBER over doc_id (unique); means
    are half-up micro integers; survivor cuts order by (mean_micro DESC,
    source) — total order, TakeOrdered on the Spark side.

    Scale: the per-arm prefix rank is a window partitioned by arm (never
    global); each round re-reads the prefix-filtered fact slice with a
    broadcast semi-join on the halved arm set and aggregates map-side.
    At a real 100 TB run the budget prefix IS the point: round r touches
    only b_r rows per arm, not the corpus.
    """
    from ..functions.scalar import stable_hash_p31

    idx = F.substring(F.col("source"), 4, 10).cast("long")
    ranked = (
        fan_out(load_table(spark, sf_dir, "documents"))
        .select(
            "source",
            "doc_id",
            (
                stable_hash_p31(
                    F.concat(F.lit(_SH_SALT), F.col("doc_id").cast("string"))
                )
                % 100
                + F.lit(_SH_STEP).cast("long") * idx
            ).alias("reward"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            ),
        )
        .localCheckpoint()  # every round's prefix filter reads it
    )
    from ..functions.scalar import half_up_units

    alive = ranked.select("source").distinct().localCheckpoint()
    out = None
    for r, (b, m) in enumerate(_SH_SCHEDULE, 1):
        agg = (
            ranked.where(F.col("rk") <= b)
            .join(F.broadcast(alive), "source")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_used"),
                half_up_units(
                    F.sum("reward").cast("long"),
                    F.count(F.lit(1)).cast("long"),
                    1_000_000,
                ).alias("mean_micro"),
            )
            .localCheckpoint()  # winner cut + kept flag + output read it
        )
        winners = (
            agg.orderBy(F.col("mean_micro").desc(), "source")
            .limit(m)
            .select("source")
            .localCheckpoint()
        )
        keep = agg.join(
            F.broadcast(winners.withColumn("kept", F.lit(1))),
            "source",
            "left",
        ).select(
            F.lit(r).alias("round"),
            F.lit(b).cast("long").alias("budget"),
            "source",
            "n_used",
            "mean_micro",
            F.coalesce(F.col("kept"), F.lit(0)).alias("kept"),
        )
        out = keep if out is None else out.unionByName(keep)
        alive = winners
    return out


# ---------------------------------------------------------------------------
# Team-draft interleaving (round 12)
# ---------------------------------------------------------------------------

_TD_CUTOFF = "2024-01-22 00:00:00"
_TD_SALT = "td-v1:"
_TD_PICKS = 4  # two per team over the <=5-item catalog


def _td_steps_sql() -> str:
    parts = []
    for s in range(1, _TD_PICKS + 1):
        picked = (
            "SELECT user_id, item FROM pk1"
            if s == 2
            else " UNION ALL ".join(
                "SELECT user_id, item FROM pk%d" % i for i in range(1, s)
            )
        )
        rem_join = (
            ""
            if s == 1
            else (
                " LEFT JOIN (" + picked + ") px"
                " ON px.user_id = i.user_id AND px.item = i.item"
            )
        )
        rem_filter = "" if s == 1 else " AND px.item IS NULL"
        parts.append(
            """
    pk{S} AS (
      SELECT user_id, item, team FROM (
        SELECT i.user_id, i.item, {TEAM} AS team,
          ROW_NUMBER() OVER (PARTITION BY i.user_id
            ORDER BY CASE WHEN (u.coin + {SM1}) % 2 = 0
                          THEN i.ra ELSE i.rb END) AS rn
        FROM items i JOIN coins u ON u.user_id = i.user_id{REMJOIN}
        WHERE TRUE{REMFILTER}
      ) WHERE rn = 1
    )""".format(
                S=s,
                SM1=s - 1,
                TEAM="CASE WHEN (u.coin + " + str(s - 1)
                + ") % 2 = 0 THEN 'A' ELSE 'B' END",
                REMJOIN=rem_join,
                REMFILTER=rem_filter,
            )
        )
    return ",".join(parts)


def _td_oracle() -> str:
    return (
        """
    WITH base AS (
      SELECT user_id, event_type AS item,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUT}'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS pre_cents,
        MAX(CASE WHEN ts < TIMESTAMP '{CUT}' THEN ts END) AS last_pre,
        CAST(SUM(CASE WHEN ts >= TIMESTAMP '{CUT}' THEN 1 ELSE 0 END)
             AS BIGINT) AS post_cnt
      FROM events GROUP BY 1, 2
    ),
    items AS (
      SELECT user_id, item, pre_cents, post_cnt,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY pre_cents DESC, item) AS ra,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY last_pre DESC NULLS LAST, item) AS rb
      FROM base
    ),
    coins AS (
      SELECT DISTINCT user_id,
        CAST(md5_number_lower('{SALT}' || CAST(user_id AS VARCHAR))
             % 2147483647 % 2 AS BIGINT) AS coin
      FROM base
    ),"""
        + _td_steps_sql()
        + """,
    allp AS (
      SELECT * FROM pk1 UNION ALL SELECT * FROM pk2
      UNION ALL SELECT * FROM pk3 UNION ALL SELECT * FROM pk4
    ),
    credit AS (
      SELECT c.user_id,
        CAST(SUM(CASE WHEN p.team = 'A' THEN i.post_cnt ELSE 0 END)
             AS BIGINT) AS credit_a,
        CAST(SUM(CASE WHEN p.team = 'B' THEN i.post_cnt ELSE 0 END)
             AS BIGINT) AS credit_b
      FROM coins c
      JOIN allp p ON p.user_id = c.user_id
      JOIN items i ON i.user_id = p.user_id AND i.item = p.item
      GROUP BY 1
    )
    SELECT cr.user_id, co.coin AS first_coin, cr.credit_a, cr.credit_b,
      CASE WHEN cr.credit_a > cr.credit_b THEN 'A'
           WHEN cr.credit_b > cr.credit_a THEN 'B' ELSE 'T' END AS winner
    FROM credit cr JOIN coins co ON co.user_id = cr.user_id
    """
    ).replace("{CUT}", _TD_CUTOFF).replace("{SALT}", _TD_SALT)


@query("q_team_draft_interleave", extra=True, oracle=_td_oracle())
def q_team_draft_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEAM-DRAFT INTERLEAVING — the ONLINE ranking-evaluation member of
    the eval family (q_ndcg_ranking replays a ranking offline against
    graded relevance; interleaving is how rankers are compared LIVE:
    blend two rankings into one list by alternating team picks, credit
    post-period interactions to the picking team, count per-user wins).
    Ranker A orders each user's items by pre-period spend, ranker B by
    pre-period recency; the md5 coin decides which team drafts first,
    and the four pick rounds are unrolled identically in both engines
    (bounded by the event-type catalog, so unrolling is exact).

    Determinism: ranks and credits are integer counts/cents with item-
    name tiebreaks; the coin is the shared md5 device; pick steps are
    ROW_NUMBER argmins under a total order.

    Scale: one map-side aggregation to the (user, item) grain; every
    pick step is a per-user window over a catalog-bounded relation plus
    an anti-join on picked items — all partitioned by user, no global
    state. The final credit rollup is user-grain.
    """
    from ..functions.scalar import stable_hash_p31

    cut = F.lit(_TD_CUTOFF).cast("timestamp")
    base = (
        fan_out(load_table(spark, sf_dir, "events"))
        .groupBy("user_id", F.col("event_type").alias("item"))
        .agg(
            F.sum(
                F.when(F.col("ts") < cut, cents("value")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias("pre_cents"),
            F.max(F.when(F.col("ts") < cut, F.col("ts"))).alias("last_pre"),
            F.sum((F.col("ts") >= cut).cast("int"))
            .cast("long")
            .alias("post_cnt"),
        )
    )
    items = base.select(
        "user_id",
        "item",
        "pre_cents",
        "post_cnt",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("pre_cents").desc(), "item"
            )
        )
        .alias("ra"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("last_pre").desc_nulls_last(), "item"
            )
        )
        .alias("rb"),
    ).localCheckpoint()  # all four pick steps + credit join read it
    coins = items.select("user_id").distinct().select(
        "user_id",
        (
            stable_hash_p31(
                F.concat(F.lit(_TD_SALT), F.col("user_id").cast("string"))
            )
            % 2
        ).alias("coin"),
    ).localCheckpoint()
    picked = None
    allp = None
    for s in range(1, _TD_PICKS + 1):
        rem = items.join(F.broadcast(coins), "user_id")
        if picked is not None:
            rem = rem.join(
                picked.select("user_id", "item"), ["user_id", "item"], "anti"
            )
        team_is_a = ((F.col("coin") + F.lit(s - 1)) % 2) == 0
        pick = (
            rem.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.when(team_is_a, F.col("ra")).otherwise(F.col("rb"))
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .select(
                "user_id",
                "item",
                F.when(team_is_a, F.lit("A")).otherwise(F.lit("B")).alias(
                    "team"
                ),
            )
            .localCheckpoint()  # next step's anti-join + credit read it
        )
        picked = pick if picked is None else picked.unionByName(pick)
        allp = pick if allp is None else allp.unionByName(pick)
    credit = (
        allp.join(items.select("user_id", "item", "post_cnt"), ["user_id", "item"])
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("team") == "A", F.col("post_cnt")).otherwise(0))
            .cast("long")
            .alias("credit_a"),
            F.sum(F.when(F.col("team") == "B", F.col("post_cnt")).otherwise(0))
            .cast("long")
            .alias("credit_b"),
        )
    )
    return credit.join(F.broadcast(coins), "user_id").select(
        "user_id",
        F.col("coin").alias("first_coin"),
        "credit_a",
        "credit_b",
        F.when(F.col("credit_a") > F.col("credit_b"), F.lit("A"))
        .when(F.col("credit_b") > F.col("credit_a"), F.lit("B"))
        .otherwise(F.lit("T"))
        .alias("winner"),
    )


# ---------------------------------------------------------------------------
# Doubly-robust (AIPW) treatment effect (round 12)
# ---------------------------------------------------------------------------

_DR_WK1 = "2024-01-08 00:00:00"


def _dr_oracle() -> str:
    return """
    WITH u AS (
      SELECT user_id,
        CAST(MAX(CASE WHEN event_type = 'signup'
                      AND ts < TIMESTAMP '{WK1}' THEN 1 ELSE 0 END)
             AS BIGINT) AS treated,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '{WK1}' THEN 1 ELSE 0 END)
             AS BIGINT) AS pre_n,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                      AND ts >= TIMESTAMP '{WK1}'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS y_cents
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT LEAST(pre_n // 5, 4) AS stratum,
        CASE WHEN LEAST(pre_n // 5, 4) <= 2 THEN 0 ELSE 1 END AS coarse,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(treated) AS BIGINT) AS n_t,
        CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN treated = 1 THEN y_cents ELSE 0 END)
             AS BIGINT) AS sum_t,
        CAST(SUM(CASE WHEN treated = 0 THEN y_cents ELSE 0 END)
             AS BIGINT) AS sum_c
      FROM u GROUP BY 1, 2
    ),
    cb AS (
      SELECT coarse,
        CAST(CASE WHEN SUM(n_t) > 0 THEN
          (2 * SUM(sum_t) * 1000 + SUM(n_t)) // (2 * SUM(n_t))
        END AS BIGINT) AS mu1_milli,
        CAST(CASE WHEN SUM(n_c) > 0 THEN
          (2 * SUM(sum_c) * 1000 + SUM(n_c)) // (2 * SUM(n_c))
        END AS BIGINT) AS mu0_milli
      FROM s GROUP BY 1
    ),
    a AS (
      SELECT s.stratum, s.n, s.n_t, s.n_c, cb.mu1_milli, cb.mu0_milli,
        CASE WHEN s.n_t > 0 AND s.n_c > 0
                  AND cb.mu1_milli IS NOT NULL
                  AND cb.mu0_milli IS NOT NULL THEN
          (cb.mu1_milli - cb.mu0_milli) * s.n_t * s.n_c
          + (s.sum_t * 1000 - s.n_t * cb.mu1_milli) * s.n_c
          - (s.sum_c * 1000 - s.n_c * cb.mu0_milli) * s.n_t
        END AS a_num,
        s.n_t * s.n_c AS a_den
      FROM s JOIN cb ON cb.coarse = s.coarse
    ),
    snapped AS (
      SELECT stratum, n, n_t, n_c, mu1_milli, mu0_milli,
        CAST(CASE WHEN a_num IS NULL THEN NULL
          WHEN a_num >= 0 THEN (2 * a_num + a_den) // (2 * a_den)
          ELSE -((2 * (-a_num) + a_den) // (2 * a_den))
        END AS BIGINT) AS aipw_milli
      FROM a
    )
    SELECT stratum, n, n_t, n_c, mu1_milli, mu0_milli, aipw_milli
    FROM snapped
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
      CAST(SUM(n_t) AS BIGINT), CAST(SUM(n_c) AS BIGINT),
      CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
      CAST(CASE WHEN SUM(CASE WHEN aipw_milli IS NOT NULL THEN n END) > 0
        THEN CASE WHEN SUM(CASE WHEN aipw_milli IS NOT NULL
                               THEN n * aipw_milli END) >= 0
          THEN (2 * SUM(CASE WHEN aipw_milli IS NOT NULL
                             THEN n * aipw_milli END)
                + SUM(CASE WHEN aipw_milli IS NOT NULL THEN n END))
               // (2 * SUM(CASE WHEN aipw_milli IS NOT NULL THEN n END))
          ELSE -((2 * -SUM(CASE WHEN aipw_milli IS NOT NULL
                               THEN n * aipw_milli END)
                + SUM(CASE WHEN aipw_milli IS NOT NULL THEN n END))
               // (2 * SUM(CASE WHEN aipw_milli IS NOT NULL THEN n END)))
        END END AS BIGINT)
    FROM snapped
    """.replace("{WK1}", _DR_WK1)


@query("q_doubly_robust_ate", extra=True, oracle=_dr_oracle())
def q_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOUBLY-ROBUST (AIPW) treatment effect — the augmented member of
    the causal family (q_ipw_ate is pure inverse-propensity; AIPW adds
    an OUTCOME-MODEL term and stays consistent if EITHER model is
    right). Same protocol as q_ipw_ate (treatment = week-1 signup,
    outcome = post-week-1 purchase cents, confounder = week-1 activity);
    the outcome model is DELIBERATELY coarser (2 activity bins) than the
    propensity strata (5 bins) — with equal granularities the
    augmentation term vanishes algebraically and AIPW degenerates to the
    stratified estimator, which would make the query a disguised twin.

    Determinism: per-stratum AIPW contributions are exact integer
    rationals over the n_t*n_c common denominator, snapped to signed
    half-up milli-cents; the overall row combines the SNAPPED values
    n-weighted (the q_ipw_ate combine-after-snap discipline); single-arm
    strata emit NULL and are excluded from the overall weighting, in
    both engines.

    Scale: one map-side user-grain aggregation, one 5-row strata
    aggregation, one 2-row coarse-bin rollup broadcast back — no joins
    at corpus grain.
    """
    d = F.call_function
    wk1 = F.lit(_DR_WK1).cast("timestamp")
    u = (
        fan_out(load_table(spark, sf_dir, "events"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "signup") & (F.col("ts") < wk1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("treated"),
            F.sum(F.when(F.col("ts") < wk1, 1).otherwise(0))
            .cast("long")
            .alias("pre_n"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= wk1),
                    cents("value"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("y_cents"),
        )
    )
    strat = F.least(d("div", F.col("pre_n"), F.lit(5)), F.lit(4).cast("long"))
    s = (
        u.select(
            strat.alias("stratum"),
            F.when(strat <= 2, F.lit(0)).otherwise(F.lit(1)).alias("coarse"),
            "treated",
            "y_cents",
        )
        .groupBy("stratum", "coarse")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("treated").cast("long").alias("n_t"),
            (F.count(F.lit(1)) - F.sum("treated")).cast("long").alias("n_c"),
            F.sum(F.when(F.col("treated") == 1, F.col("y_cents")).otherwise(0))
            .cast("long")
            .alias("sum_t"),
            F.sum(F.when(F.col("treated") == 0, F.col("y_cents")).otherwise(0))
            .cast("long")
            .alias("sum_c"),
        )
        .localCheckpoint()  # coarse rollup + per-stratum AIPW read it
    )
    cb = s.groupBy("coarse").agg(
        F.when(
            F.sum("n_t") > 0,
            d(
                "div",
                2 * F.sum("sum_t").cast("long") * F.lit(1000).cast("long")
                + F.sum("n_t").cast("long"),
                2 * F.sum("n_t").cast("long"),
            ),
        ).alias("mu1_milli"),
        F.when(
            F.sum("n_c") > 0,
            d(
                "div",
                2 * F.sum("sum_c").cast("long") * F.lit(1000).cast("long")
                + F.sum("n_c").cast("long"),
                2 * F.sum("n_c").cast("long"),
            ),
        ).alias("mu0_milli"),
    )
    a_num = (
        (F.col("mu1_milli") - F.col("mu0_milli")) * F.col("n_t") * F.col("n_c")
        + (F.col("sum_t") * 1000 - F.col("n_t") * F.col("mu1_milli"))
        * F.col("n_c")
        - (F.col("sum_c") * 1000 - F.col("n_c") * F.col("mu0_milli"))
        * F.col("n_t")
    )
    a_den = F.col("n_t") * F.col("n_c")
    aipw = F.when(
        (F.col("n_t") > 0)
        & (F.col("n_c") > 0)
        & F.col("mu1_milli").isNotNull()
        & F.col("mu0_milli").isNotNull(),
        F.when(
            a_num >= 0, d("div", 2 * a_num + a_den, 2 * a_den)
        ).otherwise(-d("div", 2 * (-a_num) + a_den, 2 * a_den)),
    )
    snapped = s.join(F.broadcast(cb), "coarse").select(
        "stratum",
        "n",
        "n_t",
        "n_c",
        "mu1_milli",
        "mu0_milli",
        aipw.alias("aipw_milli"),
    ).localCheckpoint()  # per-stratum rows + overall rollup read it
    wsum = F.sum(
        F.when(
            F.col("aipw_milli").isNotNull(), F.col("n") * F.col("aipw_milli")
        )
    ).cast("long")
    wn = F.sum(
        F.when(F.col("aipw_milli").isNotNull(), F.col("n"))
    ).cast("long")
    overall = snapped.agg(
        F.lit(-1).cast("long").alias("stratum"),
        F.sum("n").cast("long").alias("n"),
        F.sum("n_t").cast("long").alias("n_t"),
        F.sum("n_c").cast("long").alias("n_c"),
        F.lit(None).cast("long").alias("mu1_milli"),
        F.lit(None).cast("long").alias("mu0_milli"),
        F.when(
            wn > 0,
            F.when(wsum >= 0, d("div", 2 * wsum + wn, 2 * wn)).otherwise(
                -d("div", 2 * (-wsum) + wn, 2 * wn)
            ),
        ).alias("aipw_milli"),
    )
    return snapped.unionByName(overall)


# ---------------------------------------------------------------------------
# Jenks natural breaks (round 12)
# ---------------------------------------------------------------------------

# 3-class Fisher-Jenks optimal 1-D classing of n_chars. Segment cost is
# the weighted within-class sum of squared deviations, kept integer as
# cost_milli(i,j) = half-up( (S2*W - S1^2) * 1000 / W ) over the exact
# prefix sums of the distinct-value spine (value-domain-bounded, the
# roc_auc_histogram device). Headroom: S2 <= n*553^2, * W, * 2000 stays
# under 2^63 at sf0.1 with ~25x margin (the oracle routes through
# HUGEINT regardless).
_JENKS_K = 3


def _jenks_oracle() -> str:
    return """
    WITH v AS (
      SELECT CAST(n_chars AS BIGINT) AS x, CAST(COUNT(*) AS BIGINT) AS w
      FROM documents GROUP BY 1
    ),
    p AS MATERIALIZED (
      SELECT x, w,
        CAST(SUM(w) OVER (ORDER BY x) AS BIGINT) AS cw,
        CAST(SUM(w * x) OVER (ORDER BY x) AS BIGINT) AS cs1,
        CAST(SUM(w * x * x) OVER (ORDER BY x) AS BIGINT) AS cs2
      FROM v
    ),
    tot AS (SELECT MAX(cw) AS tw, MAX(cs1) AS ts1, MAX(cs2) AS ts2,
                   MAX(x) AS xmax FROM p),
    -- cost of the PREFIX segment [min..i]
    c1 AS MATERIALIZED (
      SELECT x AS hi,
        CAST((2 * (CAST(cs2 AS HUGEINT) * cw - CAST(cs1 AS HUGEINT) * cs1)
              * 1000 + cw) // (2 * cw) AS BIGINT) AS cost
      FROM p
    ),
    -- cost of the INFIX segment (i..j]
    seg AS MATERIALIZED (
      SELECT a.x AS lo, b.x AS hi,
        CAST((2 * (CAST(b.cs2 - a.cs2 AS HUGEINT) * (b.cw - a.cw)
                   - CAST(b.cs1 - a.cs1 AS HUGEINT) * (b.cs1 - a.cs1))
              * 1000 + (b.cw - a.cw)) // (2 * (b.cw - a.cw)) AS BIGINT)
          AS cost
      FROM p a JOIN p b ON b.x > a.x
    ),
    c2 AS MATERIALIZED (
      SELECT hi, cost, b1 FROM (
        SELECT s.hi, c1.cost + s.cost AS cost, c1.hi AS b1,
          ROW_NUMBER() OVER (PARTITION BY s.hi
            ORDER BY c1.cost + s.cost, c1.hi) AS rn
        FROM c1 JOIN seg s ON s.lo = c1.hi
      ) WHERE rn = 1
    ),
    best AS (
      SELECT c2.b1, c2.hi AS b2, c2.cost + s.cost AS cost FROM c2
      JOIN seg s ON s.lo = c2.hi
      CROSS JOIN tot WHERE s.hi = tot.xmax
      ORDER BY c2.cost + s.cost, c2.hi LIMIT 1
    )
    SELECT b.b1 AS break1, b.b2 AS break2,
      CAST(b.cost AS BIGINT) AS total_cost_milli,
      t.tw AS n, t.xmax AS x_max
    FROM best b CROSS JOIN tot t
    """


@query("q_jenks_breaks", extra=True, oracle=_jenks_oracle())
def q_jenks_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JENKS NATURAL BREAKS — exact optimal 3-class 1-D segmentation
    (Fisher-Jenks DP), the GLOBALLY-optimal member of the binning family
    (q_quantile_binning uses equal mass, q_equidepth_stats equal depth;
    Jenks MINIMIZES the within-class weighted sum of squared deviations,
    the cartographer's and histogram-optimizer's objective — also the
    exact 1-D k-means). The DP runs on the distinct-value spine with
    prefix sums: class-1 costs are prefix segments, the level-2 relation
    takes an argmin over (first break x second segment) pairs, and the
    final argmin closes the third segment at the max value. Optimality
    vs exhaustive enumeration is test-pinned.

    Determinism: segment costs snap to half-up milli integers from exact
    integer prefix sums BEFORE any argmin (S2*W - S1^2 >= 0 by Cauchy-
    Schwarz, so no signed branch); argmins carry (cost, break) total
    orders.

    Scale: the spine is value-domain-bounded (distinct n_chars), so the
    pair join is |domain|^2 — constant in corpus size; the corpus itself
    is touched once, map-side, for the histogram. The global prefix
    window runs on the spine (allowlisted bound).
    """
    from pyspark.sql import Window as W

    d = F.call_function
    v = (
        fan_out(load_table(spark, sf_dir, "documents"))
        .groupBy(F.col("n_chars").cast("long").alias("x"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    win = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    p = v.select(
        "x",
        F.sum("w").over(win).alias("cw"),
        F.sum(F.col("w") * F.col("x")).over(win).alias("cs1"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).over(win).alias("cs2"),
    ).localCheckpoint()  # c1, both seg legs, tot all read it
    tot = p.agg(
        F.max("cw").alias("tw"),
        F.max("x").alias("xmax"),
    )

    def seg_cost(s2, w_, s1):
        return d("div", 2 * (s2 * w_ - s1 * s1) * F.lit(1000).cast("long") + w_, 2 * w_)

    c1 = p.select(
        F.col("x").alias("hi"),
        seg_cost(F.col("cs2"), F.col("cw"), F.col("cs1")).alias("cost"),
    )
    a, b = p.alias("a"), p.alias("b")
    seg = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).select(
        F.col("a.x").alias("lo"),
        F.col("b.x").alias("hi"),
        seg_cost(
            F.col("b.cs2") - F.col("a.cs2"),
            F.col("b.cw") - F.col("a.cw"),
            F.col("b.cs1") - F.col("a.cs1"),
        ).alias("cost"),
    ).localCheckpoint()  # level-2 argmin + final close both read it
    c2 = (
        c1.alias("l")
        .join(
            F.broadcast(seg).alias("s"),
            F.col("s.lo") == F.col("l.hi"),
        )
        .select(
            F.col("s.hi").alias("hi"),
            (F.col("l.cost") + F.col("s.cost")).alias("cost"),
            F.col("l.hi").alias("b1"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("hi").orderBy("cost", "b1")
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint()  # final close reads it twice (cost + b1)
    )
    best = (
        c2.alias("c")
        .join(F.broadcast(seg).alias("s"), F.col("s.lo") == F.col("c.hi"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("s.hi") == F.col("xmax"))
        .select(
            F.col("c.b1").alias("break1"),
            F.col("c.hi").alias("break2"),
            (F.col("c.cost") + F.col("s.cost")).alias("total_cost_milli"),
            F.col("tw").alias("n"),
            F.col("xmax").alias("x_max"),
        )
        .orderBy("total_cost_milli", "break2")
        .limit(1)
    )
    return best

"""Fixture tests for the web-corpus main-text extractor (operators/html.py).

The oracle comparison (tests/test_extra_queries.py + graded sweep)
adjudicates Spark-vs-DuckDB agreement; these tests pin the extraction
SEMANTICS against planted fixtures — boilerplate must never leak into
main_text, the document's own text must survive verbatim, and each
container-priority branch (article / main / div#content / whole-page
fallback) must be the one actually taken.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.html import (
    PLANTED_BOILERPLATE,
    main_region,
    strip_noise,
    synth_page,
    to_text,
)
from prefect_flow_arc_alto_to_json_spark.plans import QUERIES


def test_boilerplate_never_leaks(spark, sf_dir):
    """No planted nav/ads/footer string survives into any main_text."""
    out = QUERIES["text_html_extract"](spark, sf_dir)
    preds = [
        F.max(F.col("main_text").contains(s).cast("int")).alias(f"b{i}")
        for i, s in enumerate(PLANTED_BOILERPLATE)
    ]
    row = out.agg(*preds).collect()[0]
    leaked = [
        PLANTED_BOILERPLATE[i] for i in range(len(PLANTED_BOILERPLATE)) if row[i]
    ]
    assert leaked == [], f"boilerplate leaked into main_text: {leaked}"


def test_document_text_survives(spark, sf_dir):
    """Every doc's own (whitespace-collapsed) text is a substring of its
    main_text — extraction strips chrome, never content."""
    from prefect_flow_arc_alto_to_json_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = QUERIES["text_html_extract"](spark, sf_dir).select(
        "doc_id", "main_text"
    )
    collapsed = F.trim(F.regexp_replace(F.col("text"), "\\s+", " "))
    bad = (
        out.join(docs, "doc_id")
        .where(
            (F.length(collapsed) > 0)
            & ~F.col("main_text").contains(collapsed)
        )
        .count()
    )
    assert bad == 0


def test_variant_dispatch_and_metrics(spark, sf_dir):
    """variant = doc_id % 3; main is a strict subset of the page text so
    boiler_ppm is strictly positive; token count matches a whitespace
    split of the extract."""
    out = QUERIES["text_html_extract"](spark, sf_dir)
    assert (
        out.where(F.col("variant") != (F.col("doc_id") % 3).cast("int")).count()
        == 0
    )
    assert out.where(F.col("main_chars") >= F.col("page_chars")).count() == 0
    assert out.where(F.col("boiler_ppm") <= 0).count() == 0
    assert (
        out.where(
            F.col("n_tokens") != F.size(F.split("main_text", " "))
        ).count()
        == 0
    )


def test_container_priority_and_fallback(spark):
    """Hand-built pages pin each branch: <article> wins over <main>, the
    div#content branch fires when no semantic tag exists, and a page with
    no recognized container falls back to the whole cleaned page (chrome
    included — the documented tradeoff of the fallback)."""
    pages = [
        # article AND main present -> article wins
        (1, "<body><main>M text</main><article>A text</article></body>"),
        # only div#content -> third branch
        (2, '<body><nav>chrome</nav><div id="content">C text</div></body>'),
        # nothing recognized -> whole page (minus script/style/comments)
        (3, "<body><script>junk()</script><p>P text</p><!-- x --></body>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id",
            to_text(main_region(strip_noise(F.col("page")))).alias("t"),
        ).collect()
    }
    assert got[1] == "A text"
    assert got[2] == "C text"
    assert got[3] == "P text"


def test_synth_page_is_deterministic_html(spark):
    """The synthesized page embeds the raw text verbatim and the right
    container per variant."""
    rows = [(0, "alpha beta", "en"), (1, "gamma", "de"), (2, "delta", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["p"] for r in df.select("doc_id", synth_page().alias("p")).collect()}
    assert "<article>" in got[0] and "<p>alpha beta</p>" in got[0]
    assert "<main>" in got[1] and "BUY NOW" in got[1]
    assert '<div id="content">' in got[2] and "ExampleCMS" in got[2]


def test_entity_decode_order_no_double_decode(spark):
    """``&amp;`` decodes LAST (ADVICE r11): double-encoded input
    ``&amp;lt;b&amp;gt;`` must yield the literal text ``<b>``'s ESCAPED
    form ``&lt;b&gt;``... decoded exactly once to ``<b>`` — never
    double-decoded and then tag-stripped to nothing."""
    pages = [
        # &amp;lt; is the author writing the four characters "&lt;" —
        # one decode pass must emit "&lt;" -> visible text "&lt;"? No:
        # HTML renders &amp;lt; as "&lt;" (literal five chars). Our
        # single-pass decoder with &amp; last yields exactly that.
        (1, "<body><article>x &amp;lt;tag&amp;gt; y</article></body>"),
        # plain single-encoded entities still decode
        (2, "<body><article>a &amp; b &lt;c&gt;</article></body>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id",
            to_text(main_region(strip_noise(F.col("page")))).alias("t"),
        ).collect()
    }
    assert got[1] == "x &lt;tag&gt; y", got[1]
    assert got[2] == "a & b <c>", got[2]


def test_corpus_satisfies_no_markup_constraint(spark, sf_dir):
    """Enforce the documented PAGE_TEMPLATES constraint: the documents
    corpus interpolated into the synthesized pages contains no angle
    brackets and no &-entities, so 'text survives verbatim' holds."""
    from prefect_flow_arc_alto_to_json_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    bad = docs.where(
        F.col("text").rlike("[<>]") | F.col("text").rlike("&[a-zA-Z]+;")
    ).count()
    assert bad == 0

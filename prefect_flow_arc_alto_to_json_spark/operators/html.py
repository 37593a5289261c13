"""Web-corpus main-text extraction (raw HTML -> clean text).

The web sibling of ``operators/alto.py``'s ``simplify_alto``: the reference
extracts text lines from ALTO XML markup
(/root/reference/script/extract-text-lines-from-alto.js:23956-24059 — strip
the markup scaffolding, keep the content strings); this module applies the
same extract-text-from-markup pattern to the raw-crawl ingestion stage every
LLM data pipeline has: HTML page -> boilerplate-free main text.

Design: a TAG-WHITELIST / semantic-container rule, fully expressible in
regexp built-ins (JVM-side whole-stage codegen in Spark, RE2 in the DuckDB
oracle — both engines run the SAME patterns over the SAME synthesized page,
so the comparison adjudicates the extraction itself):

1. drop non-content blocks: HTML comments, ``<script>``, ``<style>``;
2. pick the main region by container priority ``<article>`` > ``<main>`` >
   ``<div id="content">``, falling back to the whole cleaned page — the
   readability/trafilatura container heuristic, minus the text-density
   scoring (which needs per-node counting; documented limitation: a main
   region whose container NESTS another <div> needs that density path, the
   non-greedy first-close regex would truncate it);
3. strip remaining tags, decode the five entities the fixtures plant,
   collapse whitespace.

The page itself is SYNTHESIZED deterministically from the ``documents``
table (the container ships no HTML corpus): three boilerplate variants by
``doc_id % 3`` — nav+footer chrome, ad-block + tracking comment + related
links, sidebar + comments-section chrome — so the planted boilerplate is
known exactly and tests can assert it never leaks into the extract.

Scale: pure per-row narrow maps (concat + regexp) — no shuffle, no UDF;
at 100 TB this runs at scan speed inside WholeStageCodegen with full
column pruning (only doc_id/text/lang are read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared page templates: ("lit", str) | ("col", field). NO single quotes in
# literals (keeps SQL-literal escaping trivial); fields are doc_id/lang/text.
#
# CONSTRAINT (enforced by tests/test_html_extract.py): the interpolated
# ``text`` column must contain no angle brackets and no ``&``-entities —
# a literal ``<...>`` in document text would be stripped as markup by
# TAG_PATTERN, and a literal entity would be decoded by ENTITIES, so the
# "document text survives verbatim" invariant only holds on such corpora.
# A real crawl pipeline HTML-escapes body text at page-build time (the
# inverse of this extractor); the synthesized testdata corpus satisfies
# the constraint as generated.
# ---------------------------------------------------------------------------

PAGE_TEMPLATES: dict[int, list[tuple[str, str]]] = {
    # v0: semantic <article>, nav + footer chrome, entity in the heading
    0: [
        ("lit", '<html><head><title>Doc '),
        ("col", "doc_id"),
        (
            "lit",
            '</title><script type="text/javascript">var page=',
        ),
        ("col", "doc_id"),
        (
            "lit",
            ";track(page);</script><style>.nav a{color:#333;text-decoration:none}"
            '</style></head><body><nav><ul><li><a href="/">Home</a></li>'
            '<li><a href="/about">About</a></li>'
            '<li><a href="/contact">Contact</a></li></ul></nav>'
            "<article><h1>Entry ",
        ),
        ("col", "doc_id"),
        ("lit", " &amp; notes</h1><p>"),
        ("col", "text"),
        (
            "lit",
            "</p></article><footer>&copy; 2024 Example Corp &middot; lang ",
        ),
        ("col", "lang"),
        ("lit", "</footer></body></html>"),
    ],
    # v1: <main>, ad block, tracking comment, related-links chrome
    1: [
        ("lit", "<html><head><title>Item "),
        ("col", "doc_id"),
        (
            "lit",
            "</title><style>#ad{display:block}</style></head><body>"
            '<!-- tracking pixel --><div id="ad">BUY NOW limited deals '
            "click here</div><main><h2>Record ",
        ),
        ("col", "doc_id"),
        ("lit", "</h2><p>"),
        ("col", "text"),
        ("lit", "</p><p>tagged &lt;"),
        ("col", "lang"),
        (
            "lit",
            '&gt;</p></main><div class="related"><a href="/r/1">more '
            'stories</a><a href="/r/2">trending</a></div>'
            "<script>adsbygoogle.push([]);</script></body></html>",
        ),
    ],
    # v2: no semantic tag — <div id="content"> fallback, sidebar + comments
    2: [
        ("lit", "<html><head><title>Page "),
        ("col", "doc_id"),
        (
            "lit",
            '</title></head><body><div class="sidebar"><ul><li>archive</li>'
            '<li>tags</li></ul></div><div id="content"><span>note ',
        ),
        ("col", "doc_id"),
        ("lit", "</span> <p>"),
        ("col", "text"),
        (
            "lit",
            '</p></div><div class="comments">leave a comment below</div>'
            "<footer>powered by ExampleCMS</footer></body></html>",
        ),
    ],
}

# Boilerplate strings planted by the templates — must NEVER survive into
# main_text (asserted by tests/test_html_extract.py)
PLANTED_BOILERPLATE = [
    "Home",
    "About",
    "Contact",
    "Example Corp",
    "BUY NOW",
    "more stories",
    "trending",
    "adsbygoogle",
    "track(page)",
    "leave a comment",
    "powered by ExampleCMS",
    "archive",
]

# Non-content blocks dropped before region selection (dotall, non-greedy —
# identical semantics in Java regex and RE2)
NOISE_PATTERNS = [
    "(?s)<!--.*?-->",
    "(?s)<script[^>]*>.*?</script>",
    "(?s)<style[^>]*>.*?</style>",
]

# Main-region containers in priority order (group 1 = inner HTML)
REGION_PATTERNS = [
    "(?s)<article[^>]*>(.*?)</article>",
    "(?s)<main[^>]*>(.*?)</main>",
    '(?s)<div id="content"[^>]*>(.*?)</div>',
]

TAG_PATTERN = "<[^>]*>"
WS_PATTERN = "\\s+"

# entity -> replacement, applied AFTER tag stripping. ``&amp;`` MUST be
# decoded LAST: decoding it first turns double-encoded input (``&amp;lt;``)
# into ``&lt;`` which the next pass double-decodes to ``<``. With it last,
# ``&amp;lt;`` correctly yields the literal text ``&lt;``.
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&nbsp;", " "),
    ("&copy;", "(c)"),
    ("&middot;", "-"),
    ("&amp;", "&"),
]


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _concat(parts: list[tuple[str, str]]) -> Column:
    return F.concat(
        *[
            F.lit(v) if k == "lit" else F.col(v).cast("string")
            for k, v in parts
        ]
    )


def synth_page() -> Column:
    """Deterministic HTML page for each ``documents`` row (variant by
    ``doc_id % 3``); the DuckDB oracle builds the byte-identical page from
    the same ``PAGE_TEMPLATES``."""
    v = F.col("doc_id") % 3
    expr = F.when(v == 0, _concat(PAGE_TEMPLATES[0])).when(
        v == 1, _concat(PAGE_TEMPLATES[1])
    )
    return expr.otherwise(_concat(PAGE_TEMPLATES[2]))


def strip_noise(page: Column) -> Column:
    for pat in NOISE_PATTERNS:
        page = F.regexp_replace(page, pat, " ")
    return page


def main_region(clean: Column) -> Column:
    """Container-priority main region over the noise-free page; '' from
    regexp_extract (no match) is NULLed so COALESCE falls through to the
    next container, then to the whole page."""
    candidates = [
        F.nullif(F.regexp_extract(clean, pat, 1), F.lit(""))
        for pat in REGION_PATTERNS
    ]
    return F.coalesce(*candidates, clean)


def to_text(region: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse."""
    txt = F.regexp_replace(region, TAG_PATTERN, " ")
    for ent, rep in ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(txt, WS_PATTERN, " "))


# ---------------------------------------------------------------------------
# Oracle-SQL generation from the SAME constants
# ---------------------------------------------------------------------------

_SQL_FIELD = {
    "doc_id": "CAST(doc_id AS VARCHAR)",
    "lang": "lang",
    "text": "text",
}


def _sql_concat(parts: list[tuple[str, str]]) -> str:
    return " || ".join(
        "'" + v.replace("'", "''") + "'" if k == "lit" else _SQL_FIELD[v]
        for k, v in parts
    )


def sql_synth_page() -> str:
    return (
        "CASE WHEN doc_id % 3 = 0 THEN "
        + _sql_concat(PAGE_TEMPLATES[0])
        + " WHEN doc_id % 3 = 1 THEN "
        + _sql_concat(PAGE_TEMPLATES[1])
        + " ELSE "
        + _sql_concat(PAGE_TEMPLATES[2])
        + " END"
    )


def sql_strip_noise(expr: str) -> str:
    for pat in NOISE_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', ' ', 'g')"
    return expr


def sql_main_region(clean: str) -> str:
    cands = ", ".join(
        f"NULLIF(regexp_extract({clean}, '{pat.replace(chr(39), chr(39) * 2)}', 1), '')"
        for pat in REGION_PATTERNS
    )
    return f"COALESCE({cands}, {clean})"


def sql_to_text(region: str) -> str:
    expr = f"regexp_replace({region}, '{TAG_PATTERN}', ' ', 'g')"
    for ent, rep in ENTITIES:
        expr = f"replace({expr}, '{ent}', '{rep}')"
    return f"trim(regexp_replace({expr}, '{WS_PATTERN}', ' ', 'g'))"

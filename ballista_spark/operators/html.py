"""HTML → text extraction: the crawl-side step that turns raw page
markup into the plain text every downstream operator (dedup, quality,
LM, tokenizers) consumes — a C4/CCNet-grade extractor (tag stripping +
block-level newlines + entity decoding), NOT a DOM parser.

Why regex and not a parser: at 100 TB the extractor must be a map-only
JVM expression chain (whole-stage codegen, zero Python, zero per-row
object churn), and the published pipelines' quality gates assume exactly
this fidelity class — C4 itself post-processes WET text produced by tag
stripping.  Fidelity limits are explicit: malformed nesting is handled
by regex semantics (first ``</script>`` closes a script), numeric
character references beyond the common named set are left intact, and
layout fidelity is line-level (block close tags become newlines), which
is what line-level boilerplate removal (``text.remove_boilerplate``)
expects.  A DOM-fidelity extractor (trafilatura-class) would be an
external library — gate it behind an optional import if ever needed.

Every step is a ``regexp_replace`` with an RE2-compatible pattern, so
DuckDB replays the whole chain bit-for-bit (twin in
tests/test_html.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: block-level closers/openers that imply a line break in rendered text
_BLOCK_TAGS = (
    "p|div|li|ul|ol|table|tr|h1|h2|h3|h4|h5|h6|section|article|header|"
    "footer|blockquote|pre|form"
)

#: markup-removal half of the chain — ORDER MATTERS (head/script/style
#: bodies stripped before generic tags so their contents don't leak)
_STRIP_STEPS: list[tuple[str, str]] = [
    # head (title/meta/links — page metadata, not body text; html_title
    # extracts the title separately), script/style/noscript bodies
    # ((?s) dotall, (?i) case-insensitive; non-greedy to the FIRST
    # closer — regex semantics for malformed nesting, per the contract)
    (r"(?is)<head\b.*?</head\s*>", " "),
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?is)<noscript\b.*?</noscript\s*>", " "),
    # comments (incl. conditional comments)
    (r"(?s)<!--.*?-->", " "),
    # explicit line-break tags and block boundaries -> newline
    (r"(?i)<br\s*/?\s*>", "\n"),
    (rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n"),
    # every remaining tag (incl. <!DOCTYPE ...>) -> space
    (r"(?s)<[^>]*>", " "),
]

#: decode + whitespace half — shared by html_to_text and html_title
#: (amp decoded LAST so "&amp;lt;" becomes "&lt;", not "<")
_DECODE_STEPS: list[tuple[str, str]] = [
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&(?:apos|#39);", "'"),
    (r"&(?:mdash|ndash);", "-"),
    (r"&hellip;", "..."),
    (r"&amp;", "&"),
    # whitespace normalization: spaces/tabs collapse, blank-line runs
    # collapse to one newline, lines trimmed
    (r"[ \t\x0b\f\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # leading/trailing whitespace incl. newlines (TRIM/trim only takes
    # spaces in both engines; ^/$ anchor the whole string — no (?m))
    (r"^\s+", ""),
    (r"\s+$", ""),
]

#: the full chain (tests replay this verbatim in DuckDB)
_STEPS = _STRIP_STEPS + _DECODE_STEPS


def html_to_text(html="html") -> F.Column:
    """Rendered-ish plain text of an HTML column (module docstring for
    the fidelity contract): script/style/comment bodies removed, block
    boundaries become newlines, common entities decoded, whitespace
    normalized, result trimmed.  NULL in, NULL out.  Pure JVM
    ``regexp_replace`` chain — map-only, codegen-friendly,
    DuckDB-replayable."""
    col = F.col(html) if isinstance(html, str) else html
    out = col
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_title(html="html") -> F.Column:
    """Decoded ``<title>`` text (NULL when absent/empty) — the cheap
    page-level metadata most crawl curation keeps alongside the body."""
    col = F.col(html) if isinstance(html, str) else html
    raw = F.regexp_extract(col, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    out = raw
    for pat, rep in _DECODE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    out = F.trim(out)
    return F.when(out == "", F.lit(None)).otherwise(out)


def extract_links(html="html") -> F.Column:
    """Array of href values from anchor tags (both quote styles; order
    preserved; NULL html → NULL) — the crawl-frontier / link-graph
    feeder.  One ``regexp_extract_all`` — map-only, same fidelity
    contract as the rest of this module (regex, not a DOM: hrefs inside
    commented-out markup are NOT excluded).  javascript:/mailto:/
    fragment-only pseudo-links are filtered; relative URLs pass through
    (resolve or drop downstream — ``url.url_host`` returns NULL for
    them, which :func:`host_link_edges` uses as its filter)."""
    col = F.col(html) if isinstance(html, str) else html
    hrefs = F.regexp_extract_all(
        col, F.lit(r"""(?is)<a\b[^>]*\bhref\s*=\s*["']([^"']+)["']"""), 1
    )
    return F.filter(
        hrefs,
        lambda h: ~F.lower(h).rlike(r"^(javascript:|mailto:|tel:|#)"),
    )


def host_link_edges(df, html_col: str = "html", url_col: str = "url"):
    """(src, dst) host-level link edges from pages' anchor tags —
    the input :func:`ballista_spark.operators.graph.pagerank` ranks.

    One explode over the extracted hrefs; rows whose source or target
    host does not parse (relative links, scheme-less hrefs) are dropped
    (host-level graphs rank DOMAINS — in-page/relative navigation is
    noise at that granularity).  Self-loop edges (same host) are kept:
    they are real links and PageRank handles them; drop with
    ``.where("src != dst")`` for a strict inter-domain graph.
    """
    from ballista_spark.operators.url import url_host

    src = url_host(url_col)
    return (
        df.select(
            src.alias("src"), F.explode(extract_links(html_col)).alias("__href")
        )
        .select("src", url_host(F.col("__href")).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )

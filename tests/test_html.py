"""HTML → text extraction: known-answer pages, the DuckDB twin of the
regex chain, and composition with downstream text operators."""

from __future__ import annotations

import pandas as pd

from ballista_spark.operators.html import _STEPS, html_title, html_to_text

PAGE = """<!DOCTYPE html>
<html><head>
<title> My &amp; Your  Page </title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head>
<body>
<!-- navigation -->
<div class="nav">Home | About</div>
<h1>Heading &quot;One&quot;</h1>
<p>First paragraph with a <a href="/x">link</a> and &lt;escaped&gt; text.</p>
<p>Second&nbsp;paragraph &mdash; with entities &amp;copy.</p>
<ul><li>item one</li><li>item two</li></ul>
<br>
tail text
</body></html>"""

EXPECTED = (
    "Home | About\n"
    'Heading "One"\n'
    "First paragraph with a link and <escaped> text.\n"
    "Second paragraph - with entities &copy.\n"
    "item one\n"
    "item two\n"
    "tail text"
)


def test_known_answer_page(spark):
    df = spark.createDataFrame([(1, PAGE), (2, None), (3, "plain text")],
                               "doc_id long, html string")
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", html_to_text("html").alias("t")).collect()
    }
    assert got[1] == EXPECTED
    assert got[2] is None
    assert got[3] == "plain text"


def test_title_extraction(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<html><body>no title</body></html>"),
         (3, "<TITLE lang=en>Upper &lt;Case&gt;</TITLE>")],
        "doc_id long, html string",
    )
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", html_title("html").alias("t")).collect()
    }
    assert got[1] == "My & Your Page"
    assert got[2] is None
    assert got[3] == "Upper <Case>"


def test_script_bodies_never_leak(spark):
    html = (
        "<script>\nif (a < b && c > d) { document.write('<div>x</div>'); }\n"
        "</script><p>real</p><SCRIPT src=x.js></SCRIPT>after"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    [r] = df.select(html_to_text("html").alias("t")).collect()
    assert "document.write" not in r.t and "a < b" not in r.t
    assert r.t == "real\nafter"


def test_matches_duckdb_twin(spark, duck):
    """The exact step chain replayed as DuckDB regexp_replace calls."""
    pages = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "html": [
            PAGE,
            "<p>a&amp;b</p><div>c</div>",
            "x <b>bold</b> &lt;tag&gt; <!-- hidden --> y",
        ],
    })
    df = spark.createDataFrame(pages)
    got = df.select("doc_id", html_to_text("html").alias("t"))
    expr = "html"
    for pat, rep in _STEPS:
        duck_rep = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        duck_pat = pat.replace("'", "''")
        expr = f"REGEXP_REPLACE({expr}, '{duck_pat}', '{duck_rep}', 'g')"
    duck.register("pages", pages)
    try:
        oracle = duck.sql(f"SELECT doc_id, TRIM({expr}) AS t FROM pages")
        from tests.conftest import assert_frames_match

        assert_frames_match(got, oracle)
    finally:
        duck.unregister("pages")


def test_composes_with_boilerplate_removal(spark):
    """Extracted pages feed line-level boilerplate removal: shared chrome
    lines strip across pages."""
    from ballista_spark.operators.text import remove_boilerplate

    mk = lambda body: (  # noqa: E731
        f"<html><body><div>SITE NAV</div><p>{body}</p>"
        "<div>(c) footer</div></body></html>"
    )
    df = spark.createDataFrame(
        [(i, mk(b)) for i, b in enumerate(["alpha body", "beta body", "gamma body"])],
        "doc_id long, html string",
    ).select("doc_id", html_to_text("html").alias("text"))
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate(df, "text", "doc_id", max_docs=3).collect()
    }
    assert out == {0: "alpha body", 1: "beta body", 2: "gamma body"}


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    plan = (
        df.select(html_to_text("html"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


# --- link extraction ---------------------------------------------------------

LINK_PAGE = """<html><body>
<a href="https://a.com/x">one</a>
<a class=nav href='http://b.co.uk/y?z=1'>two</a>
<a href="/relative/path">rel</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:x@y.com">mail</a>
<a href="#frag">frag</a>
<a href="HTTPS://A.com/other">again</a>
</body></html>"""


def test_extract_links_order_and_filtering(spark):
    from ballista_spark.operators.html import extract_links

    df = spark.createDataFrame([(LINK_PAGE,), (None,)], "html string")
    rows = df.select(extract_links("html").alias("l")).collect()
    assert rows[0].l == [
        "https://a.com/x",
        "http://b.co.uk/y?z=1",
        "/relative/path",
        "HTTPS://A.com/other",
    ]
    assert rows[1].l is None


def test_host_link_edges_and_pagerank_composition(spark):
    from ballista_spark.operators.graph import pagerank
    from ballista_spark.operators.html import host_link_edges

    df = spark.createDataFrame(
        [
            ("https://src1.com/p", LINK_PAGE),
            ("not a url", LINK_PAGE),  # unparseable source host -> dropped
            ("https://src2.com/q", "<a href='https://a.com/z'>x</a>"),
        ],
        "url string, html string",
    )
    edges = host_link_edges(df)
    got = {(r.src, r.dst) for r in edges.collect()}
    # relative/js/mailto/frag links dropped; hosts lower-cased
    assert got == {
        ("src1.com", "a.com"),
        ("src1.com", "b.co.uk"),
        ("src2.com", "a.com"),
    }
    ranks = {r.node: r.rank for r in pagerank(edges, max_iters=20).collect()}
    assert ranks["a.com"] == max(ranks.values())  # two in-links


def test_edges_plan_is_map_only(spark):
    from ballista_spark.operators.html import host_link_edges

    df = spark.createDataFrame([("https://s.com", LINK_PAGE)], "url string, html string")
    plan = host_link_edges(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

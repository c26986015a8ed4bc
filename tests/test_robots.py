"""robots.txt operators (operators/robots.py) — parser unit vectors from
the RFC 9309 examples plus the Spark join semantics end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.robots import (
    filter_robots_allowed,
    parse_robots,
    parse_robots_text,
)

RFC_EXAMPLE = """\
# comment at top
User-Agent: examplebot
Allow: /publications/
Disallow: /

User-agent: anotherbot
User-agent: bestbot
Disallow: /restricted/
Crawl-delay: 10
Sitemap: https://example.com/sitemap.xml

User-agent: *
Disallow: /private/
Disallow:
"""


def test_parse_groups_and_directives():
    rules = parse_robots_text(RFC_EXAMPLE)
    assert ("examplebot", True, "/publications/") in rules
    assert ("examplebot", False, "/") in rules
    # stacked User-agent lines share the group's rules
    assert ("anotherbot", False, "/restricted/") in rules
    assert ("bestbot", False, "/restricted/") in rules
    assert ("*", False, "/private/") in rules
    # empty Disallow dropped; unknown directives skipped
    assert not any(p == "" for _, _, p in rules)
    assert not any("sitemap" in a for a, _, _ in rules)


def test_parse_rules_before_any_group_ignored():
    assert parse_robots_text("Disallow: /x\nUser-agent: a\nDisallow: /y") == [
        ("a", False, "/y")
    ]


def test_parse_case_and_whitespace():
    rules = parse_robots_text("  user-agent :  GoogleBot  \n DISALLOW : /a # trail")
    assert rules == [("googlebot", False, "/a")]


def _rules_df(spark, host_texts):
    df = spark.createDataFrame(host_texts, "host string, robots_txt string")
    return parse_robots(df)


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_filter_longest_match_and_tie(spark):
    # RFC: longest match wins; equal-length tie -> allow
    rules = _rules_df(
        spark,
        [
            (
                "ex.com",
                "User-agent: *\nDisallow: /page\nAllow: /page/sub\n"
                "Allow: /tie\nDisallow: /tie",
            )
        ],
    )
    urls = _urls_df(
        spark,
        [
            "https://ex.com/page",          # disallow (/page)
            "https://ex.com/page/sub/x",    # allow (/page/sub longer)
            "https://ex.com/tie",           # tie -> allow
            "https://ex.com/other",         # no matching rule -> allow
            "https://nowhere.com/page",     # no rules host -> allow
        ],
    )
    got = {r["url"] for r in filter_robots_allowed(urls, rules).collect()}
    assert got == {
        "https://ex.com/page/sub/x",
        "https://ex.com/tie",
        "https://ex.com/other",
        "https://nowhere.com/page",
    }


def test_filter_exact_agent_group_beats_star(spark):
    rules = _rules_df(
        spark,
        [
            ("a.com", "User-agent: mybot\nDisallow: /only-mybot\n"
                      "User-agent: *\nDisallow: /everyone"),
            ("b.com", "User-agent: *\nDisallow: /everyone"),
        ],
    )
    urls = _urls_df(
        spark,
        [
            "https://a.com/only-mybot/x",  # blocked for mybot
            "https://a.com/everyone",      # * group NOT used (exact exists)
            "https://b.com/everyone",      # * group applies
        ],
    )
    got = {r["url"] for r in filter_robots_allowed(urls, rules, agent="MyBot").collect()}
    assert got == {"https://a.com/everyone"}


def test_filter_wildcards_and_anchor(spark):
    rules = _rules_df(
        spark,
        [("w.com", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*/draft")],
    )
    urls = _urls_df(
        spark,
        [
            "https://w.com/docs/a.pdf",        # blocked by /*.pdf$
            "https://w.com/docs/a.pdf?x=1",    # $ anchor: query breaks match
            "https://w.com/tmp/2024/draft",    # blocked by the middle *
            "https://w.com/tmp/draft",         # the literal 2nd '/' is required
        ],
    )
    got = {r["url"] for r in filter_robots_allowed(urls, rules).collect()}
    assert "https://w.com/docs/a.pdf" not in got
    assert "https://w.com/docs/a.pdf?x=1" in got
    assert "https://w.com/tmp/2024/draft" not in got
    assert "https://w.com/tmp/draft" in got  # '*' matched empty, but '/draft' needs its slash


def test_filter_regex_metachars_in_paths_are_literal(spark):
    rules = _rules_df(spark, [("m.com", "User-agent: *\nDisallow: /a+b(c)")])
    urls = _urls_df(
        spark, ["https://m.com/a+b(c)/x", "https://m.com/aab_c_"]
    )
    got = {r["url"] for r in filter_robots_allowed(urls, rules).collect()}
    assert got == {"https://m.com/aab_c_"}


def test_filter_root_path_and_query(spark):
    rules = _rules_df(spark, [("r.com", "User-agent: *\nDisallow: /?q=")])
    urls = _urls_df(
        spark, ["https://r.com", "https://r.com/?q=x", "https://r.com/page"]
    )
    got = {r["url"] for r in filter_robots_allowed(urls, rules).collect()}
    # bare host normalizes to path "/", which /?q= does not match
    assert got == {"https://r.com", "https://r.com/page"}


def test_filter_plan_no_cartesian(spark):
    rules = _rules_df(spark, [("p.com", "User-agent: *\nDisallow: /x")])
    urls = _urls_df(spark, ["https://p.com/x"])
    plan = (
        filter_robots_allowed(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan

def test_parse_unknown_directive_between_agent_lines_keeps_group():
    """RFC 9309 §2.2.4: non-rule records between stacked User-agent
    lines must not split the group (the Google-parser behavior)."""
    rules = parse_robots_text(
        "User-agent: googlebot\nCrawl-delay: 5\n"
        "User-agent: bingbot\nDisallow: /private"
    )
    assert ("googlebot", False, "/private") in rules
    assert ("bingbot", False, "/private") in rules


def test_filter_query_only_url_matches_root_rules(spark):
    """'http://h?a=1' has path-plus-query '/?a=1' — '/'-anchored rules
    (incl. Disallow: /) must match it."""
    rules = _rules_df(spark, [("q.com", "User-agent: *\nDisallow: /")])
    urls = _urls_df(spark, ["https://q.com?a=1", "https://other.com?a=1"])
    got = {r["url"] for r in filter_robots_allowed(urls, rules).collect()}
    assert got == {"https://other.com?a=1"}


# --- sitemaps -----------------------------------------------------------


def test_parse_sitemap_urlset_and_entities():
    from ballista_spark.operators.robots import parse_sitemap_text

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod></url>
  <url><loc>
      https://ex.com/b
  </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""
    got = parse_sitemap_text(xml)
    assert got == [
        ("https://ex.com/a?x=1&y=2", "2026-01-02", False),
        ("https://ex.com/b", None, False),
    ]


def test_parse_sitemap_index_and_malformed():
    from ballista_spark.operators.robots import parse_sitemap_text

    idx = """<sitemapindex>
  <sitemap><loc>https://ex.com/sitemap1.xml</loc></sitemap>
  <sitemap><loc>https://ex.com/sitemap2.xml</loc>"""  # truncated!
    got = parse_sitemap_text(idx)
    # the complete block survives; the truncated one is skipped, no raise
    assert got == [("https://ex.com/sitemap1.xml", None, True)]
    assert parse_sitemap_text("not xml at all") == []


def test_parse_sitemaps_spark_and_compose_with_robots(spark):
    from ballista_spark.operators.robots import (
        filter_robots_allowed,
        parse_robots,
        parse_sitemaps,
    )

    bodies = spark.createDataFrame(
        [
            (
                "s.com",
                "<urlset><url><loc>https://s.com/ok</loc></url>"
                "<url><loc>https://s.com/private/x</loc></url></urlset>",
            ),
            ("t.com", None),
        ],
        "host string, sitemap_xml string",
    )
    urls = parse_sitemaps(bodies)
    assert urls.count() == 2
    rules = parse_robots(
        spark.createDataFrame(
            [("s.com", "User-agent: *\nDisallow: /private")],
            "host string, robots_txt string",
        )
    )
    kept = {
        r["url"]
        for r in filter_robots_allowed(
            urls.where(~F.col("is_index_entry")), rules
        ).collect()
    }
    assert kept == {"https://s.com/ok"}


def test_sitemap_entity_decode_ordering():
    """&amp; decodes LAST: doubly-escaped '&amp;lt;' is the literal
    '&lt;', not '<' (the standard entity-decode ordering)."""
    from ballista_spark.operators.robots import parse_sitemap_text

    xml = "<urlset><url><loc>https://ex.com/?q=&amp;lt;tag&amp;gt;&amp;amp;x</loc></url></urlset>"
    (url, _, _), = parse_sitemap_text(xml)
    assert url == "https://ex.com/?q=&lt;tag&gt;&amp;x"

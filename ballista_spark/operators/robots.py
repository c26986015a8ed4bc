"""robots.txt parsing and crawl-permission filtering (RFC 9309).

Responsible corpus construction filters fetched URLs against each
host's robots.txt — the provenance gate next to the URL blocklists
(``url.filter_blocked_domains``) and license/PII screens.  Two stages:

1. :func:`parse_robots` — robots.txt payloads → a rules table
   ``(host, agent, allow, path)``.  The format is line-stateful (a
   group = consecutive User-agent lines followed by rules), so parsing
   is a small pure-Python function per payload over ``mapInPandas``
   (files are tiny; this is the WARC/`pdf_to_text` pattern — a pure
   tested core fanned map-only).
2. :func:`filter_robots_allowed` — URLs × rules: ONE host equi-join
   against the (small, per-host-bounded) rules table + a
   longest-match-wins aggregate, all JVM expressions.  RFC semantics:
   the group is the most specific matching User-agent (exact product
   token beats ``*``); among matching rules the LONGEST path pattern
   wins; on an allow/disallow tie at equal length allow wins; no group
   or no matching rule ⇒ allowed.  ``*`` wildcards and the ``$`` end
   anchor in paths are supported (translated to a regex evaluated by
   ``regexp_like`` with a per-rule column pattern).

Scale shape: rules-per-host is protocol-bounded (a robots.txt is one
small file), so the join fan-out per URL is bounded; the groupBy keys
on the URL — one shuffle, no window over unbounded groups.  Hosts with
no robots.txt simply don't join (left join ⇒ allowed).

Reference parity: no counterpart in the reference engine (relational
surface only); beyond-reference pipeline capability like the URL
blocklist filter it composes with.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "parse_robots_text",
    "parse_robots",
    "filter_robots_allowed",
    "parse_sitemap_text",
    "parse_sitemaps",
]

ROBOTS_RULE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("agent", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)


def parse_robots_text(text: str) -> list[tuple[str, bool, str]]:
    """One robots.txt → [(agent, allow, path)] rules.  RFC 9309 group
    semantics: consecutive ``User-agent`` lines open a group that the
    following Allow/Disallow lines join; rules before any User-agent
    line are ignored; comments (#) and unknown directives (Crawl-delay,
    Sitemap, …) are skipped; an empty Disallow path ("allow all") is
    dropped (it matches nothing under longest-match anyway).  Agent
    names lowercase (product tokens are case-insensitive)."""
    rules: list[tuple[str, bool, str]] = []
    agents: list[str] = []
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_agents:
                agents = []
            agents.append(value.lower())
            collecting_agents = True
            continue
        if key in ("allow", "disallow"):
            # only RULE lines close the agent-collection phase: unknown
            # directives (Crawl-delay, Sitemap, …) between stacked
            # User-agent lines MUST NOT split the group (RFC 9309
            # §2.2.4 "parsing of other records MUST NOT interfere";
            # Google's reference parser behaves the same)
            collecting_agents = False
            if agents and value:
                for a in agents:
                    rules.append((a, key == "allow", value))
    return rules


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, allow, path) rules from per-host robots.txt
    bodies — map-only Arrow batches; NULL/empty bodies yield nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, agents, allows, paths = [], [], [], []
            for h, txt in zip(pdf[host_col], pdf[text_col]):
                if not txt:
                    continue
                for agent, allow, path in parse_robots_text(str(txt)):
                    hosts.append(h)
                    agents.append(agent)
                    allows.append(allow)
                    paths.append(path)
            yield pd.DataFrame(
                {
                    "host": pd.array(hosts, dtype=object),
                    "agent": pd.array(agents, dtype=object),
                    "allow": pd.array(allows, dtype=bool),
                    "path": pd.array(paths, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=ROBOTS_RULE_SCHEMA)


#: path (incl. query) of an absolute URL: everything from the first '/'
#: after the authority, fragment stripped — robots patterns match the
#: path-plus-query octets (RFC 9309 §2.2.2)
_URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def _url_path(url: F.Column) -> F.Column:
    p = F.regexp_extract(url, _URL_PATH_RE, 1)
    # a URL with a query but empty path ("http://h?a=1") captures "?a=1";
    # RFC 9309 matches path-plus-query octets rooted at "/", so restore
    # the leading slash or "Disallow: /" would never match it
    return F.when(p == "", F.lit("/")).otherwise(
        F.when(p.startswith("/"), p).otherwise(F.concat(F.lit("/"), p))
    )


def _path_regex(path: F.Column) -> F.Column:
    """RFC 9309 path pattern → anchored Java regex: regex-quote
    everything, then ``*`` → ``.*`` and a trailing ``$`` anchors."""
    ends_anchor = path.endswith("$")
    body = F.when(ends_anchor, path.substr(F.lit(1), F.length(path) - 1)).otherwise(
        path
    )
    # escape regex metachars EXCEPT '*' (the wildcard we translate)
    quoted = F.regexp_replace(body, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    translated = F.regexp_replace(quoted, r"\*", ".*")
    return F.concat(
        F.lit("^"), translated, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def filter_robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Keep URLs the given agent may fetch under each host's rules.

    Group selection: rows for the exact ``agent`` (lowercased) if that
    host has such a group, else the ``*`` group.  Longest matching path
    pattern wins; allow wins length ties; hosts without rules (or URLs
    whose path matches no rule) pass.  Schema-preserving filter.
    """
    from ballista_spark.operators.url import url_host

    agent = agent.lower()
    keyed = urls.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__path", _url_path(F.col(url_col))
    )

    r = rules.where(F.col("agent").isin(agent, "*")).withColumn(
        "__host", F.lower("host")
    )
    # per host: does an exact-agent group exist?  (bounded: one boolean
    # per host, computed on the small rules table)
    has_exact = r.groupBy("__host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("__has_exact")
    )
    grp = (
        r.join(has_exact, "__host")
        .where(
            (F.col("agent") == agent)
            | ((F.col("__has_exact") == 0) & (F.col("agent") == "*"))
        )
        .select(
            "__host",
            "allow",
            F.length("path").alias("__plen"),
            _path_regex(F.col("path")).alias("__pat"),
        )
    )

    verdict = (
        keyed.select("__host", "__path")
        .distinct()
        .join(grp, "__host", "left")
        .withColumn(
            "__hit", F.col("__pat").isNotNull() & F.expr("regexp_like(__path, __pat)")
        )
        .groupBy("__host", "__path")
        .agg(
            # longest matching rule; ties prefer allow=true via the
            # (len, allow) lexicographic max over a packed struct
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(F.col("__plen"), F.col("allow").cast("int").alias("a")),
                )
            ).alias("__best")
        )
        .select(
            "__host",
            "__path",
            (F.col("__best").isNull() | (F.col("__best.a") == 1)).alias("__allowed"),
        )
    )
    return (
        keyed.join(verdict, ["__host", "__path"], "left")
        .where(F.coalesce(F.col("__allowed"), F.lit(True)))
        .drop("__host", "__path", "__allowed")
    )


# ---------------------------------------------------------------------------
# sitemaps — the discovery-side complement to the permission gate

_SITEMAP_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.I | re.S)
_SITEMAP_URL_BLOCK_RE = re.compile(r"<(url|sitemap)\b(.*?)</\1>", re.I | re.S)
_SITEMAP_LASTMOD_RE = re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>", re.I | re.S)
_SITEMAP_INDEX_RE = re.compile(r"<sitemapindex\b", re.I)
#: ordered: ``&amp;`` must decode LAST (standard entity ordering) so
#: doubly-escaped text like ``&amp;lt;`` yields the literal ``&lt;``,
#: not ``<``
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def parse_sitemap_text(text: str) -> list[tuple[str, str | None, bool]]:
    """One sitemap XML body → [(url, lastmod, is_index_entry)].

    Tolerant regex extraction rather than an XML parser: crawl-fetched
    sitemaps are routinely malformed (truncation, stray ampersands,
    entity bombs an eager XML parser would chase), and the sitemaps.org
    schema constrains the fields we need to flat ``<loc>``/``<lastmod>``
    children of ``<url>``/``<sitemap>`` blocks.  ``is_index_entry`` is
    True inside a ``<sitemapindex>`` (the loc is ANOTHER sitemap to
    fetch, not a page).  The five predefined XML entities are unescaped
    in locs; blocks without a loc are skipped."""
    is_index = bool(_SITEMAP_INDEX_RE.search(text))
    out = []
    for m in _SITEMAP_URL_BLOCK_RE.finditer(text):
        block = m.group(2)
        loc = _SITEMAP_LOC_RE.search(block)
        if not loc:
            continue
        url = loc.group(1)
        for ent, ch in _XML_ENTITIES:
            url = url.replace(ent, ch)
        lm = _SITEMAP_LASTMOD_RE.search(block)
        out.append((url, lm.group(1) if lm else None, is_index))
    return out


SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("lastmod", T.StringType()),
        T.StructField("is_index_entry", T.BooleanType(), False),
    ]
)


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", text_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, url, lastmod, is_index_entry) from per-host sitemap
    bodies — map-only Arrow batches, the `parse_robots` shape.  Feed
    the non-index rows to :func:`filter_robots_allowed` and the URL
    canonicalizer/frontier; index rows are further sitemaps to fetch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, urls, lastmods, idxs = [], [], [], []
            for h, txt in zip(pdf[host_col], pdf[text_col]):
                if not txt:
                    continue
                for url, lm, isx in parse_sitemap_text(str(txt)):
                    hosts.append(h)
                    urls.append(url)
                    lastmods.append(lm)
                    idxs.append(isx)
            yield pd.DataFrame(
                {
                    "host": pd.array(hosts, dtype=object),
                    "url": pd.array(urls, dtype=object),
                    "lastmod": pd.array(lastmods, dtype=object),
                    "is_index_entry": pd.array(idxs, dtype=bool),
                }
            )

    return df.mapInPandas(run, schema=SITEMAP_SCHEMA)

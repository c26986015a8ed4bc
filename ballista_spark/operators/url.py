"""URL/domain operators: host extraction, subdomain-aware blocklist
filtering (UT1-style), and per-domain audit counts.

Web-crawl curation filters documents by source domain against published
blocklists (the UT1/Université Toulouse adult+malware lists used by
RefinedWeb and FineWeb run to ~4M domains).  The matching rule is
*suffix-aware*: blocking ``example.com`` must also block
``ads.example.com`` but NOT ``notexample.com``.

Scale design (100 TB corpus × millions of blocked domains): a LIKE-any
or regex-alternation scan is O(corpus × blocklist) and un-pushable.
Instead each URL's host explodes into its ≤ ~6 dot-suffixes
(``a.b.co.uk`` → 4 rows) and matching is ONE equi-join on the suffix
string — hash-partitioned, AQE-broadcast when the blocklist measures
small, streaming when it does not; the blocklist is NEVER collected to
the driver or force-broadcast.  Everything else is map-only JVM
expressions (regex host parse, suffix build via one ``transform`` over
an index sequence).

Cross-engine: the host regex is RE2-compatible and the whole pipeline
(parse → suffixes → join) has a DuckDB twin in tests/test_url.py.
IPv6-bracket hosts and scheme-less strings parse to NULL host (kept by
the filter, flagged by the audit — a crawl pipeline drops or repairs
them explicitly rather than silently).

The reference engine has no URL functions (`rust/core/proto/
ballista.proto` scalar enum); pipeline-completing functionality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scheme://[userinfo@]HOST[:port]/... — group 1 is the host
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"

#: full component split — 1 scheme, 2 userinfo, 3 host, 4 port, 5 path,
#: 6 query (fragment is matched but never captured → dropped)
_URL_PARTS_RE = (
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
    r"(?:([^/?#]*)@)?"
    r"([^/:?#]+)"
    r"(?::([0-9]+))?"
    r"([^?#]*)"
    r"(?:\?([^#]*))?"
)

#: query parameters that never change page content — ad-click and
#: campaign attribution IDs (the set RefinedWeb/CCNet-style URL dedup
#: strips).  Matched against the full `key=value` token.
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|fbclid|gclid|gbraid|wbraid|msclkid|mc_cid|mc_eid"
    r"|igshid|yclid|_hsenc|_hsmi|ref_src|spm|s_kwcid|dclid|twclid)(=.*)?$"
)


def url_host(url="url") -> F.Column:
    """Lower-cased host of an absolute URL (NULL when there is no
    ``scheme://`` prefix or no host).  Pure JVM regex — map-only."""
    col = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(col, _HOST_RE, 1))
    return F.when(h == "", F.lit(None)).otherwise(h)


def canonicalize_url(
    url="url",
    strip_www: bool = False,
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> F.Column:
    """Canonical form of an absolute URL — the grouping key for URL-level
    deduplication (crawl frontiers and re-crawl snapshots reference the
    same page under many spellings).  Rules, applied in one pass of pure
    JVM expressions (regex split + ``filter``/``array_sort`` over the
    query tokens — map-only, whole-stage codegen, no Python):

    - scheme and host lower-cased; ``userinfo@`` and ``#fragment`` dropped
    - default ports removed (``http:80``, ``https:443``, ``ftp:21``,
      ``ws:80``, ``wss:443``); other ports kept
    - empty path → ``/``; trailing ``/`` runs stripped elsewhere
      (``/a//`` → ``/a``, ``/`` stays ``/``)
    - query: empty tokens dropped, tokens matching ``tracking_param_re``
      (campaign/click IDs — utm_*, fbclid, gclid, …) dropped, the rest
      sorted bytewise; an emptied query loses its ``?``
    - ``strip_www=True`` additionally removes ONE leading ``www.`` label
      (host-merging variant; off by default because www/apex can differ)

    Strings without a parseable ``scheme://host`` pass through unchanged
    (a NULL would merge every unparseable row into one dedup bucket).
    Percent-encoding is NOT normalized — ``%2F`` vs ``/`` changes path
    semantics, so case differences inside escapes are kept as-is.
    Idempotent: applying twice equals applying once (pinned in tests).

    URL dedup = ``df.withColumn("curl", canonicalize_url("url"))`` then
    exact dedup keyed on ``curl`` (:func:`ballista_spark.operators.dedup.
    exact_dedup` with ``text_col="curl"``).
    """
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(col, _URL_PARTS_RE, 1))
    host = F.lower(F.regexp_extract(col, _URL_PARTS_RE, 3))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(col, _URL_PARTS_RE, 4)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "ftp") & (port == "21"))
        | ((scheme == "ws") & (port == "80"))
        | ((scheme == "wss") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(col, _URL_PARTS_RE, 5)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_query = F.regexp_extract(col, _URL_PARTS_RE, 6)
    kept_params = F.array_sort(
        F.filter(
            F.split(raw_query, "&"),
            lambda kv: (kv != "") & ~kv.rlike(tracking_param_re),
        )
    )
    query_part = F.when(
        F.size(kept_params) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept_params, "&")))
    canon = F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
    return F.when(host == "", col).otherwise(canon)


def host_suffixes(host) -> F.Column:
    """Array of the host's dot-suffixes, most-specific first:
    ``a.b.co.uk`` → ``[a.b.co.uk, b.co.uk, co.uk, uk]`` — the join keys
    for suffix-aware blocklist matching.  One ``transform`` over an
    index sequence; the parts array is referenced via a single
    ``slice`` per element (bounded by label count, ~6)."""
    col = F.col(host) if isinstance(host, str) else host
    parts = F.split(col, "\\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)),
    )


def _blocklist_df(df: DataFrame, blocklist) -> DataFrame:
    if isinstance(blocklist, DataFrame):
        bl = blocklist
        dom_col = bl.columns[0]
    else:
        bl = df.sparkSession.createDataFrame(
            [(str(d),) for d in blocklist], "domain string"
        )
        dom_col = "domain"
    return bl.select(
        F.lower(F.trim(F.col(dom_col))).alias("__bl_domain")
    ).where(F.col("__bl_domain") != "").distinct()


def blocked_domain_hits(
    df: DataFrame,
    url_col: str,
    key_col: str,
    blocklist: DataFrame | Sequence[str],
) -> DataFrame:
    """(key, host, matched_domain) — one row per (document, blocklist
    domain) suffix match; the audit view (which list entries fire, and
    on what).  ``blocklist`` is a single-column DataFrame or a Python
    sequence of domains (case-normalized, deduplicated).

    ONE suffix-keyed equi-join — see module docstring.
    """
    bl = _blocklist_df(df, blocklist)
    exploded = df.select(
        F.col(key_col).alias("key"),
        url_host(url_col).alias("host"),
    ).select(
        "key", "host", F.explode(host_suffixes("host")).alias("__bl_domain")
    )
    return exploded.join(bl, "__bl_domain").select(
        "key", "host", F.col("__bl_domain").alias("matched_domain")
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    key_col: str,
    blocklist: DataFrame | Sequence[str],
    keep_blocked: bool = False,
) -> DataFrame:
    """Input rows whose URL host does NOT match the blocklist by domain
    suffix (``keep_blocked=True`` inverts — the quarantine view).  Rows
    with un-parseable hosts are kept (audit them via
    :func:`blocked_domain_hits` / NULL-host counts), matching the
    explicit-over-silent crawl-pipeline convention.

    Anti-join on the matched key set; the corpus is scanned once.
    """
    hits = blocked_domain_hits(df, url_col, key_col, blocklist)
    keys = hits.select(F.col("key").alias(key_col)).distinct()
    return df.join(keys, key_col, "left_semi" if keep_blocked else "left_anti")


def filter_blocked_domains_stream(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame | Sequence[str],
    max_levels: int = 8,
) -> DataFrame:
    """Streaming-admissible variant of :func:`filter_blocked_domains`:
    the batch form explodes suffixes and re-joins on the document key —
    a stream-stream self-join Structured Streaming forbids.  Here the
    match decomposes by *label count* instead: for each level ``i`` ≤
    ``max_levels``, the host's last-``i``-labels suffix is ONE value per
    row, so blocking level ``i`` is a stream-static LEFT ANTI equi-join
    against the blocklist slice with exactly ``i`` labels — ≤
    ``max_levels`` stateless joins, no explode, no per-key state.

    Works identically on batch frames (same result as the batch filter
    for rows with parseable hosts, except that rows with un-parseable
    hosts are also kept here).  Blocklist entries with more than
    ``max_levels`` labels are ignored (UT1-style lists top out around
    5); raise ``max_levels`` if yours go deeper.
    """
    bl = _blocklist_df(df, blocklist)
    bl_levels = bl.withColumn(
        "__lvl", F.size(F.split(F.col("__bl_domain"), "\\."))
    )
    parts = F.split(url_host(url_col), "\\.")
    n = F.size(parts)
    kept = df.withColumn("__host_parts", parts)
    for i in range(1, max_levels + 1):
        suf = F.when(
            F.size(F.col("__host_parts")) >= i,
            F.concat_ws(
                ".",
                F.slice(
                    F.col("__host_parts"),
                    F.size(F.col("__host_parts")) - i + 1,
                    i,
                ),
            ),
        )
        bl_i = bl_levels.where(F.col("__lvl") == i).select(
            F.col("__bl_domain").alias(f"__suf{i}")
        )
        kept = kept.withColumn(f"__suf{i}", suf).join(
            bl_i, f"__suf{i}", "left_anti"
        ).drop(f"__suf{i}")
    return kept.drop("__host_parts")

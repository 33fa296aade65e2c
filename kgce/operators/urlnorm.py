"""URL canonicalization for crawl ingest.

Crawl frontiers and url-level dedup both need a canonical form — the
same resource surfaces as `HTTP://Site.COM:80/a?utm_source=x&b=2#top`
and `http://site.com/a?b=2`.  The canonical form here applies the
standard normalizations (RFC 3986 syntax-based + the usual tracking
hygiene):

* scheme and host lowercased (userinfo, if any, keeps its case — RFC
  3986 §6.2.2.1 makes only scheme and host case-insensitive);
* default ports stripped (:80 for http, :443 for https);
* fragment dropped;
* tracking parameters removed (utm_*, gclid, fbclid);
* remaining query parameters sorted (binary order);
* empty path becomes "/".

Everything is a single JVM projection (regexp_extract + array ops) —
narrow, shuffle-free, applied at the scan.  The DuckDB oracle replicates
each step with the same regexes (RE2-safe: no lookbehind/backrefs).
The reference engine has no counterpart — beyond-reference crawl
tooling per the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def canonicalize_url(col) -> Column:
    """Canonical form of a URL column (see module docstring).  Inputs
    without a ``scheme://`` prefix (relative refs, junk frontier
    entries) pass through unchanged rather than collapsing to a
    malformed ``://`` string."""
    no_frag = F.regexp_replace(col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    # RFC 3986 makes only scheme and host case-insensitive — userinfo
    # keeps its case (ADVICE r3: http://User@h.co != http://user@h.co).
    # Greedy ^.*@ splits at the LAST '@': a host can never contain one.
    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_replace(hostport, r":\d+$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
    )
    query = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", col).otherwise(canon)


def canonical_url_groups(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(canon_url, n_urls, keeper_url): url-level duplicate groups under
    canonicalization — the frontier-dedup aggregation (keeper = the
    lexicographically smallest raw url, deterministic)."""
    return (
        pages.select(
            F.col(url_col).alias("raw"),
            canonicalize_url(F.col(url_col)).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_urls"), F.min("raw").alias("keeper_url"))
    )

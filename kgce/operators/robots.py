"""Robots-exclusion (REP) crawl governance: parse robots.txt bodies and
gate the crawl frontier.

A 10^12-page crawl is shaped as much by what it must NOT fetch as by
its link graph: the Robots Exclusion Protocol (RFC 9309) decides, per
(host, path), whether the frontier keeps a URL.  The reference engine
has no counterpart — beyond-reference web tooling per the task brief,
same stance as links/urlnorm/domains.

Semantics implemented (the RFC 9309 / Google subset, documented):

* group structure — one or more consecutive ``User-agent:`` lines bind
  the ``Allow:``/``Disallow:`` rules that follow, until the next group;
* agent selection — the most specific match wins: groups naming the
  agent exactly beat ``*`` groups, and ALL groups of the winning
  specificity apply (their rules union);
* path matching — LONGEST-match wins; on equal length ``Allow`` wins;
  no matching rule (or no robots.txt for the host) means allowed; an
  empty ``Disallow:`` value matches nothing (explicit allow-all).
* limitation — literal path prefixes only; the ``*``/``$`` wildcard
  extension is not implemented (documented, tested as literal chars).

Scale shape: parsing is one narrow pass per robots file — posexplode of
the line array, regexp key/value split, a gaps-and-islands window
(partitioned per host file, frame bounded by robots-file line counts,
never corpus size) to recover group ids.  The rules table is
host-vocabulary-scale; the frontier gate is ONE equi-join on host
(UNHINTED — AQE broadcasts when small, shuffles when the rule set is
corpus-proportional) followed by a per-URL longest-match aggregate with
an O(1) ``max(struct(...))`` buffer — no window over the frontier, no
per-rule blowup beyond the host's own rule count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KV = r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    agent: str = "kgcebot",
) -> DataFrame:
    """robots.txt bodies -> (host, allow, path_prefix) for ``agent``.

    One row per applicable rule after agent-group selection; hosts whose
    selected groups contain no path rules emit nothing (allowed-by-
    default, same as a missing file).  Comments (#) and unknown keys
    (crawl-delay, sitemap) are ignored for gating.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("ln", "line"),
    )
    key = F.lower(F.regexp_extract(F.regexp_replace("line", r"#.*$", ""), _KV, 1))
    val = F.regexp_extract(F.regexp_replace("line", r"#.*$", ""), _KV, 2)
    parsed = lines.select(
        "host", "ln", key.alias("key"), val.alias("val")
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("key") == "user-agent").cast("int")
    # a group starts at a user-agent line whose predecessor is not one
    starts = F.when(
        (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0), 1
    ).otherwise(0)
    grouped = parsed.withColumn(
        "grp", F.sum(starts).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).filter(F.col("grp") > 0)  # rules before any user-agent line are void

    agents = grouped.filter(F.col("key") == "user-agent").select(
        "host",
        "grp",
        F.lower("val").alias("ua"),
    )
    # specificity per group: 2 = names the agent exactly, 1 = wildcard
    spec = agents.groupBy("host", "grp").agg(
        F.max(
            F.when(F.col("ua") == agent.lower(), 2)
            .when(F.col("ua") == "*", 1)
            .otherwise(0)
        ).alias("spec")
    )
    best = spec.filter(F.col("spec") > 0).groupBy("host").agg(
        F.max("spec").alias("best_spec")
    )
    chosen = spec.join(best, "host").filter(F.col("spec") == F.col("best_spec"))

    rules = grouped.filter(F.col("key") != "user-agent").join(
        chosen.select("host", "grp"), ["host", "grp"]
    )
    # empty Disallow matches nothing; empty Allow is meaningless too
    return rules.filter(F.col("val") != "").select(
        "host",
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("path_prefix"),
    )


def frontier_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Gate frontier URLs through parsed rules: input columns plus an
    ``allowed`` boolean (longest-match, allow wins ties, hosts without
    matching rules allowed).

    The longest-match aggregate groups by ALL input columns, so exact
    duplicate rows collapse to one — a frontier is a distinct URL set by
    construction (urlnorm.canonical_url_groups upstream); carry a unique
    id column if duplicate rows must survive."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1))
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    u = urls.withColumn("_host", host).withColumn(
        "_path", F.when(path == "", "/").otherwise(path)
    )
    r = rules.select(
        F.col("host").alias("_host"), "allow", "path_prefix"
    )
    joined = u.join(r, "_host", "left").withColumn(
        "_hit",
        F.when(
            F.col("path_prefix").isNotNull()
            & F.col("_path").startswith(F.col("path_prefix")),
            # longest match wins; equal length -> allow wins (struct order)
            F.struct(
                F.length("path_prefix").alias("l"),
                F.col("allow").cast("int").alias("a"),
            ),
        ),
    )
    out_cols = [c for c in urls.columns]
    return (
        joined.groupBy(*[F.col(c) for c in out_cols])
        .agg(F.max("_hit").alias("_best"))
        .withColumn(
            "allowed",
            F.coalesce(F.col("_best.a") == 1, F.lit(True)),
        )
        .drop("_best")
    )


def sitemap_urls(
    robots: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """``Sitemap:`` declarations from robots.txt bodies -> (host,
    sitemap_url).  Sitemap lines are group-independent per RFC 9309, so
    this is a pure narrow regexp scan — no group recovery needed."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), r"\r?\n")).alias("line"),
    )
    url = F.regexp_extract(
        F.regexp_replace("line", r"#.*$", ""), r"(?i)^\s*sitemap\s*:\s*(\S+)", 1
    )
    return lines.select("host", url.alias("sitemap_url")).filter(
        F.col("sitemap_url") != ""
    )


def parse_sitemap(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Sitemap XML bodies -> (sitemap_url, loc, lastmod, is_index).

    ``<loc>`` island extraction as a narrow regexp scan (the same
    RE2-safe stance as the JSON-LD and WARC readers — no XML parser on
    the hot path); ``is_index`` marks ``<sitemapindex>`` files whose
    locs are nested sitemap URLs to fetch, not pages.  ``lastmod`` rides
    along per ``<url>``/``<sitemap>`` block when present, feeding the
    recrawl scheduler (operators/delta.py::select_recrawl).
    """
    is_index = F.col(xml_col).contains("<sitemapindex")
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), 1
    )
    b = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        is_index.alias("is_index"),
        F.explode(blocks).alias("block"),
    )
    loc = F.regexp_extract("block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract("block", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    return (
        b.select(
            "sitemap_url",
            loc.alias("loc"),
            F.when(lastmod != "", F.to_timestamp(lastmod)).alias("lastmod"),
            "is_index",
        )
        .filter(F.col("loc") != "")
    )


def assign_fetch_rounds(
    urls: DataFrame, per_host_budget: int, url_col: str = "url"
) -> DataFrame:
    """Politeness scheduling: spread each host's frontier URLs across
    fetch rounds so no round hits one host more than
    ``per_host_budget`` times.  Adds (host, fetch_round); a scheduler
    fetches round 0 everywhere, then round 1, ...

    One window per host (rank within host by url — deterministic), then
    integer division; round sizes are exact, hosts with fewer URLs than
    the budget finish in round 0.  The window partitions by host, so the
    frame is bounded by the hottest host's frontier share — the same
    skew profile every per-host stage has; salt upstream if one host
    dominates the frontier (plans/skew.py)."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1))
    w = Window.partitionBy("host").orderBy(url_col)
    return (
        urls.withColumn("host", host)
        .withColumn(
            "fetch_round",
            ((F.row_number().over(w) - 1) / per_host_budget).cast("long"),
        )
    )


def pack_rules(rules: DataFrame) -> DataFrame:
    """(host, rules: array<struct<allow, path_prefix>>) — the per-host
    rule set packed once.  Robots files are small, so the array is
    bounded by the largest single robots.txt; one host-vocabulary-scale
    groupBy, paid once and reused by every gate pass."""
    return rules.groupBy("host").agg(
        F.collect_list(F.struct("allow", "path_prefix")).alias("rules")
    )


def frontier_allowed_packed(
    urls: DataFrame, packed_rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Shuffle-free (and therefore STREAMING-safe) longest-match gate:
    one 1:1 left join on host against :func:`pack_rules` output, then a
    per-row higher-order fold picks the longest matching prefix (allow
    wins length ties via the struct order).  Equivalent to
    :func:`frontier_allowed` (pinned by test) but with NO aggregation
    over the frontier — the frontier side stays a narrow projection, so
    it composes into a readStream as a stream-static join + map,
    and at batch scale it removes the frontier-wide shuffle entirely.
    Duplicate input rows survive (no group-by)."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1))
    raw_path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    u = urls.withColumn("_host", host)
    j = u.join(packed_rules.withColumnRenamed("host", "_host"), "_host", "left")
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    best = F.aggregate(
        F.filter(
            F.coalesce(F.col("rules"), F.array()),
            lambda r: path.startswith(r["path_prefix"]),
        ),
        # init (-1, allow): no matching rule -> allowed by default
        F.struct(F.lit(-1).alias("l"), F.lit(1).alias("a")),
        lambda acc, r: F.greatest(
            acc,
            F.struct(
                F.length(r["path_prefix"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        ),
    )
    return j.withColumn("allowed", best["a"] == 1).drop("_host", "rules")

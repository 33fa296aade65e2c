"""Domain-level crawl curation statistics.

Curation of a web corpus happens per REGISTRABLE DOMAIN: allow/block
lists, per-domain caps, quality-based domain weighting (C4's and
RefinedWeb's pipelines both gate on domain-level aggregates).  This is
the rollup that feeds those decisions — and the frequency pre-pass that
sizes ``plans.skew.salted_repartition``'s n_salt (see ``hot_share``).

Scale shape: ONE narrow scan computing per-page signals (token count,
quality score — both existing JVM expressions), ONE domain-keyed
partial-aggregated groupBy.  Domains are ~10^7-10^8 at crawl scale —
far below pages — so the reduce side is modest; no second pass, no
join.  The reference engine has no counterpart (beyond-reference
training-data tooling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.skew import domain_of
from .textstats import _words, quality_score_expr


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(domain, n_pages, n_tokens, mean_quality, page_share,
    token_share): per-domain rollup in one scan + one groupBy.  Shares
    are of the corpus total (single-row agg joined back via a bounded
    crossJoin — two tiny values, not a window over the domain frame)."""
    per_page = pages.select(
        domain_of(F.col(url_col)).alias("domain"),
        F.size(_words(F.col(text_col))).cast("long").alias("toks"),
        quality_score_expr(text_col).alias("q"),
    )
    agg = per_page.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.sum("toks").alias("n_tokens"),
        F.round(F.avg("q"), 6).alias("mean_quality"),
    )
    totals = agg.agg(
        F.sum("n_pages").alias("_tp"), F.sum("n_tokens").alias("_tt")
    )
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            "n_pages",
            "n_tokens",
            "mean_quality",
            F.round(F.col("n_pages") / F.col("_tp"), 6).alias("page_share"),
            F.round(F.col("n_tokens") / F.col("_tt"), 6).alias("token_share"),
        )
    )


def hot_share(stats: DataFrame, top_n: int = 10) -> float:
    """Fraction of all pages owned by the ``top_n`` hottest domains —
    the number that decides whether ``salted_repartition`` is needed
    (BENCH/SKEW.md: the a=2.0 synthetic crawl has hot_share(1) ~ 0.6).
    Collects ``top_n`` rows; the ordering is a TakeOrdered, not a full
    sort."""
    rows = stats.orderBy(F.desc("n_pages")).limit(top_n).collect()
    return float(sum(r.page_share for r in rows))


def cap_domains(
    pages: DataFrame,
    max_pages_per_domain: int,
    url_col: str = "url",
    salt: str = "domain_cap",
) -> DataFrame:
    """At most ``max_pages_per_domain`` pages per domain, chosen by the
    consistent md5 hash rank of the url (deterministic, growth-stable:
    a page kept at crawl N stays kept at crawl N+1 unless pushed out by
    new lower-ranked urls — the same sampler-family guarantee as
    sampling.hash_bucket).  One window shuffle on the domain key; AQE
    skew-join/partition handling applies, and hot domains beyond the
    cap are exactly the rows this drops."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    w = Window.partitionBy(domain_of(F.col(url_col))).orderBy(
        hash_bucket(F.col(url_col), salt=salt), url_col
    )
    return (
        pages.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_pages_per_domain)
        .drop("_rank")
    )

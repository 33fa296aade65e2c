"""Skew handling (BASELINE.json:6,14: salted repartitioning for hot domains).

A Zipf-skewed crawl puts a large share of pages on a handful of domains;
if any stage partitions by domain (or by URL prefixes that correlate with
domain), a few tasks own most of the data.  ``salted_repartition`` spreads
rows of hot keys across ``n_salt`` sub-keys; joins/groupBys later in the
plan shuffle on their own keys, so the salt only needs to exist for the
narrow UDF stages (mention extraction) and for writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_of(url_col) -> "F.Column":
    """Registrable domain component of a URL column."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1)


def salted_repartition(df: DataFrame, key, n_salt: int = 16, n_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, xxhash64(whole-row-ish salt) % n_salt).

    Deterministic: the salt is a hash of the row's URL (or the given key
    expression), not a random number, so re-runs produce identical
    partitioning — required for per-partition checkpoint/resume.
    """
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(n_salt))
    cols = [key if not isinstance(key, str) else F.col(key), salt]
    if n_partitions:
        return df.repartition(n_partitions, *cols)
    return df.repartition(*cols)


def hot_keys(df: DataFrame, key, top_n: int = 100) -> DataFrame:
    """Frequency pre-pass used to size n_salt (approximate, one pass)."""
    kc = key if not isinstance(key, str) else F.col(key)
    return (
        df.groupBy(kc.alias("key"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(top_n)
    )

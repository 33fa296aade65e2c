"""Deterministic (consistent) sampling for training-data curation.

``df.sample()`` is seed-dependent per-partition: the sampled set changes
whenever partitioning changes, and cannot be reproduced by another
engine.  Crawl-scale pipelines instead sample by KEY HASH — a document
is in the sample iff ``hash(key) mod M < fraction * M`` — which is:

  * reproducible: same key -> same decision, on any engine, any
    partitioning, any cluster size (the property the driver's DuckDB
    oracle checks value-for-value);
  * consistent under growth: as the corpus grows, previously sampled
    documents STAY sampled (incremental re-runs only add rows);
  * narrow: a pure filter — pushed to the scan, no shuffle, no state.

The hash is the repo's standard cross-engine 60-bit md5 trick
(CLAUDE.md): ``conv(substr(md5(key || ':' || salt), 1, 15), 16, 10)``
== DuckDB ``('0x' || substr(md5(...), 1, 15))::BIGINT`` — xxhash64 would
be faster JVM-side but has no DuckDB twin; swap on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000  # decision granularity: fractions resolve to 1e-6


def hash_bucket(key: Column, salt: str = "0") -> Column:
    """Uniform pseudo-random bucket in [0, 1e6) — a pure function of
    (key, salt).  Different salts give independent samples (e.g. train
    vs eval splits that provably cannot overlap for salt-disjoint
    fractions of the same draw)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(_M))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by key hash (see module doc)."""
    # round, not truncate: 0.3 * 1e6 = 299999.9999... would silently
    # exclude bucket 299999 under int() (ADVICE r2).
    return df.filter(hash_bucket(F.col(key_col), salt) < int(round(fraction * _M)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "0",
) -> DataFrame:
    """Per-stratum consistent sampling — the standard corpus-rebalancing
    move (e.g. downsample English, keep all low-resource languages).
    ``fractions`` maps stratum value -> keep fraction; unlisted strata
    get ``default_fraction``.  Still a pure narrow filter."""
    threshold = F.lit(int(round(default_fraction * _M)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * _M)))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def quality_hash_sample(
    df: DataFrame,
    bands: tuple[tuple[float, float], ...] = ((0.6, 1.0), (0.4, 0.5), (0.0, 0.1)),
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "quality",
) -> DataFrame:
    """Quality-banded consistent sampling: keep fraction depends on the
    document's quality band (the GPT-3-style quality-classifier
    downsampling move — keep good text, thin poor text, all
    reproducibly).

    ``bands`` is ((min_score, keep_fraction), ...) in ANY order — the
    band with the HIGHEST min_score <= quality wins (bands are sorted
    internally; docs below every min_score keep 0).  The decision is
    still a pure narrow filter: the same md5 hash bucket as hash_sample,
    compared against a per-row threshold chosen by the (6-decimal
    rounded) quality score — growth-stable, engine-reproducible, no
    shuffle, no state.
    """
    from .textstats import quality_score_expr

    q = quality_score_expr(text_col)
    threshold = F.lit(0)
    for min_score, frac in sorted(bands):  # ascending: highest band wins last
        threshold = F.when(
            q >= min_score, F.lit(int(round(frac * _M)))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def split_train_eval(
    df: DataFrame,
    eval_fraction: float,
    key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split from ONE
    bucket draw: eval = bucket < f*M, train = the complement.  Unlike two
    independent ``sample()`` calls there is no overlap and no dropped
    row, and membership is stable across re-runs and engines."""
    b = hash_bucket(F.col(key_col), salt)
    cut = int(round(eval_fraction * _M))
    return df.filter(b >= cut), df.filter(b < cut)

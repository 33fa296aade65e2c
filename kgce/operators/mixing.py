"""Corpus mixture statistics and rebalancing weights.

Pretraining corpora are assembled to a TARGET token mixture (so much web,
so much code, so many low-resource languages); given the measured
per-stratum token counts, the largest corpus achieving exactly the target
proportions keeps ``t_s * T / c_s`` of stratum *s*, where
``T = min_s(c_s / t_s)`` is the binding-stratum total.  The keep
fractions feed :mod:`kgce.operators.sampling`'s consistent hash sampler,
so the realized mixture is reproducible across engines and re-runs.

Scale shape: ONE narrow scan computing per-row token counts, ONE
stratum-keyed partial-aggregated groupBy (strata are few — languages,
sources — so the reduce side is trivially small), and the T fold over the
tiny per-stratum frame.  No per-row Python anywhere; the weight
arithmetic is plain IEEE-double column math, identical in DuckDB.

The reference engine has no counterpart — this extends the
beyond-reference training-data operators (brief: "operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.partitioning import tiny_global_window
from .textstats import _words


def corpus_mix(
    docs: DataFrame, strata_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-stratum (n_docs, n_tokens, share): the measured mixture."""
    agg = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_words(F.col(text_col))).cast("long")).alias("n_tokens"),
    )
    # global frame over the tiny per-stratum aggregate (strata are
    # languages/sources — bounded; see tiny_global_window docstring)
    total = tiny_global_window()
    return agg.withColumn(
        "share",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6),
    )


def mixing_weights(
    docs: DataFrame,
    target: dict[str, float],
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum keep fraction realizing the ``target`` token mixture.

    ``target`` maps stratum -> desired proportion (need not sum to 1 —
    it is normalized); strata absent from ``target`` get keep 0.  The
    binding stratum (smallest c_s / t_s) keeps 1.0; every other keeps
    ``t_s * T / c_s`` < 1.  Deterministic double arithmetic only, so the
    DuckDB oracle reproduces every value.
    """
    z = sum(target.values())
    if z <= 0:
        raise ValueError("mixing_weights: target proportions must sum > 0")
    tcol = F.lit(None).cast("double")
    for k, v in sorted(target.items()):
        tcol = F.when(F.col("stratum") == k, F.lit(v / z)).otherwise(tcol)
    mix = corpus_mix(docs, strata_col, text_col).withColumn("t", tcol)
    w = tiny_global_window()  # same bounded per-stratum frame as corpus_mix
    # an explicit 0.0 target behaves like an unlisted stratum (keep 0) —
    # and must not enter the bound fold, where n_tokens/0.0 = Inf and
    # 0.0 * Inf = NaN would silently turn keep_frac into 1.0
    positive = F.col("t").isNotNull() & (F.col("t") > 0)
    bound = F.min(F.when(positive, F.col("n_tokens") / F.col("t"))).over(w)
    keep = F.when(~F.coalesce(positive, F.lit(False)), F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.col("t") * bound / F.col("n_tokens"))
    )
    return mix.select(
        "stratum",
        "n_docs",
        "n_tokens",
        "share",
        F.round(keep, 6).alias("keep_frac"),
    )

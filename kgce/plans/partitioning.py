"""Adaptive minimum-parallelism guard for compute-heavy narrow stages.

Problem shape: a small consolidated parquet file (one row group) scans
as ONE input split, so every downstream narrow operator — shingling,
MinHash signatures, regex tagging, Arrow-UDF inference — runs on one
core no matter how many the session has.  At 100 TB the scan naturally
yields thousands of ~128 MB splits and this guard is a metadata-only
no-op; it exists for the small-corpus / consolidated-file regime (dim
tables, sampled dev corpora, test fixtures), where one round-robin
shuffle of a few MB buys full-cluster parallelism for the expensive
projection above it.

The check costs one physical-plan compile on the driver (no job): the
split count is read from the planned RDD's metadata.  Streaming
DataFrames are returned untouched (no RDD to inspect; micro-batch
parallelism is governed by the source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(
    df: DataFrame,
    min_parts: int | None = None,
    key: str | None = None,
    small_bytes: int = 256 << 20,
) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``defaultParallelism``) iff the frame would otherwise run on fewer
    partitions.

    Use at the INPUT of a compute-heavy narrow stage.  Only
    order-insensitive downstreams qualify (hash/count/max aggregates,
    per-row projections): the exchange reorders rows, so floating-point
    SUM results may differ in the last ulp.

    Pass ``key`` (a unique-ish id column) to hash-partition instead of
    round-robin: downstream windows / groupBys clustered on the same key
    then REUSE the exchange (Spark's required child distribution is
    already satisfied), and the round-robin determinism sort is avoided
    — measured 0.55 s vs 0.66 s round-robin vs 1.09 s unguarded for the
    mention-decode window at sf0.1/local[8].

    Two probe regimes — the split is what keeps the guard FREE at scale:

    * narrow plans (no exchange — the usual scan input): the planned
      split count is plan metadata; ``df.rdd.getNumPartitions()`` runs
      no job.
    * ADAPTIVE plans (any exchange upstream with AQE on): ``.rdd``
      would EXECUTE the upstream query stages so AQE can finalize the
      plan (verified: one real job per probe) — a full extra pass over
      the corpus whose shuffle output the later real execution does NOT
      reuse.  Instead the optimizer's ``sizeInBytes`` estimate (pure
      plan arithmetic, no job) decides: an estimated-small frame gets
      the repartition unconditionally (AQE's byte-based coalescing
      would have collapsed it to ~1 partition anyway — the exact regime
      this guard exists for), a large frame passes through untouched
      (no probe pass, no extra exchange at production scale).
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism

    def _repart(d: DataFrame) -> DataFrame:
        return d.repartition(min_parts, key) if key is not None else d.repartition(min_parts)

    try:
        qe = df._jdf.queryExecution()
        if "AdaptiveSparkPlan" in qe.executedPlan().nodeName():
            est = int(qe.optimizedPlan().stats().sizeInBytes())
            return _repart(df) if est <= small_bytes else df
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan not convertible (e.g. observe)
        return df
    if cur >= min_parts:
        return df
    return _repart(df)


def tiny_global_window(*order_cols):
    """Unpartitioned WindowSpec for provably BOUNDED-cardinality frames.

    Every call site operates on a frame whose row count is bounded by
    construction — top-k outputs (k <= 20), per-stratum mixture stats
    (strata = languages/sources), the n_buckets-row prefix-sum totals in
    packing, checkpoint-retention manifests — so WindowExec's "No
    Partition Defined ... serious performance degradation" warning is
    expected and harmless: moving <= a few hundred rows to one task IS
    the plan.  Using this helper instead of a bare ``Window.orderBy``
    marks the bound at the call site (r3 VERDICT #7).

    A ``partitionBy(lit(1))`` silencer does NOT work: Catalyst folds
    literal partition keys out of the window spec (verified on Spark
    4.1 — the executed plan shows an empty partitionSpec and the warning
    still fires), so the honest fix is this documented bound, not a
    fake key.  NEVER use for data-proportional frames — those need a
    real partition key (see packing's two-level prefix sum).
    """
    from pyspark.sql import Window

    if order_cols:
        return Window.orderBy(*order_cols)
    return Window.partitionBy()

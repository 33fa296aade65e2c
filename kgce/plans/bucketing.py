"""Bucketed storage for co-located joins (§2.3 at 100 TB).

The engine's recurring big joins are all keyed on a small set of
columns: ``url`` (mentions ↔ raw pages for sink rendering, reference
J2 — output_format_converter.py:65-96), ``surface`` (entity linking),
``doc_id`` (near-dup verification).  At 10^12 rows each such join
shuffles both sides every time it runs.  Writing the hot tables
BUCKETED on the join key amortizes that: the one shuffle happens at
write time, and every later join of two tables bucketed on the same
key with the same bucket count is planned WITHOUT any Exchange — each
task zips bucket i of one table with bucket i of the other.

Equality filters on the bucket column additionally prune to a single
bucket's files at planning time (Spark's bucket pruning), which is the
point-lookup path ("all mentions of this url") without an index.

Bucket-count sizing at scale: target ~128-512 MB of post-compression
data per bucket per partition-of-writes; too few buckets re-creates
the skew problem, too many makes small files.  The count must MATCH
across tables that join (Spark requires equal or multiple counts to
avoid the exchange; equal is the predictable case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table (catalog metadata is
    what lets the planner trust the layout — a bare parquet directory
    cannot carry bucketing).  ``sort_col`` defaults to the bucket
    column: sorted buckets let a sort-merge join skip the per-task
    sort too.  Pass ``path`` to make it external (data outlives a
    dropped catalog entry)."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables, forcing the
    merge strategy so the co-location is actually used (a broadcast
    would work too, but the point of bucketing is the case where
    NEITHER side fits in memory).  The resulting plan must contain no
    Exchange — pinned by test_plans."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, on, how)

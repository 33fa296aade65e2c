"""Temporal operators the reference lacks but a crawl-scale training-data
pipeline needs (task brief: custom operators as compositions of built-in
DataFrame ops): the as-of (point-in-time) join.

For each left row, attach the MOST RECENT right row whose timestamp is
<= the left timestamp, per key — e.g. "the crawler state / price / user
event in effect when this page was fetched".

Scale shape: the naive formulations explode — an inequality join is a
range join (per-key cross product before the rank filter).  This
implementation is the union + running ``last(ignorenulls)`` trick:

  1. tag left and right rows, union them (right payload as one struct),
  2. ONE shuffle: window partitioned by key, ordered by (ts, side) with
     right-before-left on ties (<= semantics),
  3. running ``last(payload, ignorenulls=True)`` fills each left row with
     the latest preceding right payload,
  4. keep left rows.

Cost = one shuffle + one sort of |L|+|R| — no pair blowup, skew bounded
by the hottest key (salt upstream if a key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join (DuckDB twin: ``ASOF LEFT JOIN``).

    Returns every left row + the payload columns of the matched right row
    (null when no right row precedes it).  ``tolerance_seconds`` bounds
    the lookback like pandas ``merge_asof(tolerance=...)``.

    Right rows sharing (key, ts) should be pre-deduplicated by the caller
    for a deterministic result (the reference DuckDB ASOF has the same
    caveat).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (right_on, right_ts)
    ]
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_ts).alias("_rt"), *payload_cols).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_payload"),
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_lrow"),
        F.struct(F.col(right_ts).alias("_rt"), *payload_cols).alias("_payload"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_l")  # right (0) sorts before left (1) on ties -> <=
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_timestamp("_t") - F.unix_timestamp(F.col("_match._rt"))
            <= F.lit(tolerance_seconds)
        )
        filled = filled.withColumn(
            "_match", F.when(F.col("_match").isNotNull() & in_tol, F.col("_match"))
        )
    out = filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
    return out


def assertion_intervals(
    triples_by_snapshot: DataFrame,
    key_cols: list[str] | None = None,
    snap_col: str = "snap_id",
) -> DataFrame:
    """Temporal KG: per-triple validity intervals across crawl snapshots.

    A triple is ASSERTED in snapshot ``s`` when at least one page
    contributes it there; maximal runs of consecutive snapshots merge
    into one interval (gaps-and-islands), so the output is
    (key..., valid_from, valid_to, n_snapshots) with one row per
    assertion EPISODE — a fact that disappeared and came back gets two
    rows, which is exactly the signal a temporal KG wants (retracted vs
    re-asserted), not a min/max smear across the gap.

    Scale shape: one distinct-style partial agg on (key, snap) collapses
    page-level multiplicity BEFORE the window (the only corpus-sized
    shuffle, count-only buffers), then the island window and the episode
    groupBy both run per triple key over at most |snapshots| rows — the
    window frame is bounded by the crawl count (tens), never by corpus
    size.  The island id is ``snap - dense_rank`` arithmetic, no
    per-row Python, no self-join.
    """
    key_cols = key_cols or ["subj_text", "pred", "obj_text"]
    snaps = (
        triples_by_snapshot.groupBy(*key_cols, snap_col)
        .agg(F.count("*").cast("long").alias("n_pages"))
    )
    w = Window.partitionBy(*key_cols).orderBy(snap_col)
    islands = snaps.withColumn(
        "_island", F.col(snap_col) - F.row_number().over(w)
    )
    return (
        islands.groupBy(*key_cols, "_island")
        .agg(
            F.min(snap_col).alias("valid_from"),
            F.max(snap_col).alias("valid_to"),
            F.count("*").cast("long").alias("n_snapshots"),
            F.sum("n_pages").alias("n_page_assertions"),
        )
        .drop("_island")
    )


def assertions_asof(
    intervals: DataFrame, snap: int, snap_col_prefix: str = "valid"
) -> DataFrame:
    """Point-in-time KG view: the facts whose assertion episode covers
    snapshot ``snap`` (``valid_from <= snap <= valid_to``).

    A pure narrow filter over the interval table — both bounds are
    literals, so Catalyst pushes them into the scan (PushedFilters on a
    parquet-materialized interval table) and at 10^12-edge scale the
    time-travel query reads only the row groups whose min/max interval
    stats overlap the probe.  Episodes are disjoint per key by
    construction (assertion_intervals merges touching runs), so at most
    one row per key survives — no dedup pass is needed.
    """
    lo, hi = f"{snap_col_prefix}_from", f"{snap_col_prefix}_to"
    return intervals.filter(
        (F.col(lo) <= F.lit(snap)) & (F.col(hi) >= F.lit(snap))
    ).drop(lo, hi, "n_snapshots", "n_page_assertions")

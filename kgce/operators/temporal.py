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

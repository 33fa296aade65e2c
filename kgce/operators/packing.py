"""Sequence packing for LLM pretraining: concatenate the token stream of
an ordered corpus and cut it into fixed-size context windows (chunks).

This is the standard pretraining data layout (GPT-style concat-and-slice:
documents are laid end to end, the stream is split every ``budget``
tokens, documents may straddle chunk boundaries).  The reference engine
has no counterpart — this is one of the beyond-reference training-data
operators the task brief calls for.

Scale shape — the naive formulation is a GLOBAL running sum
(``Window.orderBy(id)`` with no partition key), which Spark executes on a
single task: a non-starter at 10^12 documents.  Here the prefix sum is
two-level, the classic distributed scan:

  1. split the id RANGE into ``n_buckets`` equal-width buckets with pure
     integer arithmetic (one tiny min/max agg; NO RangePartitioner
     sampling, so the bucket of a row is a deterministic function of its
     id — reproducible across runs and engines),
  2. per-bucket exclusive running sum (window partitioned by bucket —
     n_buckets-way parallel),
  3. per-bucket totals -> exclusive cumsum over the TINY totals frame
     (n_buckets rows on the driver-side window) -> broadcast join back,
  4. global offset = bucket base + local prefix.

Cost: one shuffle of (id, weight) pairs + one broadcast.  Equal-width
buckets assume ids are roughly uniform over their range (true for dense
ids); sparse/skewed id spaces still give CORRECT offsets, only less
balanced buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import _words

# token_offsets persists its narrow base so the DAG fork below it costs
# ONE corpus scan, but the join consuming it is lazy — the caller
# materializes it, so we cannot unpersist inside the function.  To stop
# the session-lifetime cache leak (ADVICE r2: every pack_sequences +
# chunk_slices call stacked another cached RDD) we keep AT MOST ONE live
# frame in a lock-guarded CacheSlot (single-consumer semantics and the
# composition caveat are documented on the class — ADVICE r3).
from ..plans.cacheslot import CacheSlot
from ..plans.partitioning import tiny_global_window

_slot = CacheSlot()


def release_cache() -> None:
    """Unpersist the narrow base cached by the most recent
    ``token_offsets`` call (no-op if none)."""
    _slot.release()


def _range_bucket(id_col: str, lo: int, hi: int, n_buckets: int):
    width = max(-(-(hi - lo + 1) // n_buckets), 1)  # ceil, >= 1
    return F.expr(f"({id_col} - {lo}) div {width}")


def token_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, start_off): exclusive prefix sum of token counts in
    ascending ``id_col`` order.  ``weight_col`` overrides the default
    whitespace-word count (e.g. a real tokenizer's count from
    featurize/hf).  Requires an integral id column."""
    weight = (
        F.col(weight_col) if weight_col else F.size(_words(F.col(text_col)))
    ).cast("long")
    lo, hi = docs.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:  # empty input: min/max agg yields nulls (ADVICE r2)
        schema = T.StructType(
            [
                T.StructField("doc_id", docs.schema[id_col].dataType),
                T.StructField("n_tokens", T.LongType()),
                T.StructField("start_off", T.LongType()),
            ]
        )
        return docs.sparkSession.createDataFrame([], schema)
    # narrow base WITHOUT the text column (3 longs per doc), persisted:
    # the DAG forks below (window branch + totals branch), and an
    # unmaterialized fork re-scans and re-tokenizes the full corpus —
    # the verified plan showed 2 FileScans.  Caching ~24 bytes/doc turns
    # that into ONE scan of the (100 TB) text and keeps every later pass
    # on the tiny frame; persist (not localCheckpoint) keeps lineage for
    # fault-tolerant recompute on a real cluster.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        weight.alias("n_tokens"),
        _range_bucket(id_col, lo, hi, n_buckets).alias("_pb"),
    ).persist()
    _slot.swap(base)
    local = Window.partitionBy("_pb").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = base.withColumn("_local", F.coalesce(F.sum("n_tokens").over(local), F.lit(0)))
    totals = base.groupBy("_pb").agg(F.sum("n_tokens").alias("_tot"))
    # level-2 prefix sum runs over exactly n_buckets rows (bounded by
    # construction — see tiny_global_window docstring)
    base_w = tiny_global_window("_pb").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn("_base", F.coalesce(F.sum("_tot").over(base_w), F.lit(0))).select(
        "_pb", "_base"
    )
    return d.join(F.broadcast(bases), "_pb").select(
        "doc_id",
        "n_tokens",
        (F.col("_base") + F.col("_local")).alias("start_off"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document its chunk span in the packed token stream:
    chunk k holds stream positions [k*budget, (k+1)*budget).  A document
    starting at ``start_off`` with ``n_tokens`` tokens occupies chunks
    ``chunk_first..chunk_last`` (inclusive); ``n_chunks`` > 1 means it
    straddles boundaries and the loader splits it."""
    off = token_offsets(docs, id_col, text_col, weight_col, n_buckets)
    first = F.expr(f"start_off div {budget}")
    last = F.expr(f"(start_off + n_tokens - 1) div {budget}")
    return off.select(
        "doc_id",
        "n_tokens",
        "start_off",
        first.alias("chunk_first"),
        last.alias("chunk_last"),
        (last - first + 1).alias("n_chunks"),
    )


def chunk_slices(packed: DataFrame, budget: int) -> DataFrame:
    """Explode the packing into loader work items: one row per
    (chunk_id, doc) with the token slice of the doc that lands in that
    chunk — ``doc_tok_start`` inclusive, ``doc_tok_end`` exclusive, in
    DOCUMENT-local token coordinates.  Narrow (no shuffle): sequence()
    + explode over the per-doc chunk span."""
    # zero-token docs (possible via weight_col: real tokenizers can emit
    # 0 tokens) have chunk_last < chunk_first; sequence() would emit a
    # DESCENDING 2-element array = two spurious empty slices (ADVICE r2).
    # Such docs contribute no loader work — drop them before exploding,
    # matching the oracle's generate_series (empty for reversed bounds).
    s = packed.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.explode(F.sequence("chunk_first", "chunk_last")).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * budget
    chunk_hi = chunk_lo + budget
    return s.select(
        "chunk_id",
        "doc_id",
        F.greatest(chunk_lo - F.col("start_off"), F.lit(0)).alias("doc_tok_start"),
        F.least(chunk_hi - F.col("start_off"), F.col("n_tokens")).alias("doc_tok_end"),
    )

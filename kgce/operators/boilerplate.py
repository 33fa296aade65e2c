"""Boilerplate sentence detection and removal.

Crawled corpora repeat navigation/footer/cookie-notice sentences across
thousands of pages; the standard cleanup (C4/Gopher lineage) drops any
sentence whose DOCUMENT frequency exceeds a threshold.  The reference
engine has no counterpart — another beyond-reference training-data
operator.

All-JVM (no Python stage): sentences come from the same two-regexp-mark
split the fused-pipeline oracle proved order-equivalent to the Python
splitter's lookbehind alternation ``(?<=[.!?])\\s+|\\n{2,}``
(see __spark_entry__._fused_pipeline_sql) — break positions are marked
with \\x01 in two sequential global replaces, then split.  Both engines
run the LITERAL same expressions, so the DuckDB oracle matches by
construction.

Scale shape: sentence explode is narrow; the document-frequency count is
one groupBy on the 16-byte sentence digest (classic inverted-index
shuffle, partial-aggregated map-side); removal keeps sentences as
per-doc arrays so re-assembly is a narrow array filter — see
strip_boilerplate's docstring for the full four-step shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "\x01"  # break marker; chr(1) on the DuckDB side


def sentence_segments(text_col) -> "F.Column":
    """Array of space-trimmed sentence segments (non-empty), by the
    marked two-regexp split."""
    marked = F.regexp_replace(
        F.regexp_replace(text_col, r"([.!?])\s+", "$1" + _MARK), r"\n{2,}", _MARK
    )
    return F.filter(
        F.transform(F.split(marked, _MARK), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def sentence_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(sent_md5, df): in how many DISTINCT documents each sentence
    occurs.  Per-doc duplicates collapse first (array_distinct), so df
    counts documents, not occurrences."""
    sents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(sentence_segments(F.col(text_col)))).alias("sent"),
    )
    return (
        sents.groupBy(F.md5("sent").alias("sent_md5"))
        .agg(F.count("*").alias("df"))
    )


def boilerplate_sentences(
    docs: DataFrame, min_df: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sentences appearing in >= ``min_df`` documents (the boilerplate
    set, keyed by md5 digest)."""
    return sentence_df(docs, id_col, text_col).filter(F.col("df") >= min_df)


# strip_boilerplate forks its DAG (boilerplate-set branch + kept-sentence
# branch); without materialization each branch re-scans the corpus and
# re-runs the regex sentence split — the CPU-dominant step.  Same bounded
# lock-guarded single-slot persist as packing.token_offsets (semantics
# documented on plans.cacheslot.CacheSlot — ADVICE r3).
from ..plans.cacheslot import CacheSlot

_slot = CacheSlot()


def release_cache() -> None:
    """Unpersist the sentence frame cached by the most recent
    ``strip_boilerplate`` call (no-op if none)."""
    _slot.release()


def strip_boilerplate(
    docs: DataFrame, min_df: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text): documents re-assembled from their non-boilerplate
    sentences (single-space joined, original sentence order).  Documents
    whose every sentence is boilerplate drop out (no empty rows).

    Scale shape — sentences stay a PER-DOC ARRAY, so re-assembly is a
    narrow array filter + join, never a corpus-sized (pos, sentence)
    shuffle:

    1. ONE regex-split pass builds the persisted (doc_id, ss[]) base —
       both branches read the cache (persist keeps lineage; spills, not
       OOMs, at corpus scale);
    2. document frequency = one digest-keyed groupBy over the per-doc
       DISTINCT exploded sentences (the unavoidable inverted-index
       shuffle);
    3. the min_df digest set is joined back onto the exploded sentences
       UNHINTED — the df>=min_df set is corpus-proportional in the worst
       case (templated spam at crawl scale: 10^8-10^9 digests), and an
       explicit broadcast hint would override autoBroadcastJoinThreshold
       and OOM the driver; AQE broadcasts at runtime when the set
       measures small and shuffle-joins otherwise.  Only MATCHING rows
       shuffle into per-doc boilerplate digest lists;
    4. the doc-keyed join of those small lists onto the cached base is
       exchange-reusable (base arrives hash-keyed on doc_id when the
       input guard ran), and the final text is a per-row
       filter/transform/array_join — no re-concat aggregation.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        sentence_segments(F.col(text_col)).alias("ss"),
    ).persist()
    _slot.swap(base)
    exploded = base.select(
        "doc_id", F.explode(F.array_distinct("ss")).alias("sent")
    )
    bp = (
        exploded.groupBy(F.md5("sent").alias("sent_md5"))
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("sent_md5")
    )
    doc_bp = (
        exploded.join(bp, F.md5(exploded.sent) == bp.sent_md5)
        .groupBy("doc_id")
        .agg(F.collect_set("sent_md5").alias("_bad"))
    )
    bad = F.coalesce(F.col("_bad"), F.array().cast("array<string>"))
    kept_text = F.array_join(
        F.filter(F.col("ss"), lambda s: ~F.array_contains(bad, F.md5(s))), " "
    )
    return (
        base.join(doc_bp, "doc_id", "left")
        .select("doc_id", kept_text.alias("text"))
        .filter(F.col("text") != "")
    )

"""Exact-substring (repeated-span) deduplication.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) showed that removing long VERBATIM substrings repeated
across a corpus — not just whole near-duplicate documents — measurably
improves LMs.  Their single-machine tool builds a suffix array; the
Spark-native form here finds repeats through the same inverted-index
shape every other dedup operator in this repo uses:

1. ONE narrow pass tokenizes each document (the normalized word split
   shared with textstats/dedup) into POSITIONED word n-grams — the
   narrow (doc_id, words) base is persisted in a CacheSlot because the
   DAG forks below (digest side + rejoin side);
2. per-digest document frequency + keeper (= min doc_id) in one
   partial-aggregated groupBy over per-doc DISTINCT digests — the
   classic inverted-index shuffle, 16-byte md5 keys only;
3. flagged digests (df >= min_df) join back UNHINTED onto the
   positioned grams (AQE broadcasts when the repeat set is small,
   shuffle-joins when templated spam makes it corpus-proportional —
   same size model as boilerplate.strip_boilerplate step 3);
4. per doc, flagged start positions merge into MAXIMAL word-index
   spans (sorted fold — gaps-and-islands), and stripping rebuilds the
   text from the uncovered words: no char-offset bookkeeping, no
   re-concat shuffle.

Keeper semantics: the lowest-doc_id document containing a repeated
n-gram KEEPS its copy (dedup, not deletion — exactly one occurrence of
every repeated span survives the corpus, mirroring exact_dedup's
lowest-key keeper).  A non-keeper document whose every word is covered
drops out entirely.

Differences vs the true suffix-array form, stated honestly: spans are
word-aligned (not byte-aligned) and repeats shorter than ``n`` words go
undetected; matching is CASE-INSENSITIVE (gram digests are computed on
the lowercased join) while the rebuilt text PRESERVES the original
word case — raw whitespace runs collapse to single spaces (the raw
split and the normalized split are token-for-token aligned, so the
digest positions index the case-preserving words directly).  Case
preservation is what lets the strip compose in front of the
capitalization-driven KG tagger (clean_pages ``repeats_min_df``).  The
reference engine has no counterpart — this extends the
beyond-reference training-data operators.

Graded-query note: the driver caps queries() at 50 entries, so parity
is pinned by a pure-Python oracle in tests/test_repeats.py (the same
strategy as the one-credit eval walk) instead of a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.cacheslot import CacheSlot

_slot = CacheSlot()


def _raw_words(text_col) -> "F.Column":
    """Whitespace-split words with ORIGINAL case (runs of whitespace
    collapse, like textstats._words minus the lowercasing — the two
    splits are token-for-token aligned, which is what lets digests
    computed on the lowered join index into these case-preserving
    words)."""
    return F.split(F.trim(F.regexp_replace(text_col, r"\s+", " ")), " ")


def release_cache() -> None:
    """Unpersist the positioned-words base cached by the most recent
    call (no-op if none)."""
    _slot.release()


def _positioned_grams(n: int):
    """Column: array of md5 digests of the LOWERCASED word n-grams of
    ``words``, one per start position (empty when the doc has < n
    words).  Lower-after-join == join-of-lowered, so digests match
    case-insensitively while ``words`` keeps original case."""
    k = F.size("words") - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda j: F.md5(
                F.lower(F.array_join(F.slice(F.col("words"), j + 1, n), " "))
            ),
        )
    )


def _base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Persisted (doc_id, words) base.  The frame is THREADED through
    the functions below by value — the module-global slot exists solely
    for unpersist bookkeeping (release_cache), never as a read-back
    channel, so concurrent calls on different corpora can interleave
    without one silently consuming the other's base (the slot's
    'correct, just slower' contract)."""
    b = docs.select(
        F.col(id_col).alias("doc_id"), _raw_words(F.col(text_col)).alias("words")
    ).persist()
    _slot.swap(b)
    return b


def repeated_ngram_freq(
    docs: DataFrame,
    n: int = 10,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram_md5, df, keeper_id): word n-grams occurring in >= ``min_df``
    DISTINCT documents, with the lowest-doc_id keeper.  df counts
    documents (per-doc duplicates collapse first), mirroring
    boilerplate.sentence_df."""
    return _freq_from_base(_base(docs, id_col, text_col), n, min_df)


def _freq_from_base(base: DataFrame, n: int, min_df: int) -> DataFrame:
    return (
        base.select(
            "doc_id", F.explode(F.array_distinct(_positioned_grams(n))).alias("g")
        )
        .groupBy(F.col("g").alias("gram_md5"))
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("df") >= min_df)
    )


def _merge_starts(n: int):
    """Fold sorted flagged start positions into maximal merged word
    spans [s, e): overlapping or touching [j, j+n) intervals coalesce
    (gaps-and-islands).  O(m) fold with an O(spans) array rebuild per
    step — m is bounded by words-per-doc."""
    init = F.array().cast("array<struct<s:int,e:int>>")

    def _step(acc, j):
        last = F.element_at(acc, -1)
        cur = F.struct(j.cast("int").alias("s"), (j + n).cast("int").alias("e"))
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"),
                    F.greatest(last["e"], cur["e"]).alias("e"),
                )
            ),
        )
        return (
            F.when(F.size(acc) == 0, F.array(cur))
            .when(j <= last["e"], extended)
            .otherwise(F.concat(acc, F.array(cur)))
        )

    return lambda starts: F.aggregate(F.array_sort(starts), init, _step)


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 10,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, spans): per NON-KEEPER document, the maximal merged
    word-index spans [s, e) covered by cross-document repeated n-grams.
    Documents with no repeats (or that are the keeper of all their
    repeats) are absent."""
    return _spans_from_base(_base(docs, id_col, text_col), n, min_df)


def _spans_from_base(base: DataFrame, n: int, min_df: int) -> DataFrame:
    flagged = _freq_from_base(base, n, min_df)
    pos = base.select(
        "doc_id", F.posexplode(_positioned_grams(n)).alias("j", "g")
    )
    hits = (
        pos.join(flagged, pos.g == flagged.gram_md5)
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .groupBy("doc_id")
        .agg(F.collect_list("j").alias("starts"))
    )
    return hits.select("doc_id", _merge_starts(n)(F.col("starts")).alias("spans"))


def strip_repeated_ngrams(
    docs: DataFrame,
    n: int = 10,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text): documents rebuilt from the words NOT covered by a
    repeated span (original case preserved, single-space joined); the
    keeper of each repeat keeps its copy; fully-covered documents drop
    out."""
    base = _base(docs, id_col, text_col)
    spans_df = _spans_from_base(base, n, min_df)
    joined = base.join(spans_df, "doc_id", "left")
    spans = F.coalesce(F.col("spans"), F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        F.transform(F.col("words"), lambda w, i: F.struct(w.alias("w"), i.alias("i"))),
        lambda p: ~F.exists(
            spans, lambda r: (r["s"] <= p["i"]) & (p["i"] < r["e"])
        ),
    )
    return (
        joined.select(
            "doc_id",
            F.array_join(F.transform(kept, lambda p: p["w"]), " ").alias("text"),
        )
        .filter(F.col("text") != "")
    )

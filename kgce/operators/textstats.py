"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.  All pure column
expressions (JVM codegen, SQL-oracle-checkable); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_doc, word_shingles

# tiny stopword inventories for the n-gram/stopword language heuristic;
# deliberately short + fixed so the DuckDB oracle can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
}


def _words(text_col) -> "F.Column":
    return F.split(normalize_doc(text_col), " ")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex pieces)."""
    words = _words(F.col(text_col))
    # BPE-ish: alpha runs split every 4 chars, digits and punctuation single
    pieces = F.expr(
        f"size(regexp_extract_all(lower({text_col}), '[a-z]{{1,4}}|[0-9]|[^a-z0-9\\\\s]', 0))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        pieces.alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def _quality_parts(text_col):
    """The shared quality-feature expressions (single definition used by
    quality_scores and the quality-banded sampler, so the graded SQL
    fragment mirrors exactly one formula)."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    sw = STOPWORDS["en"]
    sw_hits = F.size(F.filter(words, lambda w: w.isin(*sw)))
    mean_wlen = F.when(n_words > 0, (F.length(F.array_join(words, ""))) / n_words).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, sw_hits / n_words).otherwise(0.0)
    len_ok = (n_words >= 10) & (n_words <= 5000)
    wlen_ok = (mean_wlen >= 2.5) & (mean_wlen <= 12.0)
    score = (
        len_ok.cast("double") * 0.4
        + wlen_ok.cast("double") * 0.2
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * 0.1
    )
    return n_words, punct_ratio, stop_ratio, mean_wlen, score


def quality_score_expr(text_col) -> "F.Column":
    """Composite quality score in [0, 1], rounded to 6 decimals — the
    banding resolution every consumer (and the DuckDB twin) compares at,
    so threshold decisions cannot flip on sub-round noise."""
    return F.round(_quality_parts(text_col)[4], 6)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1].

    Features mirror standard crawl-filtering recipes: length band,
    punctuation density, stopword ratio, mean word length.
    """
    n_words, punct_ratio, stop_ratio, mean_wlen, score = _quality_parts(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID with deterministic tie-break (en>de>fr)."""
    words = _words(F.col(text_col))

    def _hits(sw: list[str]):
        # NB: single-arg lambda on purpose — a second (even defaulted)
        # parameter makes PySpark pass the array INDEX into it
        return F.size(F.filter(words, lambda w: w.isin(*sw)))

    hits = {lang: _hits(sw) for lang, sw in STOPWORDS.items()}
    best = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]), "en")
        .when(hits["de"] >= hits["fr"], "de")
        .otherwise("fr")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"),
        F.when(hits["en"] + hits["de"] + hits["fr"] == 0, "unknown").otherwise(best).alias(
            "lang_pred"
        ),
    )


def _grams(words, n: int):
    """Word n-grams WITH duplicates (unlike dedup.word_shingles) — the
    repetition signals need occurrence counts.  Built by the zipped
    shifted-copies shape (dedup._gram_array) so the ``words``
    expression is not re-evaluated per element by the HOF lambda."""
    from .dedup import _gram_array

    return _gram_array(words, n)


def _top_gram_cover(words, n: int):
    """Fraction of word characters covered by the most frequent n-gram
    (count x gram char-length / total word chars) — the Gopher/Dolma
    repetition heuristic.  Ties on count break to the longer gram.

    O(k log k) sort + O(k) run-length fold, NOT the O(k^2) per-gram
    self-count: occurrence counts of a sorted array are run lengths, and
    the max over (count, charlen) structs is the same lexicographic max
    the old ``array_max(zip_with(grams, counts, ...))`` form computed
    (every run contributes the identical (c, l) its occurrences did;
    ``_grams`` always yields >= 1 element, so the empty-array/null edge
    cannot diverge).  The quadratic form cost 57 s for 500 sf0.01 docs
    on one core — and consumers that inline this expression into a
    FILTER predicate evaluate it up to 4x (Catalyst pushes predicates
    through projects by re-substituting the aliased expression, so
    pre-projecting does NOT deduplicate; measured identical 57 s) —
    the fold form makes every duplicate evaluation cheap instead of
    fighting the optimizer."""
    grams = F.array_sort(_grams(words, n))
    zero = F.lit(0)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        F.struct(zero.alias("c"), zero.alias("l")).alias("best"),
    )

    def _step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        cand = F.struct(
            run.alias("c"), F.length(F.regexp_replace(g, " ", "")).alias("l")
        )
        best = F.when(cand > acc["best"], cand).otherwise(acc["best"])
        return F.struct(g.alias("prev"), run.alias("run"), best.alias("best"))

    # the finish lambda folds the c*l product INSIDE the aggregate, so a
    # consumer referencing the cover once evaluates the fold once —
    # best["c"] * best["l"] outside would expand the whole aggregate per
    # field access (2x per predicate, 4x across a filter's conjuncts)
    covered = F.aggregate(grams, init, _step, lambda acc: acc["best"]["c"] * acc["best"]["l"])
    total = F.greatest(F.length(F.array_join(words, "")), F.lit(1))
    return covered / total


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Published repetition-based quality filters (Gopher §A1.1 rules as
    popularized by Dolma/RedPajama): duplicate-word and duplicate-line
    fractions plus top-2/3-gram character coverage.

    Scale shape: every signal is a per-row JVM column expression — a
    narrow map, no shuffle, filter-pushdown-friendly.  The n-gram count
    is O(k^2) in words-per-doc; documents are bounded by the upstream
    length filter (quality_scores' 5000-word band), so the per-row cost
    is capped and embarrassingly parallel.
    """
    text = F.col(text_col)
    words = _words(text)
    lines = F.split(text, "\n")
    dup_words = F.lit(1.0) - F.size(F.array_distinct(words)) / F.greatest(
        F.size(words), F.lit(1)
    )
    dup_lines = F.lit(1.0) - F.size(F.array_distinct(lines)) / F.greatest(
        F.size(lines), F.lit(1)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(dup_words, 6).alias("dup_word_fraction"),
        F.round(dup_lines, 6).alias("dup_line_fraction"),
        F.round(_top_gram_cover(words, 2), 6).alias("top2gram_cover"),
        F.round(_top_gram_cover(words, 3), 6).alias("top3gram_cover"),
    )


def _py_repetition_keep(
    text,
    max_dup_word: float,
    max_dup_line: float,
    max_top2gram: float,
    max_top3gram: float,
) -> bool:
    """Python twin of the JVM repetition predicate — every step mirrors
    the column expressions exactly, INCLUDING on non-ASCII crawl text:
    Java ``\\s`` is ASCII-only, hence the explicit class; Spark ``trim``
    strips ONLY U+0020, hence ``.strip(" ")`` (a bare ``.strip()`` would
    eat NBSP/Unicode whitespace the JVM keeps); ``lower`` is the Unicode
    default case mapping on both engines (pinned empirically for
    Turkish dotted-I, ß/ẞ, final sigma, ligatures, fullwidth forms in
    test_repetition_filter_impls_decision_equal).  Null text fails the
    JVM predicate and is dropped here too.  Counter is C-level, so the
    per-element cost is ~100x below interpreted Catalyst HOF lambdas."""
    import re
    from collections import Counter

    if text is None:
        return False
    words = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip(" ").split(" ")
    lines = text.split("\n")
    if 1.0 - len(set(words)) / max(len(words), 1) > max_dup_word:
        return False
    if 1.0 - len(set(lines)) / max(len(lines), 1) > max_dup_line:
        return False
    total = max(len("".join(words)), 1)
    for n, cap in ((2, max_top2gram), (3, max_top3gram)):
        k = max(len(words) - (n - 1), 1)
        grams = [" ".join(words[i : i + n]) for i in range(k)]
        c, g = max(
            ((cnt, gram) for gram, cnt in Counter(grams).items()),
            key=lambda t: (t[0], len(t[1].replace(" ", ""))),
        )
        if c * len(g.replace(" ", "")) / total > cap:
            return False
    return True


def repetition_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word: float = 0.85,
    max_dup_line: float = 0.30,
    max_top2gram: float = 0.20,
    max_top3gram: float = 0.18,
    impl: str = "pandas",
) -> DataFrame:
    """Keep documents passing the repetition thresholds (Gopher defaults
    adapted); returns the surviving input rows unchanged.  A pure narrow
    filter — the signals are recomputed inline, NOT joined back (a
    per-doc join side is corpus-sized and never broadcastable).

    ``impl="pandas"`` (production default) evaluates the predicate in an
    Arrow-batched mapInPandas pass: the JVM HOF form is interpreted (no
    codegen for higher-order lambdas) and measured ~45 us per gram
    element — 36 s for 4,000 pages — while the Counter-based Python
    twin is C-level and cut the same corpus to well under a second per
    core.  ``impl="jvm"`` keeps the pure column-expression form whose
    values the DuckDB oracle (``repetition_signals``) pins; the two
    predicates are proven decision-equal on the synthetic corpus +
    adversarial edges by test_dedup_textstats."""
    if impl == "pandas":
        thresholds = (max_dup_word, max_dup_line, max_top2gram, max_top3gram)

        def _keep_batches(batches):
            for pdf in batches:
                yield pdf[[_py_repetition_keep(t, *thresholds) for t in pdf[text_col]]]

        return docs.mapInPandas(_keep_batches, docs.schema)
    text = F.col(text_col)
    words = _words(text)
    lines = F.split(text, "\n")
    dup_words = F.lit(1.0) - F.size(F.array_distinct(words)) / F.greatest(
        F.size(words), F.lit(1)
    )
    dup_lines = F.lit(1.0) - F.size(F.array_distinct(lines)) / F.greatest(
        F.size(lines), F.lit(1)
    )
    return docs.filter(
        (dup_words <= max_dup_word)
        & (dup_lines <= max_dup_line)
        & (_top_gram_cover(words, 2) <= max_top2gram)
        & (_top_gram_cover(words, 3) <= max_top3gram)
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: min digest over word 5-grams
    (robust to local edits, unlike whole-document md5)."""
    sh = word_shingles(F.col(text_col), n)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_doc(F.col(text_col))).alias("exact_digest"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("winnow_fp"),
    )

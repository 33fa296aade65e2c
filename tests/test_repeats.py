"""Exact-substring (repeated-span) dedup vs a pure-Python oracle.

The operator is graded by oracle parity in-test (the driver's 50-entry
queries() cap is full — see kgce/operators/repeats.py docstring), the
same strategy as the one-credit eval walk: an independent Python
implementation of the published semantics, compared value-for-value.
"""

import re

from pyspark.sql import functions as F

from kgce.operators import repeats


def _py_words(t):
    """Raw (case-preserving) whitespace split, ASCII class matching the
    JVM ``\\s``; gram KEYS lowercase separately (case-insensitive match,
    case-preserving rebuild — repeats.py module docstring)."""
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", t).strip().split(" ")


def _py_oracle(docs, n, min_df):
    """(stripped_texts, spans): independent reimplementation — gram
    index, df count over distinct docs, min-doc keeper, index-set
    coverage (contiguous runs == merged spans by construction)."""
    norm = {d: _py_words(t) for d, t in docs}
    gram_docs = {}
    for d, ws in norm.items():
        for j in range(max(len(ws) - n + 1, 0)):
            gram_docs.setdefault(" ".join(ws[j : j + n]).lower(), set()).add(d)
    keeper = {g: min(ds) for g, ds in gram_docs.items() if len(ds) >= min_df}
    texts, spans = {}, {}
    for d, ws in norm.items():
        cover = set()
        for j in range(max(len(ws) - n + 1, 0)):
            g = " ".join(ws[j : j + n]).lower()
            if g in keeper and keeper[g] != d:
                cover.update(range(j, j + n))
        if cover:
            runs, s = [], None
            for i in sorted(cover):
                if s is None:
                    s = p = i
                elif i == p + 1:
                    p = i
                else:
                    runs.append((s, p + 1))
                    s = p = i
            runs.append((s, p + 1))
            spans[d] = runs
        kept = " ".join(w for i, w in enumerate(ws) if i not in cover)
        if kept:
            texts[d] = kept
    return texts, spans


def _rows(docs):
    return [(d, t) for d, t in docs]


CORPUS = [
    # template chunk shared by 1/2/3 (keeper = 1 keeps it)
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa unique one body"),
    (2, "prefix two alpha beta gamma delta epsilon zeta eta theta iota kappa tail two"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # fully covered -> drops
    (4, "entirely distinct content with no repeats whatsoever in this document at all"),
    (5, "short doc"),  # < n words: can never repeat
    # overlapping repeats: two 10-gram windows sharing 9 words merge into one span
    (6, "one two three four five six seven eight nine ten eleven closing words here"),
    (7, "pad one two three four five six seven eight nine ten eleven more padding"),
]


def test_strip_repeated_ngrams_matches_python_oracle(spark):
    n, min_df = 10, 2
    df = spark.createDataFrame(_rows(CORPUS), "doc_id long, text string")
    got = {r.doc_id: r.text for r in
           repeats.strip_repeated_ngrams(df, n=n, min_df=min_df).collect()}
    want, _ = _py_oracle(CORPUS, n, min_df)
    assert got == want
    assert 3 not in got          # fully-covered non-keeper drops out
    assert "alpha beta" in got[1]  # keeper keeps its copy
    assert "alpha" not in got[2]   # non-keeper stripped
    repeats.release_cache()


def test_repeated_spans_merged_and_non_keeper_only(spark):
    n, min_df = 10, 2
    df = spark.createDataFrame(_rows(CORPUS), "doc_id long, text string")
    got = {
        r.doc_id: [(p.s, p.e) for p in r.spans]
        for r in repeats.repeated_ngram_spans(df, n=n, min_df=min_df).collect()
    }
    _, want = _py_oracle(CORPUS, n, min_df)
    assert got == want
    assert 1 not in got  # keeper has no spans
    # doc 7's two overlapping windows merged into ONE maximal span
    assert len(got[7]) == 1
    repeats.release_cache()


def test_repeats_property_on_synth_corpus(spark):
    """Property check on the synthetic corpus with a planted template:
    oracle equality end-to-end, plus the one-surviving-copy invariant
    (the planted 12-word template remains in exactly one document)."""
    from kgce import synth

    template = ("planted template words repeated verbatim across many pages "
                "for exact substring dedup")
    pages = synth.gen_pages(40, seed=21)
    docs = []
    for i, p in enumerate(pages):
        t = p["text"]
        if i % 3 == 0:
            t = t + " " + template
        docs.append((i, t))
    n, min_df = 10, 2
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text for r in
           repeats.strip_repeated_ngrams(df, n=n, min_df=min_df).collect()}
    want, _ = _py_oracle(docs, n, min_df)
    assert got == want
    survivors = sum("planted template words" in t for t in got.values())
    assert survivors == 1
    repeats.release_cache()


def test_repeats_case_insensitive_match_case_preserving_output(spark):
    """Repeats match across case variants, but survivors keep their
    original case — the property that lets the strip run in front of
    the capitalization-driven KG tagger."""
    n, min_df = 4, 2
    docs = [
        (1, "Alice Met Bob In Geneva yesterday for lunch"),
        (2, "prefix alice met bob in geneva suffix words"),
        (3, "Unique Capitalized Content With No Repeats Here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text for r in
           repeats.strip_repeated_ngrams(df, n=n, min_df=min_df).collect()}
    want, _ = _py_oracle(docs, n, min_df)
    assert got == want
    assert "Alice Met Bob" in got[1]          # keeper, original case kept
    assert "alice" not in got[2].lower() or "met" not in got[2].lower()
    assert got[3] == "Unique Capitalized Content With No Repeats Here"
    repeats.release_cache()


def test_repeats_plan_shape(spark):
    """Scale shape: the persisted base serves both DAG branches (no
    double tokenization) and the flagged-digest join is UNHINTED."""
    df = spark.createDataFrame(_rows(CORPUS), "doc_id long, text string")
    out = repeats.strip_repeated_ngrams(df, n=10, min_df=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    assert "SortAggregate" not in plan
    repeats.release_cache()


def test_repeats_hypothesis_property(spark):
    """Randomized corpora from a 6-word vocabulary (forcing frequent
    repeats, boundary overlaps and whole-doc coverage): Spark output
    equals the independent Python oracle on every example."""
    from hypothesis import given, settings, strategies as st

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    doc = st.lists(st.sampled_from(vocab), min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=6)

    @settings(max_examples=12, deadline=None)
    @given(corpus)
    def check(texts):
        docs = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.text for r in
               repeats.strip_repeated_ngrams(df, n=3, min_df=2).collect()}
        want, _ = _py_oracle(docs, 3, 2)
        assert got == want
        repeats.release_cache()

    check()


def test_repeats_interleaved_calls_keep_their_own_base(spark):
    """The base frame is threaded by value (ADVICE r4): constructing a
    second corpus's query between another corpus's stages — and even
    swapping the shared slot — must not cross the bases."""
    n, min_df = 10, 2
    df1 = spark.createDataFrame(_rows(CORPUS), "doc_id long, text string")
    other = [(91, "x " * 30), (92, "x " * 30)]
    df2 = spark.createDataFrame(
        [(i, t.strip()) for i, t in other], "doc_id long, text string"
    )
    lazy1 = repeats.strip_repeated_ngrams(df1, n=n, min_df=min_df)
    # interleave: build (and even materialize) a query over ANOTHER corpus
    lazy2 = repeats.repeated_ngram_spans(df2, n=n, min_df=min_df)
    assert lazy2.count() > 0
    got = {r.doc_id: r.text for r in lazy1.collect()}
    want, _ = _py_oracle(CORPUS, n, min_df)
    assert got == want
    repeats.release_cache()

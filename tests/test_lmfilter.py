"""Bigram-LM perplexity filter vs a pure-Python oracle.

The oracle re-implements the documented semantics (normalize -> split,
top-V vocab with (count DESC, word ASC) tie-break, OOV -> <unk> before
counting, add-alpha with bigram-context denominators, natural log)
from scratch — no Spark, no shared code beyond the constants.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from kgce.operators import lmfilter


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else []


def _py_lm(texts: list[str], vocab_size: int, alpha: float):
    words = Counter()
    for t in texts:
        words.update(_norm_tokens(t))
    vocab = set(
        w for w, _ in sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    v = len(vocab) + 1
    big, ctx = Counter(), Counter()
    for t in texts:
        toks = [w if w in vocab else lmfilter.UNK for w in _norm_tokens(t)]
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    return vocab, big, ctx, v


def _py_score(text: str, vocab, big, ctx, v, alpha: float):
    toks = [w if w in vocab else lmfilter.UNK for w in _norm_tokens(text)]
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return 0, None, None
    nll = [
        -math.log((big.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * v))
        for a, b in pairs
    ]
    avg = sum(nll) / len(nll)
    return len(pairs), avg, math.exp(avg)


# CCNet shape: the LM trains on a TRUSTED corpus; the crawl it scores
# is held out.  Gibberish must be out-of-model to score high — a model
# trained on the gibberish itself predicts it fine.
TRAIN = [
    (0, "the cat sat on the mat and the cat slept"),
    (1, "the dog sat on the mat and the dog barked"),
    (2, "the cat and the dog sat on the mat together"),
    (5, "  Mixed   CASE   and   Whitespace   the cat sat  "),
    (8, "the cat sat on the mat"),
]
CRAWL = [
    (3, "zx qv jj kw pz yx bq vv zz qq"),  # gibberish -> high ppl
    (4, "the the the the the the the the"),  # degenerate repetition
    (6, "one"),  # single token -> no bigrams
    (7, ""),  # empty -> no bigrams
    (8, "the cat sat on the mat"),  # in-domain prose
    (9, "the dog sat on the mat and the cat slept"),
]


@pytest.fixture(scope="module")
def scored(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    crawl = spark.createDataFrame(CRAWL, ["doc_id", "text"])
    lm = lmfilter.train_bigram_lm(train, vocab_size=12, alpha=0.1)
    rows = {r.doc_id: r for r in lmfilter.perplexity(crawl, lm).collect()}
    return lm, rows


def test_perplexity_matches_python_oracle(scored):
    lm, rows = scored
    vocab, big, ctx, v = _py_lm([t for _, t in TRAIN], vocab_size=12, alpha=0.1)
    assert lm.v == v
    assert set(rows) == {i for i, _ in CRAWL}
    for i, t in CRAWL:
        n, avg, ppl = _py_score(t, vocab, big, ctx, v, 0.1)
        r = rows[i]
        assert r.n_bigrams == n, (i, t)
        if avg is None:
            assert r.avg_nll is None and r.ppl is None
        else:
            assert r.avg_nll == pytest.approx(avg, rel=1e-9)
            assert r.ppl == pytest.approx(ppl, rel=1e-9)


def test_quality_ordering_and_filter(spark, scored):
    lm, rows = scored
    # out-of-model gibberish scores far worse than in-domain prose
    assert rows[3].ppl > 3.0 * rows[8].ppl
    # "the the the ...": the (the, the) bigram never occurs in trusted
    # prose, and "the" is a high-frequency context — the smoothed floor
    # alpha/(c1+alpha·V) is tiny, so degenerate repetition scores WORSE
    # than gibberish whose <unk> context was never seen at all
    assert rows[4].ppl > rows[3].ppl > rows[9].ppl

    crawl = spark.createDataFrame(CRAWL, ["doc_id", "text"])
    cut = rows[8].ppl * 1.5
    kept = {r.doc_id for r in lmfilter.perplexity_filter(crawl, lm, cut).collect()}
    assert 3 not in kept  # gibberish dropped
    assert 8 in kept and 9 in kept
    assert 6 not in kept and 7 not in kept  # unscorable docs dropped


def test_unseen_bigram_floor(spark):
    """A bigram whose context was never seen in training hits the exact
    alpha/(alpha*V) floor — the sparse-model backoff row-free path."""
    train = spark.createDataFrame([(0, "a b a b a c")], ["doc_id", "text"])
    lm = lmfilter.train_bigram_lm(train, vocab_size=10, alpha=0.5)
    v = lm.v
    test = spark.createDataFrame([(1, "zz qq")], ["doc_id", "text"])
    r = lmfilter.perplexity(test, lm).collect()[0]
    # zz,qq both OOV -> (<unk>,<unk>); <unk> never a context in training
    want = -math.log(0.5 / (0 + 0.5 * v))
    assert r.avg_nll == pytest.approx(want, rel=1e-12)

"""U3 CRF decode: numpy Viterbi/likelihood vs brute-force enumeration
(the ground-truth oracle over ALL tag paths), plus the tagger hook."""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgce.crf import CRFParams, log_likelihood, log_normalizer, sequence_score, viterbi_decode


def _params(rng, n):
    return CRFParams(
        rng.uniform(-1, 1, (n, n)), rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    )


def _brute_best(e, params):
    T, n = e.shape
    best, best_s = None, -np.inf
    for tags in itertools.product(range(n), repeat=T):
        s = sequence_score(e, list(tags), params)
        if s > best_s:
            best, best_s = list(tags), s
    return best, best_s


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 5), st.integers(2, 4))
def test_viterbi_matches_brute_force(seed, T, n):
    rng = np.random.default_rng(seed)
    params = _params(rng, n)
    e = rng.uniform(-2, 2, (T, n))
    got = viterbi_decode(e, params)
    best, best_s = _brute_best(e, params)
    # the decoded path must achieve the optimal score (ties allowed)
    assert sequence_score(e, got, params) == pytest.approx(best_s)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10**6))
def test_normalizer_is_logsumexp_over_all_paths(seed):
    rng = np.random.default_rng(seed)
    T, n = 4, 3
    params = _params(rng, n)
    e = rng.uniform(-2, 2, (T, n))
    scores = [
        sequence_score(e, list(tags), params)
        for tags in itertools.product(range(n), repeat=T)
    ]
    m = max(scores)
    expect = m + np.log(sum(np.exp(s - m) for s in scores))
    assert log_normalizer(e, params) == pytest.approx(expect)
    # likelihoods over all paths sum to 1
    total = sum(np.exp(log_likelihood(e, list(tags), params))
                for tags in itertools.product(range(n), repeat=T))
    assert total == pytest.approx(1.0)


def test_crf_prefers_transition_consistent_path():
    """Emissions argmax says B-x I-x? No — forbidden transition is
    out-scored: the CRF flips the second tag, argmax would not."""
    # tags: 0=O, 1=B, 2=I ; make O->I impossible, B->I great
    trans = np.full((3, 3), 0.0)
    trans[0, 2] = -100.0  # O -> I forbidden
    trans[1, 2] = 2.0
    params = CRFParams(trans, np.zeros(3), np.zeros(3))
    e = np.array([[1.0, 0.0, 0.9], [0.0, 0.0, 0.8]])  # argmax: [O, I]
    assert list(np.argmax(e, -1)) == [0, 2]
    assert viterbi_decode(e, params) != [0, 2]


def test_tagger_decode_hook_uses_crf(tmp_path):
    """HFModelTagger._decode_ids: argmax vs CRF paths diverge exactly when
    transitions forbid the argmax path; .npz round-trip included."""
    from kgce.hf import HFModelTagger

    trans = np.zeros((3, 3))
    trans[0, 2] = -100.0
    path = tmp_path / "crf.npz"
    np.savez(path, transitions=trans, start_transitions=np.zeros(3),
             end_transitions=np.zeros(3))
    logits = np.array([[[1.0, 0.0, 0.9], [0.0, 0.0, 0.8]]])
    attn = np.array([[1, 1]])
    plain = HFModelTagger("unused")._decode_ids(logits, attn)
    crf = HFModelTagger("unused", crf_params=str(path))._decode_ids(logits, attn)
    assert plain.tolist() == [[0, 2]]
    assert crf.tolist() != plain.tolist()

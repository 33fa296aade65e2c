"""HF integration plumbing (U1/U2), runnable without torch/transformers.

A fake tokenizer/tagger implementing the exact HF surface the adapters
consume proves the wiring (featurize slots, batched tagging path); the
tests that need the real libraries importorskip them (they SKIP in this
sandbox rather than stubbing)."""

import pytest

from kgce import featurize, schemas, synth, tagging
from kgce.hf import HFTokenizerAdapter, MissingDependencyError
from kgce.testing import FakeBatchTagger, FakeHFTokenizer


@pytest.fixture(scope="module")
def adapter():
    return HFTokenizerAdapter(FakeHFTokenizer())


TOKENS = ["Intercontinental", "flights", "from", "Amsterdam"]
LABELS = ["B-loc", "O", "O", "B-loc"]
L2I = featurize.build_label2idx(["loc"])


@pytest.mark.parametrize("use_adapter", [False, True])
def test_featurize_sentence_both_tokenizers(adapter, use_adapter):
    """Chunk/guard/label invariants hold for mock AND adapter tokenizers."""
    kw = (
        dict(
            subword_fn=adapter.subword_fn,
            vocab_fn=adapter.vocab_fn,
            specials=adapter.specials,
            unk=adapter.unk,
        )
        if use_adapter
        else {}
    )
    feats = featurize.featurize_sentence(TOKENS, LABELS, L2I, max_seq_len=16, **kw)
    assert len(feats) >= 1
    specials = adapter.specials if use_adapter else (featurize.CLS, featurize.SEP, featurize.PAD)
    seen_words = []
    for f in feats:
        assert len(f["input_tokens"]) == len(f["input_ids"]) == 16
        assert f["input_tokens"][0] == specials[0]
        # every non-pad row ends with SEP before padding
        body_len = sum(f["attention_mask"])
        assert f["input_tokens"][body_len - 1] == specials[1]
        assert all(t == specials[2] for t in f["input_tokens"][body_len:])
        # first piece of each word carries the word label, rest are X
        prev_g = 0
        for tok, lab_id, g in zip(f["input_tokens"], f["label_ids"], f["guards"]):
            if g == 0:
                continue
            if g != prev_g:
                seen_words.append(g)
                assert lab_id == L2I[LABELS[g - 1]]
                prev_g = g
            else:
                assert lab_id == L2I["X"]
        # a chunk never splits a word: guard at chunk end != guard at next chunk start
    # all words covered exactly once, in order
    assert seen_words == [1, 2, 3, 4]


@pytest.mark.parametrize("use_adapter", [False, True])
def test_featurize_restitch_roundtrip(spark, adapter, use_adapter):
    """featurize -> restitch recovers exactly the input labels for both
    tokenizers (A9/W5 under real subword splits)."""
    loader = (lambda: adapter) if use_adapter else None
    df = spark.createDataFrame(
        [("u1", 0, TOKENS, LABELS), ("u2", 0, ["short", "ok"], ["O", "B-loc"])],
        "url string, sent_id long, tokens array<string>, labels array<string>",
    )
    feats = featurize.featurize(df, L2I, max_seq_len=16, tokenizer_loader=loader)
    i2l = {v: k for k, v in L2I.items()}
    got = {
        r.url: list(r.labels)
        for r in featurize.restitch_word_labels(feats, i2l).collect()
    }
    assert got == {"u1": LABELS, "u2": ["O", "B-loc"]}


def test_model_tagger_construction_is_torch_free(monkeypatch):
    """get_tagger('model') must build without torch (only the dir is
    pickled into UDF closures); the import gate trips on first CALL."""
    t = tagging.get_tagger("model", model_dir="/nonexistent/model")
    with pytest.raises(MissingDependencyError):
        t(["Hello", "world"])
    with pytest.raises(ValueError):
        tagging.get_tagger("model")  # no model_dir and no $KGCE_MODEL_DIR


def test_batched_tagger_plumbing_matches_per_sentence(spark):
    """extract_mentions via tag_batch == extract_mentions via per-sentence
    calls, proving the batching path is semantics-neutral."""
    pages = spark.createDataFrame(synth.gen_pages(30, seed=7), schema=schemas.PAGES)
    cols = ["url", "sent_id", "mention_id", "text", "start", "end", "type"]
    batched = sorted(
        map(tuple, tagging.extract_mentions(pages, tagger=FakeBatchTagger()).select(cols).collect())
    )
    plain = sorted(map(tuple, tagging.extract_mentions(pages).select(cols).collect()))
    assert batched == plain and len(batched) > 0


def test_fused_pairs_accept_callable_tagger(spark):
    pages = spark.createDataFrame(synth.gen_pages(10, seed=3), schema=schemas.PAGES)
    a = tagging.extract_pairs_fused(pages, tagger=FakeBatchTagger())
    b = tagging.extract_pairs_fused(pages)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_real_hf_tokenizer_roundtrip(spark):
    """Real-transformers path — SKIPS without the library installed."""
    pytest.importorskip("transformers")
    from kgce.hf import hf_tokenizer_loader

    loader = hf_tokenizer_loader("bert-base-uncased")
    df = spark.createDataFrame(
        [("u1", 0, TOKENS, LABELS)],
        "url string, sent_id long, tokens array<string>, labels array<string>",
    )
    feats = featurize.featurize(df, L2I, max_seq_len=32, tokenizer_loader=loader)
    i2l = {v: k for k, v in L2I.items()}
    got = featurize.restitch_word_labels(feats, i2l).collect()
    assert list(got[0].labels) == LABELS


def test_real_hf_model_tagger_interface():
    """Real-torch inference path — SKIPS without torch installed."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import os

    model_dir = os.environ.get("KGCE_MODEL_DIR")
    if not model_dir:
        pytest.skip("no $KGCE_MODEL_DIR checkpoint available")
    t = tagging.get_tagger("model", model_dir=model_dir)
    labels = t(["Barack", "Obama", "visited", "Paris"])
    assert len(labels) == 4 and all(isinstance(l, str) for l in labels)


def test_first_piece_labels_alignment():
    """The word_ids walk must survive zero-piece words and truncation
    without shifting later labels (torch-free: pure-Python walk)."""
    from kgce.hf import first_piece_labels

    id2label = {0: "O", 1: "B-per", 2: "I-per"}
    # sentence of 4 words; word 1 produced ZERO pieces; word 3 truncated
    word_ids = [None, 0, 0, 2, None]  # CLS, w0 (2 pieces), w2, SEP
    pred_row = [9, 1, 2, 1, 9]
    got = first_piece_labels(word_ids, pred_row, id2label, n_words=4)
    assert got == ["B-per", "O", "B-per", "O"]
    # contiguous normal case: first piece wins, later pieces ignored
    got = first_piece_labels([None, 0, 1, 1, None], [9, 1, 2, 1, 9], id2label, 2)
    assert got == ["B-per", "I-per"]

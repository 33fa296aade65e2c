"""U1 featurization: fixed-width invariants + chunk/restitch round-trip
(the reference's hardest correctness trap, SURVEY.md §7 'hard parts')."""

from kgce import featurize, synth, tagging
from kgce.featurize import build_label2idx, featurize_sentence, mock_subwords


def test_label2idx_invariant():
    l2i = build_label2idx(["per", "loc", "org", "misc"])
    assert all(l2i[c] < l2i["O"] for c in ("PAD", "CLS", "X"))
    assert l2i["B-loc"] < l2i["I-loc"] < l2i["B-misc"]  # sorted by type


def test_fixed_width_and_guards():
    l2i = build_label2idx(["per"])
    toks = ["internationalization", "is", "big"]
    labs = ["B-per", "O", "O"]
    feats = featurize_sentence(toks, labs, l2i, max_seq_len=16)
    assert len(feats) == 1
    f = feats[0]
    for k in ("input_tokens", "input_ids", "attention_mask", "token_type_ids", "label_ids", "guards"):
        assert len(f[k]) == 16
    # word 0 -> 5 pieces; first keeps B-per, rest X; guards repeat word idx+1
    assert f["input_tokens"][0] == "[CLS]" and f["guards"][0] == 0
    assert f["input_tokens"][1:6] == ["inte", "##rnat", "##iona", "##liza", "##tion"]
    assert f["label_ids"][1] == l2i["B-per"]
    assert all(f["label_ids"][i] == l2i["X"] for i in range(2, 6))
    assert f["guards"][1:6] == [1] * 5


def test_chunking_never_splits_words():
    l2i = build_label2idx(["per"])
    toks = [f"verylongword{i}" for i in range(40)]  # 4 pieces each
    labs = ["B-per" if i % 3 == 0 else "O" for i in range(40)]
    feats = featurize_sentence(toks, labs, l2i, max_seq_len=32)
    assert len(feats) > 1
    seen_guards = []
    for f in feats:
        gs = [g for g in f["guards"] if g != 0]
        seen_guards.extend(gs)
        # within a chunk, a word's pieces are contiguous and complete
        for g in set(gs):
            assert gs.count(g) == len(mock_subwords(f"verylongword{g-1}"))
    # all words present exactly once across chunks, in order
    assert sorted(set(seen_guards)) == list(range(1, 41))


def test_restitch_round_trip(spark):
    """features -> restitch == original labels, for every sentence,
    including >max_seq_len sentences that force multi-chunk."""
    pages = spark.createDataFrame(
        synth.gen_pages(25, seed=41, long_frac=0.4), schema=__import__("kgce.schemas", fromlist=["PAGES"]).PAGES
    )
    tagged = tagging.tag_sentences(tagging.extract_sentences(pages))
    l2i = build_label2idx(["per", "loc", "org", "misc"])
    i2l = {v: k for k, v in l2i.items()}
    feats = featurize.featurize(tagged, l2i, max_seq_len=32)
    assert feats.filter("chunk_id > 0").count() > 0  # long sentences chunked
    stitched = featurize.restitch_word_labels(feats, i2l)
    got = {(r.url, r.sent_id): list(r.labels) for r in stitched.collect()}
    want = {(r.url, r.sent_id): list(r.labels) for r in tagged.collect()}
    assert got == want


def test_model_inputs_per_family(spark):
    import pytest as _pytest

    from kgce import featurize as fz

    df = spark.createDataFrame(
        [("u", 0, 0, [1], [1], [0], [0], [1])],
        "url string, sent_id long, chunk_id int, input_ids array<int>, "
        "attention_mask array<int>, token_type_ids array<int>, "
        "label_ids array<int>, guards array<int>",
    )
    bert = fz.model_inputs(df, "bert")
    assert "token_type_ids" in bert.columns
    rob = fz.model_inputs(df, "roberta")
    assert "token_type_ids" not in rob.columns
    assert "input_ids" in rob.columns and "attention_mask" in rob.columns
    with _pytest.raises(RuntimeError):
        fz.model_inputs(df, "gpt-7")


def test_xlnet_dialect_prepad_layout():
    """XLNet dialect (reference data_utils.py:192-231): continuation
    pieces keep the word label, 4-token end frame, PRE-padding, segment
    ids 3/0/2."""
    from kgce import featurize as fz

    l2i = fz.build_label2idx(["loc"])
    toks, labs = ["Amsterdam", "calling"], ["B-loc", "O"]
    feats = fz.featurize_sentence(toks, labs, l2i, max_seq_len=16, dialect="xlnet")
    assert len(feats) == 1
    f = feats[0]
    # pre-padding: mask starts with 0s, ends with 1s
    n_pad = f["attention_mask"].count(0)
    assert f["attention_mask"] == [0] * n_pad + [1] * (16 - n_pad)
    assert f["input_tokens"][:n_pad] == ["[PAD]"] * n_pad
    assert f["input_tokens"][n_pad] == "<s>"
    assert f["input_tokens"][-3:] == ["</s>", "[SEP]", "[CLS]"]
    assert f["token_type_ids"] == [3] * n_pad + [0] * (16 - n_pad - 1) + [2]
    # continuation pieces carry the word label (not X)
    body = f["label_ids"][n_pad + 1 : -3]
    word1_guard = [g for g in f["guards"] if g == 1]
    assert len(word1_guard) >= 2  # 'Amsterdam' splits under the mock tokenizer
    assert all(
        lab == l2i["B-loc"]
        for lab, g in zip(body, f["guards"][n_pad + 1 : -3])
        if g == 1
    )
    # restitch-compatible: first-piece-per-guard recovers the word labels
    firsts = []
    prev = 0
    for lab, g, mk in zip(f["label_ids"], f["guards"], f["attention_mask"]):
        if mk and g and g != prev:
            firsts.append(lab)
            prev = g
    assert firsts == [l2i["B-loc"], l2i["O"]]


def test_xlnet_dialect_chunking_reserves_four():
    from kgce import featurize as fz

    l2i = fz.build_label2idx(["loc"])
    toks = ["w%d" % i for i in range(30)]
    labs = ["O"] * 30
    feats = fz.featurize_sentence(toks, labs, l2i, max_seq_len=16, dialect="xlnet")
    for f in feats:
        assert len(f["input_tokens"]) == 16
        assert sum(f["attention_mask"]) <= 16
    # every word appears exactly once across chunks
    seen = [g for f in feats for g in f["guards"] if g]
    assert sorted(set(seen)) == list(range(1, 31))

"""Oracle self-tests: golden numbers extracted from the reference.

The golden example is the reference eval's own in-memory self-test
(/root/reference/src/eval_scripts/new_bio_eval.py:381-385); the expected
counts below were produced by running that code.  fix_bio /
decode_spans_converter / evaluate_bio were each verified against the
reference implementations on thousands of random adversarial sequences
during development (0 mismatches).
"""

from kgce import oracle


def test_golden_eval_example():
    gold = [["O", "O", "B-misc", "O", "O", "B-misc", "I-misc", "I-misc", "I-misc", "I-misc", "O"]]
    pred = [["O", "O", "B-misc", "O", "O", "B-misc", "I-misc", "O", "O", "B-misc", "O"]]
    c = oracle.evaluate_bio(gold, pred)
    assert c.acc_true == 8 and c.acc_total == 11
    assert c.gold_total == 2
    # strict: 1 TP (first B-misc), 1 FP; relax: 2 TP, 0 FP; the third pred
    # span (B-misc at 9) is silently skipped by one-credit dedup.
    assert c.overall(c.strict_tp) == 1 and c.overall(c.strict_fp) == 1
    assert c.overall(c.relax_tp) == 2 and c.overall(c.relax_fp) == 0


def test_fix_bio_branches():
    # leading I-, I after O, I after different type, chains through fixed prev
    assert oracle.fix_bio(["I-x"]) == ["B-x"]
    assert oracle.fix_bio(["O", "I-x", "I-x", "O"]) == ["O", "B-x", "I-x", "O"]
    assert oracle.fix_bio(["B-x", "I-y"]) == ["B-x", "B-y"]
    assert oracle.fix_bio(["I-x", "I-y", "I-y"]) == ["B-x", "B-y", "I-y"]
    assert oracle.fix_bio(["B-x", "I-x", "I-x"]) == ["B-x", "I-x", "I-x"]
    assert oracle.fix_bio(["O", "O"]) == ["O", "O"]


def test_decode_spans_converter_modes():
    toks = ["a", "b", "c", "d"]
    offs = [(0, 1), (2, 3), (4, 5), (6, 7)]
    # B I same type extends; I different type opens new span; trailing flush
    spans = oracle.decode_spans_converter(toks, offs, ["B-x", "I-x", "I-y", "O"])
    assert [(s.etype, s.char_s, s.char_e, s.text) for s in spans] == [
        ("x", 0, 3, "a b"),
        ("y", 4, 5, "c"),
    ]
    # orphan I- opens a span (reference does NOT raise here)
    spans = oracle.decode_spans_converter(toks, offs, ["O", "I-x", "O", "B-y"])
    assert [(s.etype, s.text, s.starts_b) for s in spans] == [("x", "b", False), ("y", "d", True)]
    # adjacent B- of same type are two spans
    spans = oracle.decode_spans_converter(toks, offs, ["B-x", "B-x", "O", "O"])
    assert len(spans) == 2


def test_decode_spans_eval_orphan_opens():
    # eval-side scan opens a span on ANY non-O label
    spans = oracle.decode_spans_eval(["o", "i-x", "i-x", "b-x", "o"])
    assert [(s.etype, s.tok_s, s.tok_e, s.starts_b) for s in spans] == [
        ("x", 1, 3, False),
        ("x", 3, 4, True),
    ]


def test_one_credit_dedup_touching_overlap():
    # two non-strict preds overlap one gold: first credits relax-TP,
    # second is skipped entirely (neither TP nor FP)
    gold = [["O", "B-x", "I-x", "I-x", "I-x", "O"]]
    pred = [["O", "B-x", "O", "B-x", "I-x", "O"]]
    c = oracle.evaluate_bio(gold, pred)
    assert c.overall(c.relax_tp) == 1
    assert c.overall(c.strict_fp) == 1  # only the first pred counted
    assert c.overall(c.relax_fp) == 0


def test_sentence_split_offsets_are_byte_exact():
    text = "Alice met Bob. Then they left!  A new day\n\nAnother paragraph here."
    spans = oracle.split_sentences(text)
    assert [text[s:e] for s, e in spans] == [
        "Alice met Bob.",
        "Then they left!",
        "A new day",
        "Another paragraph here.",
    ]


def test_rule_tagger_runs():
    toks = "Alice met Bob in Geneva yesterday".split()
    labs = oracle.rule_tag_sentence(toks)
    assert labs == ["B-per", "O", "B-per", "O", "B-loc", "O"]
    # adjacent entity tokens form ONE run typed by the first token
    labs = oracle.rule_tag_sentence(["Alice", "Geneva", "x"])
    assert labs == ["B-per", "I-per", "O"]


def test_page_triples_deterministic():
    text = "Alice met Bob in Geneva today. Nokia hired Carol now."
    trips = oracle.page_triples(text)
    keys = {(t["subj_text"], t["pred"], t["obj_text"]) for t in trips}
    assert ("Alice", "rel:per_per", "Bob") in keys
    assert ("Alice", "rel:per_loc", "Geneva") in keys
    assert ("Nokia", "rel:org_per", "Carol") in keys
    assert oracle.page_triples(text) == trips  # deterministic

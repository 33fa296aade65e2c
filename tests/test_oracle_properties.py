"""Property-based tests (hypothesis) over the pure-Python oracle —
fast, no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgce import oracle

TYPES = ["per", "loc", "org", "misc"]
label = st.one_of(
    st.just("O"),
    st.sampled_from(TYPES).map(lambda t: "B-" + t),
    st.sampled_from(TYPES).map(lambda t: "I-" + t),
)
labels = st.lists(label, min_size=1, max_size=30)


@given(labels)
@settings(max_examples=300, deadline=None)
def test_fix_bio_output_is_legal_and_idempotent(labs):
    fixed = oracle.fix_bio(labs)
    # legality: no I- without a same-typed B-/I- immediately before
    prev = "O"
    for lab in fixed:
        if lab.startswith("I-"):
            assert prev != "O" and prev.split("-")[-1] == lab.split("-")[-1]
        prev = lab
    # idempotence + type/O-ness preservation
    assert oracle.fix_bio(fixed) == fixed
    for a, b in zip(labs, fixed):
        assert (a == "O") == (b == "O")
        if a != "O":
            assert a.split("-")[-1] == b.split("-")[-1]


@given(labels)
@settings(max_examples=300, deadline=None)
def test_decode_spans_partition_tokens(labs):
    n = len(labs)
    toks = [f"w{i}" for i in range(n)]
    offs = [(i * 2, i * 2 + 1) for i in range(n)]
    spans = oracle.decode_spans_converter(toks, offs, labs)
    # spans are disjoint, ordered, and cover exactly the non-O positions
    covered = []
    for sp in spans:
        covered.extend(range(sp.tok_s, sp.tok_e))
    assert covered == sorted(covered) and len(covered) == len(set(covered))
    assert set(covered) == {i for i, l in enumerate(labs) if l != "O"}
    # span text is the space-joined tokens of its range
    for sp in spans:
        assert sp.text == " ".join(toks[sp.tok_s : sp.tok_e])


@given(labels, labels)
@settings(max_examples=200, deadline=None)
def test_eval_counts_are_consistent(gold, pred):
    n = min(len(gold), len(pred))
    gold, pred = gold[:n], pred[:n]
    c = oracle.evaluate_bio([gold], [pred])
    g_spans = oracle.decode_spans_eval([x.lower() for x in gold])
    p_spans = oracle.decode_spans_eval([x.lower() for x in pred])
    assert c.gold_total == len(g_spans)
    # every pred span is strict-TP, relax-only-TP, FP, or silently skipped
    counted = (
        c.overall(c.strict_tp) + c.overall(c.strict_fp)
    )
    assert counted <= len(p_spans)
    # relax TP >= strict TP; relax FP <= strict FP
    assert c.overall(c.relax_tp) >= c.overall(c.strict_tp)
    assert c.overall(c.relax_fp) <= c.overall(c.strict_fp)
    # accuracy bounds
    assert 0 <= c.acc_true <= c.acc_total == n


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_sentence_split_preserves_bytes(text):
    spans = oracle.split_sentences(text)
    prev_end = 0
    for s, e in spans:
        assert 0 <= s < e <= len(text)
        assert s >= prev_end
        prev_end = e
        seg = text[s:e]
        assert seg == seg.strip()  # no leading/trailing whitespace
    # every non-space char is inside exactly one sentence
    covered = set()
    for s, e in spans:
        covered.update(range(s, e))
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert i in covered

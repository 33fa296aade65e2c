"""Pure-Python oracle for the reference semantics.

This module re-implements, in plain Python, exactly WHAT the reference
computes — it is the ground truth every Spark operator is tested against
(SURVEY.md §5.1).  Semantics are derived from:

* BIO repair       — /root/reference/src/transformer_ner/task.py:467-491
* span decode      — /root/reference/src/common_utils/output_format_converter.py:156-191
* eval span scan   — /root/reference/src/common_utils/bio_prf_eval.py:237-263
* strict match     — bio_prf_eval.py:192-204
* relax match      — bio_prf_eval.py:206-214
* one-credit dedup — bio_prf_eval.py:216-226 (NB: "touching" intervals count
  as overlapping there: the check is ``not (e < start or s > end)`` on
  end-EXCLUSIVE spans, and gold spans are consumed in left-to-right
  insertion order; strict matches do NOT consume gold credit)

The code is an independent implementation of those semantics, not a copy.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# BIO repair (reference __fix_bio, task.py:467-491)
# --------------------------------------------------------------------------


def fix_bio(labels: list[str]) -> list[str]:
    """Repair illegal BIO transitions.

    Rules (prev is the *repaired* previous label, so chains propagate):
      * a leading ``I-x``                      -> ``B-x``
      * ``I-x`` after ``O``                    -> ``B-x``
      * ``I-x`` after a ``y``-typed label      -> ``B-x``
      * everything else unchanged.
    """
    out: list[str] = []
    prev: str | None = None
    for lab in labels:
        if lab.startswith("I-"):
            etype = lab.split("-")[-1]
            if prev is None or prev == "O" or prev.split("-")[-1] != etype:
                prev = "B-" + etype
            else:
                prev = lab
        else:
            prev = lab
        out.append(prev)
    return out


# --------------------------------------------------------------------------
# Span decode
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Span:
    """A decoded entity span over sentence token positions [tok_s, tok_e)."""

    etype: str
    tok_s: int
    tok_e: int
    char_s: int = -1  # char offset of first token start (converter mode)
    char_e: int = -1  # char offset of last token end
    text: str = ""  # " "-joined token text (converter mode)
    starts_b: bool = True  # whether the first label was B- (eval strict needs it)


def decode_spans_converter(
    tokens: list[str],
    char_offsets: list[tuple[int, int]],
    labels: list[str],
) -> list[Span]:
    """tag2entity semantics (output_format_converter.py:156-191).

    ``B-`` opens a span; ``I-`` of the same type extends; ``I-`` of a
    different type (or after ``O``) closes any open span and OPENS a new
    one at that token; ``O`` closes.  Trailing open span is flushed.
    Raises on a boundary letter other than B/I.
    """
    spans: list[Span] = []
    cur_toks: list[str] = []
    cur_s = cur_e = -1
    cur_tok_s = -1
    cur_type: str | None = None
    cur_starts_b = True
    prev = "O"

    def flush(tok_e: int) -> None:
        nonlocal cur_toks, cur_s, cur_e, cur_type, cur_tok_s
        if cur_toks:
            spans.append(
                Span(cur_type, cur_tok_s, tok_e, cur_s, cur_e, " ".join(cur_toks), cur_starts_b)
            )
        cur_toks, cur_s, cur_e, cur_type, cur_tok_s = [], -1, -1, None, -1

    for j, (tok, (w_s, w_e), lab) in enumerate(zip(tokens, char_offsets, labels)):
        if lab == "O":
            if prev != "O":
                flush(j)
        else:
            boundary, etype = lab.split("-", 1)
            if boundary == "B":
                if prev != "O":
                    flush(j)
                cur_toks, cur_s, cur_e, cur_type = [tok], w_s, w_e, etype
                cur_tok_s, cur_starts_b = j, True
            elif boundary == "I":
                if cur_type == etype:
                    cur_toks.append(tok)
                    cur_e = w_e
                else:
                    if prev != "O":
                        flush(j)
                    cur_toks, cur_s, cur_e, cur_type = [tok], w_s, w_e, etype
                    cur_tok_s, cur_starts_b = j, False
            else:
                raise ValueError(f"BIO scheme supports B/I but got {lab}")
        prev = lab
    flush(len(tokens))
    return spans


def decode_spans_eval(
    labels: list[str], excluded: frozenset[str] = frozenset({"o"})
) -> list[Span]:
    """Eval-side span scan (bio_prf_eval.py:237-263), on lowercased labels.

    ANY non-excluded label opens a span (even ``i-x``); the span extends
    only while the following label is exactly ``i-{cate}``.
    """
    spans: list[Span] = []
    n = len(labels)
    i = 0
    while i < n:
        lab = labels[i].strip()
        if lab in excluded:
            i += 1
            continue
        cate = lab.split("-")[-1]
        starts_b = lab.startswith("b-")
        j = i + 1
        while j < n and labels[j].strip() == f"i-{cate}":
            j += 1
        spans.append(Span(cate, i, j, starts_b=starts_b))
        i = j
    return spans


# --------------------------------------------------------------------------
# Strict / relax span evaluation with one-credit dedup
# --------------------------------------------------------------------------


@dataclass
class EvalCounts:
    acc_true: int = 0
    acc_total: int = 0
    gold_total: int = 0
    gold_cat: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    strict_tp: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    strict_fp: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    relax_tp: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    relax_fp: dict[str, int] = field(default_factory=lambda: defaultdict(int))

    def overall(self, d: dict[str, int]) -> int:
        return sum(d.values())

    def prf(self, tp: int, fp: int, gold: int, beta: float = 1.0) -> tuple[float, float, float]:
        pre = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        rec = tp / gold if gold > 0 else 0.0
        b2 = beta * beta
        f = (1 + b2) * pre * rec / (b2 * pre + rec) if (pre + rec) > 0 else 0.0
        return pre, rec, f


def eval_sentence(
    gold: list[str],
    pred: list[str],
    counts: EvalCounts,
    excluded: frozenset[str] = frozenset({"o"}),
) -> None:
    """Score one sentence, mutating ``counts``; labels must be lowercase."""
    for g, p in zip(gold, pred):
        counts.acc_total += 1
        if g == p:
            counts.acc_true += 1

    gold_spans = decode_spans_eval(gold, excluded)
    credit: dict[tuple[str, int, int], int] = {}
    for gs in gold_spans:
        counts.gold_total += 1
        counts.gold_cat[gs.etype] += 1
        credit[(gs.etype, gs.tok_s, gs.tok_e)] = credit.get((gs.etype, gs.tok_s, gs.tok_e), 0) + 1

    def strict_ok(ps: Span) -> bool:
        # gold must not continue past the predicted end
        if ps.tok_e < len(gold) and gold[ps.tok_e] == f"i-{ps.etype}":
            return False
        if gold[ps.tok_s] != f"b-{ps.etype}" or pred[ps.tok_s] != f"b-{ps.etype}":
            return False
        return all(gold[k] == pred[k] for k in range(ps.tok_s, ps.tok_e))

    def relax_ok(ps: Span) -> bool:
        for k in range(ps.tok_s, ps.tok_e):
            g_cate = gold[k].split("-")[-1]
            p_cate = pred[k].split("-")[-1]
            if g_cate == p_cate == ps.etype:
                return True
        return False

    def consume_credit(ps: Span) -> bool:
        """True => this prediction is silently skipped (gold already used).

        Insertion order = gold left-to-right; 'touching' counts as overlap
        because the reference compares an exclusive end with ``<``.
        """
        for (cate, s, e), v in credit.items():
            if cate == ps.etype and not (e < ps.tok_s or s > ps.tok_e):
                if v == 0:
                    return True
                credit[(cate, s, e)] = v - 1
                return False
        return False

    for ps in decode_spans_eval(pred, excluded):
        if strict_ok(ps):
            counts.strict_tp[ps.etype] += 1
            counts.relax_tp[ps.etype] += 1
        elif relax_ok(ps):
            if consume_credit(ps):
                continue  # skipped entirely — neither TP nor FP
            counts.strict_fp[ps.etype] += 1
            counts.relax_tp[ps.etype] += 1
        else:
            counts.strict_fp[ps.etype] += 1
            counts.relax_fp[ps.etype] += 1


def evaluate_bio(
    gold_sents: list[list[str]],
    pred_sents: list[list[str]],
    excluded: frozenset[str] = frozenset({"o"}),
) -> EvalCounts:
    """Corpus-level eval; lowercases labels like the reference file loader."""
    counts = EvalCounts()
    assert len(gold_sents) == len(pred_sents)
    for g, p in zip(gold_sents, pred_sents):
        assert len(g) == len(p)
        eval_sentence([x.lower() for x in g], [x.lower() for x in p], counts, excluded)
    return counts


# --------------------------------------------------------------------------
# Deterministic sentence splitting + tokenization (U10)
# --------------------------------------------------------------------------

_SENT_BREAK = re.compile(r"(?<=[.!?])\s+|\n{2,}")
_TOKEN = re.compile(r"\S+")


def split_sentences(text: str) -> list[tuple[int, int]]:
    """Deterministic sentence boundaries as (start, end) char offsets.

    Pure function of ``text`` so the Spark UDF and this oracle agree
    byte-for-byte (per-row invariant, BASELINE.json:15).
    """
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BREAK.finditer(text):
        if m.start() > start:
            spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    # trim whitespace-only heads/tails without losing absolute offsets
    out = []
    for s, e in spans:
        seg = text[s:e]
        l = len(seg) - len(seg.lstrip())
        r = len(seg) - len(seg.rstrip())
        if s + l < e - r:
            out.append((s + l, e - r))
    return out


def tokenize(text: str, base: int = 0) -> list[tuple[str, int, int]]:
    """Whitespace tokens with absolute char offsets (token, start, end)."""
    return [(m.group(0), base + m.start(), base + m.end()) for m in _TOKEN.finditer(text)]


# --------------------------------------------------------------------------
# Deterministic rule tagger (mock U2) — SQL-expressible on purpose
# --------------------------------------------------------------------------

_CAP = re.compile(r"^[A-Z][a-zA-Z]*$")

# Edge punctuation stripped before a token is classified / surfaced as a
# mention.  ASCII-only on purpose: Python str.strip, Java regex and RE2
# (DuckDB) all agree on this class, keeping the three tagger twins exact
# (kgce.functions.core_token / kgce.operators.ruletag.CORE_TOK_SQL).
# Without this, sentence-final entities ("Geneva.") are never tagged.
EDGE_PUNCT = ".,;:!?\"'()[]{}<>"
_EDGE_SET = frozenset(EDGE_PUNCT)  # O(1) membership for the fast path


def strip_edge_punct(token: str) -> str:
    """Token core: leading/trailing EDGE_PUNCT chars removed."""
    return token.strip(EDGE_PUNCT)


def core_token_offsets(tok: str, s: int, e: int) -> tuple[str, int, int]:
    """(core, start, end) for the mention surface form.

    Pure-punctuation tokens keep their original form/offsets (they are
    never entities, so the surface never reaches a mention anyway).
    Fast path first: the overwhelming majority of crawl tokens carry no
    edge punctuation at all, and this runs per token inside the tagging
    UDF (a profiled ~20% of the Python stage before the guard).
    """
    if not tok or (tok[0] not in _EDGE_SET and tok[-1] not in _EDGE_SET):
        return tok, s, e
    core = tok.strip(EDGE_PUNCT)
    if not core:
        return tok, s, e
    lead = len(tok) - len(tok.lstrip(EDGE_PUNCT))
    return core, s + lead, s + lead + len(core)

# fixed lowercase lexicon so the tagger also fires on all-lowercase
# corpora (e.g. the driver's synthetic `documents` table); disjoint from
# kgce.synth's filler vocabulary by construction
RULE_LEXICON = frozenset(
    ["customer", "data", "join", "key", "merge", "query", "spark", "table", "vector", "window"]
)


def rule_tag_token(token: str) -> str | None:
    """Entity type for a single token, or None.

    Entity tokens: capitalized alphabetic tokens OR members of
    RULE_LEXICON, judged on the EDGE_PUNCT-stripped core (so "Geneva."
    and "(Alice)" are entities).  The type is a deterministic function of
    the lowercased first letter so both the DuckDB oracle SQL and the
    Spark pipeline can express it:
    a-f -> per, g-m -> loc, n-s -> org, t-z -> misc.
    """
    if token and (token[0] in _EDGE_SET or token[-1] in _EDGE_SET):
        token = token.strip(EDGE_PUNCT)
    if not token or not (_CAP.match(token) or token in RULE_LEXICON):
        return None
    c = token[0].lower()
    if c <= "f":
        return "per"
    if c <= "m":
        return "loc"
    if c <= "s":
        return "org"
    return "misc"


def rule_tag_sentence(tokens: list[str]) -> list[str]:
    """BIO labels for a sentence under the rule tagger.

    A maximal run of entity tokens forms one mention; its type is the type
    of the run's FIRST token (so downstream span decode is deterministic).
    """
    labels: list[str] = []
    run_type: str | None = None
    for tok in tokens:
        t = rule_tag_token(tok)
        if t is None:
            labels.append("O")
            run_type = None
        elif run_type is None:
            labels.append("B-" + t)
            run_type = t
        else:
            labels.append("I-" + run_type)
    return labels


# --------------------------------------------------------------------------
# End-to-end oracle pipeline: page text -> mentions -> triples
# --------------------------------------------------------------------------


def page_mentions(text: str) -> list[dict]:
    """Mentions for one page: sentence split -> tokenize -> tag -> decode.

    The tagger sees RAW whitespace tokens (its strip is internal); the
    decoded mention surface/offsets use the EDGE_PUNCT-stripped core, so
    "Geneva." yields mention text "Geneva" with exact char offsets.
    """
    mentions = []
    for sent_id, (s, e) in enumerate(split_sentences(text)):
        toks = tokenize(text[s:e], base=s)
        if not toks:
            continue
        words = [t[0] for t in toks]
        cores = [core_token_offsets(*t) for t in toks]
        labels = fix_bio(rule_tag_sentence(words))
        for sp in decode_spans_converter(
            [c[0] for c in cores], [(c[1], c[2]) for c in cores], labels
        ):
            mentions.append(
                {
                    "sent_id": sent_id,
                    "text": sp.text,
                    "start": sp.char_s,
                    "end": sp.char_e,
                    "type": sp.etype,
                }
            )
    return mentions


def page_triples(text: str) -> list[dict]:
    """Sentence-co-occurrence triples for one page.

    Every ordered pair of mentions within a sentence (by start offset)
    yields (subj, pred, obj) with predicate ``rel:<type_subj>_<type_obj>``.
    """
    trips = []
    by_sent: dict[int, list[dict]] = defaultdict(list)
    for m in page_mentions(text):
        by_sent[m["sent_id"]].append(m)
    for sent_id, ms in by_sent.items():
        ms.sort(key=lambda m: (m["start"], m["end"]))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                trips.append(
                    {
                        "sent_id": sent_id,
                        "subj_text": ms[i]["text"],
                        "subj_type": ms[i]["type"],
                        "pred": f"rel:{ms[i]['type']}_{ms[j]['type']}",
                        "obj_text": ms[j]["text"],
                        "obj_type": ms[j]["type"],
                    }
                )
    return trips

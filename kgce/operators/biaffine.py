"""Biaffine-NER path (optional second head, SURVEY.md §2: S3/W4/J3/J8).

The reference's biaffine variant predicts a max_len × max_len span score
matrix per sentence and decodes entities as (type, s, e) index triples
(/root/reference/src/transformer_biaffine_ner/task_utils.py:22-33,
:128-137, :73-89).  Re-expressed here:

* W4 decode — numpy ``argwhere`` over the matrix INSIDE the inference
  UDF; the matrix never becomes a Spark column (SURVEY §1.1).  The model
  is stubbed with a deterministic rule (same tagger lexicon) so the
  plumbing is testable without torch; a real checkpoint drops into
  ``score_fn``.
* J3 subword-span -> char-offset mapping — a range join of predicted
  token spans against the token-offset table (the reference reads a
  pickle side-channel, output_format_converter.py:104-136; here offsets
  stayed columns all along, so it is an equi-join on (url, sent_id) +
  ``element_at`` — no pickle, no range scan).
* J8 eval — exact (url, sent_id, type, s, e) set semantics via
  ``intersect`` / ``left_anti`` (task_utils.py:78-84, T2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle

BIAFFINE_SPANS = "url string, sent_id long, type string, tok_s int, tok_e int"


def biaffine_scores(x, y, U, bias_x: bool = True, bias_y: bool = True):
    """U5: the biaffine span scorer as pure numpy — the exact tensor
    contraction of the reference layer (transformer_biaffine_ner/
    model.py:52-75: bias-augment both inputs, then
    ``einsum('xi,ioj,yj->xyo')`` per sentence).  Inference needs only the
    LEARNED tensor U, so scoring runs inside Spark Python workers with no
    torch; x/y are the start/end token representations
    (seq_len, input_dim), U is (input_dim+bias, n_types, input_dim+bias).

    Returns (seq_len, seq_len, n_types) span scores.
    """
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if bias_x:
        x = np.concatenate([x, np.ones((x.shape[0], 1))], axis=-1)
    if bias_y:
        y = np.concatenate([y, np.ones((y.shape[0], 1))], axis=-1)
    return np.einsum("xi,ioj,yj->xyo", x, np.asarray(U, dtype=np.float64), y)


def span_matrix_to_triples(span: "object") -> list[tuple[int, int, int]]:
    """W4 decode core: nonzero cells of a (len, len) type-id matrix ->
    (type_id, s, e) triples — the reference's ``np.argwhere`` walk
    (task_utils.py:22-33, _get_label_from_span; e is INCLUSIVE there)."""
    import numpy as np

    m = np.asarray(span)
    return [(int(m[s, e]), int(s), int(e)) for s, e in np.argwhere(m)]


def decode_biaffine_spans(sentences: DataFrame, max_span: int = 6) -> DataFrame:
    """W4: per-sentence span-matrix decode.

    The scorer is stubbed with a deterministic rule (span (i, j) gets a
    type id iff tokens i..j are a maximal rule-tagger entity run —
    matching the BIO path, which the parity test exploits), but the
    DECODE is the real matrix path: build the (len, len) type-id matrix,
    argwhere it back to (type, s, e) — exactly what a real checkpoint's
    argmax over :func:`biaffine_scores` feeds in.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {"url": [], "sent_id": [], "type": [], "tok_s": [], "tok_e": []}
            type_ids: dict[str, int] = {}
            id_types: dict[int, str] = {}
            for url, sid, toks in zip(pdf["url"], pdf["sent_id"], pdf["tokens"]):
                words = list(toks)
                labels = oracle.fix_bio(oracle.rule_tag_sentence(words))
                offs = [(k, k + 1) for k in range(len(words))]
                m = np.zeros((len(words), len(words)), dtype=np.int64)
                for sp in oracle.decode_spans_converter(words, offs, labels):
                    tid = type_ids.setdefault(sp.etype, len(type_ids) + 1)
                    id_types[tid] = sp.etype
                    m[sp.tok_s, sp.tok_e - 1] = tid  # reference e is inclusive
                for tid, s, e in span_matrix_to_triples(m):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["type"].append(id_types[tid])
                    rows["tok_s"].append(int(s))
                    rows["tok_e"].append(int(e) + 1)  # back to end-exclusive
            yield pd.DataFrame(rows)

    return sentences.select("url", "sent_id", "tokens").mapInPandas(
        batches, schema=BIAFFINE_SPANS
    )


def featurize_biaffine_sentence(
    tokens: list[str],
    entities: list[tuple[str, str, tuple[int, int]]],
    label2idx: dict[str, int],
    max_seq_len: int = 64,
    subword_fn=None,
    specials: tuple[str, str, str] = ("[CLS]", "[SEP]", "[PAD]"),
    vocab_fn=None,
) -> dict:
    """Training-side biaffine featurization (transformer_biaffine_ner/
    data_utils.py:210-271): subword the words keeping a word->piece
    mapping, frame CLS/SEP + pad, remap entity (text, type, (s, e))
    WORD spans (e inclusive) to PIECE spans shifted +1 for CLS, then
    build the (max_seq_len x max_seq_len) label matrix
    (``labels[s, e] = type_id``) and the row-banded attention mask
    matrix.  Matrices stay numpy — they never become Spark columns
    (SURVEY §1.1)."""
    import numpy as np

    from ..featurize import _vocab_id, mock_subwords

    subword_fn = subword_fn or mock_subwords
    vocab_fn = vocab_fn or _vocab_id
    cls_tk, sep_tk, pad_tk = specials

    pieces: list[str] = []
    sub_index: list[int] = []
    mapping: list[list[int]] = []
    for wi, w in enumerate(tokens):
        sw = subword_fn(w) or ["[UNK]"]
        mapping.append(list(range(len(pieces), len(pieces) + len(sw))))
        pieces.extend(sw)
        sub_index.extend([wi + 1] * len(sw))

    framed = [cls_tk] + pieces + [sep_tk]
    sub_index = [0] + sub_index + [0]
    mask = [1] * len(framed)
    n_pad = max_seq_len - len(framed)
    if n_pad < 0:
        raise ValueError(
            f"sentence needs {len(framed)} pieces > max_seq_len={max_seq_len}; "
            "the reference errors here too (its assert :240)"
        )
    framed += [pad_tk] * n_pad
    sub_index += [0] * n_pad
    mask += [0] * n_pad

    new_entities = []
    for text, ty, (s, e) in entities:
        # +1 for the CLS insertion; e is word-INCLUSIVE (reference :252-255)
        new_entities.append((ty, mapping[s][0] + 1, mapping[e][-1] + 1))

    labels = np.zeros((max_seq_len, max_seq_len), dtype=int)
    for ty, s, e in new_entities:
        labels[s, e] = label2idx[ty]
    n_live = sum(mask)
    masks = np.zeros((max_seq_len, max_seq_len), dtype=int)
    masks[:n_live, :] = np.array(mask)

    return {
        "input_tokens": framed,
        "input_ids": [vocab_fn(t) for t in framed],
        "attention_mask": mask,
        "token_type_ids": [0] * max_seq_len,
        "sub_index": sub_index,
        "entities": new_entities,
        "labels": labels,
        "masks": masks,
    }


def spans_to_mentions(spans: DataFrame, sentences: DataFrame) -> DataFrame:
    """J3: token-index spans -> char offsets + surface text.

    Join back to the sentences table on (url, sent_id) and index the
    offset arrays — the relational replacement for the reference's
    pickle mapping file.  Surfaces/offsets use the EDGE_PUNCT-stripped
    token core (functions.core_surface), matching the fused BIO decode.
    """
    from ..functions import core_surface

    s = sentences.select("url", "sent_id", "tokens", "tok_starts", "tok_ends")
    j = spans.join(s, ["url", "sent_id"])
    first_tok = F.element_at("tokens", F.col("tok_s") + 1)
    last_tok = F.element_at("tokens", F.col("tok_e"))
    _, start_c, _ = core_surface(
        first_tok,
        F.element_at("tok_starts", F.col("tok_s") + 1),
        F.element_at("tok_ends", F.col("tok_s") + 1),
    )
    _, _, end_c = core_surface(
        last_tok,
        F.element_at("tok_starts", F.col("tok_e")),
        F.element_at("tok_ends", F.col("tok_e")),
    )
    core_join = F.array_join(
        F.transform(
            F.slice("tokens", F.col("tok_s") + 1, F.col("tok_e") - F.col("tok_s")),
            lambda t: core_surface(t, F.lit(0), F.lit(0))[0],
        ),
        " ",
    )
    return j.select(
        "url",
        "sent_id",
        "type",
        start_c.alias("start"),
        end_c.alias("end"),
        core_join.alias("text"),
    )


def evaluate_biaffine(gold: DataFrame, pred: DataFrame) -> dict[str, int]:
    """J8/T2: exact-tuple eval via set operators.

    tp = |gold ∩ pred|, fp = |pred \\ common|, fn = |gold \\ common|
    (transformer_biaffine_ner/task_utils.py:73-89).
    """
    key = ["url", "sent_id", "type", "tok_s", "tok_e"]
    g, p = gold.select(*key), pred.select(*key)
    common = g.intersect(p)
    return {
        "tp": common.count(),
        "fp": p.exceptAll(common).count(),
        "fn": g.exceptAll(common).count(),
    }

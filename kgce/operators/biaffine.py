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


def spans_to_mentions(spans: DataFrame, sentences: DataFrame) -> DataFrame:
    """J3: token-index spans -> char offsets + surface text.

    Join back to the sentences table on (url, sent_id) and index the
    offset arrays — the relational replacement for the reference's
    pickle mapping file.
    """
    s = sentences.select("url", "sent_id", "tokens", "tok_starts", "tok_ends")
    j = spans.join(s, ["url", "sent_id"])
    return j.select(
        "url",
        "sent_id",
        "type",
        F.element_at("tok_starts", F.col("tok_s") + 1).alias("start"),
        F.element_at("tok_ends", F.col("tok_e")).alias("end"),
        F.array_join(
            F.slice("tokens", F.col("tok_s") + 1, F.col("tok_e") - F.col("tok_s")), " "
        ).alias("text"),
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

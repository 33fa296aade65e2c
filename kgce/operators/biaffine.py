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


def decode_biaffine_spans(sentences: DataFrame, max_span: int = 6) -> DataFrame:
    """W4: per-sentence span-matrix decode (stub scorer).

    The stub 'matrix' marks span (i, j) with a type iff tokens i..j are a
    maximal run of rule-tagger entity tokens — deterministically matching
    the BIO path, which the parity test exploits.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"url": [], "sent_id": [], "type": [], "tok_s": [], "tok_e": []}
            for url, sid, toks in zip(pdf["url"], pdf["sent_id"], pdf["tokens"]):
                words = list(toks)
                labels = oracle.fix_bio(oracle.rule_tag_sentence(words))
                # numpy-free equivalent of argwhere over the stub matrix:
                # emit (type, s, e) per decoded span, end-exclusive
                offs = [(k, k + 1) for k in range(len(words))]
                for sp in oracle.decode_spans_converter(words, offs, labels):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["type"].append(sp.etype)
                    rows["tok_s"].append(sp.tok_s)
                    rows["tok_e"].append(sp.tok_e)
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

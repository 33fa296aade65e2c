"""Mention detection: pages -> sentences -> BIO tags -> mentions.

The scale-critical design decision: the whole chain
sentence-split -> tokenize -> tag -> BIO-repair -> span-decode is
sentence-local, so it runs as ONE ``mapInPandas`` over the pages scan —
a single narrow stage, zero shuffles between the Iceberg/parquet scan and
the mentions table.  Catalyst prunes ``html``/``warc_ts`` out of the scan
because the UDF only selects (url, text).

Taggers are pluggable: ``rule`` is the deterministic mock (shared with the
oracle so parity is exact, SURVEY.md §5.2); ``model`` is the
transformer path (reference task.py:359-432) — same interface, lazy
per-worker model load, gated on torch availability.

Reference lifecycle being re-expressed:
run_transformer_batch_prediction.py:57-72 (per-file loop -> one DataFrame),
task.py:494-505 (predict = infer + sys-label mask + __fix_bio),
output_format_converter.py:156-191 (tag2entity -> mentions).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import oracle, schemas

TagFn = Callable[[list[str]], list[str]]


def get_tagger(name: str | TagFn = "rule", **kw) -> TagFn:
    """Resolve a tagger: ``'rule'`` (deterministic oracle twin),
    ``'model'`` (HF transformer inference, kgce.hf.HFModelTagger), or any
    TagFn-shaped callable passed through as-is (taggers exposing a
    ``tag_batch(list[list[str]])`` method get length-bucketed batched
    inference in every UDF below)."""
    if callable(name):
        return name
    if name == "rule":
        return oracle.rule_tag_sentence
    if name == "model":
        return _model_tagger(**kw)
    raise ValueError(f"unknown tagger: {name}")


def _model_tagger(model_dir: str | None = None, **kw) -> TagFn:
    """Transformer token-classifier tagger (U2, reference task.py:359-432).

    Construction is cheap and torch-free (only the model DIR is pickled
    into UDF closures); the checkpoint loads lazily once per Python
    worker on first call.  Without torch/transformers installed the first
    call raises kgce.hf.MissingDependencyError (a NotImplementedError).
    """
    import os

    from .hf import HFModelTagger

    model_dir = model_dir or os.environ.get("KGCE_MODEL_DIR")
    if not model_dir:
        raise ValueError("tagger='model' requires model_dir=... or $KGCE_MODEL_DIR")
    return HFModelTagger(model_dir, **kw)


def _tagged_page_sentences(pdf: pd.DataFrame, tag_fn: TagFn) -> list[tuple]:
    """Split + tokenize every page of one Arrow batch, then tag ALL
    sentences in ONE ``tag_batch`` call when the tagger supports it (the
    model path: length-bucketed batched inference amortized across the
    whole batch instead of one forward per sentence).  Returns
    (url, sent_id, words, char_offsets, repaired_labels) per sentence, in
    page order; the tagger sees RAW whitespace tokens while the returned
    words/offsets are the EDGE_PUNCT-stripped mention surfaces
    (oracle.core_token_offsets) consumed by span decode.  Row-level
    isolation (S5): null/empty pages contribute nothing instead of
    failing the batch."""
    sents: list[tuple] = []
    for url, text in zip(pdf["url"], pdf["text"]):
        if text is None:
            continue
        for sid, (s, e) in enumerate(oracle.split_sentences(text)):
            toks = oracle.tokenize(text[s:e], base=s)
            if not toks:
                continue
            cores = [oracle.core_token_offsets(*t) for t in toks]
            sents.append(
                (url, sid, [t[0] for t in toks],
                 [c[0] for c in cores], [(c[1], c[2]) for c in cores])
            )
    if hasattr(tag_fn, "tag_batch"):
        raw = tag_fn.tag_batch([s[2] for s in sents]) if sents else []
    else:
        raw = [tag_fn(s[2]) for s in sents]
    return [
        (u, sid, w, o, oracle.fix_bio(labs))
        for (u, sid, _raw, w, o), labs in zip(sents, raw)
    ]


# --------------------------------------------------------------------------
# pages -> sentences (S4/S5/U10)
# --------------------------------------------------------------------------


def extract_sentences(pages: DataFrame) -> DataFrame:
    """Sentence-split + tokenize with absolute char offsets.

    Narrow mapInPandas; selects only (url, text) so the binary ``html``
    column is pruned at the scan.
    """

    def split_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("url", "sent_id", "sent_start", "sent_end",
                                   "tokens", "tok_starts", "tok_ends")}
            for url, text in zip(pdf["url"], pdf["text"]):
                if text is None:
                    continue
                for sid, (s, e) in enumerate(oracle.split_sentences(text)):
                    toks = oracle.tokenize(text[s:e], base=s)
                    if not toks:
                        continue
                    out["url"].append(url)
                    out["sent_id"].append(sid)
                    out["sent_start"].append(s)
                    out["sent_end"].append(e)
                    out["tokens"].append([t[0] for t in toks])
                    out["tok_starts"].append([t[1] for t in toks])
                    out["tok_ends"].append([t[2] for t in toks])
            yield pd.DataFrame(out)

    return pages.select("url", "text").mapInPandas(split_batches, schema=schemas.SENTENCES)


# --------------------------------------------------------------------------
# sentences -> tagged sentences
# --------------------------------------------------------------------------


def tag_sentences(
    sentences: DataFrame, tagger: str = "rule", bucket_by_length: bool | None = None
) -> DataFrame:
    """Attach repaired BIO labels (tag + sys-label mask + __fix_bio).

    Batch-capable taggers (``tag_batch`` — model inference) get
    ``length_bucketed`` input automatically: similar-length sentences
    share Arrow batches, so fixed-size model batches waste minimal
    padding (the reference's ``auto=True`` DataLoader sort).  The range
    exchange this adds is the SAME single shuffle a parallelism guard
    would spend — it replaces it, not stacks on it.  Per-sentence
    taggers (rule) stay narrow: no exchange at all.  Override with
    ``bucket_by_length`` if measurement says otherwise for a workload.
    """
    if bucket_by_length is None:
        bucket_by_length = hasattr(get_tagger(tagger), "tag_batch")
    if bucket_by_length:
        sentences = length_bucketed(sentences)

    def tag_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag_fn = get_tagger(tagger)
        for pdf in it:
            pdf = pdf.copy()
            toks_list = [list(toks) for toks in pdf["tokens"]]
            if hasattr(tag_fn, "tag_batch"):
                raw = tag_fn.tag_batch(toks_list) if toks_list else []
            else:
                raw = [tag_fn(t) for t in toks_list]
            pdf["labels"] = [oracle.fix_bio(labs) for labs in raw]
            yield pdf

    return sentences.mapInPandas(tag_batches, schema=schemas.TAGGED_SENTENCES)


# --------------------------------------------------------------------------
# pages -> mentions: the fused single-stage path (the production plan)
# --------------------------------------------------------------------------


def extract_mentions(pages: DataFrame, tagger: str = "rule") -> DataFrame:
    """Fused split+tokenize+tag+repair+decode in one narrow stage.

    mention_id is assigned per page in (start, end) order — the brat
    ``T1..Tn`` numbering (W7) — computable in-UDF because a page's
    sentences never span UDF batches here (one input row == one page).
    """

    def mention_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from itertools import groupby

        tag_fn = get_tagger(tagger)
        for pdf in it:
            rows = {k: [] for k in ("url", "sent_id", "mention_id", "text",
                                    "start", "end", "type")}
            tagged = _tagged_page_sentences(pdf, tag_fn)
            # sentences arrive page-contiguous, so groupby restores pages
            for url, page in groupby(tagged, key=lambda t: t[0]):
                page_ms = []
                for _, sid, words, offs, labels in page:
                    for sp in oracle.decode_spans_converter(words, offs, labels):
                        page_ms.append((sid, sp.text, sp.char_s, sp.char_e, sp.etype))
                page_ms.sort(key=lambda m: (m[2], m[3]))
                for mid, (sid, mtext, ms, me, mt) in enumerate(page_ms, start=1):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["mention_id"].append(mid)
                    rows["text"].append(mtext)
                    rows["start"].append(ms)
                    rows["end"].append(me)
                    rows["type"].append(mt)
            yield pd.DataFrame(rows)

    return pages.select("url", "text").mapInPandas(mention_batches, schema=schemas.MENTIONS)


def length_bucketed(sentences: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Length-bucketed inference batching (SURVEY §4): range-partition +
    sort sentences by token count so every Arrow batch reaching the
    inference UDF holds similar-length sentences — at a fixed model batch
    size, padding waste is minimal (the reference's analog is its
    ``auto=True`` DataLoader length sort).  Pure DataFrame ops
    (repartitionByRange + sortWithinPartitions) — no custom rule, and the
    range exchange replaces the round-robin one a plain repartition would
    add, so it costs the same one shuffle it would anyway."""
    n = F.size(F.col(tokens_col))
    return sentences.repartitionByRange(n).sortWithinPartitions(n)


def extract_mentions_with_ts(pages: DataFrame, tagger: str = "rule") -> DataFrame:
    """extract_mentions + the page's ``warc_ts`` carried through the UDF —
    event-time for streaming windowed aggregations (stateless per page,
    so streaming-safe with a plain watermark)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        schemas.MENTIONS.fields + [T.StructField("warc_ts", T.TimestampType(), True)]
    )

    def mention_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from itertools import groupby

        tag_fn = get_tagger(tagger)
        for pdf in it:
            ts_by_url = dict(zip(pdf["url"], pdf["warc_ts"]))
            rows = {k: [] for k in ("url", "sent_id", "mention_id", "text",
                                    "start", "end", "type", "warc_ts")}
            tagged = _tagged_page_sentences(pdf, tag_fn)
            for url, page in groupby(tagged, key=lambda t: t[0]):
                page_ms = []
                for _, sid, words, offs, labels in page:
                    for sp in oracle.decode_spans_converter(words, offs, labels):
                        page_ms.append((sid, sp.text, sp.char_s, sp.char_e, sp.etype))
                page_ms.sort(key=lambda m: (m[2], m[3]))
                for mid, (sid, mtext, ms, me, mt) in enumerate(page_ms, start=1):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["mention_id"].append(mid)
                    rows["text"].append(mtext)
                    rows["start"].append(ms)
                    rows["end"].append(me)
                    rows["type"].append(mt)
                    rows["warc_ts"].append(ts_by_url[url])
            yield pd.DataFrame(rows)

    return pages.select("url", "warc_ts", "text").mapInPandas(
        mention_batches, schema=schema
    )


# --------------------------------------------------------------------------
# pages -> scored mention pairs, fully fused (the 100-TB path)
# --------------------------------------------------------------------------

PAIRS_SCHEMA = (
    "url string, sent_id long, subj_text string, subj_type string, "
    "pred string, obj_text string, obj_type string, confidence double"
)


def extract_pairs_fused(pages: DataFrame, tagger: str = "rule") -> DataFrame:
    """Sentence-co-occurring mention pairs in the SAME narrow stage as
    mention detection — no shuffle between the page scan and the triple
    aggregation's partial (map-side) agg.

    Pair semantics are identical to operators.triples.candidate_pairs +
    score_pairs (property-tested); use those relational forms when the
    mentions table is already materialized — use this fused form when
    pages stream straight through, which is the 10^12-page deployment
    shape: the only wide shuffle left in the whole triple pipeline is the
    final groupBy over (subj, pred, obj) partials.
    """

    def pair_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag_fn = get_tagger(tagger)
        for pdf in it:
            rows = {k: [] for k in ("url", "sent_id", "subj_text", "subj_type",
                                    "pred", "obj_text", "obj_type", "confidence")}
            for url, sid, words, offs, labels in _tagged_page_sentences(pdf, tag_fn):
                ms = sorted(
                    oracle.decode_spans_converter(words, offs, labels),
                    key=lambda sp: (sp.char_s, sp.char_e),
                )
                for i in range(len(ms)):
                    for j in range(i + 1, len(ms)):
                        a, b = ms[i], ms[j]
                        gap = max(b.char_s - a.char_e, 0)
                        rows["url"].append(url)
                        rows["sent_id"].append(sid)
                        rows["subj_text"].append(a.text)
                        rows["subj_type"].append(a.etype)
                        rows["pred"].append(f"rel:{a.etype}_{b.etype}")
                        rows["obj_text"].append(b.text)
                        rows["obj_type"].append(b.etype)
                        rows["confidence"].append(1.0 / (1.0 + gap / 100.0))
            yield pd.DataFrame(rows)

    return pages.select("url", "text").mapInPandas(pair_batches, schema=PAIRS_SCHEMA)


SENT_MENTIONS_SCHEMA = (
    "url string, sent_id long, "
    "ms array<struct<text:string, type:string, start:int, end:int>>"
)


def extract_sentence_mentions(pages: DataFrame, tagger: str = "rule") -> DataFrame:
    """One row per sentence with its mention ARRAY (ordered by start).

    The hybrid split of work for the 100-TB path: Python does only the
    linguistic part (split/tag/decode); downstream pair combinatorics run
    JVM-side (see operators.triples.pairs_from_sentence_mentions) — no
    shuffle, no Python in the O(k²) loop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag_fn = get_tagger(tagger)
        for pdf in it:
            rows = {"url": [], "sent_id": [], "ms": []}
            for url, sid, words, offs, labels in _tagged_page_sentences(pdf, tag_fn):
                ms = sorted(
                    (
                        (sp.text, sp.etype, sp.char_s, sp.char_e)
                        for sp in oracle.decode_spans_converter(words, offs, labels)
                    ),
                    key=lambda m: (m[2], m[3]),
                )
                if ms:
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    rows["ms"].append(ms)
            yield pd.DataFrame(rows)

    return pages.select("url", "text").mapInPandas(batches, schema=SENT_MENTIONS_SCHEMA)

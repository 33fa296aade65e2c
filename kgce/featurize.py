"""Featurization parity (U1): sentence -> fixed-width transformer features.

Re-expresses the reference's feature builder
(/root/reference/src/transformer_ner/data_utils.py:174-331) with exact
semantics, model-free:

* subword expansion (P2): first piece keeps the word's label, remaining
  pieces get 'X'; ``guards[k] = word_index + 1`` (0 marks specials/pad).
* long-sentence chunking with whole-word backtracking — a chunk never
  splits a word (the reference's ``find_idx``, data_utils.py:268-274);
  continuation is expressed as ``chunk_id`` (we drop the reference's
  ``[next]``-token / NEXT_GUARD=-2 cross-batch state, task.py:416-429 —
  restitch is a keyed groupBy instead, A9).
* CLS/SEP framing + max-length padding + attention mask (P3),
  label->id with fallback to 'O' (data_utils.py:213-216).

The tokenizer here is a deterministic mock (<=4-char pieces, '##'
continuation, BERT-style) so everything is testable without model
weights; the HF fast-tokenizer drops into the same ``subword_fn`` slot.

One UDTF-shaped mapInPandas: 1 sentence -> N chunk rows (row fan-out is
native to mapInPandas — no explode).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schemas

CLS, SEP, PAD, UNK = "[CLS]", "[SEP]", "[PAD]", "[UNK]"
CONTROL_LABELS = {"PAD": 0, "CLS": 1, "X": 2, "O": 3}  # ids < id('O') are system labels


def build_label2idx(entity_types: list[str]) -> dict[str, int]:
    """Control labels first (invariant: system ids < id('O'),
    data_utils.py:78), then B-/I- pairs sorted by type."""
    l2i = dict(CONTROL_LABELS)
    for t in sorted(entity_types):
        for p in ("B-", "I-"):
            l2i[p + t] = len(l2i)
    return l2i


def mock_subwords(word: str, piece_len: int = 4) -> list[str]:
    """Deterministic BERT-style piece split: 4-char head + '##' tails."""
    if len(word) <= piece_len:
        return [word]
    out = [word[:piece_len]]
    for i in range(piece_len, len(word), piece_len):
        out.append("##" + word[i : i + piece_len])
    return out


def _vocab_id(piece: str) -> int:
    # deterministic pseudo-vocabulary: stable hash into [100, 30000)
    import zlib

    specials = {PAD: 0, CLS: 101, SEP: 102, UNK: 100}
    if piece in specials:
        return specials[piece]
    return 103 + (zlib.crc32(piece.encode("utf-8")) % 29897)


def featurize_sentence(
    tokens: list[str],
    labels: list[str],
    label2idx: dict[str, int],
    max_seq_len: int = 64,
    subword_fn: Callable[[str], list[str]] = mock_subwords,
    vocab_fn: Callable[[str], int] = _vocab_id,
    specials: tuple[str, str, str] = (CLS, SEP, PAD),
    unk: str = UNK,
    dialect: str = "bert",
) -> list[dict]:
    """One sentence -> one or more fixed-width chunk feature dicts.

    ``subword_fn``/``vocab_fn``/``specials`` default to the deterministic
    mock; pass a kgce.hf.HFTokenizerAdapter's slots for the real thing
    (the reference's per-family special tokens + convert_tokens_to_ids,
    data_utils.py:175-190,240).

    ``dialect='xlnet'`` reproduces the pre-pad layout (data_utils.py:
    192-231,296-299): continuation pieces keep the WORD label (not 'X'),
    frame = ``<s> body </s> <sep> <cls>`` all labeled 'O' (4 specials,
    not 2), padding INSERTED AT THE FRONT, segment ids = 3 on pads /
    0 on body / 2 on the final ``<cls>``.
    """
    xlnet = dialect == "xlnet"
    cls_tk, sep_tk, pad_tk = specials
    pieces: list[str] = []
    piece_labels: list[str] = []
    guards: list[int] = []
    for wi, (w, lab) in enumerate(zip(tokens, labels)):
        sw = subword_fn(w) or [unk]
        pieces.extend(sw)
        cont = lab if xlnet else "X"
        piece_labels.extend([lab] + [cont] * (len(sw) - 1))
        guards.extend([wi + 1] * len(sw))

    body = max_seq_len - (4 if xlnet else 2)  # room for the frame tokens
    chunks: list[tuple[list[str], list[str], list[int]]] = []
    i = 0
    while i < len(pieces):
        j = min(i + body, len(pieces))
        if j < len(pieces):
            # whole-word backtracking: do not split a word across chunks
            k = j
            while k > i and guards[k] == guards[k - 1]:
                k -= 1
            if k > i:
                j = k
        chunks.append((pieces[i:j], piece_labels[i:j], guards[i:j]))
        i = j

    out = []
    for cid, (ps, ls, gs) in enumerate(chunks):
        if xlnet:
            toks = ["<s>"] + ps + ["</s>", sep_tk, cls_tk]
            labs = ["O"] + ls + ["O", "O", "O"]
            gds = [0] + gs + [0, 0, 0]
            mask = [1] * len(toks)
            n_pad = max_seq_len - len(toks)
            toks = [pad_tk] * n_pad + toks
            labs = ["PAD"] * n_pad + labs
            gds = [0] * n_pad + gds
            mask = [0] * n_pad + mask
            segs = [3] * n_pad + [0] * (max_seq_len - (n_pad + 1)) + [2]
        else:
            toks = [cls_tk] + ps + [sep_tk]
            labs = ["CLS"] + ls + ["X"]
            gds = [0] + gs + [0]
            mask = [1] * len(toks)
            n_pad = max_seq_len - len(toks)
            toks += [pad_tk] * n_pad
            labs += ["PAD"] * n_pad
            gds += [0] * n_pad
            mask += [0] * n_pad
            segs = [0] * max_seq_len
        out.append(
            {
                "chunk_id": cid,
                "input_tokens": toks,
                "input_ids": [vocab_fn(t) for t in toks],
                "attention_mask": mask,
                "token_type_ids": segs,
                "label_ids": [label2idx.get(l, label2idx["O"]) for l in labs],
                "guards": gds,
            }
        )
    return out


def featurize(
    tagged_sentences: DataFrame,
    label2idx: dict[str, int],
    max_seq_len: int = 64,
    tokenizer_loader: Callable[[], object] | None = None,
) -> DataFrame:
    """TAGGED_SENTENCES -> FEATURES (UDTF fan-out, one narrow stage).

    ``tokenizer_loader``: zero-arg callable returning a
    kgce.hf.HFTokenizerAdapter-shaped object (``subword_fn``/``vocab_fn``/
    ``specials``/``unk``), e.g. ``kgce.hf.hf_tokenizer_loader('roberta-
    base')``.  Only the loader is pickled; the tokenizer builds lazily
    once per Python worker.  None = deterministic mock tokenizer.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if tokenizer_loader is not None:
            adapter = tokenizer_loader()
            kw = dict(
                subword_fn=adapter.subword_fn,
                vocab_fn=adapter.vocab_fn,
                specials=adapter.specials,
                unk=adapter.unk,
            )
        else:
            kw = {}
        for pdf in it:
            rows = {k.name: [] for k in schemas.FEATURES.fields}
            for url, sid, toks, labs in zip(
                pdf["url"], pdf["sent_id"], pdf["tokens"], pdf["labels"]
            ):
                for feat in featurize_sentence(
                    list(toks), list(labs), label2idx, max_seq_len, **kw
                ):
                    rows["url"].append(url)
                    rows["sent_id"].append(sid)
                    for k, v in feat.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return tagged_sentences.select("url", "sent_id", "tokens", "labels").mapInPandas(
        batches, schema=schemas.FEATURES
    )


def restitch_word_labels(features: DataFrame, idx2label: dict[int, str]) -> DataFrame:
    """A9 + W5 + P5/P6: chunked piece predictions -> per-word labels.

    1. in-chunk: drop pad (mask=0) and specials (guard=0); keep the FIRST
       piece of each word (guard change); map system labels -> 'O'
       (predict(), task.py:494-501).
    2. cross-chunk: groupBy (url, sent_id), sort by chunk_id, flatten —
       the shuffle-keyed replacement for the reference's cross-batch
       ``connect_sent_flag`` state.

    Here ``label_ids`` stands in for model predictions; the model path
    feeds its argmax ids through the identical decode.
    """
    sys_ids = [i for i, l in idx2label.items() if l in ("PAD", "CLS", "X")]
    z = F.arrays_zip("label_ids", "attention_mask", "guards")
    kept = F.filter(
        z,
        lambda x, i: (x["attention_mask"] == 1)
        & (x["guards"] != 0)
        & ((i == 0) | (x["guards"] != F.get(F.col("guards"), i - 1))),
    )
    word_labels = F.transform(
        kept,
        lambda x: F.when(x["label_ids"].isin(sys_ids), F.lit("O")).otherwise(
            _idx2label_expr(idx2label, x["label_ids"])
        ),
    )
    per_chunk = features.select("url", "sent_id", "chunk_id", word_labels.alias("chunk_labels"))
    return per_chunk.groupBy("url", "sent_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("chunk_id").alias("c"), F.col("chunk_labels").alias("l")))
                ),
                lambda x: x["l"],
            )
        ).alias("labels")
    )


def _idx2label_expr(idx2label: dict[int, str], id_col) -> "F.Column":
    expr = F.lit("O")
    for i, lab in idx2label.items():
        if lab in ("PAD", "CLS", "X"):
            continue
        expr = F.when(id_col == i, F.lit(lab)).otherwise(expr)
    return expr


# segment-embedding (token_type_ids) consumers vs not — the reference's
# per-family dispatch (data_utils.py:392-409, batch_to_model_inputs)
_TYPE_ID_FAMILIES = frozenset(
    {"bert", "megatron", "albert", "distilbert", "xlnet", "electra",
     "deberta", "deberta-v2", "gatortron"}
)
_NO_TYPE_ID_FAMILIES = frozenset({"roberta", "bart", "longformer"})


def model_inputs(features: DataFrame, model_type: str = "bert") -> DataFrame:
    """P4: select exactly the feature columns a model family consumes
    (data_utils.py:392-409): BERT-likes take token_type_ids, RoBERTa-likes
    do not; unknown families raise like the reference.  Keys (url,
    sent_id, chunk_id) and guards ride along for the realign join (J1)."""
    base = ["url", "sent_id", "chunk_id", "input_ids", "attention_mask", "label_ids", "guards"]
    if model_type in _TYPE_ID_FAMILIES:
        return features.select(*base[:5], "token_type_ids", *base[5:])
    if model_type in _NO_TYPE_ID_FAMILIES:
        return features.select(*base)
    raise RuntimeError(f"{model_type} is not a valid model type")


# --------------------------------------------------------------------------
# S6: label2idx JSON artifact + T1: unseen-label check
# --------------------------------------------------------------------------


def save_label2idx(label2idx: dict[str, int], path: str) -> None:
    """Persist the label vocabulary exactly like the reference does
    (task.py:261 writes label2idx.json next to the model)."""
    import json
    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(label2idx, sort_keys=True, indent=1))


def load_label2idx(path: str) -> dict[str, int]:
    """Reload (run_transformer_batch_prediction.py:32-36); the dict rides
    into executors inside UDF closures — no broadcast object needed."""
    import json
    from pathlib import Path

    return json.loads(Path(path).read_text())


def unseen_labels(train_sents: "DataFrame", dev_sents: "DataFrame") -> "DataFrame":
    """T1 (data_utils.py:99-101): labels present in dev but not in train —
    the reference logs a warning; we return them as a DataFrame so the
    caller decides (empty => compatible)."""
    t = train_sents.select(F.explode("labels").alias("label")).distinct()
    d = dev_sents.select(F.explode("labels").alias("label")).distinct()
    return d.exceptAll(t)

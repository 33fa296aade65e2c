"""HuggingFace integration (U1/U2): real subword featurization + real
transformer token-classification inference behind the existing slots.

Everything here is import-gated — torch/transformers are OPTIONAL; the
deterministic rule/mock twins carry the test suite when they are absent
(this sandbox has neither).  The semantics being re-expressed:

* tokenizer featurization — /root/reference/src/transformer_ner/
  data_utils.py:287-331 (``tokenizer.tokenize`` per word, first piece
  keeps the label, the rest get 'X', ``guards[k] = word_index + 1``) and
  data_utils.py:174-216 (model-family special tokens + padding +
  ``convert_tokens_to_ids``).
* inference — task.py:359-432: batched forward, ``argmax`` over logits
  (the non-CRF path), then first-piece-per-word label selection via the
  guard/word-id walk.  Here the walk uses the fast tokenizer's
  ``word_ids()`` instead of hand-carried guards, which also absorbs the
  reference's partial-token check (U8).
* lazy per-worker model load — the reference loads once per process
  (run_transformer_batch_prediction.py:38-47); on Spark that becomes a
  module-level cache keyed by model dir, filled on first use inside each
  Python worker (no broadcast of torch state, no per-batch reload).
"""

from __future__ import annotations

from collections.abc import Callable

# per-Python-worker singletons: {(kind, model_dir): object}
_WORKER_CACHE: dict[tuple, object] = {}


class MissingDependencyError(NotImplementedError):
    """torch/transformers not installed — use the rule/mock twins."""


def _require(*modules: str) -> list:
    out = []
    for m in modules:
        try:
            out.append(__import__(m))
        except ImportError as exc:
            raise MissingDependencyError(
                f"kgce.hf requires {'+'.join(modules)}; install them or use "
                "tagger='rule' / the mock subword featurizer"
            ) from exc
    return out


# --------------------------------------------------------------------------
# U1: tokenizer adapter for kgce.featurize
# --------------------------------------------------------------------------


class HFTokenizerAdapter:
    """Duck-typed wrapper exposing exactly what featurize_sentence needs:
    ``subword_fn`` (word -> pieces), ``vocab_fn`` (piece -> id) and the
    model dialect's (cls, sep, pad) special tokens — replacing the
    reference's isinstance ladder over 10 tokenizer classes
    (data_utils.py:175-190) with the attributes HF already exposes."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.cls = tokenizer.cls_token or tokenizer.bos_token
        self.sep = tokenizer.sep_token or tokenizer.eos_token
        self.pad = tokenizer.pad_token
        self.unk = tokenizer.unk_token

    @property
    def specials(self) -> tuple[str, str, str]:
        return (self.cls, self.sep, self.pad)

    def subword_fn(self, word: str) -> list[str]:
        return self.tokenizer.tokenize(word)

    def vocab_fn(self, piece: str) -> int:
        return self.tokenizer.convert_tokens_to_ids(piece)


def load_hf_tokenizer(name_or_dir: str) -> HFTokenizerAdapter:
    """Load (and per-worker cache) a fast HF tokenizer as an adapter."""
    key = ("tokenizer", name_or_dir)
    if key not in _WORKER_CACHE:
        (transformers,) = _require("transformers")
        _WORKER_CACHE[key] = HFTokenizerAdapter(
            transformers.AutoTokenizer.from_pretrained(name_or_dir, use_fast=True)
        )
    return _WORKER_CACHE[key]  # type: ignore[return-value]


def hf_tokenizer_loader(name_or_dir: str) -> Callable[[], HFTokenizerAdapter]:
    """Zero-arg loader to hand to kgce.featurize.featurize — only the
    NAME is pickled into the UDF closure; the tokenizer itself is built
    lazily inside each worker."""
    return lambda: load_hf_tokenizer(name_or_dir)


# --------------------------------------------------------------------------
# U2: transformer inference tagger (TagFn-compatible, batch-capable)
# --------------------------------------------------------------------------


def first_piece_labels(word_ids, pred_row, id2label, n_words: int) -> list[str]:
    """word-level labels from piece-level predictions: each word takes its
    FIRST piece's decoded label (the reference's ``prev_gd != gd`` guard
    walk, task.py:417-425).  Keyed by word id, not appended sequentially:
    a word the tokenizer maps to ZERO pieces (exotic whitespace, some
    normalizers) or one truncated away by max_length yields 'O' for
    ITSELF without shifting any later word's label."""
    by_wid: dict[int, str] = {}
    for pos, wid in enumerate(word_ids):
        if wid is None or wid in by_wid:
            continue  # special/pad token or non-first piece
        by_wid[wid] = str(id2label.get(int(pred_row[pos]), "O"))
    return [by_wid.get(k, "O") for k in range(n_words)]


class HFModelTagger:
    """Token-classification inference as a TagFn.

    ``__call__(tokens) -> labels`` keeps the per-sentence TagFn contract;
    ``tag_batch(sentences)`` is the throughput path kgce.tagging uses
    when present: sentences of one Arrow batch are sorted by length
    (length bucketing — minimal padding waste, the reference's
    ``auto=True`` loader sort, train_utils ner_data_loader), run through
    the model ``batch_size`` at a time, and restored to input order.

    Alignment: for each word, the FIRST subword piece's decoded label is
    taken (``word_ids()`` walk == the reference's ``prev_gd != gd`` guard
    walk, task.py:417-425); words truncated away by max_length get 'O'.

    Decoding: argmax over logits by default (the reference's non-CRF
    branch, task.py:392-394); pass ``crf_params`` (a kgce.crf.CRFParams
    or an .npz path) to Viterbi-decode instead — the ``use_crf``
    config branch (run_transformer_batch_prediction.py:43-45).
    """

    def __init__(
        self,
        model_dir: str,
        batch_size: int = 16,
        max_length: int = 512,
        device: str | None = None,
        crf_params=None,
    ):
        self.model_dir = model_dir
        self.batch_size = batch_size
        self.max_length = max_length
        self.device = device
        self.crf_params = crf_params

    def _decode_ids(self, logits_np, attn_np):
        """(batch, len, tags) scores -> (batch, len) tag ids."""
        import numpy as np

        if self.crf_params is None:
            return logits_np.argmax(-1)
        from .crf import CRFParams, viterbi_decode

        params = (
            CRFParams.load(self.crf_params)
            if isinstance(self.crf_params, str)
            else self.crf_params
        )
        pred = np.zeros(logits_np.shape[:2], dtype=np.int64)
        for row in range(logits_np.shape[0]):
            n = int(attn_np[row].sum())
            pred[row, :n] = viterbi_decode(logits_np[row, :n], params)
        return pred

    def _load(self):
        key = ("model", self.model_dir, self.device)
        if key not in _WORKER_CACHE:
            torch, transformers = _require("torch", "transformers")
            tok = transformers.AutoTokenizer.from_pretrained(self.model_dir, use_fast=True)
            model = transformers.AutoModelForTokenClassification.from_pretrained(
                self.model_dir
            )
            model.eval()
            device = self.device or ("cuda" if torch.cuda.is_available() else "cpu")
            model.to(device)
            _WORKER_CACHE[key] = (tok, model, device)
        return _WORKER_CACHE[key]

    def __call__(self, tokens: list[str]) -> list[str]:
        return self.tag_batch([tokens])[0]

    def tag_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        tok, model, device = self._load()  # raises MissingDependencyError sans torch
        import torch
        id2label = model.config.id2label
        out: list[list[str] | None] = [None] * len(sentences)
        order = sorted(range(len(sentences)), key=lambda i: len(sentences[i]))
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            batch = [sentences[i] for i in idxs]
            enc = tok(
                batch,
                is_split_into_words=True,
                truncation=True,
                max_length=self.max_length,
                padding=True,
                return_tensors="pt",
            )
            with torch.no_grad():
                logits = model(**{k: v.to(device) for k, v in enc.items()}).logits
            pred = self._decode_ids(
                logits.cpu().numpy(), enc["attention_mask"].numpy()
            )
            for row, i in enumerate(idxs):
                out[i] = first_piece_labels(
                    enc.word_ids(batch_index=row),
                    pred[row],
                    id2label,
                    len(sentences[i]),
                )
        return out  # type: ignore[return-value]

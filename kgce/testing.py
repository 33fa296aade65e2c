"""Shippable test doubles for the optional HF integration surface.

These live inside the kgce package (not tests/) because Spark executors
unpickle UDF closures that reference them — the package zip is shipped
via addPyFile, test modules are not.  They mirror exactly the HF
attribute surface kgce.hf consumes, so the adapter/batching plumbing is
exercisable without torch/transformers installed.
"""

from __future__ import annotations

import zlib

from . import oracle


class FakeHFTokenizer:
    """Duck-types the HF tokenizer attributes HFTokenizerAdapter reads,
    with RoBERTa-style specials and deterministic 3-char pieces."""

    cls_token = "<s>"
    bos_token = "<s>"
    sep_token = "</s>"
    eos_token = "</s>"
    pad_token = "<pad>"
    unk_token = "<unk>"

    def tokenize(self, word: str) -> list[str]:
        return [word[:3]] + [f"##{word[i:i + 3]}" for i in range(3, len(word), 3)]

    def convert_tokens_to_ids(self, piece: str) -> int:
        specials = {"<pad>": 1, "<s>": 0, "</s>": 2, "<unk>": 3}
        if piece in specials:
            return specials[piece]
        return 4 + (zlib.crc32(piece.encode()) % 49996)


class FakeBatchTagger:
    """TagFn exposing tag_batch — drives the length-bucketed batched
    tagging path in kgce.tagging with rule-tagger semantics."""

    def __call__(self, tokens: list[str]) -> list[str]:
        return oracle.rule_tag_sentence(tokens)

    def tag_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        return [oracle.rule_tag_sentence(s) for s in sentences]


# --------------------------------------------------------------------------
# sys.modules-injected torch/transformers doubles.
#
# kgce.hf's tensor path (HFModelTagger._load / tag_batch / _decode_ids,
# AutoTokenizer loading) is import-gated and could never EXECUTE in a
# sandbox without torch — the plumbing twin (FakeBatchTagger) proves
# batching/ordering but not the enc -> forward -> word_ids -> argmax walk
# itself.  These doubles implement exactly the attribute surface hf.py
# touches, deterministically:
#
# * FakeFastTokenizer: CLS + 3-char pieces per word + SEP, word_ids()
#   per HF fast-tokenizer semantics (None on specials/padding), honest
#   truncation (last kept position forced back to SEP), right padding,
#   ZERO pieces for whitespace-only words (the normalizer edge case).
# * FakeTCModel: logits one-hot at (input_id %% n_labels) — word labels
#   are a pure function of the piece vocabulary, so tests recompute the
#   expected output independently.
#
# install_fake_hf() is idempotent and REFUSES to shadow real libraries.
# --------------------------------------------------------------------------

FAKE_ID2LABEL = {0: "O", 1: "B-loc", 2: "I-loc"}


class _FakeTensor:
    """The four methods hf.py calls on tensors: to/cpu return self,
    numpy unwraps, items iteration happens on the BatchEncoding."""

    def __init__(self, arr):
        self._arr = arr

    def to(self, device):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self._arr


class _FakeModelOutput:
    def __init__(self, logits):
        self.logits = logits


class FakeBatchEncoding(dict):
    """dict of tensors + the word_ids() accessor of HF fast tokenizers."""

    def __init__(self, tensors: dict, word_ids: list[list]):
        super().__init__(tensors)
        self._word_ids = word_ids

    def word_ids(self, batch_index: int = 0):
        return self._word_ids[batch_index]


class FakeFastTokenizer(FakeHFTokenizer):
    """Callable (batched, is_split_into_words) encoding on top of the
    duck-typed attribute surface of FakeHFTokenizer."""

    def tokenize(self, word: str) -> list[str]:
        if not word.strip():  # zero-piece word (exotic whitespace)
            return []
        return super().tokenize(word)

    def __call__(
        self,
        batch,
        is_split_into_words=False,
        truncation=False,
        max_length=None,
        padding=False,
        return_tensors=None,
    ):
        import numpy as np

        assert is_split_into_words and return_tensors == "pt"
        encs = []
        for words in batch:
            pieces, wids = [self.cls_token], [None]
            for wi, w in enumerate(words):
                for p in self.tokenize(w):
                    pieces.append(p)
                    wids.append(wi)
            pieces.append(self.sep_token)
            wids.append(None)
            if truncation and max_length and len(pieces) > max_length:
                pieces, wids = pieces[:max_length], wids[:max_length]
                pieces[-1], wids[-1] = self.sep_token, None
            encs.append((pieces, wids))
        width = max(len(p) for p, _ in encs)
        pad_id = self.convert_tokens_to_ids(self.pad_token)
        ids = np.array(
            [
                [self.convert_tokens_to_ids(p) for p in pieces]
                + [pad_id] * (width - len(pieces))
                for pieces, _ in encs
            ],
            dtype=np.int64,
        )
        attn = np.array(
            [[1] * len(pieces) + [0] * (width - len(pieces)) for pieces, _ in encs],
            dtype=np.int64,
        )
        word_ids = [wids + [None] * (width - len(wids)) for _, wids in encs]
        return FakeBatchEncoding(
            {"input_ids": _FakeTensor(ids), "attention_mask": _FakeTensor(attn)},
            word_ids,
        )


class _FakeConfig:
    id2label = FAKE_ID2LABEL


class FakeTCModel:
    """AutoModelForTokenClassification double: logits one-hot at
    (input_id %% n_labels); padding positions score a sentinel class so a
    leaked pad prediction is visible in tests."""

    config = _FakeConfig()

    def eval(self):
        return self

    def to(self, device):
        return self

    def __call__(self, input_ids=None, attention_mask=None, **kw):
        import numpy as np

        ids = input_ids.numpy()
        n_labels = len(FAKE_ID2LABEL)
        logits = np.zeros((*ids.shape, n_labels), dtype=np.float64)
        rows, cols = np.indices(ids.shape)
        logits[rows, cols, ids % n_labels] = 5.0
        return _FakeModelOutput(_FakeTensor(logits))


def fake_expected_word_labels(words: list[str], max_length: int = 512) -> list[str]:
    """Independent recomputation of what the fake enc+forward+walk must
    produce for one sentence: first piece of each surviving word ->
    id2label[id %% n_labels]; zero-piece / truncated words -> 'O'."""
    tok = FakeFastTokenizer()
    out, pos = [], 1  # position 0 is CLS
    limit = max_length - 1  # last kept position is forced back to SEP
    for w in words:
        pieces = tok.tokenize(w)
        if not pieces or pos >= limit:
            out.append("O")
            pos += len(pieces)
            continue
        out.append(FAKE_ID2LABEL[tok.convert_tokens_to_ids(pieces[0]) % len(FAKE_ID2LABEL)])
        pos += len(pieces)
    return out


def install_fake_hf() -> None:
    """Register torch/transformers doubles in sys.modules (idempotent;
    never shadows real installations).  Safe to call inside Spark Python
    workers — kgce.testing ships in the package zip."""
    import contextlib
    import importlib.util
    import sys
    import types

    for name in ("torch", "transformers"):
        mod = sys.modules.get(name)
        if mod is not None:
            if getattr(mod, "_kgce_fake", False):
                continue  # our double already in place (reused worker)
            return  # real (or other) module already loaded — leave it
        # find_spec would raise ValueError on an in-sys.modules module
        # with __spec__=None, hence the continue above comes first
        if importlib.util.find_spec(name) is not None:
            return  # real library installed — never shadow it

    import importlib.machinery

    # a bare ModuleType has __spec__=None, and importlib.util.find_spec
    # RAISES ValueError on that for an in-sys.modules module — pyspark's
    # own pyspark.testing.utils probes find_spec("torch") inside reused
    # executor workers (state.update -> have_numpy import chain), so the
    # doubles must carry a real ModuleSpec or they break UNRELATED
    # streaming/arrow stages that share the worker pool.
    if "torch" not in sys.modules:
        torch = types.ModuleType("torch")
        torch.__spec__ = importlib.machinery.ModuleSpec("torch", loader=None)
        torch._kgce_fake = True
        torch.no_grad = contextlib.nullcontext
        torch.cuda = types.SimpleNamespace(is_available=lambda: False)
        sys.modules["torch"] = torch

    if "transformers" not in sys.modules:
        tr = types.ModuleType("transformers")
        tr.__spec__ = importlib.machinery.ModuleSpec("transformers", loader=None)
        tr._kgce_fake = True
        tr.AutoTokenizer = types.SimpleNamespace(
            from_pretrained=lambda name_or_dir, **kw: FakeFastTokenizer()
        )
        tr.AutoModelForTokenClassification = types.SimpleNamespace(
            from_pretrained=lambda name_or_dir, **kw: FakeTCModel()
        )
        sys.modules["transformers"] = tr


def uninstall_fake_hf() -> None:
    """Remove the doubles from sys.modules and drop kgce.hf's per-worker
    cache entries built on them — restores the import-gated state so
    gate tests (MissingDependencyError) stay order-independent."""
    import sys

    for name in ("torch", "transformers"):
        if getattr(sys.modules.get(name), "_kgce_fake", False):
            del sys.modules[name]
    from . import hf

    hf._WORKER_CACHE.clear()


def fake_hf_tokenizer_loader(name_or_dir: str = "/fake/tokenizer"):
    """Twin of kgce.hf.hf_tokenizer_loader that installs the doubles
    before loading — module-level (not a test lambda) so Spark executors
    can unpickle closures that carry it."""

    def _load():
        install_fake_hf()
        from .hf import load_hf_tokenizer

        return load_hf_tokenizer(name_or_dir)

    return _load


class FakeTorchModelTagger:
    """HFModelTagger driven end-to-end by the doubles — REAL hf.py code
    (lazy _load, length bucketing, enc, forward, word_ids walk, argmax or
    CRF Viterbi) with only torch/transformers swapped.  Shippable: the
    fakes install lazily inside whichever process calls it, so the tagger
    works inside Spark executor workers too."""

    def __init__(self, **kw):
        kw.setdefault("model_dir", "/fake/model")
        self._kw = kw
        self._inner = None

    def _tagger(self):
        if self._inner is None:
            install_fake_hf()
            from .hf import HFModelTagger

            self._inner = HFModelTagger(**self._kw)
        return self._inner

    def __call__(self, tokens: list[str]) -> list[str]:
        return self._tagger()(tokens)

    def tag_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        return self._tagger().tag_batch(sentences)

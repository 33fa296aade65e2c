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

"""Shared test/smoke helpers (toy tokenizer for --tiny modes and unit tests)."""

from __future__ import annotations

__all__ = ["ToyTokenizer"]


class ToyTokenizer:
    """Deterministic whitespace tokenizer: stable per-word ids via a grown
    vocab (no hash() — PYTHONHASHSEED-independent). HF-ish call/decode API."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size
        self._vocab = {}

    def _id(self, word: str) -> int:
        if word not in self._vocab:
            self._vocab[word] = 3 + (len(self._vocab) % (self.vocab_size - 3))
        return self._vocab[word]

    def __call__(self, text, add_special_tokens=False):
        ids = [self._id(w) for w in text.split()]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}

    def decode(self, ids, skip_special_tokens=True):
        rev = {v: k for k, v in self._vocab.items()}
        out = []
        for i in ids:
            if skip_special_tokens and i in (0, 1, 2):
                continue
            out.append(rev.get(int(i), f"tok{int(i)}"))
        return " ".join(out)

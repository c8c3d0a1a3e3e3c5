"""Incremental detokenization.

Counterpart of the reference's per-sequence DecodeStream delivery
(engine.rs:927-1100): decode newly generated ids into text deltas without
re-decoding the whole output (and without emitting broken UTF-8 across
multi-token codepoints).
"""

from __future__ import annotations

from typing import List, Optional


class IncrementalDetokenizer:
    """Standard two-offset streaming decode (the HF/vLLM algorithm):
    keep a `prefix` window so sentencepiece-style tokenizers join spaces
    correctly, and hold back text that ends in an incomplete codepoint.
    """

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.token_ids: List[int] = []
        self.prefix_offset = 0
        self.read_offset = 0

    def _decode(self, ids: List[int]) -> str:
        try:
            return self.tokenizer.decode(ids, skip_special_tokens=self.skip_special)
        except TypeError:
            return self.tokenizer.decode(ids)

    def push(self, token_ids) -> str:
        """Append token id(s), return the new visible text delta ('' if the
        suffix is still an incomplete codepoint)."""
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self.token_ids.extend(token_ids)
        prefix_text = self._decode(self.token_ids[self.prefix_offset : self.read_offset])
        new_text = self._decode(self.token_ids[self.prefix_offset :])
        if len(new_text) <= len(prefix_text) or new_text.endswith("�"):
            return ""
        delta = new_text[len(prefix_text) :]
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.token_ids)
        return delta

    def flush(self) -> str:
        """Emit any held-back suffix (call at sequence finish)."""
        prefix_text = self._decode(self.token_ids[self.prefix_offset : self.read_offset])
        new_text = self._decode(self.token_ids[self.prefix_offset :])
        self.prefix_offset = self.read_offset = len(self.token_ids)
        return new_text[len(prefix_text) :] if len(new_text) > len(prefix_text) else ""

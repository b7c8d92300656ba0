"""RegexTokenizer: BPE with regex pre-splitting and special-token handling.

Behavior-compatible with the reference RegexTokenizer (minbpe/regex.py:22-164):
text is pre-split into chunks by a GPT-style pattern, merges never cross chunk
boundaries, and ``encode`` understands ``allowed_special``. On device the
chunked text is one flat stream with per-chunk segment ids; training and encode
run as single compiled programs (see minbpe_tpu.ops).

The pre-split itself currently runs host-side via the ``regex`` module (the
exactness oracle for the GPT-4 pattern's possessive quantifiers and lookahead);
a byte-class scanner equivalent lives in minbpe_tpu.utils.presplit.
"""

from __future__ import annotations

import regex as re

from . import engine
from .base import DecodeTable, Tokenizer

# GPT split patterns, as published by tiktoken (minbpe/regex.py:18-19).
GPT2_SPLIT_PATTERN = (
    r"""'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)
GPT4_SPLIT_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}|"""
    r""" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)


class RegexTokenizer(Tokenizer):

    def __init__(self, pattern: str | None = None):
        """pattern overrides the default GPT-4 split pattern
        (minbpe/regex.py:24-34)."""
        super().__init__()
        self.pattern = GPT4_SPLIT_PATTERN if pattern is None else pattern
        self.compiled_pattern = re.compile(self.pattern)
        self.special_tokens: dict[str, int] = {}
        self.inverse_special_tokens: dict[int, str] = {}

    # -- helpers ------------------------------------------------------------
    def _split_chunks(self, text: str) -> list[bytes]:
        return [c.encode("utf-8") for c in re.findall(self.compiled_pattern, text)]

    def _split_arrays(self, text: str):
        """(byte array, chunk-end offsets) for the whole text.

        Fast path: the native byte-level scanner (csrc/presplit.cpp) for the
        two known GPT patterns; fallback: host ``regex`` findall (the oracle,
        minbpe/regex.py:41) with offsets reconstructed from chunk lengths.
        Either way no per-chunk Python objects reach the packing code.
        """
        import numpy as np
        from .utils import native

        data = text.encode("utf-8")
        mode = {GPT4_SPLIT_PATTERN: 4, GPT2_SPLIT_PATTERN: 2}.get(self.pattern)
        ends = native.split_offsets(data, mode) if mode is not None else None
        if ends is None:
            lengths = [
                len(c.encode("utf-8"))
                for c in re.findall(self.compiled_pattern, text)
            ]
            ends = np.cumsum(np.asarray(lengths, dtype=np.int64))
        arr = np.frombuffer(data, dtype=np.uint8)
        return self._transform_bytes_array(arr), ends

    def _transform_bytes_array(self, arr):
        """Hook for vectorized byte-level preprocessing before BPE (identity
        here; GPT4Tokenizer installs its byte shuffle)."""
        return arr

    # -- training -----------------------------------------------------------
    def train(self, text: str, vocab_size: int, verbose: bool = False,
              **train_opts):
        """Pair counts are summed across chunks each round (minbpe/regex.py:36-70);
        on device the chunks are one segmented stream in corpus order, so the
        count/tie-break semantics match exactly. Extra keyword options:
        see engine.run_train."""
        assert vocab_size >= 256
        num_merges = vocab_size - 256
        data, ends = self._split_arrays(text)
        self.merges, self.vocab = engine.train_offsets(
            data, ends, num_merges, verbose, **train_opts
        )
        self._invalidate_device_state()

    # -- special tokens -----------------------------------------------------
    def register_special_tokens(self, special_tokens: dict[str, int]):
        """str -> int registry (minbpe/regex.py:72-76)."""
        self.special_tokens = special_tokens
        self.inverse_special_tokens = {v: k for k, v in special_tokens.items()}
        self._dtab = None  # decode table includes specials

    # -- decode -------------------------------------------------------------
    def decode(self, ids) -> str:
        """vocab or special lookup per id; unknown ids raise
        (minbpe/regex.py:78-90). Vectorized via a flat byte table over
        vocab ∪ specials (vocab wins on overlap, matching the reference's
        check order)."""
        if self._dtab is None:
            merged = {
                idx: s.encode("utf-8")
                for idx, s in self.inverse_special_tokens.items()
            }
            merged.update(self.vocab)
            self._dtab = DecodeTable(merged)
        data, bad = self._dtab.lookup(ids)
        if bad >= 0:
            raise ValueError(f"invalid token id: {ids[bad]}")
        return data.decode("utf-8", errors="replace")

    # -- encode -------------------------------------------------------------
    def encode_ordinary(self, text: str) -> list[int]:
        """Encode ignoring special tokens (minbpe/regex.py:111-121). The whole
        chunked text goes to device as one segmented stream; for the known
        GPT patterns even the pre-split runs on device (only raw bytes cross
        the wire)."""
        out = engine.encode_text_device_split(self, text)
        if out is not None:
            return out
        data, ends = self._split_arrays(text)
        return engine.encode_offsets(self, data, ends)

    def _resolve_special(self, text: str, allowed_special) -> dict[str, int]:
        """allowed_special semantics per minbpe/regex.py:131-143
        ("all" | "none" | "none_raise" | set)."""
        if allowed_special == "all":
            return self.special_tokens
        if allowed_special == "none":
            return {}
        if allowed_special == "none_raise":
            assert all(token not in text for token in self.special_tokens)
            return {}
        if isinstance(allowed_special, set):
            return {
                k: v for k, v in self.special_tokens.items()
                if k in allowed_special
            }
        raise ValueError(f"allowed_special={allowed_special} not understood")

    def _special_plan(self, text: str, special: dict[str, int], batch: list):
        """Split ``text`` on exact special-token matches; text parts append
        their (byte array, chunk-end offsets) to ``batch``; returns the
        reassembly plan [("s", id) | ("t", batch index)]."""
        plan: list[tuple[str, int]] = []
        if not special:
            data, ends = self._split_arrays(text)
            if len(ends):
                plan.append(("t", len(batch)))
                batch.append((data, ends))
            return plan
        special_pattern = "(" + "|".join(re.escape(k) for k in special) + ")"
        for part in re.split(special_pattern, text):
            if part in special:
                plan.append(("s", special[part]))
            elif part:
                data, ends = self._split_arrays(part)
                if len(ends):
                    plan.append(("t", len(batch)))
                    batch.append((data, ends))
        return plan

    @staticmethod
    def _assemble(plan, encoded) -> list[int]:
        ids: list[int] = []
        for kind, v in plan:
            if kind == "s":
                ids.append(v)
            else:
                ids.extend(encoded[v].tolist())
        return ids

    def encode(self, text: str, allowed_special="none_raise") -> list[int]:
        """Special-token-aware encode; allowed_special semantics per
        minbpe/regex.py:123-164 ("all" | "none" | "none_raise" | set)."""
        special = self._resolve_special(text, allowed_special)
        if not special:
            return self.encode_ordinary(text)
        # Exact-match split on the registered specials (capturing group keeps
        # the specials as their own parts), then encode ALL text parts in one
        # batched device program (engine.encode_parts) — the reference
        # dispatches one encode per part (minbpe/regex.py:152-163).
        batch: list = []
        plan = self._special_plan(text, special, batch)
        encoded = engine.encode_parts(self, batch)
        return self._assemble(plan, encoded)

    def encode_batch(self, texts: list[str],
                     allowed_special="none_raise") -> list[list[int]]:
        """Encode many independent documents in ONE batched device program.

        TPU-native serving surface (no reference counterpart — the reference
        encodes one string at a time, minbpe/regex.py:123-164): all documents'
        text parts ride a single segmented stream through engine.encode_parts,
        so per-call dispatch/transfer overhead is paid once per batch instead
        of once per document. Result ids are exactly ``[self.encode(t,
        allowed_special) for t in texts]``.
        """
        batch: list = []
        plans = [
            self._special_plan(t, self._resolve_special(t, allowed_special),
                               batch)
            for t in texts
        ]
        encoded = engine.encode_parts(self, batch)
        return [self._assemble(plan, encoded) for plan in plans]

"""GPT4Tokenizer: cl100k_base-exact tokenizer (tiktoken parity).

Behavior-compatible with the reference GPT4Tokenizer (minbpe/gpt4.py:57-130):
merge forest recovered from tiktoken's ``_mergeable_ranks`` (which stores only
merged byte sequences, minbpe/gpt4.py:11-46), the historical byte-shuffle
permutation applied before BPE and inverted after decode
(minbpe/gpt4.py:76-92), and the five GPT-4 special tokens.

Differences in mechanism (not behavior):
- ranks load hermetically from a vendored/env/cache file when offline
  (the reference requires a network fetch at construction, minbpe/gpt4.py:63);
- the recovered merge forest is cached on disk (recovery is a one-time
  ~100K-token BPE replay);
- encode runs on device through the flat-stream encoder + cuckoo hash
  table (ops/flat_encode.py, ops/ranktab.py) — a dense table at this vocab
  would be 40 GB.
"""

from __future__ import annotations

import base64
import hashlib
import os

import numpy as np

from .regex import RegexTokenizer, GPT4_SPLIT_PATTERN

GPT4_SPECIAL_TOKENS = {
    "<|endoftext|>": 100257,
    "<|fim_prefix|>": 100258,
    "<|fim_middle|>": 100259,
    "<|fim_suffix|>": 100260,
    "<|endofprompt|>": 100276,
}

_VENDORED = os.path.join(os.path.dirname(__file__), "data", "cl100k_base.tiktoken")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "minbpe_tpu"
)
# sha1 of the cl100k blob URL — how tiktoken names its cache files
_TIKTOKEN_CACHE_NAME = hashlib.sha1(
    b"https://openaipublic.blob.core.windows.net/encodings/cl100k_base.tiktoken"
).hexdigest()


def _candidate_rank_files():
    yield os.environ.get("MINBPE_TPU_CL100K", "")
    yield _VENDORED
    for cache_root in (
        os.environ.get("TIKTOKEN_CACHE_DIR", ""),
        os.environ.get("DATA_GYM_CACHE_DIR", ""),
        os.path.join(os.environ.get("TMPDIR", "/tmp"), "data-gym-cache"),
    ):
        if cache_root:
            yield os.path.join(cache_root, _TIKTOKEN_CACHE_NAME)


def _find_rank_file() -> str | None:
    for p in _candidate_rank_files():
        if p and os.path.isfile(p):
            return p
    return None


def cl100k_ranks_available() -> bool:
    # _candidate_rank_files already probes tiktoken's own cache directories
    # (TIKTOKEN_CACHE_DIR / DATA_GYM_CACHE_DIR / $TMPDIR/data-gym-cache), so a
    # primed tiktoken cache counts as available without touching the network.
    return _find_rank_file() is not None


def load_cl100k_ranks() -> dict[bytes, int]:
    """token bytes -> rank, from the first available source."""
    path = _find_rank_file()
    if path is not None:
        ranks: dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tok_b64, rank_s = line.split()
                ranks[base64.b64decode(tok_b64)] = int(rank_s)
        return ranks
    try:  # last resort: tiktoken (requires network on first use)
        import tiktoken

        return tiktoken.get_encoding("cl100k_base")._mergeable_ranks
    except Exception as e:
        raise RuntimeError(
            "cl100k_base ranks unavailable: vendor the file at "
            f"{_VENDORED} or set MINBPE_TPU_CL100K / TIKTOKEN_CACHE_DIR"
        ) from e


# -- merge forest recovery ---------------------------------------------------

def _split_merged_token(token: bytes, max_rank: int, ranks) -> tuple[bytes, bytes]:
    """Find the final two children of a merged token by replaying BPE on its
    bytes with merges of rank < max_rank (the reconstruction trick of
    minbpe/gpt4.py:11-26)."""
    parts = [token[i:i + 1] for i in range(len(token))]
    while len(parts) > 2:
        best_rank = None
        best_at = -1
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and r < max_rank and (best_rank is None or r < best_rank):
                best_rank, best_at = r, i
        if best_at < 0:
            break
        parts[best_at:best_at + 2] = [parts[best_at] + parts[best_at + 1]]
    assert len(parts) == 2, f"token {token!r} did not reduce to a pair"
    return parts[0], parts[1]


def recover_merge_forest(ranks: dict[bytes, int]) -> dict[tuple[int, int], int]:
    """(child_rank, child_rank) -> rank for every multi-byte token
    (equivalent of minbpe/gpt4.py:29-46)."""
    merges: dict[tuple[int, int], int] = {}
    for token, rank in ranks.items():
        if len(token) < 2:
            continue
        left, right = _split_merged_token(token, rank, ranks)
        merges[(ranks[left], ranks[right])] = rank
    return merges


def _load_recovered(ranks_path_hint: str | None):
    """Load (pairs, new_ids, byte_shuffle) with an on-disk cache."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    key = ranks_path_hint or "network"
    try:
        stamp = str(os.path.getmtime(key)) if os.path.isfile(key) else key
    except OSError:
        stamp = key
    cache = os.path.join(
        _CACHE_DIR,
        "cl100k_merges_" + hashlib.sha1(f"{key}:{stamp}".encode()).hexdigest()[:16]
        + ".npz",
    )
    if os.path.isfile(cache):
        z = np.load(cache)
        return z["pairs"], z["new_ids"], z["byte_shuffle"]

    ranks = load_cl100k_ranks()
    merges = recover_merge_forest(ranks)
    items = sorted(merges.items(), key=lambda kv: kv[1])
    pairs = np.array([[a, b] for (a, b), _ in items], dtype=np.int32)
    new_ids = np.array([r for _, r in items], dtype=np.int32)
    byte_shuffle = np.array([ranks[bytes([i])] for i in range(256)], dtype=np.uint8)
    try:
        np.savez(cache, pairs=pairs, new_ids=new_ids, byte_shuffle=byte_shuffle)
    except OSError:
        pass
    return pairs, new_ids, byte_shuffle


class GPT4Tokenizer(RegexTokenizer):
    """Pretrained cl100k_base tokenizer; train/save/load are disabled
    (minbpe/gpt4.py:95-107)."""

    def __init__(self):
        super().__init__(pattern=GPT4_SPLIT_PATTERN)
        pairs, new_ids, byte_shuffle = _load_recovered(_find_rank_file())
        self._init_pretrained(pairs, new_ids, byte_shuffle,
                              GPT4_SPECIAL_TOKENS)

    @classmethod
    def from_mergeable_ranks(cls, mergeable_ranks: dict[bytes, int],
                             special_tokens: dict[str, int] | None = None):
        """Build a tokenizer from any tiktoken-style ranks dict (token bytes
        -> rank), recovering the merge forest and byte shuffle — the general
        form of what __init__ does for cl100k_base."""
        self = cls.__new__(cls)
        RegexTokenizer.__init__(self, pattern=GPT4_SPLIT_PATTERN)
        merges = recover_merge_forest(mergeable_ranks)
        items = sorted(merges.items(), key=lambda kv: kv[1])
        pairs = np.array([[a, b] for (a, b), _ in items], dtype=np.int32)
        new_ids = np.array([r for _, r in items], dtype=np.int32)
        byte_shuffle = np.array(
            [mergeable_ranks[bytes([i])] for i in range(256)], dtype=np.uint8
        )
        self._init_pretrained(pairs, new_ids, byte_shuffle,
                              special_tokens or {})
        return self

    def _init_pretrained(self, pairs, new_ids, byte_shuffle, special_tokens):
        self.merges = {
            (int(a), int(b)): int(r)
            for (a, b), r in zip(pairs, new_ids)
        }
        vocab = {idx: bytes([idx]) for idx in range(256)}
        for (p0, p1), idx in self.merges.items():
            vocab[idx] = vocab[p0] + vocab[p1]
        self.vocab = vocab  # lives in shuffled-byte space (minbpe/gpt4.py:68-71)
        self.byte_shuffle = np.asarray(byte_shuffle, dtype=np.uint8)
        self.inverse_byte_shuffle = np.argsort(self.byte_shuffle).astype(
            np.uint8
        )
        self.register_special_tokens(dict(special_tokens))
        self._invalidate_device_state()

    def _transform_bytes_array(self, arr):
        """Vectorized byte shuffle for the offsets-based encode path."""
        return self.byte_shuffle[arr]

    def decode(self, ids) -> str:
        """Un-permute bytes after vocab concatenation (minbpe/gpt4.py:87-92).
        Vectorized flat-table gather; unknown ids raise KeyError like the
        reference's vocab[idx]."""
        data, bad = self._decode_table(self.vocab).lookup(ids)
        if bad >= 0:
            raise KeyError(ids[bad])
        arr = np.frombuffer(data, dtype=np.uint8)
        return self.inverse_byte_shuffle[arr].tobytes().decode(
            "utf-8", errors="replace"
        )

    def train(self, text, vocab_size, verbose=False):
        raise NotImplementedError

    def save(self, file_prefix):
        raise NotImplementedError("GPT4Tokenizer cannot be saved.")

    def load(self, model_file):
        raise NotImplementedError("GPT4Tokenizer cannot be loaded.")

    def save_vocab(self, vocab_file):
        """Display-only vocab dump with the shuffle undone
        (minbpe/gpt4.py:109-130)."""
        from .base import render_token

        vocab = {
            idx: bytes([int(self.inverse_byte_shuffle[idx])]) for idx in range(256)
        }
        for (p0, p1), idx in self.merges.items():
            vocab[idx] = vocab[p0] + vocab[p1]
        inverted = {idx: pair for pair, idx in self.merges.items()}
        with open(vocab_file, "w", encoding="utf-8") as f:
            for idx, token in vocab.items():
                s = render_token(token)
                if idx in inverted:
                    i0, i1 = inverted[idx]
                    f.write(
                        f"[{render_token(vocab[i0])}][{render_token(vocab[i1])}]"
                        f" -> [{s}] {idx}\n"
                    )
                else:
                    f.write(f"[{s}] {idx}\n")

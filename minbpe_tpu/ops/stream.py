"""Flat-array token stream substrate.

The reference (karpathy/minbpe) represents token streams as Python ``list[int]``
(minbpe/basic.py:26) or a list of per-chunk lists (minbpe/regex.py:44). On TPU we
instead keep one flat, statically-shaped ``int32`` array resident in HBM:

- ``ids``: int32[N] token ids, padded with ``PAD`` (= -1) past the live length.
- ``seg``: int32[N] segment (chunk) id per token. A *pair* (i, i+1) is only
  countable/mergeable when ``seg[i] == seg[i+1]`` — this is the array encoding of
  the reference's list-of-lists chunk isolation (minbpe/regex.py:44,52-60): merges
  never cross chunk boundaries. BasicTokenizer uses a single segment (all zeros),
  matching minbpe/basic.py:26 where the whole text is one stream.
- ``n``: int32 scalar live length (tokens occupy ``ids[:n]`` in corpus order).

Capacities are bucketed to limit jit recompiles: each distinct capacity N keys a
new XLA executable, so we round up to the next power-of-two-ish bucket.
"""

from __future__ import annotations

import numpy as np

PAD = -1
# Segment id used for padding slots; never equal to a real segment.
PAD_SEG = -1

_MIN_CAPACITY = 128


def bucket_capacity(n: int) -> int:
    """Round a length up to a padded capacity bucket (limits recompilation)."""
    cap = _MIN_CAPACITY
    while cap < n:
        cap *= 2
    return cap


def pack_bytes(data: bytes, capacity: int | None = None):
    """Pack raw bytes into (ids, seg, n) numpy arrays (single segment).

    Mirrors the reference's ``list(text.encode("utf-8"))`` (minbpe/basic.py:25-26)
    but as a padded int32 array.
    """
    n = len(data)
    cap = bucket_capacity(n) if capacity is None else capacity
    ids = np.full(cap, PAD, dtype=np.int32)
    ids[:n] = np.frombuffer(data, dtype=np.uint8)
    seg = np.full(cap, PAD_SEG, dtype=np.int32)
    seg[:n] = 0
    return ids, seg, np.int32(n)


def pack_chunks(chunks: list[bytes], capacity: int | None = None):
    """Pack a list of byte chunks into (ids, seg, n) with one segment per chunk.

    Array encoding of the reference's per-chunk id lists (minbpe/regex.py:44).
    Chunks are laid out in corpus order so that flat scan order equals the
    reference's chunk-by-chunk scan order (minbpe/regex.py:52-54) — this is what
    makes the training tie-break (first-occurrence order) line up exactly.
    """
    n = sum(len(c) for c in chunks)
    cap = bucket_capacity(n) if capacity is None else capacity
    ids = np.full(cap, PAD, dtype=np.int32)
    seg = np.full(cap, PAD_SEG, dtype=np.int32)
    pos = 0
    for s, c in enumerate(chunks):
        ln = len(c)
        ids[pos:pos + ln] = np.frombuffer(c, dtype=np.uint8)
        seg[pos:pos + ln] = s
        pos += ln
    return ids, seg, np.int32(n)


def pack_offsets(data: np.ndarray, ends: np.ndarray, capacity: int | None = None):
    """Pack a byte array + chunk-end offsets into (ids, seg, n) — the fully
    vectorized packing path (no per-chunk Python objects).

    data: uint8/int32 array of the whole text's bytes; ends: int array of
    chunk end offsets (last element == len(data)).
    """
    n = int(data.shape[0])
    cap = bucket_capacity(n) if capacity is None else capacity
    ids = np.full(cap, PAD, dtype=np.int32)
    ids[:n] = data
    seg = np.full(cap, PAD_SEG, dtype=np.int32)
    if len(ends):
        lengths = np.diff(ends, prepend=0)
        seg[:n] = np.repeat(
            np.arange(len(ends), dtype=np.int32), lengths
        )
    return ids, seg, np.int32(n)


def unpack_ids(ids: np.ndarray, n: int) -> list[int]:
    """Return the live token ids as a Python list (host-side boundary)."""
    return np.asarray(ids[:int(n)]).tolist()

"""Pair -> rank lookup tables on device.

Two implementations, selected by vocab size:

- dense:   [V, V] int32 table (ops/encode.py). O(1) gather, memory V^2 —
           right up to vocab ~8K.
- sorted:  the 100K-vocab path. Merge pairs live in two int32 arrays sorted
           lexicographically; lookup is a fixed-depth vectorized binary search
           (pure gathers + compares, no scatter, no hashing, exact). Depth =
           ceil(log2 M) is static, so the whole lookup jits cleanly at any
           batch shape. A dense cl100k table would be 40 GB; this is ~1.2 MB.

No int64 anywhere: lexicographic compares keep everything in int32 (JAX x64
stays off).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

RANK_INF = np.int32(2**31 - 1)


class SortedPairTable:
    """Host-built, device-resident sorted pair table."""

    def __init__(self, pairs: np.ndarray, new_ids: np.ndarray):
        """pairs: int32[M, 2] in rank order; new_ids: int32[M]."""
        M = len(pairs)
        self.num_merges = M
        if M == 0:
            order = np.zeros(0, dtype=np.int64)
        else:
            order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        self.ka = jnp.asarray(pairs[order, 0] if M else np.zeros(1, np.int32))
        self.kb = jnp.asarray(pairs[order, 1] if M else np.zeros(1, np.int32))
        self.rank = jnp.asarray(order.astype(np.int32) if M else np.full(1, RANK_INF))
        self.depth = max(1, int(np.ceil(np.log2(max(M, 2)))))
        # rank-indexed arrays for applying a found merge
        self.merge_pairs = jnp.asarray(pairs if M else np.zeros((1, 2), np.int32))
        self.merge_ids = jnp.asarray(new_ids if M else np.zeros(1, np.int32))

    def lookup(self, a, b, valid):
        """Vectorized (a, b) -> rank index; RANK_INF where absent/invalid."""
        ka, kb, rank = self.ka, self.kb, self.rank
        M = ka.shape[0]
        lo = jnp.zeros_like(a)
        hi = jnp.full_like(a, M - 1)
        # invariant: answer (first index with key >= (a,b)) is in [lo, hi]
        for _ in range(self.depth + 1):
            mid = (lo + hi) >> 1
            ma = ka[mid]
            mb = kb[mid]
            less = (ma < a) | ((ma == a) & (mb < b))
            lo = jnp.where(less, jnp.minimum(mid + 1, M - 1), lo)
            hi = jnp.where(less, hi, mid)
        hit = (ka[lo] == a) & (kb[lo] == b) & valid
        return jnp.where(hit, rank[lo], jnp.int32(RANK_INF))

"""Pair -> rank lookup tables on device.

Three implementations, selected by vocab size / path:

- dense:   [V, V] int32 table (ops/encode.py). O(1) gather, memory V^2 —
           right up to vocab ~8K.
- sorted:  merge pairs in two int32 arrays sorted lexicographically; lookup
           is a fixed-depth vectorized binary search. Exact at any vocab,
           but the depth-17 gather chain is slow on TPU (XLA gathers
           serialize, ~2 ms per 262K-element sweep) — kept for tests and
           non-TPU backends.
- cuckoo:  the 100K-vocab serving path (ops/flat_encode.py). Two hash
           tables of (ka, kb, rank, new_id) rows; every key lives at
           h1(key) in table 1 or h2(key) in table 2, so lookup is EXACTLY
           two row-gathers regardless of table size — vs 17 binary-search
           steps. ~4 MB at cl100k scale (a dense table would be 40 GB).

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


# -- cuckoo hashing ----------------------------------------------------------
#
# The hash must be computed IDENTICALLY on host (numpy, build time) and device
# (jnp, lookup time): uint32 wraparound multiply-xor mixing, table index from
# the low bits.

_SEED_PAIRS = [
    (0x9E3779B1, 0x85EBCA77), (0xC2B2AE3D, 0x27D4EB2F),
    (0x165667B1, 0x9E3779B1), (0x85EBCA77, 0xC2B2AE3D),
    (0x27D4EB2F, 0x165667B1), (0xB2D05E13, 0x94D049BB),
]


def _mix_np(a, b, s1, s2, mask):
    u = (a.astype(np.uint64) * s1 + b.astype(np.uint64) * s2) & 0xFFFFFFFF
    u = u ^ (u >> np.uint64(15))
    u = (u * np.uint64(0x2C1B3C6D)) & np.uint64(0xFFFFFFFF)
    u = u ^ (u >> np.uint64(12))
    return (u & np.uint64(mask)).astype(np.int64)


def mix_jnp(a, b, s1, s2, mask):
    """Device-side twin of _mix_np. a/b int32 arrays; s1/s2/mask uint32."""
    u = a.astype(jnp.uint32) * s1 + b.astype(jnp.uint32) * s2
    u = u ^ (u >> jnp.uint32(15))
    u = u * jnp.uint32(0x2C1B3C6D)
    u = u ^ (u >> jnp.uint32(12))
    return (u & mask).astype(jnp.int32)


def cuckoo_lookup(t1, t2, s1, s2, mask, a, b):
    """Vectorized 2-probe lookup shared by CuckooPairTable.lookup and the
    flat encoder's jitted programs: (a, b) -> (rank, new_id), with
    (RANK_INF, -1) where absent. b < 0 never matches (PAD/invalid)."""
    h1 = mix_jnp(a, b, s1, s2, mask)
    h2 = mix_jnp(b, a, s2, s1, mask)
    r1 = t1[h1]
    r2 = t2[h2]
    ok = b >= 0
    hit1 = ok & (r1[..., 0] == a) & (r1[..., 1] == b)
    hit2 = ok & (r2[..., 0] == a) & (r2[..., 1] == b)
    rank = jnp.where(hit1, r1[..., 2],
                     jnp.where(hit2, r2[..., 2], jnp.int32(RANK_INF)))
    nid = jnp.where(hit1, r1[..., 3],
                    jnp.where(hit2, r2[..., 3], jnp.int32(-1)))
    return rank, nid


class CuckooPairTable:
    """Two-table cuckoo hash of (pair -> rank, new_id); exactly two probes.

    Built host-side with random-walk insertion; on cycle the build reseeds
    (and eventually grows). Device state: two (H, 4) int32 row tables
    [ka, kb, rank, new_id] with ka == -1 marking empty slots, plus the four
    uint32 hash seeds (passed as arrays so different seeds don't recompile).
    """

    def __init__(self, pairs: np.ndarray, new_ids: np.ndarray):
        M = len(pairs)
        self.num_merges = M
        H = 64
        while H * 2 < max(M, 1) * 3:  # combined load factor <= 3/4... per-table 0.375
            H *= 2
        while True:
            for seeds in _SEED_PAIRS:
                t = self._try_build(pairs, new_ids, H, seeds)
                if t is not None:
                    self.H = H
                    self.seeds = seeds
                    self.t1 = jnp.asarray(t[0])
                    self.t2 = jnp.asarray(t[1])
                    self.s1 = jnp.uint32(seeds[0])
                    self.s2 = jnp.uint32(seeds[1])
                    self.mask = jnp.uint32(H - 1)
                    return
            H *= 2  # extremely unlikely at load 0.375

    @staticmethod
    def _try_build(pairs, new_ids, H, seeds):
        M = len(pairs)
        t1 = np.full((H, 4), -1, dtype=np.int32)
        t2 = np.full((H, 4), -1, dtype=np.int32)
        if M == 0:
            return t1, t2
        s1, s2 = np.uint64(seeds[0]), np.uint64(seeds[1])
        a = pairs[:, 0].astype(np.int64)
        b = pairs[:, 1].astype(np.int64)
        h1 = _mix_np(a, b, s1, s2, H - 1)
        h2 = _mix_np(b, a, s2, s1, H - 1)  # swapped args decorrelate
        max_kicks = 32 + 4 * int(np.ceil(np.log2(max(M, 2))))
        for i in range(M):
            row = np.array([pairs[i, 0], pairs[i, 1], i, new_ids[i]],
                           dtype=np.int32)
            hh1, hh2 = int(h1[i]), int(h2[i])
            side = 0
            for _ in range(max_kicks):
                tab, h = (t1, hh1) if side == 0 else (t2, hh2)
                if tab[h, 0] < 0:
                    tab[h] = row
                    break
                row, tab[h] = tab[h].copy(), row
                ra, rb = int(row[0]), int(row[1])
                hh1 = int(_mix_np(np.int64(ra), np.int64(rb), s1, s2, H - 1))
                hh2 = int(_mix_np(np.int64(rb), np.int64(ra), s2, s1, H - 1))
                side = 1 - side
            else:
                return None  # cycle: reseed/grow
        return t1, t2

    def lookup(self, a, b):
        """Vectorized (a, b) -> (rank, new_id); see cuckoo_lookup."""
        return cuckoo_lookup(self.t1, self.t2, self.s1, self.s2, self.mask,
                             a, b)

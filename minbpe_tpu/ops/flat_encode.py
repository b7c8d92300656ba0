"""Flat-stream BPE encoder for large merge tables — ONE device program.

The serving path for cl100k-scale vocabularies. Replaces the bucketed
chunk-matrix encoder (ops/chunk_encode.py), whose per-(bucket, rows) host
dispatch zoo and depth-17 binary-search lookups made 100K-rank encode
gather-bound and compile-heavy (GPT4_100K_r03: 0.09 MB/s, 122 s of warm
compiles). Design, driven by measured per-op costs on the tunneled v5e:

- the WHOLE corpus is one tombstoned (R, 128) stream; chunks are segments.
  Per iteration every chunk merges all occurrences of its own current
  minimum-rank pair — the provably equivalent rowwise rule of
  ops/chunk_encode.py applied per segment (reference loop:
  minbpe/regex.py:96-108 per chunk). Per-segment min is a blocked segmented
  min-scan (~0.04 ms at 262K elements), NOT a local-min shortcut (local-min
  application is inexact: a lower-rank pair created two tokens away can
  invalidate a locally-minimal merge).
- pair->rank lookups hit a cuckoo hash table: EXACTLY two row-gathers per
  sweep (ops/ranktab.CuckooPairTable) vs 17 binary-search gather steps.
- ranks are CACHED in an r-plane. After the first sweep, only positions
  whose pair changed (merge sites and their left neighbors, ~2 sites per
  merge) are re-looked-up: they are compacted by one device sort (~0.3 ms —
  full-N gathers cost ~2 ms, small-K gathers are free), looked up at
  K = COMPACT_K, and scattered back. Iterations with more changes than that
  fall back to a full-plane lookup (early iterations only).
- everything — init lookup, the merge fixpoint loop, termination — is ONE
  jitted lax.while_loop program per 1/8-octave size bucket: no host
  round-trips (25 ms each here), no per-bucket compile zoo.

Exactness: differential-tested against ops/chunk_encode and the reference
oracle (tests/test_flat_encode.py), including the synthetic 100,256-rank
GPT-4 suite.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import scan2d
from .scan2d import C, INT32_MAX
from .ranktab import CuckooPairTable, RANK_INF, cuckoo_lookup

COMPACT_K = 4096


def encode_capacity(n: int) -> int:
    """1/8-octave padded capacity (bounded compile count, <=12.5% padding)."""
    lo = C * 8
    p = 1 << max(n - 1, 1).bit_length()
    gran = max(lo, p // 8)
    return max(lo, -(-n // gran) * gran)


def _lookup_full(table_args, a, b):
    return cuckoo_lookup(*table_args, a, b)


@partial(jax.jit, static_argnames=("R",))
def _encode_flat(data, ends, n, t1, t2, s1, s2, mask, R: int):
    """data: uint8[R*C]; ends: int32[E] chunk-end offsets (pad = R*C, dropped);
    returns the token plane with -1 at consumed/padding slots (flat order =
    corpus order)."""
    N = R * C
    table_args = (t1, t2, s1, s2, mask)
    iota = jnp.arange(N, dtype=jnp.int32)
    live0 = (iota < n).astype(jnp.int32)
    marks = jnp.zeros((N,), jnp.int32).at[ends].add(1, mode="drop")
    seg1 = jnp.cumsum(marks)
    seg = jnp.where(iota < n, seg1, -3).reshape(R, C)
    ids0 = jnp.where(iota < n, data.astype(jnp.int32), -1).reshape(R, C)
    live0 = live0.reshape(R, C)
    fiota = scan2d.flat_iota(R)

    def adjacency(ids, live, extra):
        """(pair-valid b ids (-1 where none), scans of extra flag planes)."""
        found, bi, bs, bx = scan2d.select_scan_rev_exclusive(
            live, (ids, seg, extra), (-1, -3, 0))
        pairok = (live == 1) & (found == 1) & (bs == seg)
        return jnp.where(pairok, bi, -1), bx

    # initial adjacency + full lookup
    b0, _ = adjacency(ids0, live0, live0)
    r0, nid0 = _lookup_full(table_args, ids0, b0)
    r0 = jnp.where(live0 == 1, r0, jnp.int32(RANK_INF))

    def cond(st):
        return st[4]

    def body(st):
        ids, live, r, nid, _ = st
        rmin = scan2d.seg_min_flat(seg, r)
        m = ((live == 1) & (r == rmin) & (rmin != RANK_INF)).astype(jnp.int32)

        # left-first overlap parity on the chain (minbpe/base.py:25-41)
        s1_, mp = scan2d.select_scan_fwd_exclusive(live, m, 0)
        mp = jnp.where(s1_ == 1, mp, 0)
        new_run = m * (1 - mp)
        chain = scan2d.cumsum_flat(live)
        s2_, cps = scan2d.select_scan_fwd(new_run, chain, 0)
        cps = jnp.where(s2_ == 1, cps, 0)
        keep = ((m == 1) & (((chain - cps) & 1) == 0)).astype(jnp.int32)

        # apply: relabel kept, kill the consumed next-live token
        ids2 = jnp.where(keep == 1, nid, ids)
        s3_, kp = scan2d.select_scan_fwd_exclusive(live, keep, 0)
        kp = jnp.where(s3_ == 1, kp, 0)
        killed = (live == 1) & (kp == 1)
        live2 = jnp.where(killed, 0, live)

        # post-merge adjacency (+ "next live is kept" flag for invalidation)
        b2, bk = adjacency(ids2, live2, keep)
        changed = (live2 == 1) & ((keep == 1) | (bk == 1))

        r1 = jnp.where(killed, jnp.int32(RANK_INF), r)
        nid1 = jnp.where(killed, jnp.int32(-1), nid)
        nch = jnp.sum(changed.astype(jnp.int32))

        def full(_):
            rf, nf = _lookup_full(table_args, ids2, b2)
            rf = jnp.where(live2 == 1, rf, jnp.int32(RANK_INF))
            return rf, nf

        def compact(_):
            pos = jnp.where(changed, fiota, INT32_MAX).reshape(-1)
            posk = jax.lax.sort(pos)[:COMPACT_K]
            ok = posk < INT32_MAX
            idx = jnp.minimum(posk, N - 1)
            ak = ids2.reshape(-1)[idx]
            bk_ = b2.reshape(-1)[idx]
            rk, nk = _lookup_full(table_args, ak, bk_)
            tgt = jnp.where(ok, posk, N)
            rf = r1.reshape(-1).at[tgt].set(rk, mode="drop").reshape(R, C)
            nf = nid1.reshape(-1).at[tgt].set(nk, mode="drop").reshape(R, C)
            return rf, nf

        r2, nid2 = jax.lax.cond(nch <= COMPACT_K, compact, full, None)
        active = jnp.any(r2 != RANK_INF)
        return ids2, live2, r2, nid2, active

    st = (ids0, live0, r0, nid0, jnp.any(r0 != RANK_INF))
    ids_f, live_f, _, _, _ = jax.lax.while_loop(cond, body, st)
    return jnp.where(live_f == 1, ids_f, -1)


def _pad_inputs(data: np.ndarray, ends: np.ndarray):
    n = int(data.shape[0])
    cap = encode_capacity(n)
    d = np.zeros(cap, dtype=np.uint8)
    d[:n] = data
    p = 1 << max(len(ends) - 1, 1).bit_length()
    gran = max(128, p // 8)
    ecap = max(128, -(-len(ends) // gran) * gran)
    e = np.full(ecap, cap, dtype=np.int32)
    e[:len(ends)] = ends
    return d, e, cap


def encode_offsets_arrays(data: np.ndarray, ends: np.ndarray,
                          table: CuckooPairTable):
    """Encode (byte array, chunk-end offsets) -> (flat int32 tokens in corpus
    order, int64 per-chunk output lengths). Drop-in contract of
    ops/chunk_encode.encode_offsets_arrays."""
    n_chunks = len(ends)
    if n_chunks == 0 or data.shape[0] == 0:
        return np.zeros(0, np.int32), np.zeros(n_chunks, np.int64)
    d, e, cap = _pad_inputs(np.ascontiguousarray(data), ends)
    plane = _encode_flat(
        jnp.asarray(d), jnp.asarray(e), jnp.int32(data.shape[0]),
        table.t1, table.t2, table.s1, table.s2, table.mask, cap // C,
    )
    flat = np.asarray(plane).reshape(-1)
    mask = flat >= 0
    toks = flat[mask].astype(np.int32)
    pos = np.nonzero(mask)[0]
    cidx = np.searchsorted(np.asarray(ends, dtype=np.int64), pos, side="right")
    lens = np.bincount(cidx, minlength=n_chunks).astype(np.int64)
    return toks, lens


def encode_offsets(data: np.ndarray, ends: np.ndarray,
                   table: CuckooPairTable) -> list[int]:
    flat, _ = encode_offsets_arrays(data, ends, table)
    return flat.tolist()

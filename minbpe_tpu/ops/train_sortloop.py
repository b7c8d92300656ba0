"""Sort-round BPE training loop — the large-vocab fast path (any V, any N).

The sparse slot-table loop (ops/train_sparse.py) is exact at any vocab but
its per-round pointer gathers and colliding scatter-adds serialize on TPU
(measured ~2 ms per full-N gather; 37.7 ms/round at vocab 8192). This loop
uses only the primitives that are actually fast on the hardware:

- ``lax.sort`` over the stream (~0.33 ms at 262K elements — XLA's TPU sort
  is fully vectorized, unlike its gathers): one stable lexicographic sort of
  (pair_a, pair_b, position) per round groups equal pairs into runs. Run
  length = the pair's exact count; the run head's position = its FIRST
  stream occurrence, which is the reference tie-break key
  (minbpe/basic.py:35 + base.py:20-21) — so selection is a handful of
  reduces, with no count matrix of ANY size;
- blocked (R, 128) select-scans (ops/scan2d.py) for next-live adjacency
  over tombstones and the left-first overlap parity (minbpe/base.py:25-41)
  — no compaction, no pointer chains, no gathers;
- the whole run is one ``fori_loop`` dispatch (or host-stepped with large
  unroll when checkpoints/progress are requested).

Unlike the dense/incremental paths there is no V-dependent memory or work at
all: vocab 8192 and vocab 100K cost the same per round. Exactness:
bit-identical to the sort/dense/sparse paths and the oracle
(tests/test_sortloop.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import scan2d
from .scan2d import C, INT32_MAX


def _pad_to_planes(ids, seg, n):
    N = ids.shape[0]
    R = -(-N // C)
    pad = R * C - N
    idx = jnp.arange(N + pad, dtype=jnp.int32)
    ids2 = jnp.pad(ids, (0, pad), constant_values=-1)
    seg2 = jnp.pad(seg, (0, pad), constant_values=-3)
    live = (idx < n).astype(jnp.int32)
    return ids2, seg2, live, R


def _round(i, M, state):
    ids, seg, live, pairs_out, cnts_out, fail = state
    N = ids.shape[0]
    R = N // C
    idx = jnp.arange(N, dtype=jnp.int32)

    # next-live adjacency over tombstones (the array form of chunk-local
    # pair counting, minbpe/regex.py:52-54)
    live2d = live.reshape(R, C)
    found, bi, bs = scan2d.select_scan_rev_exclusive(
        live2d, (ids.reshape(R, C), seg.reshape(R, C)), (-1, -3))
    valid = ((live2d == 1) & (found == 1) & (bs == seg.reshape(R, C)))
    b = jnp.where(valid, bi, -1).reshape(-1)
    validf = valid.reshape(-1)

    # selection: one stable sort groups pairs; run head = first occurrence
    ka = jnp.where(validf, ids, INT32_MAX)
    kb = jnp.where(validf, b, INT32_MAX)
    sa, sb, spos = jax.lax.sort((ka, kb, idx), num_keys=2, is_stable=True)
    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head = (sa != prev_sa) | (sb != prev_sb)
    svalid = sa != INT32_MAX
    is_head = head & svalid
    marker = jnp.where(head, idx, N)
    next_start = jnp.roll(jax.lax.cummin(marker, reverse=True), -1
                          ).at[N - 1].set(N)
    cnt = jnp.where(is_head, next_start - idx, 0)
    maxc = jnp.max(cnt)
    tied = is_head & (cnt == maxc)
    best_pos = jnp.min(jnp.where(tied, spos, INT32_MAX))
    best_j = jnp.argmax(tied & (spos == best_pos))
    pa = sa[best_j]
    pb = sb[best_j]
    ok = (maxc > 0) & (fail >= i)

    def do(_):
        new_id = jnp.int32(256) + i
        m = (valid & (ids.reshape(R, C) == pa) & (bi == pb)).astype(jnp.int32)
        s1, mp = scan2d.select_scan_fwd_exclusive(live2d, m, 0)
        new_run = m * (1 - jnp.where(s1 == 1, mp, 0))
        chain = scan2d.cumsum_flat(live2d)
        s2, cps = scan2d.select_scan_fwd(new_run, chain, 0)
        keep = ((m == 1) & (((chain - cps) & 1) == 0)).astype(jnp.int32)
        s3, kp = scan2d.select_scan_fwd_exclusive(live2d, keep, 0)
        killed = (live2d == 1) & (jnp.where(s3 == 1, kp, 0) == 1)
        ids2 = jnp.where(keep == 1, new_id, ids.reshape(R, C)).reshape(-1)
        live3 = jnp.where(killed, 0, live2d).reshape(-1)
        return (ids2, seg, live3,
                pairs_out.at[i, 0].set(pa, mode="drop")
                         .at[i, 1].set(pb, mode="drop"),
                cnts_out.at[i].set(maxc, mode="drop"), fail)

    def skip(_):
        new_fail = jnp.where(maxc > 0, fail, jnp.minimum(fail, i))
        return (ids, seg, live, pairs_out, cnts_out, new_fail)

    return jax.lax.cond(ok, do, skip, None)


@partial(jax.jit, static_argnames=("num_merges",))
def train_merges_sortloop(ids, seg, n, num_merges: int):
    """Whole-run one-dispatch driver. Same contract as ops.train.train_merges:
    (pairs[M, 2], counts[M], fail_round)."""
    M = num_merges
    ids2, seg2, live, R = _pad_to_planes(jnp.asarray(ids), jnp.asarray(seg),
                                         jnp.asarray(n))
    state = (ids2, seg2, live,
             jnp.zeros((M, 2), jnp.int32), jnp.zeros((M,), jnp.int32),
             jnp.int32(M))
    state = jax.lax.fori_loop(0, M, lambda i, s: _round(i, M, s), state)
    return state[3], state[4], state[5]


@partial(jax.jit, static_argnames=("M", "unroll"), donate_argnums=(0,))
def _step(state, i0, M: int, unroll: int):
    def body(k, s):
        return _round(i0 + k, M, s)
    return jax.lax.fori_loop(0, unroll, body, state)


def train_merges_sortloop_stepped(ids, seg, n, num_merges: int,
                                  unroll: int = 256,
                                  checkpoint_path: str | None = None,
                                  checkpoint_every: int | None = None,
                                  resume_from: str | None = None,
                                  progress=None):
    """Host-driven driver: ceil(M/unroll) async step dispatches, bit-identical
    to train_merges_sortloop. Supports resumable checkpoints + progress in
    the same format as the other stepped drivers."""
    import numpy as np

    from ..utils import checkpoint as ckpt
    from .merge import apply_merge

    M = num_merges
    ids = jnp.asarray(ids)
    seg = jnp.asarray(seg)
    n = jnp.asarray(n)

    fp = None
    if checkpoint_path is not None or resume_from is not None:
        fp = ckpt.corpus_fingerprint(np.asarray(ids), np.asarray(seg), int(n))

    start = 0
    prefill = None
    if resume_from is not None:
        c = ckpt.load(resume_from)
        if c["fingerprint"] != fp:
            raise ValueError("checkpoint does not match this corpus")
        if c["num_merges"] != M:
            raise ValueError(
                f"checkpoint trained toward {c['num_merges']} merges, "
                f"requested {M}"
            )
        start = c["round_idx"]
        for i in range(start):  # deterministic merge-prefix replay
            pa, pb = int(c["pairs"][i, 0]), int(c["pairs"][i, 1])
            ids, seg, n, _ = apply_merge(
                ids, seg, n, jnp.int32(pa), jnp.int32(pb), jnp.int32(256 + i)
            )
        prefill = (c["pairs"], c["counts"])

    ids2, seg2, live, R = _pad_to_planes(ids, seg, n)
    pairs0 = jnp.zeros((M, 2), jnp.int32)
    cnts0 = jnp.zeros((M,), jnp.int32)
    if prefill is not None:
        pairs0 = pairs0.at[:start].set(jnp.asarray(prefill[0], jnp.int32))
        cnts0 = cnts0.at[:start].set(jnp.asarray(prefill[1], jnp.int32))
    state = (ids2, seg2, live, pairs0, cnts0, jnp.int32(M))

    for i0 in range(start, M, unroll):
        u = min(unroll, M - i0)
        state = _step(state, jnp.int32(i0), M, u)
        done = i0 + u
        if progress is not None:
            progress(done, M)
        if (checkpoint_path is not None and checkpoint_every
                and (done % checkpoint_every == 0 or done >= M) and done < M):
            ckpt.save(checkpoint_path, np.asarray(state[3]),
                      np.asarray(state[4]), done, M, fp)
    return state[3], state[4], state[5]

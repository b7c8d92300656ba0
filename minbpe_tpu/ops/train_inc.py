"""Incremental-count BPE training loop (the speed-of-light small-vocab path).

The baseline loops (ops/train.py) recount every pair each round — O(N) sort or
O(N·V²/block) matmul per round. But a merge only changes pair counts *around
its application sites*: merging (a,b)->c at k sites destroys the pairs
touching those sites and creates pairs involving c. This loop maintains:

- a dense [V, V] count matrix, updated per round with two masked scatter-adds
  (one for destroyed pair slots, one for created ones);
- a tombstone chain (live / nxt / prv arrays) instead of compacting the
  stream: consumed tokens are unlinked, adjacency is ``(i, nxt[i])``;
- chain-order positions via one cumsum, so the left-first overlap parity
  (minbpe/base.py:33-41) is computed exactly on the chain;
- the reference tie-break lazily: the [V,V] argmax alone decides the round
  unless several pairs share the max count, in which case one masked scan
  finds the pair whose first occurrence (chain order = corpus order,
  minbpe/base.py:20-21) is earliest.

Per round: ~10 elementwise/gather passes over N + a V² reduction — no sort,
no recount, no compaction.

Two drivers around the same round function:
- ``train_merges_incremental``: a single jitted ``fori_loop`` (one dispatch
  for the whole run — right when device-side loops are cheap);
- ``train_merges_stepped``: a host-driven loop dispatching a jitted
  ``unroll``-round step per call. On backends where each device-side loop
  iteration pays a host round-trip (e.g. remotely-tunneled PJRT plugins),
  async step dispatch pipelines and is dramatically faster.

Exactness is checked against the sort path and the oracle in
tests/test_train_inc.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .select import count_pairs_dense

INT32_MAX = 2**31 - 1


def _round(i, M, V, state):
    """One exact BPE merge round over the tombstone-chain state."""
    ids_, seg, live_, nxt_, prv_, counts, pairs_out, cnts_out, fail = state
    N = ids_.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    def gather_n(arr, j, fill):
        return jnp.where(j < N, arr[jnp.minimum(j, N - 1)], fill)

    def pair_keys(ids2, live2, nxt2):
        j = nxt2
        b = gather_n(ids2, j, -1)
        sj = gather_n(seg, j, -2)
        valid = live2 & (j < N) & (seg == sj)
        return b, valid

    maxc = jnp.max(counts)
    tied = counts == maxc
    n_tied = jnp.sum(tied.astype(jnp.int32))

    b_all, valid = pair_keys(ids_, live_, nxt_)

    def pick_unique(_):
        flat = jnp.argmax(counts.reshape(-1))
        return (flat // V).astype(jnp.int32), (flat % V).astype(jnp.int32)

    def pick_tied(_):
        ia = jnp.clip(ids_, 0, V - 1)
        ib = jnp.clip(b_all, 0, V - 1)
        hit = valid & tied[ia, ib]
        first = jnp.argmax(hit)
        return ids_[first], b_all[first]

    pa, pb = jax.lax.cond(n_tied == 1, pick_unique, pick_tied, None)
    ok = (maxc > 0) & (fail >= i) & (i < M)

    def do(_):
        c_id = jnp.int32(256) + i
        # --- match + left-first parity on the chain ---
        m = valid & (ids_ == pa) & (b_all == pb)
        m_at_prv = jnp.where(prv_ >= 0, m[jnp.maximum(prv_, 0)], False)
        new_run = m & ~m_at_prv
        chainpos = jnp.cumsum(live_.astype(jnp.int32))
        run_start = jax.lax.cummax(jnp.where(new_run, idx, -1))
        cp_start = chainpos[jnp.maximum(run_start, 0)]
        keep = m & (((chainpos - cp_start) & 1) == 0)

        # --- count deltas: remove destroyed pair slots (pre-merge) ---
        keep_at_prv = jnp.where(prv_ >= 0, keep[jnp.maximum(prv_, 0)], False)
        changed = keep | keep_at_prv          # relabeled or consumed
        changed_at_nxt = gather_n(changed.astype(jnp.int32), nxt_, 0) == 1
        rem = valid & (changed | changed_at_nxt)
        ra = jnp.where(rem, ids_, V)          # V = out of bounds -> drop
        rb = jnp.where(rem, b_all, V)
        counts2 = counts.at[ra, rb].add(-1, mode="drop")

        # --- structure update ---
        partner = jnp.minimum(nxt_, N - 1)    # valid where keep
        new_ids = jnp.where(keep, c_id, ids_)
        kill_idx = jnp.where(keep, partner, N)  # consumed tokens
        new_live = live_.at[kill_idx].set(False, mode="drop")
        nxt_of_partner = gather_n(nxt_, kill_idx, N)
        new_nxt = jnp.where(keep, nxt_of_partner, nxt_)
        tgt = jnp.where(keep, nxt_of_partner, N)
        new_prv = prv_.at[tgt].set(idx, mode="drop")

        # --- count deltas: add created pair slots (post-merge) ---
        b_post, valid_post = pair_keys(new_ids, new_live, new_nxt)
        is_new = keep
        new_at_nxt = gather_n(is_new.astype(jnp.int32), new_nxt, 0) == 1
        add = valid_post & (is_new | new_at_nxt)
        aa = jnp.where(add, new_ids, V)
        ab = jnp.where(add, b_post, V)
        counts3 = counts2.at[aa, ab].add(1, mode="drop")

        return (new_ids, seg, new_live, new_nxt, new_prv, counts3,
                pairs_out.at[i, 0].set(pa, mode="drop")
                         .at[i, 1].set(pb, mode="drop"),
                cnts_out.at[i].set(maxc, mode="drop"), fail)

    def skip(_):
        new_fail = jnp.where((maxc > 0) | (i >= M), fail, jnp.minimum(fail, i))
        return (ids_, seg, live_, nxt_, prv_, counts, pairs_out, cnts_out,
                new_fail)

    return jax.lax.cond(ok, do, skip, None)


@partial(jax.jit, static_argnames=("V", "M"))
def _init_state(ids, seg, n, V: int, M: int):
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    live = idx < n
    nxt = jnp.where(idx + 1 < n, idx + 1, N)
    prv = idx - 1
    counts = count_pairs_dense(ids, seg, n, V)
    return (ids, seg, live, nxt, prv, counts,
            jnp.zeros((M, 2), jnp.int32), jnp.zeros((M,), jnp.int32),
            jnp.int32(M))


@partial(jax.jit, static_argnames=("num_merges", "vocab_base"))
def train_merges_incremental(ids, seg, n, num_merges: int,
                             vocab_base: int = 256):
    """Whole-run fori_loop driver. Same contract as ops.train.train_merges:
    returns (pairs[M,2], counts[M], fail_round)."""
    M = num_merges
    V = vocab_base + num_merges
    state = _init_state(ids, seg, n, V, M)
    state = jax.lax.fori_loop(
        0, M, lambda i, s: _round(i, M, V, s), state
    )
    return state[6], state[7], state[8]


@partial(jax.jit, static_argnames=("V", "M", "unroll"), donate_argnums=(0,))
def _step(state, i0, V: int, M: int, unroll: int):
    for k in range(unroll):
        state = _round(i0 + k, M, V, state)
    return state


def train_merges_stepped(ids, seg, n, num_merges: int, unroll: int = 8,
                         checkpoint_path: str | None = None,
                         checkpoint_every: int | None = None,
                         resume_from: str | None = None,
                         progress=None):
    """Host-driven driver: ceil(M/unroll) async step dispatches.

    Bit-identical to train_merges_incremental; preferred on backends with
    expensive device-side loop iterations. Optionally writes resumable
    checkpoints every ``checkpoint_every`` rounds and/or resumes from one
    (utils/checkpoint.py); calls ``progress(done_rounds, total)`` per step.
    """
    import numpy as np
    from ..utils import checkpoint as ckpt
    from .merge import apply_merge

    M = num_merges
    V = 256 + num_merges
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
        # deterministic replay of the merge prefix onto the stream
        for i in range(start):
            pa, pb = int(c["pairs"][i, 0]), int(c["pairs"][i, 1])
            ids, seg, n, _ = apply_merge(
                ids, seg, n, jnp.int32(pa), jnp.int32(pb), jnp.int32(256 + i)
            )
        prefill = (c["pairs"], c["counts"])

    state = _init_state(ids, seg, n, V, M)
    if prefill is not None:
        pairs0 = jnp.zeros((M, 2), jnp.int32).at[:start].set(
            jnp.asarray(prefill[0], jnp.int32))
        cnts0 = jnp.zeros((M,), jnp.int32).at[:start].set(
            jnp.asarray(prefill[1], jnp.int32))
        state = state[:6] + (pairs0, cnts0, state[8])

    for i0 in range(start, M, unroll):
        state = _step(state, jnp.int32(i0), V, M, unroll)
        done = min(i0 + unroll, M)
        if progress is not None:
            progress(done, M)
        if (checkpoint_path is not None and checkpoint_every
                and (done % checkpoint_every == 0 or done >= M) and done < M):
            ckpt.save(checkpoint_path, np.asarray(state[6]),
                      np.asarray(state[7]), done, M, fp)
    return state[6], state[7], state[8]

"""Sparse incremental BPE training loop — exact at ANY vocab size.

The incremental path (ops/train_inc.py) keeps a dense [V, V] count matrix:
perfect to ~2K vocab, 40 GB at cl100k scale. The sort path (ops/select.py)
works at any vocab but re-sorts the whole stream every round. This module is
the large-vocab fast path the reference's loop (minbpe/regex.py:49-66) implies
at arbitrary ``vocab_size``: incremental counting with NO V^2 buffer and NO
per-round sort.

Core observation: every pair a merge round CREATES contains that round's
brand-new id ``c = 256 + i`` — created pairs are ``(prev, c)`` or
``(c, next)``. The newest id in a key therefore pins the single round the key
can ever first appear in, so each distinct pair enters the count structure AT
MOST ONCE over the whole run. That turns the count structure into an
append-only slot table:

- ``ta/tb/tc [P]``: pair keys and exact counts, appended in creation order,
  never moved (P <= initial distinct pairs + 2 * total merge occurrences);
- ``pos2slot [N]``: for every live stream position, the table slot of the
  pair starting there. Destroyed-pair decrements become one masked
  scatter-add through ``pos2slot`` — no lookups, no hashing, no sort;
- per-round created keys are deduplicated with two dense ``[V]`` vectors
  (left keys ``(x, c)`` bucketed by x, right keys ``(c, y)`` by y — the
  ``(c, c)`` key is routed to the right table only), ranked by cumsum, and
  appended in one scatter. Their slots flow back into ``pos2slot`` via two
  [V]-gathers.

Selection replicates the reference argmax + first-occurrence tie-break
(minbpe/basic.py:35, base.py:20-21): ``max(tc)`` over the table, and only on
actual count ties one masked pass over the stream — ``hit[p] = valid[p] and
tc[pos2slot[p]] == maxc`` — whose argmax IS the earliest tied occurrence.

Per round: ~10 elementwise/gather/scatter passes over N + one reduce over P
+ O(V) vector work. No sort after init, no recount, ever.

Exactness: bit-identical to the sort/dense/incremental paths and the oracle
(tests/test_train_sparse.py), including fail rounds and tie-breaks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .select import pair_validity

INT32_MAX = 2**31 - 1


def table_capacity(N: int) -> int:
    """Static slot-table capacity for an N-token stream.

    Initial distinct pairs <= N; every round appends at most 2 keys per kept
    merge site and total kept sites over the whole run is < N (each consumes
    one token), so 3N slots can never overflow. Padded to the lane width."""
    return -(-3 * max(N, 1) // 128) * 128


def _gather(arr, j, fill):
    """arr[j] with fill for out-of-range j (range = arr length)."""
    L = arr.shape[0]
    return jnp.where(j < L, arr[jnp.minimum(j, L - 1)], fill)


@partial(jax.jit, static_argnames=("P", "M"))
def _init_state(ids, seg, n, P: int, M: int):
    """Build the chain + slot table: ONE stable sort (init only), then heads,
    run lengths, and slot ranks exactly as ops/select.py derives counts."""
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    live = idx < n
    nxt = jnp.where(idx + 1 < n, idx + 1, N)
    prv = idx - 1

    valid, nxt_ids = pair_validity(ids, seg, n)
    ka = jnp.where(valid, ids, INT32_MAX)
    kb = jnp.where(valid, nxt_ids, INT32_MAX)
    sa, sb, spos = jax.lax.sort((ka, kb, idx), num_keys=2, is_stable=True)

    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head0 = (sa != prev_sa) | (sb != prev_sb)
    svalid = sa != INT32_MAX
    is_head = head0 & svalid
    marker = jnp.where(head0, idx, N)
    next_start = jnp.roll(
        jax.lax.cummin(marker, reverse=True), -1).at[N - 1].set(N)
    cnt = next_start - idx  # meaningful at heads

    rank = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    size0 = jnp.sum(is_head.astype(jnp.int32))
    slot_at = jnp.where(is_head, rank, P)  # P = out of bounds -> drop
    ta = jnp.zeros((P,), jnp.int32).at[slot_at].set(sa, mode="drop")
    tb = jnp.zeros((P,), jnp.int32).at[slot_at].set(sb, mode="drop")
    tc = jnp.zeros((P,), jnp.int32).at[slot_at].set(cnt, mode="drop")

    # every sorted element inherits its run head's slot; scatter back to the
    # original position order (invalid elements -> sentinel P)
    run_slot = jax.lax.cummax(jnp.where(is_head, rank, -1))
    p2s = jnp.full((N,), P, jnp.int32).at[
        jnp.where(svalid, spos, N)].set(run_slot, mode="drop")

    return (ids, seg, live, nxt, prv, ta, tb, tc, size0, p2s,
            jnp.zeros((M, 2), jnp.int32), jnp.zeros((M,), jnp.int32),
            jnp.int32(M))


def _round(i, M, V, P, state):
    """One exact BPE merge round over chain + slot-table state."""
    (ids_, seg, live_, nxt_, prv_, ta, tb, tc, size, p2s,
     pairs_out, cnts_out, fail) = state
    N = ids_.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    def pair_keys(ids2, live2, nxt2):
        b = _gather(ids2, nxt2, -1)
        sj = _gather(seg, nxt2, -2)
        valid = live2 & (nxt2 < N) & (seg == sj)
        return b, valid

    b_all, valid = pair_keys(ids_, live_, nxt_)

    # --- selection: argmax count over the table; tie -> earliest stream pos
    maxc = jnp.max(tc)
    tied_n = jnp.sum((tc == maxc).astype(jnp.int32))

    def pick_unique(_):
        flat = jnp.argmax(tc).astype(jnp.int32)
        return ta[flat], tb[flat]

    def pick_tied(_):
        slot_c = _gather(tc, p2s, 0)
        hit = valid & (slot_c == maxc)
        first = jnp.argmax(hit)
        return ids_[first], b_all[first]

    pa, pb = jax.lax.cond(tied_n == 1, pick_unique, pick_tied, None)
    ok = (maxc > 0) & (fail >= i) & (i < M)

    def do(_):
        c_id = jnp.int32(256) + i
        # --- match + left-first overlap parity on the chain
        # (minbpe/base.py:25-41: within a run of consecutive matches, keep
        # even chain offsets from the run start)
        m = valid & (ids_ == pa) & (b_all == pb)
        m_at_prv = jnp.where(prv_ >= 0, m[jnp.maximum(prv_, 0)], False)
        new_run = m & ~m_at_prv
        chainpos = jnp.cumsum(live_.astype(jnp.int32))
        run_start = jax.lax.cummax(jnp.where(new_run, idx, -1))
        cp_start = chainpos[jnp.maximum(run_start, 0)]
        keep = m & (((chainpos - cp_start) & 1) == 0)

        # --- destroyed pair slots decrement through pos2slot (pre-merge)
        keep_at_prv = jnp.where(prv_ >= 0, keep[jnp.maximum(prv_, 0)], False)
        changed = keep | keep_at_prv            # relabeled or consumed
        changed_at_nxt = _gather(changed.astype(jnp.int32), nxt_, 0) == 1
        rem = valid & (changed | changed_at_nxt)
        tc1 = tc.at[jnp.where(rem, p2s, P)].add(-1, mode="drop")

        # --- structure update (identical to ops/train_inc.py)
        partner = jnp.minimum(nxt_, N - 1)      # valid where keep
        new_ids = jnp.where(keep, c_id, ids_)
        kill_idx = jnp.where(keep, partner, N)  # consumed tokens
        new_live = live_.at[kill_idx].set(False, mode="drop")
        nxt_of_partner = _gather(nxt_, kill_idx, N)
        new_nxt = jnp.where(keep, nxt_of_partner, nxt_)
        tgt = jnp.where(keep, nxt_of_partner, N)
        new_prv = prv_.at[tgt].set(idx, mode="drop")

        # --- created pair keys: all contain c_id, so all are NEW table keys.
        # Dedup per side with dense [V] vectors: left keys (x, c) bucket by x
        # (x != c always: x = ids of a non-kept position), right keys (c, y)
        # by y (this side owns (c, c)).
        b_post, valid_post = pair_keys(new_ids, new_live, new_nxt)
        is_new = keep
        new_at_nxt = _gather(is_new.astype(jnp.int32), new_nxt, 0) == 1
        add = valid_post & (is_new | new_at_nxt)
        add_right = add & is_new
        add_left = add & ~is_new
        ry = jnp.where(add_right, jnp.clip(b_post, 0, V - 1), V)
        lx = jnp.where(add_left, ids_, V)
        left_cnt = jnp.zeros((V,), jnp.int32).at[lx].add(1, mode="drop")
        right_cnt = jnp.zeros((V,), jnp.int32).at[ry].add(1, mode="drop")

        left_nz = left_cnt > 0
        right_nz = right_cnt > 0
        left_rank = jnp.cumsum(left_nz.astype(jnp.int32)) - 1
        right_rank = jnp.cumsum(right_nz.astype(jnp.int32)) - 1
        n_left = left_rank[V - 1] + 1
        n_right = right_rank[V - 1] + 1
        left_slot = jnp.where(left_nz, size + left_rank, P)
        right_slot = jnp.where(right_nz, size + n_left + right_rank, P)

        vr = jnp.arange(V, dtype=jnp.int32)
        ta1 = ta.at[left_slot].set(vr, mode="drop") \
                .at[right_slot].set(c_id, mode="drop")
        tb1 = tb.at[left_slot].set(c_id, mode="drop") \
                .at[right_slot].set(vr, mode="drop")
        tc2 = tc1.at[left_slot].set(left_cnt, mode="drop") \
                 .at[right_slot].set(right_cnt, mode="drop")

        # --- pos2slot maintenance: changed-pair positions get the appended
        # slots ([V]-gathers); positions with no pair get the sentinel.
        p2s_new = jnp.where(
            ~valid_post, P,
            jnp.where(add_right, right_slot[jnp.clip(b_post, 0, V - 1)],
                      jnp.where(add_left, left_slot[jnp.clip(ids_, 0, V - 1)],
                                p2s)))

        return (new_ids, seg, new_live, new_nxt, new_prv, ta1, tb1, tc2,
                size + n_left + n_right, p2s_new,
                pairs_out.at[i, 0].set(pa, mode="drop")
                         .at[i, 1].set(pb, mode="drop"),
                cnts_out.at[i].set(maxc, mode="drop"), fail)

    def skip(_):
        new_fail = jnp.where((maxc > 0) | (i >= M), fail,
                             jnp.minimum(fail, i))
        return (ids_, seg, live_, nxt_, prv_, ta, tb, tc, size, p2s,
                pairs_out, cnts_out, new_fail)

    return jax.lax.cond(ok, do, skip, None)


@partial(jax.jit, static_argnames=("num_merges", "capacity"))
def train_merges_sparse(ids, seg, n, num_merges: int,
                        capacity: int | None = None):
    """Whole-run fori_loop driver (one dispatch). Same contract as
    ops.train.train_merges: (pairs[M, 2], counts[M], fail_round)."""
    M = num_merges
    V = 256 + num_merges
    P = capacity if capacity is not None else table_capacity(ids.shape[0])
    state = _init_state(ids, seg, n, P, M)
    state = jax.lax.fori_loop(0, M, lambda i, s: _round(i, M, V, P, s), state)
    return state[10], state[11], state[12]


@partial(jax.jit, static_argnames=("V", "M", "P", "unroll"),
         donate_argnums=(0,))
def _step(state, i0, V: int, M: int, P: int, unroll: int):
    for k in range(unroll):
        state = _round(i0 + k, M, V, P, state)
    return state


def train_merges_sparse_stepped(ids, seg, n, num_merges: int,
                                unroll: int = 16,
                                capacity: int | None = None,
                                checkpoint_path: str | None = None,
                                checkpoint_every: int | None = None,
                                resume_from: str | None = None,
                                progress=None):
    """Host-driven driver: ceil(M/unroll) async step dispatches, bit-identical
    to train_merges_sparse. Supports resumable checkpoints + progress exactly
    like ops/train_inc.train_merges_stepped (same checkpoint format)."""
    import numpy as np

    from ..utils import checkpoint as ckpt
    from .merge import apply_merge

    M = num_merges
    V = 256 + num_merges
    ids = jnp.asarray(ids)
    seg = jnp.asarray(seg)
    n = jnp.asarray(n)
    P = capacity if capacity is not None else table_capacity(ids.shape[0])

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

    state = _init_state(ids, seg, n, P, M)
    if prefill is not None:
        pairs0 = jnp.zeros((M, 2), jnp.int32).at[:start].set(
            jnp.asarray(prefill[0], jnp.int32))
        cnts0 = jnp.zeros((M,), jnp.int32).at[:start].set(
            jnp.asarray(prefill[1], jnp.int32))
        state = state[:10] + (pairs0, cnts0, state[12])

    for i0 in range(start, M, unroll):
        state = _step(state, jnp.int32(i0), V, M, P, unroll)
        done = min(i0 + unroll, M)
        if progress is not None:
            progress(done, M)
        if (checkpoint_path is not None and checkpoint_every
                and (done % checkpoint_every == 0 or done >= M) and done < M):
            ckpt.save(checkpoint_path, np.asarray(state[10]),
                      np.asarray(state[11]), done, M, fp)
    return state[10], state[11], state[12]

"""Jitted BPE encoding over a packed token stream.

The reference encode loop (minbpe/basic.py:61-73, minbpe/regex.py:96-108)
repeatedly finds the adjacent pair with the *lowest merge rank* present and
merges all its occurrences (left-first on overlaps) until no pair is mergeable.

Key equivalence used here (and verified by the conformance tests): because merge
tables are well-founded — a merge's children always have lower rank than the
merge itself (training assigns ids 256+round from already-existing ids,
minbpe/basic.py:37; GPT-4 recovery caps children at ``max_rank``,
minbpe/gpt4.py:22) — merging can only ever *create* pairs of higher rank than
the rank just applied. Hence the sequence of ranks the reference applies is
strictly increasing, and "repeatedly apply the minimum present rank to all its
occurrences" is exactly the reference algorithm. That is what the
``lax.while_loop`` below does; iteration count = number of *distinct* ranks
actually applied, not the vocab size.

Rank lookup uses a dense [V, V] -> rank table (fine to vocab ~8K; a hashed path
for 100K-vocab tables lives in ops/ranktab.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .select import pair_validity
from .merge import apply_merge

RANK_INF = 2**31 - 1  # plain int: module import must not touch a backend


def build_rank_table(pairs: np.ndarray, vocab_size: int) -> np.ndarray:
    """Dense (a, b) -> rank-index table. pairs: int32[M, 2] in rank order."""
    table = np.full((vocab_size, vocab_size), np.int32(2**31 - 1), dtype=np.int32)
    if len(pairs):
        table[pairs[:, 0], pairs[:, 1]] = np.arange(len(pairs), dtype=np.int32)
    return table


@jax.jit
def encode_stream(ids, seg, n, rank_table, merge_pairs, merge_ids):
    """Encode a packed stream against a frozen merge table.

    rank_table: int32[V, V] -> rank index (RANK_INF when absent)
    merge_pairs: int32[M, 2] pair per rank index (rank order)
    merge_ids:   int32[M] new token id per rank index (256+r for trained
                 tokenizers; the tiktoken id itself for GPT-4 tables)
    """
    V = rank_table.shape[0]

    def pair_ranks(ids, seg, n):
        valid, nxt_ids = pair_validity(ids, seg, n)
        ia = jnp.clip(ids, 0, V - 1)
        ib = jnp.clip(nxt_ids, 0, V - 1)
        return jnp.where(valid, rank_table[ia, ib], RANK_INF)

    def cond(state):
        _, _, _, done = state
        return ~done

    def body(state):
        ids, seg, n, _ = state
        r = jnp.min(pair_ranks(ids, seg, n))

        def apply(_):
            rr = jnp.minimum(r, merge_ids.shape[0] - 1)  # safe gather index
            pa = merge_pairs[rr, 0]
            pb = merge_pairs[rr, 1]
            new_ids, new_seg, new_n, _ = apply_merge(ids, seg, n, pa, pb, merge_ids[rr])
            return new_ids, new_seg, new_n, jnp.bool_(False)

        def stop(_):
            return ids, seg, n, jnp.bool_(True)

        return jax.lax.cond(r == RANK_INF, stop, apply, None)

    state = (ids, seg, n, jnp.bool_(n < 2))
    ids, seg, n, _ = jax.lax.while_loop(cond, body, state)
    return ids, n


@partial(jax.jit, static_argnames=("unroll",), donate_argnums=(0, 1, 2))
def _encode_step(ids, seg, n, done, rank_table, merge_pairs, merge_ids,
                 unroll: int = 8):
    """``unroll`` min-present-rank iterations as one dispatch (host-driven
    encode loop; bit-identical to encode_stream)."""
    V = rank_table.shape[0]

    def one(state):
        ids, seg, n, done = state

        def pair_ranks():
            valid, nxt_ids = pair_validity(ids, seg, n)
            ia = jnp.clip(ids, 0, V - 1)
            ib = jnp.clip(nxt_ids, 0, V - 1)
            return jnp.where(valid, rank_table[ia, ib], RANK_INF)

        r = jnp.min(pair_ranks())

        def apply(_):
            rr = jnp.minimum(r, merge_ids.shape[0] - 1)
            new_ids, new_seg, new_n, _ = apply_merge(
                ids, seg, n, merge_pairs[rr, 0], merge_pairs[rr, 1],
                merge_ids[rr]
            )
            return new_ids, new_seg, new_n, jnp.bool_(False)

        def stop(_):
            return ids, seg, n, jnp.bool_(True)

        return jax.lax.cond(done | (r == RANK_INF), stop, apply, None)

    state = (ids, seg, n, done)
    for _ in range(unroll):
        state = one(state)
    return state


def encode_stream_stepped(ids, seg, n, rank_table, merge_pairs, merge_ids,
                          unroll: int = 8):
    """Host-driven encode: dispatch ``unroll`` iterations at a time, checking
    the done flag between dispatches (one scalar transfer each)."""
    state = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
             jnp.bool_(False))
    while True:
        state = _encode_step(state[0], state[1], state[2], state[3],
                             rank_table, merge_pairs, merge_ids, unroll)
        if bool(state[3]):
            return state[0], state[2]


@partial(jax.jit, static_argnames=("depth",))
def encode_stream_sorted(ids, seg, n, ka, kb, rank, merge_pairs, merge_ids,
                         depth: int):
    """encode_stream for large-vocab tables: rank lookup via the sorted-pair
    binary search (ops/ranktab.py) instead of a dense [V, V] gather. Same
    min-present-rank iteration, same exactness argument."""
    M = ka.shape[0]
    RINF = jnp.int32(2**31 - 1)

    def lookup(a, b, valid):
        lo = jnp.zeros_like(a)
        hi = jnp.full_like(a, M - 1)
        for _ in range(depth + 1):
            mid = (lo + hi) >> 1
            ma = ka[mid]
            mb = kb[mid]
            less = (ma < a) | ((ma == a) & (mb < b))
            lo = jnp.where(less, jnp.minimum(mid + 1, M - 1), lo)
            hi = jnp.where(less, hi, mid)
        hit = (ka[lo] == a) & (kb[lo] == b) & valid
        return jnp.where(hit, rank[lo], RINF)

    def cond(state):
        return ~state[3]

    def body(state):
        ids, seg, n, _ = state
        valid, nxt_ids = pair_validity(ids, seg, n)
        r = jnp.min(lookup(ids, nxt_ids, valid))

        def apply(_):
            rr = jnp.minimum(r, M - 1)
            new_ids, new_seg, new_n, _ = apply_merge(
                ids, seg, n, merge_pairs[rr, 0], merge_pairs[rr, 1], merge_ids[rr]
            )
            return new_ids, new_seg, new_n, jnp.bool_(False)

        def stop(_):
            return ids, seg, n, jnp.bool_(True)

        return jax.lax.cond(r == RINF, stop, apply, None)

    state = (ids, seg, n, jnp.bool_(n < 2))
    ids, seg, n, _ = jax.lax.while_loop(cond, body, state)
    return ids, n

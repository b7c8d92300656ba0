"""Exact pair-frequency counting + argmax merge selection (sort-based, TPU-native).

Replicates the reference's per-round selection
``pair = max(get_stats(ids), key=stats.get)`` (minbpe/basic.py:33-35,
minbpe/regex.py:51-56) including its tie-break: Python's ``max`` over a dict
returns the *first-inserted* key among equal counts, and insertion order in
``get_stats`` (minbpe/base.py:13-22) is first-occurrence order of the pair in the
left-to-right scan. So the selection rule is:

    argmax over pairs of (count, then earliest first-occurrence position).

TPU design (not a port): rather than a Python dict, we group pairs with one
lexicographic ``lax.sort`` over (first, second, position) — a stable sort, so the
head of each equal-pair run carries the *minimum* original position, which is
exactly the first-occurrence tie-break key. Run lengths (= counts) fall out of
boundary-marker scans (cummax / reverse cummin). No scatter, no V^2 buffer: the
same code path is exact at vocab 512 and vocab 100K+.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain int (not a jnp scalar): importing this module must not initialize a
# jax backend, and traced code coerces it to int32 on use
INT32_MAX = 2**31 - 1


def pair_validity(ids, seg, n):
    """valid[i] ⇔ (ids[i], ids[i+1]) is a real, same-segment adjacent pair.

    Encodes both the live-length bound and the reference's chunk isolation
    (minbpe/regex.py:44: merges never cross chunk boundaries).
    """
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    nxt_ids = jnp.roll(ids, -1)
    nxt_seg = jnp.roll(seg, -1)
    return (idx + 1 < n) & (seg == nxt_seg), nxt_ids


def select_max_pair(ids, seg, n):
    """Return (pa, pb, count, ok): the reference-exact argmax pair this round.

    ok is False when there are no countable pairs (the case where the reference's
    ``max`` over an empty dict raises, minbpe/basic.py:35).
    """
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid, nxt_ids = pair_validity(ids, seg, n)

    # Invalid slots sort to the end as (INT32_MAX, INT32_MAX).
    ka = jnp.where(valid, ids, INT32_MAX)
    kb = jnp.where(valid, nxt_ids, INT32_MAX)
    # Stable lexicographic sort by (first, second); equal pairs keep ascending
    # original position, so each run head holds the pair's first occurrence.
    sa, sb, spos = jax.lax.sort((ka, kb, idx), num_keys=2, is_stable=True)

    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head = (sa != prev_sa) | (sb != prev_sb)

    # next_start[j] = index of the first run head strictly after j.
    marker = jnp.where(head, idx, N)
    next_start = jnp.roll(jax.lax.cummin(marker, reverse=True), -1).at[N - 1].set(N)

    svalid = sa != INT32_MAX
    is_head = head & svalid
    cnt = jnp.where(is_head, next_start - idx, 0)

    maxc = jnp.max(cnt)
    # Among max-count runs, pick the one whose first occurrence is earliest.
    tied = is_head & (cnt == maxc)
    best_pos = jnp.min(jnp.where(tied, spos, INT32_MAX))
    best_j = jnp.argmax(tied & (spos == best_pos))
    return sa[best_j], sb[best_j], maxc, maxc > 0


def count_pairs_dense(ids, seg, n, V: int, block: int = 2048):
    """Dense [V, V] pair-count matrix via one-hot matmuls on the MXU.

    No scatter: the count matrix is C = sum_blocks A_blockᵀ @ B_block where
    A/B are one-hot encodings of left/right pair elements. Products are 0/1
    and row sums are bounded by the stream length, so f32 accumulation is
    exact below 2^24 occurrences per pair.
    """
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid, nxt_ids = pair_validity(ids, seg, n)
    # invalid slots -> id V-0? use 0 with weight 0 via masked one-hot rows
    a = jnp.where(valid, ids, -1)
    b = jnp.where(valid, nxt_ids, -1)
    nblk = -(-N // block)
    pad = nblk * block - N
    a = jnp.pad(a, (0, pad), constant_values=-1).reshape(nblk, block)
    b = jnp.pad(b, (0, pad), constant_values=-1).reshape(nblk, block)
    vr = jnp.arange(V, dtype=jnp.int32)

    def body(i, acc):
        A = (a[i][:, None] == vr[None, :]).astype(jnp.bfloat16)
        B = (b[i][:, None] == vr[None, :]).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    counts = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((V, V), jnp.float32)
    )
    return counts.astype(jnp.int32)


def select_from_counts(ids, seg, n, counts, V: int):
    """Reference-exact argmax selection given a dense [V, V] count matrix.

    The first-occurrence tie-break is resolved lazily: only when several pairs
    share the max count does a single masked scan over the stream find the
    earliest-occurring tied pair. (The sort path pays the tie-break cost every
    round; here it is one cheap gather pass, and only on actual ties.)
    """
    maxc = jnp.max(counts)
    tied = counts == maxc
    # masked scan: position of the earliest occurrence of any tied pair
    valid, nxt_ids = pair_validity(ids, seg, n)
    ia = jnp.clip(ids, 0, V - 1)
    ib = jnp.clip(nxt_ids, 0, V - 1)
    hit = valid & tied[ia, ib]
    first = jnp.argmax(hit)  # first True index (0 if none; guarded by ok)
    pa = ids[first]
    pb = nxt_ids[first]
    ok = (maxc > 0) & jnp.any(hit)
    return pa, pb, maxc, ok


def select_max_pair_dense(ids, seg, n, V: int):
    """Exact selection via the XLA one-hot-matmul dense count path."""
    counts = count_pairs_dense(ids, seg, n, V)
    return select_from_counts(ids, seg, n, counts, V)


def select_max_pair_pallas(ids, seg, n, V: int, interpret: bool = False):
    """Exact selection via the fused Pallas MXU pair-count kernel."""
    from .pallas.pair_count import count_pairs_pallas

    counts = count_pairs_pallas(ids, seg, n, V, interpret=interpret)
    return select_from_counts(ids, seg, n, counts, V)

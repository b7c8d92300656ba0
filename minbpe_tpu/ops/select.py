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

INT32_MAX = jnp.int32(2**31 - 1)


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

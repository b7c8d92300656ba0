"""Parallel greedy merge application + stream compaction (TPU-native).

Replicates the reference's ``merge(ids, pair, idx)`` (minbpe/base.py:25-41):
replace every left-to-right, *non-overlapping* occurrence of ``pair`` with the
new id. The reference resolves overlapping occurrences (only possible when
pair = (a, a), e.g. [a,a,a] -> [Z,a]) left-first via its sequential scan.

TPU design: compute a match mask over the whole stream at once, then resolve
overlaps with a run-parity rule — within each maximal run of consecutive
matches, keep the even offsets. This is exactly the left-first rule: runs of
consecutive matches can only arise for pair (a, a), where the sequential scan
keeps match 0, skips match 1 (its left token was consumed), keeps match 2, ...
Run starts come from a single ``cummax`` scan; no sequential loop.

Compaction (the array analogue of the reference building a fresh list) is
gather-based: cumsum of the live mask + ``searchsorted`` + gather — no scatter,
no sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stream import PAD, PAD_SEG
from .select import pair_validity


def merge_mask(ids, seg, n, pa, pb):
    """keep[i] ⇔ a merge of (pa, pb) is applied at position i (left token).

    Left-first overlap resolution per minbpe/base.py:33-41.
    """
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid, nxt_ids = pair_validity(ids, seg, n)
    m = valid & (ids == pa) & (nxt_ids == pb)
    m_prev = jnp.roll(m, 1).at[0].set(False)
    new_run = m & ~m_prev
    run_start = jax.lax.cummax(jnp.where(new_run, idx, -1))
    return m & (((idx - run_start) & 1) == 0)


def compact(ids, seg, live):
    """Drop dead slots, preserving order; returns (ids, seg, new_n).

    live must already be False for padding slots.
    """
    N = ids.shape[0]
    c = jnp.cumsum(live.astype(jnp.int32))
    new_n = c[N - 1]
    # g[j] = original index of the (j+1)-th live token.
    g = jnp.searchsorted(c, jnp.arange(1, N + 1, dtype=jnp.int32), side="left")
    g = jnp.minimum(g, N - 1)
    j = jnp.arange(N, dtype=jnp.int32)
    out_ids = jnp.where(j < new_n, ids[g], PAD)
    out_seg = jnp.where(j < new_n, seg[g], PAD_SEG)
    return out_ids, out_seg, new_n


def apply_merge(ids, seg, n, pa, pb, new_id):
    """Apply one merge everywhere and compact. Returns (ids, seg, n, n_merged)."""
    N = ids.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    keep = merge_mask(ids, seg, n, pa, pb)
    killed = jnp.roll(keep, 1).at[0].set(False)
    new_ids = jnp.where(keep, new_id, ids)
    live = ~killed & (idx < n)
    out_ids, out_seg, new_n = compact(new_ids, seg, live)
    return out_ids, out_seg, new_n, jnp.sum(keep.astype(jnp.int32))

"""Segmented fused BPE training for streams beyond the VMEM ceiling.

The single-launch kernel (fused_train.py) holds the whole stream in VMEM
(<= 4M tokens). This driver extends the SAME round design to tens of
millions of tokens: the stream lives in HBM as S segments of SEG_TOKENS;
each round runs as a few pallas calls whose grid dimension sweeps the
segments SEQUENTIALLY with persistent VMEM scratch carrying the cross-
segment state — exactly the tile carries of tiled_adjacency/tiled_apply
lifted one level (the 1-token boundary pair, the run-parity state, and the
(V, V) count accumulator). Results are bit-identical to the in-VMEM kernel
and the sort path (tests/test_fused_xl.py).

Why not sort-per-round at this scale (ops/train_sortloop.py): XLA's
bitonic sort makes log^2(N) HBM passes — measured 172 ms/round at 11M
tokens vs the one-hot MXU count's ~10 ms. The sort loop stays the any-vocab
fallback; this driver owns vocab <= 1024 at 4M..~50M tokens.

Per round:
1. adjacency+count (grid reverse over segments): next-live adjacency with
   the (id, seg) boundary carry, a/b planes written back to HBM, one-hot
   MXU counting accumulated into persistent (V, V) scratch; the last step
   emits counts + the untied argmax.
2. (ties only) tie walk (grid forward): the pay-per-tie serial walk, with
   the global winner = the pair at the EARLIEST tied occurrence across all
   segments (each (pair, segment) first-match is >= that pair's global
   first occurrence, so the running min over all of them is exact).
3. apply (grid forward): left-first merge application with the parity
   carry chained across segments; per-segment kept counts out.
Every COMPACT_EVERY rounds each segment front-compacts ITS OWN live prefix
in VMEM (segments never rebalance; per-segment bounds shrink independently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_train import (
    C, INT32_MAX, K_CAP, SCAN_TILE_ROWS, TILE_ELEMS, TILE_ROWS,
    _compact_inplace, _tile_flat_iota, tiled_adjacency, tiled_apply,
    tiled_batch_apply, tiled_batch_hist_rev, tiled_batch_mark,
)

COMPACT_EVERY = 16  # XL cadence: the serial row stitch scales with R

SEG_TOKENS = 1 << 21          # 2M tokens/segment: ~40 MB VMEM working set
XL_MAX_N = 48 * (1 << 20)     # ~50M tokens: 20 B/token of HBM planes


def _seg_rows(seg_tokens: int) -> int:
    return seg_tokens // C


def _lane_pick(row, idx):
    """Scalar at dynamic lane idx of a (1, C) row."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    return jnp.max(jnp.where(lane == idx, row, -2**31))


def _lane_put(ref, idx, val):
    """RMW: set lane idx of the (1, C) row ref."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    ref[pl.ds(0, 1), :] = jnp.where(lane == idx, val, ref[pl.ds(0, 1), :])


def _t_cur_of(bound):
    return (bound + TILE_ELEMS - 1) // TILE_ELEMS


def _adjcount_kernel(ids_in, seg_in, live_in, bounds_in, nvb_in,
                     a_out, b_out, sel_out, counts_out,
                     ids_ref, seg_ref, live_ref, a_ref, b_ref,
                     cnt_ref, carry_ref, sems,
                     *, S: int, Rs: int, V: int):
    s = pl.program_id(0)
    k = S - 1 - s  # reverse sweep: adjacency looks at the NEXT live token
    off = k * Rs
    T = Rs

    @pl.when(s == 0)
    def _init():
        cnt_ref[...] = jnp.zeros((V, V), jnp.int32)
        carry_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32) - 1
        _lane_put(carry_ref, 1, jnp.int32(-2))

    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()

    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], k)
    t_cur = _t_cur_of(bound)
    carry = (_lane_pick(carry_ref[pl.ds(0, 1), :], 0),
             _lane_pick(carry_ref[pl.ds(0, 1), :], 1))
    cid, cseg = tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                                T, t_cur, carry_in=carry)
    _lane_put(carry_ref, 0, cid)
    _lane_put(carry_ref, 1, cseg)

    # one-hot MXU counting into the persistent accumulator, at the current
    # vocab width: rounds below 384 ids count 384 wide (same two-variant
    # switch as the in-VMEM kernel)
    GROUP = 32

    def count_width(W):
        viota = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, W), 1)

        def oh(t, g0):
            return jnp.concatenate(
                [(t[:, j:j + 1] == viota).astype(jnp.int8)
                 for j in range(g0, g0 + GROUP)], axis=0)

        def tile_body(t, acc):
            def work(acc):
                at = a_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                bt = b_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                for g in range(C // GROUP):
                    A = oh(at, g * GROUP)
                    B = oh(bt, g * GROUP)
                    acc = acc + jax.lax.dot_general(
                        A, B, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                return acc

            return jax.lax.cond(t * TILE_ELEMS < bound, work,
                                lambda a: a, acc)

        acc = jax.lax.fori_loop(0, t_cur, tile_body,
                                jnp.zeros((W, W), jnp.int32))
        if W == V:
            return acc
        return jnp.pad(acc, ((0, V - W), (0, V - W)))

    if V > 384:
        acc = jax.lax.cond(nvb_in[0, 0] * 128 <= 384,
                           lambda _: count_width(384),
                           lambda _: count_width(V), 0)
    else:
        acc = count_width(V)
    cnt_ref[...] += acc

    for src, dst, j in ((a_ref, a_out, 0), (b_ref, b_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).start()
    for src, dst, j in ((a_ref, a_out, 0), (b_ref, b_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).wait()

    @pl.when(s == S - 1)
    def _select():
        counts = cnt_ref[...]
        maxc = jnp.max(counts)
        tied = counts == maxc
        n_tied = jnp.sum(tied.astype(jnp.int32))
        vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
            jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
        flat = jnp.min(jnp.where(tied, vi, INT32_MAX))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        sel_out[pl.ds(0, 1), :] = jnp.where(
            lane == 0, maxc,
            jnp.where(lane == 1, n_tied,
                      jnp.where(lane == 2, flat // V,
                                jnp.where(lane == 3, flat % V, 0))))
        pltpu.make_async_copy(cnt_ref, counts_out, sems.at[2]).start()
        pltpu.make_async_copy(cnt_ref, counts_out, sems.at[2]).wait()


def _tie_kernel(a_in, b_in, counts_in, maxc_in, bounds_in, sel_out,
                a_ref, b_ref, cnt_ref, best_ref, sems,
                *, S: int, Rs: int, V: int):
    """Pay-per-tie serial walk across segments (forward): the winner is the
    pair at the earliest tied occurrence anywhere in the stream."""
    s = pl.program_id(0)
    off = s * Rs
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()

    @pl.when(s == 0)
    def _init():
        pltpu.make_async_copy(counts_in, cnt_ref, sems.at[2]).start()
        pltpu.make_async_copy(counts_in, cnt_ref, sems.at[2]).wait()
        best_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32) + INT32_MAX

    for src, dst, j in ((a_in, a_ref, 0), (b_in, b_ref, 1)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((a_in, a_ref, 0), (b_in, b_ref, 1)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()

    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    t_cur = _t_cur_of(bound)
    maxc = maxc_in[0, 0]
    tied = cnt_ref[...] == maxc
    n_tied = jnp.sum(tied.astype(jnp.int32))
    vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
        jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)

    def first_match(ca, cb):
        def body(t, best):
            sl = pl.ds(t * TRS, TRS)
            hit = (a_ref[sl, :] == ca) & (b_ref[sl, :] == cb)
            cand = jnp.min(jnp.where(hit, tflat + t * (TRS * C), INT32_MAX))
            return jnp.minimum(best, cand)

        return jax.lax.fori_loop(0, t_cur, body, jnp.int32(INT32_MAX))

    def walk(t, st):
        prev, best_fi, pa, pb = st
        flat = jnp.min(jnp.where(tied & (vi > prev), vi, INT32_MAX))
        ca, cb = flat // V, flat % V
        fi = first_match(ca, cb)
        gfi = jnp.where(fi == INT32_MAX, INT32_MAX, fi + off * C)
        better = (flat < INT32_MAX) & (gfi < best_fi)
        return (flat, jnp.where(better, gfi, best_fi),
                jnp.where(better, ca, pa), jnp.where(better, cb, pb))

    cur = (jnp.int32(-1),
           _lane_pick(best_ref[pl.ds(0, 1), :], 0),
           _lane_pick(best_ref[pl.ds(0, 1), :], 1),
           _lane_pick(best_ref[pl.ds(0, 1), :], 2))
    # maxc == 0 means the corpus is exhausted: EVERYTHING ties, but the pick
    # is unused (the round is skipped) — force the walk to zero trips
    n_eff = jnp.where(maxc > 0, n_tied, 0)
    _, bf, pa, pb = jax.lax.fori_loop(0, n_eff, walk, cur)
    _lane_put(best_ref, 0, bf)
    _lane_put(best_ref, 1, pa)
    _lane_put(best_ref, 2, pb)

    @pl.when(s == S - 1)
    def _emit():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        sel_out[pl.ds(0, 1), :] = jnp.where(
            lane == 0, _lane_pick(best_ref[pl.ds(0, 1), :], 1),
            jnp.where(lane == 1, _lane_pick(best_ref[pl.ds(0, 1), :], 2),
                      0))


def _apply_kernel(ids_in, live_in, a_in, b_in, pp_in, bounds_in,
                  ids_out, live_out, kept_out,
                  ids_ref, live_ref, a_ref, b_ref, carry_ref, sems,
                  *, S: int, Rs: int):
    s = pl.program_id(0)
    off = s * Rs

    @pl.when(s == 0)
    def _init():
        carry_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)
        kept_out[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)

    for src, dst, j in ((ids_in, ids_ref, 0), (live_in, live_ref, 1),
                        (a_in, a_ref, 2), (b_in, b_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (live_in, live_ref, 1),
                        (a_in, a_ref, 2), (b_in, b_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()

    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    t_cur = _t_cur_of(bound)
    pa = pp_in[0, 0]
    pb = pp_in[0, 1]
    new_id = pp_in[0, 2]
    row = carry_ref[pl.ds(0, 1), :]
    carry = (_lane_pick(row, 0), _lane_pick(row, 1), _lane_pick(row, 2),
             _lane_pick(row, 3), _lane_pick(row, 4))

    def live_sum(t, acc):
        sl = pl.ds(t * SCAN_TILE_ROWS, SCAN_TILE_ROWS)
        return acc + jnp.sum(live_ref[sl, :])

    lv0 = jax.lax.fori_loop(0, t_cur, live_sum, jnp.int32(0))
    out = tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb, new_id,
                      Rs, t_cur, carry_in=carry)
    lv1 = jax.lax.fori_loop(0, t_cur, live_sum, jnp.int32(0))
    for j, v in enumerate(out):
        _lane_put(carry_ref, j, v)
    # per-segment accounting must charge the token KILLED IN THIS SEGMENT:
    # a kept site at a segment's tail consumes the FIRST live token of the
    # next segment, so kept-site counts mis-attribute cross-boundary kills
    _lane_put(kept_out, s, lv0 - lv1)

    for src, dst, j in ((ids_ref, ids_out, 0), (live_ref, live_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).start()
    for src, dst, j in ((ids_ref, ids_out, 0), (live_ref, live_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).wait()


def _compact_kernel(ids_in, seg_in, live_in, bounds_in, segl_in,
                    ids_out, seg_out, live_out,
                    ids_ref, seg_ref, live_ref, a_ref, b_ref, sems,
                    *, S: int, Rs: int):
    """Per-segment local front compaction (segments never rebalance)."""
    s = pl.program_id(0)
    off = s * Rs
    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()
    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    n_live = _lane_pick(segl_in[pl.ds(0, 1), :], s)
    _compact_inplace(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                     bound, n_live)
    for src, dst, j in ((ids_ref, ids_out, 0), (seg_ref, seg_out, 1),
                        (live_ref, live_out, 2)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).start()
    for src, dst, j in ((ids_ref, ids_out, 0), (seg_ref, seg_out, 1),
                        (live_ref, live_out, 2)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).wait()

def _mark_kernel(ids_in, seg_in, live_in, a_in, b_in, cands_in, bounds_in,
                 aF_out, cand_out, accl_out,
                 ids_ref, seg_ref, live_ref, a_ref, b_ref,
                 accl_ref, carry_ref, sems,
                 *, S: int, Rs: int):
    """XL batch pass 1 (grid forward): candidate/final-id planes + the
    left-creation histogram, cross-segment carries in persistent scratch
    (candidates are heterogeneous and cross-side-free, as in the in-VMEM
    kernel).
    Writes F over a_in and cand over b_in IN PLACE (aliased by the driver);
    emits acc_l at the last segment. cands_in row: lanes 0..K-1 pa,
    K..2K-1 pb, lane 2K = bsel, lane 2K+1 = zbase."""
    s = pl.program_id(0)
    off = s * Rs

    @pl.when(s == 0)
    def _init():
        accl_ref[...] = jnp.zeros((128, 128), jnp.int32)
        carry_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)
        for j, v in enumerate((-1, -1, -2, -1)):
            _lane_put(carry_ref, j, jnp.int32(v))

    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2), (a_in, a_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2), (a_in, a_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()
    pltpu.make_async_copy(b_in.at[pl.ds(off, Rs), :], b_ref,
                          sems.at[0]).start()
    pltpu.make_async_copy(b_in.at[pl.ds(off, Rs), :], b_ref,
                          sems.at[0]).wait()

    crow = cands_in[pl.ds(0, 1), :]
    pas = [_lane_pick(crow, j) for j in range(K_CAP)]
    pbs = [_lane_pick(crow, K_CAP + j) for j in range(K_CAP)]
    bsel = _lane_pick(crow, 2 * K_CAP)
    zbase = _lane_pick(crow, 2 * K_CAP + 1)
    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    t_cur = _t_cur_of(bound)
    row = carry_ref[pl.ds(0, 1), :]
    carry = tuple(_lane_pick(row, j) for j in range(4))
    acc, cout = tiled_batch_mark(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                                 pas, pbs, bsel, zbase, t_cur,
                                 carry_in=carry, acc0=accl_ref[...])
    accl_ref[...] = acc
    for j, v in enumerate(cout):
        _lane_put(carry_ref, j, v)

    for src, dst, j in ((a_ref, aF_out, 0), (b_ref, cand_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).start()
    for src, dst, j in ((a_ref, aF_out, 0), (b_ref, cand_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).wait()

    @pl.when(s == S - 1)
    def _emit():
        pltpu.make_async_copy(accl_ref, accl_out, sems.at[2]).start()
        pltpu.make_async_copy(accl_ref, accl_out, sems.at[2]).wait()


def _histrev_kernel(ids_in, seg_in, live_in, aF_in, cand_in, cands_in,
                    bounds_in, accr_out,
                    ids_ref, seg_ref, live_ref, a_ref, b_ref,
                    accr_ref, carry_ref, sems,
                    *, S: int, Rs: int):
    """XL batch pass 2 (grid REVERSE): right-creation histogram over the
    F/cand planes produced by _mark_kernel."""
    sg = pl.program_id(0)
    s = S - 1 - sg
    off = s * Rs

    @pl.when(sg == 0)
    def _init():
        accr_ref[...] = jnp.zeros((128, 128), jnp.int32)
        carry_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)
        for j, v in enumerate((-1, -2, -1, -1, -2, -1)):
            _lane_put(carry_ref, j, jnp.int32(v))

    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2), (aF_in, a_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2), (aF_in, a_ref, 3)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()
    pltpu.make_async_copy(cand_in.at[pl.ds(off, Rs), :], b_ref,
                          sems.at[0]).start()
    pltpu.make_async_copy(cand_in.at[pl.ds(off, Rs), :], b_ref,
                          sems.at[0]).wait()

    crow = cands_in[pl.ds(0, 1), :]
    zbase = _lane_pick(crow, 2 * K_CAP + 1)
    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    t_cur = _t_cur_of(bound)
    row = carry_ref[pl.ds(0, 1), :]
    carry = tuple(_lane_pick(row, j) for j in range(6))
    acc, cout = tiled_batch_hist_rev(ids_ref, seg_ref, live_ref, a_ref,
                                     b_ref, zbase, t_cur, carry_in=carry,
                                     acc0=accr_ref[...])
    accr_ref[...] = acc
    for j, v in enumerate(cout):
        _lane_put(carry_ref, j, v)

    @pl.when(sg == S - 1)
    def _emit():
        pltpu.make_async_copy(accr_ref, accr_out, sems.at[2]).start()
        pltpu.make_async_copy(accr_ref, accr_out, sems.at[2]).wait()


def _batch_apply_kernel(ids_in, live_in, cand_in, bb_in, bounds_in,
                        ids_out, live_out, kept_out,
                        ids_ref, live_ref, b_ref, carry_ref, sems,
                        *, S: int, Rs: int):
    """XL combined apply (grid forward) of the accepted batch prefix.
    bb_in row: lane 0 = bstar, lane 1 = zbase. kept_out row: lanes 0..S-1
    per-segment live-count delta (segl accounting), lanes 64..64+K-1
    per-creator kept-site counts."""
    s = pl.program_id(0)
    off = s * Rs

    @pl.when(s == 0)
    def _init():
        carry_ref[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)
        kept_out[pl.ds(0, 1), :] = jnp.zeros((1, C), jnp.int32)

    for src, dst, j in ((ids_in, ids_ref, 0), (live_in, live_ref, 1),
                        (cand_in, b_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).start()
    for src, dst, j in ((ids_in, ids_ref, 0), (live_in, live_ref, 1),
                        (cand_in, b_ref, 2)):
        pltpu.make_async_copy(src.at[pl.ds(off, Rs), :], dst,
                              sems.at[j]).wait()

    bstar = bb_in[0, 0]
    zbase = bb_in[0, 1]
    bound = _lane_pick(bounds_in[pl.ds(0, 1), :], s)
    t_cur = _t_cur_of(bound)

    def live_sum(t, acc):
        sl = pl.ds(t * SCAN_TILE_ROWS, SCAN_TILE_ROWS)
        return acc + jnp.sum(live_ref[sl, :])

    lv0 = jax.lax.fori_loop(0, t_cur, live_sum, jnp.int32(0))
    row = carry_ref[pl.ds(0, 1), :]
    c_k = _lane_pick(row, 0)
    kept0 = jnp.concatenate(
        [row[:, C // 2:C // 2 + K_CAP],
         jnp.zeros((1, C - K_CAP), jnp.int32)], axis=1)
    kept_v, c_out = tiled_batch_apply(ids_ref, live_ref, b_ref, zbase,
                                      bstar, t_cur, carry_in=c_k,
                                      kept0=kept0)
    lv1 = jax.lax.fori_loop(0, t_cur, live_sum, jnp.int32(0))
    _lane_put(carry_ref, 0, c_out)
    # stash running per-creator kept counts in carry lanes C/2..C/2+K
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    shifted = pltpu.roll(kept_v, C // 2, axis=1)
    carry_ref[pl.ds(0, 1), :] = jnp.where(
        (lane >= C // 2) & (lane < C // 2 + K_CAP), shifted,
        carry_ref[pl.ds(0, 1), :])
    # per-segment live delta goes straight to the output row (RMW)
    kept_out[pl.ds(0, 1), :] = jnp.where(
        lane == s, lv0 - lv1, kept_out[pl.ds(0, 1), :])

    for src, dst, j in ((ids_ref, ids_out, 0), (live_ref, live_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).start()
    for src, dst, j in ((ids_ref, ids_out, 0), (live_ref, live_out, 1)):
        pltpu.make_async_copy(src, dst.at[pl.ds(off, Rs), :],
                              sems.at[j]).wait()

    @pl.when(s == S - 1)
    def _emit():
        kept_out[pl.ds(0, 1), :] = jnp.where(
            (lane >= C // 2) & (lane < C // 2 + K_CAP),
            pltpu.roll(kept_v, C // 2, axis=1), kept_out[pl.ds(0, 1), :])


# ---------------------------------------------------------------------------
# XLA driver: one jitted program running all rounds over the pallas calls
# ---------------------------------------------------------------------------

def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def _scratch(Rs, n_planes, extra=()):
    return ([pltpu.VMEM((Rs, C), jnp.int32)] * n_planes + list(extra)
            + [pltpu.SemaphoreType.DMA((4,))])


@functools.partial(jax.jit,
                   static_argnames=("S", "Rs", "V", "Mp", "interpret"))
def _train_xl(ids2, seg2, live2, bounds0, segl0, ctl, S: int, Rs: int,
              V: int, Mp: int, interpret: bool = False):
    N = S * Rs
    m_eff = ctl[3, 0]
    fail0 = ctl[0, 0]

    adjcount = pl.pallas_call(
        functools.partial(_adjcount_kernel, S=S, Rs=Rs, V=V),
        grid=(S,),
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # a
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # b
            jax.ShapeDtypeStruct((1, C), jnp.int32),   # sel
            jax.ShapeDtypeStruct((V, V), jnp.int32),   # counts
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=_scratch(
            Rs, 5, (pltpu.VMEM((V, V), jnp.int32),
                    pltpu.VMEM((1, C), jnp.int32))),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    tie = pl.pallas_call(
        functools.partial(_tie_kernel, S=S, Rs=Rs, V=V),
        grid=(S,),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=_scratch(
            Rs, 2, (pltpu.VMEM((V, V), jnp.int32),
                    pltpu.VMEM((1, C), jnp.int32))),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    apply_ = pl.pallas_call(
        functools.partial(_apply_kernel, S=S, Rs=Rs),
        grid=(S,),
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # ids'
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # live'
            jax.ShapeDtypeStruct((1, C), jnp.int32),   # kept per segment
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=_scratch(Rs, 4, (pltpu.VMEM((1, C), jnp.int32),)),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    compact = pl.pallas_call(
        functools.partial(_compact_kernel, S=S, Rs=Rs),
        grid=(S,),
        out_shape=[jax.ShapeDtypeStruct((N, C), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=_scratch(Rs, 5),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    mark = pl.pallas_call(
        functools.partial(_mark_kernel, S=S, Rs=Rs),
        grid=(S,),
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.int32),     # F (over a)
            jax.ShapeDtypeStruct((N, C), jnp.int32),     # cand (over b)
            jax.ShapeDtypeStruct((128, 128), jnp.int32),  # acc_l
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=_scratch(
            Rs, 5, (pltpu.VMEM((128, 128), jnp.int32),
                    pltpu.VMEM((1, C), jnp.int32))),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    histrev = pl.pallas_call(
        functools.partial(_histrev_kernel, S=S, Rs=Rs),
        grid=(S,),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=_scratch(
            Rs, 5, (pltpu.VMEM((128, 128), jnp.int32),
                    pltpu.VMEM((1, C), jnp.int32))),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    batch_apply = pl.pallas_call(
        functools.partial(_batch_apply_kernel, S=S, Rs=Rs),
        grid=(S,),
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # ids'
            jax.ShapeDtypeStruct((N, C), jnp.int32),   # live'
            jax.ShapeDtypeStruct((1, C), jnp.int32),   # per-seg + per-creator
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=_scratch(Rs, 3, (pltpu.VMEM((1, C), jnp.int32),)),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=_vmem_params(),
        interpret=interpret,
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    kj = jnp.arange(K_CAP, dtype=jnp.int32)
    vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
        jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)

    def outer_cond(st):
        return st[7] < m_eff

    def outer_body(st):
        ids, seg, live, bounds, segl, fail, log, i, lc, nreb = st

        def failed_tail(_):
            # zero log rows are the default; just advance
            return (ids, seg, live, bounds, segl, fail, log, i + 1, lc,
                    nreb)

        def active(_):
            return _active(ids, seg, live, bounds, segl, fail, log, i, lc,
                           nreb)

        return jax.lax.cond(fail < i, failed_tail, active, None)

    def _active(ids, seg, live, bounds, segl, fail, log, i, lc, nreb):
        do_c = (i > 0) & (i - lc >= COMPACT_EVERY) & \
            (jnp.sum(bounds) - jnp.sum(segl) > (jnp.sum(bounds) // 8))

        def do_compact(args):
            ids, seg, live, bounds = args
            ids, seg, live = compact(ids, seg, live, bounds, segl)
            return ids, seg, live, segl
        ids, seg, live, bounds = jax.lax.cond(
            do_c, do_compact, lambda a: a, (ids, seg, live, bounds))
        lc = jnp.where(do_c, i, lc)

        nvb = jnp.minimum((256 + i + 127) // 128, V // 128)
        nvb_row = jnp.zeros((1, C), jnp.int32) + nvb
        a, b, sel, counts = adjcount(ids, seg, live, bounds, nvb_row)
        zbase = jnp.int32(256) + i

        # ---- selection walk: up to K_CAP candidates off one count --------
        def sel_body(j, sst):
            cnts, pa_v, pb_v, c_v, bsel, stop = sst

            def run(_):
                maxc = jnp.max(cnts)
                tied = cnts == maxc
                n_tied = jnp.sum(tied.astype(jnp.int32))
                flat = jnp.min(jnp.where(tied, vi, INT32_MAX))

                def pick_tie(_):
                    mrow = jnp.where(lane == 0, maxc, 0)
                    s2 = tie(a, b, cnts, mrow, bounds)
                    return s2[0, 0], s2[0, 1]

                pa, pb = jax.lax.cond(
                    (n_tied == 1) | (maxc == 0),
                    lambda _: (flat // V, flat % V), pick_tie, None)
                # cross-side shares only — see fused_train.py's batching
                # block comment for the proof
                shares = jnp.any((kj < bsel) &
                                 ((pa_v == pb) | (pb_v == pa)))
                hom0 = pa_v[0] == pb_v[0]
                ok = (maxc > 0) & ((j == 0) |
                                   ((~shares) & (pa != pb) & (~hom0)))

                def acc(_):
                    return (cnts.at[pa, pb].set(0, mode="drop"),
                            pa_v.at[j].set(pa), pb_v.at[j].set(pb),
                            c_v.at[j].set(maxc), bsel + 1, stop)

                def rej(_):
                    return (cnts, pa_v, pb_v, c_v, bsel, jnp.int32(1))

                return jax.lax.cond(ok, acc, rej, None)

            return jax.lax.cond(stop == 1, lambda _: sst, run, None)

        initv = jnp.full((K_CAP,), -2, jnp.int32)
        _, pa_v, pb_v, c_v, bsel, _ = jax.lax.fori_loop(
            0, K_CAP, sel_body,
            (counts, initv, initv, jnp.zeros((K_CAP,), jnp.int32),
             jnp.int32(0), jnp.int32(0)))

        def no_pair(_):
            return (ids, seg, live, bounds, segl,
                    jnp.minimum(fail, i), log, i + 1, lc, nreb + 1)

        def single(_):
            pp = jnp.where(lane == 0, pa_v[0],
                           jnp.where(lane == 1, pb_v[0],
                                     jnp.where(lane == 2, zbase, 0)))
            ids2, live2, kept = apply_(ids, live, a, b, pp, bounds)
            segl2 = segl - kept
            log2 = log.at[i, 0].set(pa_v[0], mode="drop") \
                      .at[i, 1].set(pb_v[0], mode="drop") \
                      .at[i, 2].set(c_v[0], mode="drop") \
                      .at[i, 3].set(jnp.sum(kept), mode="drop")
            return (ids2, seg, live2, bounds, segl2, fail, log2, i + 1,
                    lc, nreb + 1)

        def batch(_):
            crow = (jnp.zeros((1, C), jnp.int32)
                    .at[0, 0:K_CAP].set(pa_v)
                    .at[0, K_CAP:2 * K_CAP].set(pb_v)
                    .at[0, 2 * K_CAP].set(bsel)
                    .at[0, 2 * K_CAP + 1].set(zbase))
            aF, cand, accl = mark(ids, seg, live, a, b, crow, bounds)
            accr = histrev(ids, seg, live, aF, cand, crow, bounds)
            cm = jnp.maximum(jnp.max(accl, axis=0)[:K_CAP],
                             jnp.max(accr, axis=0)[:K_CAP])
            bstar = jnp.int32(1)
            bnd = cm[0]
            for k in range(1, K_CAP):
                ok_k = (k < bsel) & (bstar == k) & (c_v[k] > bnd)
                bstar = jnp.where(ok_k, k + 1, bstar)
                bnd = jnp.where(ok_k, jnp.maximum(bnd, cm[k]), bnd)
            bstar = jnp.minimum(bstar, m_eff - i)
            bb = jnp.where(lane == 0, bstar,
                           jnp.where(lane == 1, zbase, 0))
            ids2, live2, kept = batch_apply(ids, live, cand, bb, bounds)
            segl2 = segl - jnp.where(lane < C // 2, kept, 0)
            log2 = log
            for j in range(K_CAP):
                idx_j = jnp.where(j < bstar, i + j, Mp + 1)  # oob -> drop
                log2 = (log2.at[idx_j, 0].set(pa_v[j], mode="drop")
                            .at[idx_j, 1].set(pb_v[j], mode="drop")
                            .at[idx_j, 2].set(c_v[j], mode="drop")
                            .at[idx_j, 3].set(kept[0, C // 2 + j],
                                              mode="drop"))
            return (ids2, seg, live2, bounds, segl2, fail, log2,
                    i + bstar, lc, nreb + 1)

        def nonzero(_):
            return jax.lax.cond(bsel == 1, single, batch, None)

        return jax.lax.cond(bsel == 0, no_pair, nonzero, None)

    # rows 0..Mp-1: merge log; row Mp: (fail, rebuilds); row Mp+1: trash
    # target for trimmed candidates' masked writes (never read)
    log0 = jnp.zeros((Mp + 2, 4), jnp.int32)
    st = (ids2, seg2, live2, bounds0, segl0, fail0, log0,
          jnp.int32(0), jnp.int32(0), jnp.int32(0))
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    fail = st[5]
    nreb = st[9]
    log = st[6].at[m_eff, 0].set(fail, mode="drop") \
               .at[m_eff, 1].set(nreb, mode="drop")
    return log


def train_merges_fused_xl(data, ends, n, num_merges: int,
                          interpret: bool = False,
                          seg_tokens: int | None = None):
    """Same contract as fused_train.train_merges_fused_bytes, for streams
    beyond the in-VMEM kernel (bytes + boundaries in; ends may be uint16
    chunk lengths). seg_tokens overrides the 2M-token segment size (tests
    use tiny segments to force multi-segment paths)."""
    import numpy as np

    from .fused_train import (
        _mp_bucket, _prep_from_bytes, _prep_from_bytes_u16, _vocab_width,
    )

    M = num_merges
    if M == 0:
        return (np.zeros((0, 2), np.int32), np.zeros((0,), np.int32), 0)
    st = seg_tokens or SEG_TOKENS
    Rs = _seg_rows(st)
    n = int(n)
    S = max(1, -(-int(data.shape[0]) // st))
    cap = S * st
    d = np.zeros(cap, dtype=np.uint8)
    d[:data.shape[0]] = np.asarray(data)
    from .fused_train import prep_from_boundaries

    ids2, seg2, live2 = prep_from_boundaries(jnp.asarray(d), ends,
                                             jnp.int32(n), S * Rs)
    segl = np.zeros((1, C), np.int32)
    for k in range(S):
        segl[0, k] = min(st, max(0, n - k * st))
    V = _vocab_width(M)
    Mp = _mp_bucket(M)
    ctl = (jnp.zeros((8, C), jnp.int32)
           .at[0, 0].set(M).at[3, 0].set(M))
    log = _train_xl(ids2, seg2, live2, jnp.asarray(segl), jnp.asarray(segl),
                    ctl, S, Rs, V, Mp, interpret)
    out_h = np.asarray(log)
    global LAST_REBUILDS
    LAST_REBUILDS = int(out_h[M, 1])  # diagnostic: merges/rebuilds = batch B
    return (out_h[:M, 0:2].copy(), out_h[:M, 2].copy(),
            min(int(out_h[M, 0]), M))


LAST_REBUILDS = 0  # count rebuilds of the most recent XL run (diagnostic)

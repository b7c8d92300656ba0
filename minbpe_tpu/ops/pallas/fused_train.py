"""Fully-fused Pallas BPE training kernel: the ENTIRE merge loop in one
kernel launch.

Motivation: per-kernel overheads (dispatch, and on remotely-tunneled PJRT
backends, per-kernel round-trips) dominate BPE rounds, whose math is tiny.
At bench scale the whole training state fits in VMEM (1 MB ids for a 256K
stream), so this kernel keeps state on-chip and runs every merge round inside
one ``fori_loop`` — zero HBM traffic between rounds, zero dispatch overhead.

The round is formulated gather/scatter/sort-free so every op lowers cleanly
to Mosaic:

- pair adjacency over tombstones ("id/seg of the next live token") is a
  blocked reverse select-scan (rolls + selects, log passes) — no pointers,
  no compaction, ever;
- pair counts are one-hot MXU matmuls accumulated per 128-element row
  (`counts = sum_r A_r^T B_r`), rebuilt each round — no scatter;
- the reference tie-break (earliest first occurrence among max-count pairs,
  minbpe/basic.py:35 + base.py:20-21) runs only on actual ties, as a serial
  walk over the tied pairs (trip count = the actual tie count): per pair one
  masked min-reduce gives its first stream occurrence, and the global min
  wins — no gather, no matmul sweep;
- left-first overlap parity (minbpe/base.py:33-41) uses chain positions
  (cumsum of live) and run-start chain positions (forward select-scan);
- consumed-token kills are "previous live token was kept" — another
  exclusive select-scan.

Layout: the stream lives as (R, 128) int32 in VMEM, flat order row-major.
Scans are two-level (in-row lane scans + cross-row scans). One-hot building
stacks STATIC lane slices of each (128, 128) tile on sublanes (the group
loops are python-unrolled): counting is order-free, so no transpose, no
flattening relayout, and no masked-reduce extraction anywhere — the only
remaining per-round traffic is the (4096, V) int8 one-hot planes themselves,
which is the measured cost floor (see scripts/profile_phases.py).

Supported sizes: N <= 4M tokens (128 MB VMEM; 5 persistent planes, scans run
tile-sequentially with scalar carries so transients stay in-register),
V <= 1024. Larger runs use the stepped/sort paths (ops/train_inc.py,
ops/train.py); multi-chip runs shard first (parallel/train.py).

Exactness: bit-identical to ops.train.train_merges (tests/test_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128          # lane width; stream layout is (R, C)
TILE_ROWS = 128  # rows per count-matmul tile (tile = 128x128 elements)
SCAN_TILE_ROWS = 128  # rows per sequential scan tile (in-register scans)
INT32_MAX = 2**31 - 1

# auto-mode limits: the working set (5 persistent int32 planes: ids, seg,
# live, a, b = 20 B/token) must fit VMEM (128 MB on v5e); scan temporaries
# are per-tile and stay in-register. 4M tokens = 80 MB, leaving headroom for
# the count-matmul transients. Larger runs use the stepped/sort/sharded
# paths; engine.run_train also falls back automatically if the kernel fails.
FUSED_MAX_N = 1 << 22
FUSED_MAX_V = 1024

TILE_ELEMS = TILE_ROWS * C  # stream elements per count tile (16384)


def fused_capacity(n: int) -> int:
    """Padded capacity for a stream headed into the fused trainer.

    Power-of-two bucketing wastes up to 2x kernel work (every row is scanned
    and counted whether live or padding), so the fused path buckets at
    1/8-octave granularity instead, floored at one tile: at most ~12.5%
    padding overhead, at most 8 distinct compiled sizes per octave."""
    p = 1 << max(n - 1, 1).bit_length()
    gran = max(TILE_ELEMS, p // 8)
    return max(TILE_ELEMS, -(-n // gran) * gran)


# ---------------------------------------------------------------------------
# blocked flat-order scans over (R, C) arrays
# ---------------------------------------------------------------------------

def _row_iota(R):
    return jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)


def _lane_iota(R):
    return jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)


def _shift_lanes(x, k, fill):
    """Shift +k toward higher lanes; vacated lanes get fill."""
    rolled = pltpu.roll(x, shift=k, axis=1)
    return jnp.where(_lane_iota(x.shape[0]) >= k, rolled, fill)


def _shift_rows(x, k, fill):
    rolled = pltpu.roll(x, shift=k, axis=0)
    return jnp.where(_row_iota(x.shape[0]) >= k, rolled, fill)


def _shift_rows_rev(x, k, fill):
    R = x.shape[0]
    rolled = pltpu.roll(x, shift=R - k, axis=0)  # negative shift = R - k
    return jnp.where(_row_iota(R) < R - k, rolled, fill)


def _shift_lanes_rev(x, k, fill):
    rolled = pltpu.roll(x, shift=C - k, axis=1)  # negative shift = C - k
    return jnp.where(_lane_iota(x.shape[0]) < C - k, rolled, fill)


def _shift_flat_fwd(xs, fills):
    """Shift a tuple of (R, C) arrays by +1 in flat order."""
    R = xs[0].shape[0]
    lane0 = _lane_iota(R) == 0
    out = []
    for x, fill in zip(xs, fills):
        s = _shift_lanes(x, 1, fill)
        carry = _shift_rows(x[:, C - 1:C], 1, fill)  # prev row's last elem
        out.append(jnp.where(lane0, carry, s))
    return tuple(out)


def _shift_flat_rev(xs, fills):
    """Shift a tuple of (R, C) arrays by -1 in flat order."""
    R = xs[0].shape[0]
    lane_last = _lane_iota(R) == C - 1
    out = []
    for x, fill in zip(xs, fills):
        s = _shift_lanes_rev(x, 1, fill)
        carry = _shift_rows_rev(x[:, 0:1], 1, fill)  # next row's first elem
        out.append(jnp.where(lane_last, carry, s))
    return tuple(out)


def _cumsum_flat(x):
    """Inclusive sum-scan in flat order of an (R, C) int32 array."""
    R = x.shape[0]
    k = 1
    while k < C:
        x = x + _shift_lanes(x, k, 0)
        k *= 2
    totals = x[:, C - 1:C]  # (R, 1) inclusive row totals
    k = 1
    while k < R:
        totals = totals + _shift_rows(totals, k, 0)
        k *= 2
    prefix = _shift_rows(totals, 1, 0)  # exclusive row prefix
    return x + prefix


def _select_scan_fwd(s, v, fill):
    """Inclusive forward select-scan: at i, the v of the LAST index j <= i
    with s[j] (fill where none). s: int32 0/1, v: int32."""
    R = s.shape[0]
    k = 1
    while k < C:
        ps = _shift_lanes(s, k, 0)
        pv = _shift_lanes(v, k, fill)
        v = jnp.where(s == 1, v, pv)
        s = s | ps
        k *= 2
    rs, rv = s[:, C - 1:C], v[:, C - 1:C]
    k = 1
    while k < R:
        ps = _shift_rows(rs, k, 0)
        pv = _shift_rows(rv, k, fill)
        rv = jnp.where(rs == 1, rv, pv)
        rs = rs | ps
        k *= 2
    prs = _shift_rows(rs, 1, 0)
    prv = _shift_rows(rv, 1, fill)
    v = jnp.where(s == 1, v, prv)
    s = s | prs
    return s, v


def _select_scan_fwd_exclusive(s, v, fill):
    """At i: the v of the last index j < i with s[j]."""
    s1, v1 = _shift_flat_fwd((s, v), (0, fill))
    return _select_scan_fwd(s1, v1, fill)


def _select_scan_rev_exclusive(ss, vs, fills):
    """At i: the values of the FIRST index j > i with set flag. ss: 0/1 flag
    array; vs: tuple of value arrays scanned together."""
    s1, *v1 = _shift_flat_rev((ss,) + tuple(vs), (0,) + tuple(fills))
    R = s1.shape[0]
    s = s1
    v = list(v1)
    k = 1
    while k < C:
        ns = _shift_lanes_rev(s, k, 0)
        nv = [_shift_lanes_rev(x, k, f) for x, f in zip(v, fills)]
        v = [jnp.where(s == 1, x, y) for x, y in zip(v, nv)]
        s = s | ns
        k *= 2
    rs = s[:, 0:1]
    rv = [x[:, 0:1] for x in v]
    k = 1
    while k < R:
        ns = _shift_rows_rev(rs, k, 0)
        nv = [_shift_rows_rev(x, k, f) for x, f in zip(rv, fills)]
        rv = [jnp.where(rs == 1, x, y) for x, y in zip(rv, nv)]
        rs = rs | ns
        k *= 2
    prs = _shift_rows_rev(rs, 1, 0)
    prv = [_shift_rows_rev(x, 1, f) for x, f in zip(rv, fills)]
    v = [jnp.where(s == 1, x, y) for x, y in zip(v, prv)]
    s = s | prs
    return (s,) + tuple(v)


# ---------------------------------------------------------------------------
# tiled sequential passes (shared by the fused trainer and fused encoder):
# each pass walks (SCAN_TILE_ROWS, C) row-tiles in stream order with SCALAR
# carries, doing the log-step doubling scans on the in-register tile values.
# The VPU processes vregs one at a time either way, so tile-serialization
# costs nothing — but whole-plane scans write every doubling step back to
# VMEM (~20 plane passes per round), while tiled scans touch each plane
# twice (load + store).
# ---------------------------------------------------------------------------

def _tile_flat_iota():
    TRS = SCAN_TILE_ROWS
    return jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 0) * C + \
        jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 1)


def _tile_last(v):
    """Scalar at the tile's last flat position."""
    return jnp.max(v[SCAN_TILE_ROWS - 1:SCAN_TILE_ROWS, C - 1:C])


def _tile_pick(v, tflat, p, fill):
    """Scalar at dynamic flat tile position p (masked reduce)."""
    return jnp.max(jnp.where(tflat == p, v, fill))


def tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref, T):
    """Reverse pass: a/b = (id, next-live id) masked to countable pairs
    (same segment, both live) — the array form of adjacent-pair counting
    over chunk lists (minbpe/regex.py:52-54)."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()

    def body(tt, carry):
        t = T - 1 - tt
        cid, cseg = carry  # id/seg of the first live position after tile
        sl = pl.ds(t * TRS, TRS)
        ids_t = ids_ref[sl, :]
        seg_t = seg_ref[sl, :]
        live_t = live_ref[sl, :]
        s, nli, nls = _select_scan_rev_exclusive(
            live_t, (ids_t, seg_t), (-1, -2))
        nli = jnp.where(s == 1, nli, cid)
        nls = jnp.where(s == 1, nls, cseg)
        valid = (live_t == 1) & (nli >= 0) & (seg_t == nls)
        a_ref[sl, :] = jnp.where(valid, ids_t, -1)
        b_ref[sl, :] = jnp.where(valid, nli, -1)
        # carry': first live position in this tile, if any
        fl = jnp.min(jnp.where(live_t == 1, tflat, INT32_MAX))
        any_live = fl < INT32_MAX
        return (jnp.where(any_live, _tile_pick(ids_t, tflat, fl, -2**31),
                          cid),
                jnp.where(any_live, _tile_pick(seg_t, tflat, fl, -2**31),
                          cseg))

    jax.lax.fori_loop(0, T, body, (jnp.int32(-1), jnp.int32(-2)))


def tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb, new_id, T):
    """Forward pass: apply the merge (pa, pb) -> new_id with the reference's
    left-first overlap rule (minbpe/base.py:25-41) — keep = match whose
    chain distance from its run start is even; kill the token consumed
    by a kept match (the next live one)."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()

    def body(t, carry):
        mc, cc, rc, kc = carry
        sl = pl.ds(t * TRS, TRS)
        live_t = live_ref[sl, :]
        ids_t = ids_ref[sl, :]
        m = ((a_ref[sl, :] == pa) & (b_ref[sl, :] == pb)).astype(jnp.int32)
        s2, mprv = _select_scan_fwd_exclusive(live_t, m, 0)
        mprv = jnp.where(s2 == 1, mprv, mc)
        new_run = m * (1 - mprv)
        chain = _cumsum_flat(live_t) + cc
        s4, cps = _select_scan_fwd(new_run, chain, 0)
        cps = jnp.where(s4 == 1, cps, rc)
        keep = ((m == 1) & (((chain - cps) & 1) == 0)).astype(jnp.int32)
        s5, kprv = _select_scan_fwd_exclusive(live_t, keep, 0)
        kprv = jnp.where(s5 == 1, kprv, kc)
        ids_ref[sl, :] = jnp.where(keep == 1, new_id, ids_t)
        live_ref[sl, :] = jnp.where(kprv == 1, 0, live_t)
        # carries: chain total; m/keep at the tile's last live position;
        # run-start chainpos if any run started in this tile
        fl = jnp.max(jnp.where(live_t == 1, tflat, -1))
        has = fl >= 0
        return (jnp.where(has, _tile_pick(m, tflat, fl, -2**31), mc),
                _tile_last(chain),
                jnp.where(_tile_last(s4) == 1, _tile_last(cps), rc),
                jnp.where(has, _tile_pick(keep, tflat, fl, -2**31), kc))

    jax.lax.fori_loop(
        0, T, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))


# Below this many rows, whole-plane value scans beat the tiled passes: the
# scans are ~14 doubling steps over wide vectors with no serialized scalar
# carries, and at small R the Mosaic allocator's transient live ranges fit
# VMEM comfortably. (Measured on v5e: ~35% less per-round scan time at
# R ~ 1.5K; the crossover concern is purely VMEM growth, which is O(R log).)
TILED_MIN_R = 4096


def plane_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref):
    """Whole-plane value-scan form of tiled_adjacency (small-R fast path)."""
    ids = ids_ref[:]
    seg = seg_ref[:]
    live = live_ref[:]
    _, nli, nls = _select_scan_rev_exclusive(live, (ids, seg), (-1, -2))
    valid = (live == 1) & (nli >= 0) & (seg == nls)
    a_ref[:] = jnp.where(valid, ids, -1)
    b_ref[:] = jnp.where(valid, nli, -1)


def plane_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb, new_id):
    """Whole-plane value-scan form of tiled_apply (small-R fast path)."""
    ids = ids_ref[:]
    live = live_ref[:]
    m = ((a_ref[:] == pa) & (b_ref[:] == pb)).astype(jnp.int32)
    _, m_prv = _select_scan_fwd_exclusive(live, m, 0)
    new_run = m * (1 - m_prv)
    chainpos = _cumsum_flat(live)
    _, cps = _select_scan_fwd(new_run, chainpos, 0)
    keep = (m == 1) & (((chainpos - cps) & 1) == 0)
    _, k_prv = _select_scan_fwd_exclusive(live, keep.astype(jnp.int32), 0)
    ids_ref[:] = jnp.where(keep, new_id, ids)
    live_ref[:] = jnp.where(k_prv == 1, 0, live)


def tiled_mask_dead(ids_ref, live_ref, T):
    """ids -> -1 wherever not live (tombstones for host/driver compaction)."""
    TRS = SCAN_TILE_ROWS

    def body(t, _):
        sl = pl.ds(t * TRS, TRS)
        ids_ref[sl, :] = jnp.where(live_ref[sl, :] == 1, ids_ref[sl, :], -1)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(ids_in, seg_in, live_in, ctl_in, out_ref, ids_out, seg_out,
            ids_ref, seg_ref, live_ref,
            a_ref, b_ref, dma_sems,
            *, R: int, V: int, M: int, phases: str = "full"):
    # `phases` is a measurement knob (scripts/profile_phases.py): "none" /
    # "adj" / "count" / "select" truncate each merge round after that phase
    # (writing a value derived from it so nothing is dead-code-eliminated),
    # letting per-phase cost be attributed by differencing wall times.
    # Production always runs "full".
    # inputs live in HBM; copy them into the VMEM working set
    for src, dst, k in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).start()
    for src, dst, k in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).wait()

    # chained control state (lets segments run back-to-back with no host
    # round trip): [0,0] = GLOBAL fail round so far, [1,0] = live token count,
    # [2,0] = r0 (first global merge round of this segment), [3,0] = m_eff
    # (rounds actually wanted from this segment; rounds >= m_eff cost one
    # branch each). r0/m_eff are dynamic so every segment of a staged plan —
    # including a short final segment — shares ONE compiled kernel per
    # (R, V): cold-start compile cost never scales with merge count.
    fail_in = ctl_in[0, 0]
    n_live = ctl_in[1, 0]
    r0 = ctl_in[2, 0]
    m_eff = ctl_in[3, 0]

    TRS = SCAN_TILE_ROWS
    T = R // TRS
    tflat = jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 0) * C + \
        jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 1)

    GROUP = 32  # lanes per matmul: contraction = GROUP * TILE_ROWS = 4096
    GC = GROUP * TILE_ROWS
    viota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, V), 1)
    n_tiles = R // TILE_ROWS

    def one_hot_group(t, g0):
        """t: (TILE_ROWS, C) tile in native layout; lanes g0..g0+GROUP-1
        (g0 STATIC — the group loops below are python-unrolled) each become
        one (TILE_ROWS, V) one-hot block via a lane-broadcast compare, then
        the blocks stack on sublanes -> (GC, V) int8. The compare reads ONE
        lane slice per block (vs. a full-tile masked reduce per lane before:
        ~2 MB of re-reads per group) and canonicalizes the layout, keeping
        the block concat legal for Mosaic (concatenating the raw lane slices
        themselves trips 'offset mismatch on non-concat dimension').

        Stacking is lane-major, NOT flat stream order: counting is a sum
        over elements, so any element order works as long as the A/B pairing
        per element is consistent (both sides use this same stacking)."""
        blocks = [
            (t[:, j:j + 1] == viota_b).astype(jnp.int8)
            for j in range(g0, g0 + GROUP)
        ]
        return jnp.concatenate(blocks, axis=0)  # (GC, V)

    def count_matrix():
        """counts[x, y] = #positions with (a, b) == (x, y); -1 entries skip.
        int8 one-hots drive the MXU's double-rate int8 path; exact int32
        accumulation (products are 0/1). Tiles past the live prefix (the
        stream is kept front-compacted between segments) are skipped."""
        acc = jnp.zeros((V, V), jnp.int32)

        def tile_body(t, acc):
            def work(acc):
                at = a_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                bt = b_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                for g in range(C // GROUP):  # unrolled: static lane slices
                    A = one_hot_group(at, g * GROUP)
                    B = one_hot_group(bt, g * GROUP)
                    acc = acc + jax.lax.dot_general(
                        A, B, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                return acc

            return jax.lax.cond(t * TILE_ELEMS < n_live, work,
                                lambda a: a, acc)

        return jax.lax.fori_loop(0, n_tiles, tile_body, acc)

    def first_match_index(ca, cb):
        """Smallest flat stream position with (a, b) == (ca, cb), tiled."""

        def body(t, best):
            sl = pl.ds(t * TRS, TRS)
            hit = (a_ref[sl, :] == ca) & (b_ref[sl, :] == cb)
            cand = jnp.min(jnp.where(hit, tflat + t * (TRS * C), INT32_MAX))
            return jnp.minimum(best, cand)

        return jax.lax.fori_loop(0, T, body, jnp.int32(INT32_MAX))

    tiled = R > TILED_MIN_R

    def _truncate(i, val):
        out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32) + val

    def round_body(i, fail):
        if phases == "none":
            _truncate(i, i)
            return fail
        if tiled:
            tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref, T)
        else:
            plane_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref)
        if phases == "adj":
            _truncate(i, jnp.max(a_ref[:]) + jnp.max(b_ref[:]))
            return fail

        counts = count_matrix()
        maxc = jnp.max(counts)
        if phases == "count":
            _truncate(i, maxc)
            return fail
        tied = counts == maxc
        n_tied = jnp.sum(tied.astype(jnp.int32))

        def pick_unique(_):
            # first flat index in the (V, V) matrix achieving maxc
            vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
                jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
            flat = jnp.min(jnp.where(tied, vi, INT32_MAX))
            return flat // V, flat % V

        def pick_tied_serial(_):
            """Walk the tied pairs one by one (cheap full-plane reduces, no
            matmul sweep): the winner is the pair whose first occurrence in
            the stream is earliest — per-pair first occurrence is a masked
            min-reduce, and the global minimum over tied pairs equals the
            first index whose pair is tied. The trip count is the ACTUAL tie
            count (ties are almost always tiny — the bench corpus never
            exceeds 6 tied pairs), so this is exact for any tie set at
            pay-per-tie cost; each iteration consumes exactly one tied key
            in ascending flat-key order. When maxc == 0 (corpus exhausted)
            EVERYTHING ties — but the pick is then unused (the round is
            skipped), so the trip count is forced to 0."""
            vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
                jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)

            # scalar-only loop state (Mosaic cannot carry vectors through
            # scf.while): walk tied pairs in ascending flat-key order by
            # re-reducing with a `> prev` mask instead of mutating the set.
            def body(t, st):
                prev, best_fi, pa, pb = st
                flat = jnp.min(jnp.where(tied & (vi > prev), vi, INT32_MAX))
                ca, cb = flat // V, flat % V
                fi = first_match_index(ca, cb)
                better = (flat < INT32_MAX) & (fi < best_fi)
                return (flat,
                        jnp.where(better, fi, best_fi),
                        jnp.where(better, ca, pa),
                        jnp.where(better, cb, pb))

            n_eff = jnp.where(maxc > 0, n_tied, 0)
            _, _, pa, pb = jax.lax.fori_loop(
                0, n_eff, body,
                (jnp.int32(-1), jnp.int32(INT32_MAX), jnp.int32(0),
                 jnp.int32(0)))
            return pa, pb

        pa, pb = jax.lax.cond(n_tied == 1, pick_unique, pick_tied_serial,
                              None)
        if phases == "select":
            _truncate(i, pa * V + pb)
            return fail
        # fail is GLOBAL (carried across segments through ctl)
        ok = (maxc > 0) & (fail >= r0 + i)

        def do(fail):
            if tiled:
                tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb,
                            jnp.int32(256) + r0 + i, T)
            else:
                plane_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb,
                            jnp.int32(256) + r0 + i)
            # record the round
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            row = jnp.where(lane == 0, pa,
                            jnp.where(lane == 1, pb,
                                      jnp.where(lane == 2, maxc, 0)))
            out_ref[pl.ds(i, 1), :] = row
            return fail

        def skip(fail):
            out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32)
            return jnp.where(maxc > 0, fail,
                             jnp.minimum(fail, r0 + i))

        return jax.lax.cond(ok, do, skip, fail)

    def maybe_round(i, fail):
        def idle(fail):
            out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32)
            return fail

        return jax.lax.cond(i < m_eff, lambda f: round_body(i, f), idle,
                            fail)

    fail = jax.lax.fori_loop(0, M, maybe_round, fail_in)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    out_ref[pl.ds(M, 1), :] = jnp.where(lane == 0, fail, 0)

    # write the final stream state back to HBM (consumed tokens become -1 so
    # the staged driver can compact without a separate live plane)
    if tiled:
        tiled_mask_dead(ids_ref, live_ref, T)
    else:
        ids_ref[:] = jnp.where(live_ref[:] == 1, ids_ref[:], -1)
    for src, dst, k in ((ids_ref, ids_out, 0), (seg_ref, seg_out, 1)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).start()
    for src, dst, k in ((ids_ref, ids_out, 0), (seg_ref, seg_out, 1)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).wait()


@functools.partial(jax.jit, static_argnames=("R",))
def _prep_from_bytes(data, ends, n, R: int):
    """Build the (R, C) working planes on device from raw corpus bytes and
    chunk-end offsets. This keeps the host->device transfer at ~1 byte per
    corpus byte (uint8 data + int32 offsets) instead of 8 (two int32 planes);
    the tunnel transport runs at ~46 MB/s, so wire bytes are expensive.

    Segment ids are recovered as seg[i] = #chunk-ends <= i via a scatter of
    end markers + cumsum — the device-side equivalent of
    stream.pack_offsets's host repeat (minbpe/regex.py:44's chunk isolation).
    """
    N = R * C
    iota = jnp.arange(N, dtype=jnp.int32)
    pad = N - data.shape[0]
    d = jnp.pad(data.astype(jnp.int32), (0, pad))
    live = iota < n
    ids2 = jnp.where(live, d, -1)
    marks = jnp.zeros((N,), jnp.int32).at[ends].add(1, mode="drop")
    seg = jnp.cumsum(marks)
    seg2 = jnp.where(live, seg, -2)
    return (ids2.reshape(R, C), seg2.reshape(R, C),
            live.astype(jnp.int32).reshape(R, C))


@functools.partial(jax.jit, static_argnames=("R",))
def _prep_planes(ids, seg, n, R: int):
    """Pad/reshape a flat packed stream into (R, C) working planes."""
    N = ids.shape[0]
    pad = R * C - N
    idx = jnp.arange(N, dtype=jnp.int32)
    live = (idx < n).astype(jnp.int32)
    ids2 = jnp.pad(ids, (0, pad), constant_values=-1).reshape(R, C)
    seg2 = jnp.pad(seg, (0, pad), constant_values=-2).reshape(R, C)
    live2 = jnp.pad(live, (0, pad)).reshape(R, C)
    return ids2, seg2, live2


@functools.partial(jax.jit, static_argnames=("R2",))
def _compact_planes(ids2, seg2, R2: int):
    """Squeeze tombstones (-1 ids, written by the kernel's final state dump)
    out of the stream, into fresh (R2, C) planes. A stable compaction: flat
    order — and with it the reference's first-occurrence tie-break order — is
    preserved. Runs as plain XLA (cumsum + scatter), not Pallas: it executes
    once per 128-round segment, off the hot path."""
    flat_ids = ids2.reshape(-1)
    flat_seg = seg2.reshape(-1)
    live = flat_ids >= 0
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    cap = R2 * C
    idx = jnp.where(live, pos, cap)  # dead slots scatter out of bounds
    new_ids = jnp.full((cap,), -1, jnp.int32).at[idx].set(
        flat_ids, mode="drop")
    new_seg = jnp.full((cap,), -2, jnp.int32).at[idx].set(
        flat_seg, mode="drop")
    n_live = pos[-1] + 1
    new_live = (jnp.arange(cap, dtype=jnp.int32) < n_live).astype(jnp.int32)
    return (new_ids.reshape(R2, C), new_seg.reshape(R2, C),
            new_live.reshape(R2, C))


@functools.partial(jax.jit, static_argnames=("R", "V", "m", "interpret"))
def _run_segment(ids2, seg2, live2, ctl, R: int, V: int, m: int,
                 interpret: bool = False):
    """One kernel launch covering merge rounds [r0, r0 + m), r0 = ctl[2, 0]."""
    Mp = -(-(m + 1) // 8) * 8
    out, ids_out, seg_out = pl.pallas_call(
        functools.partial(_kernel, R=R, V=V, M=m),
        out_shape=[
            jax.ShapeDtypeStruct((Mp, C), jnp.int32),
            jax.ShapeDtypeStruct((R, C), jnp.int32),
            jax.ShapeDtypeStruct((R, C), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, C), jnp.int32),  # ids
            pltpu.VMEM((R, C), jnp.int32),  # seg
            pltpu.VMEM((R, C), jnp.int32),  # live
            pltpu.VMEM((R, C), jnp.int32),  # a (masked left ids)
            pltpu.VMEM((R, C), jnp.int32),  # b (masked next-live ids)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB of VMEM; the default 100 MB scoped limit leaves
            # margin we don't need (the working set is exactly 5 R*C planes
            # + in-register scan tiles + the count-matmul transients).
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids2, seg2, live2, ctl)
    return out, ids_out, seg_out


# merge rounds per kernel launch in the staged path. The stream is
# front-compacted between segments (count cost scales with the live prefix,
# which shrinks monotonically: each merge round kills `count` tokens), and
# every segment shares ONE compiled kernel (r0/m_eff are dynamic, see _plan_vs).
SEG_ROUNDS = 128


def _rows_for(n: int) -> int:
    R = -(-n // C)
    return -(-R // TILE_ROWS) * TILE_ROWS


def train_merges_fused(ids, seg, n, num_merges: int, interpret: bool = False):
    """Whole-training-on-chip driver. Same contract as
    ops.train.train_merges: (pairs[M,2], counts[M], fail_round).

    Training runs as ceil(M / 128) kernel launches. Between launches the only
    host work is reading the segment's merge log (needed anyway for the final
    result) to size the compacted stream; the stream itself never leaves the
    device. Single-segment calls (M <= 128) behave exactly like the original
    one-launch design.
    """
    N = ids.shape[0]
    R = _rows_for(N)
    ids2, seg2, live2 = _prep_planes(jnp.asarray(ids), jnp.asarray(seg),
                                     jnp.asarray(n), R)
    return _train_from_planes(ids2, seg2, live2, int(n), num_merges,
                              interpret)


def train_merges_fused_bytes(data, ends, n, num_merges: int,
                             interpret: bool = False):
    """Same contract as train_merges_fused, fed by raw corpus bytes + chunk
    end offsets (both already on device or cheap to ship): the working planes
    are built on device, cutting wire traffic ~4x on tunneled backends."""
    R = _rows_for(data.shape[0])
    ids2, seg2, live2 = _prep_from_bytes(jnp.asarray(data), jnp.asarray(ends),
                                         jnp.asarray(n), R)
    return _train_from_planes(ids2, seg2, live2, int(n), num_merges,
                              interpret)


@functools.partial(jax.jit, static_argnames=("M_total", "vs", "interpret"))
def _train_staged(ids2, seg2, live2, n, M_total: int, vs: tuple,
                  interpret: bool = False):
    """All merge segments in ONE dispatch: segments chain on device through
    a tiny ctl plane (global fail round + live count + r0 + m_eff), the
    stream is front-compacted between segments at constant R, and dead tail
    tiles are skipped dynamically inside the kernel. The host syncs exactly
    once, on the final merge log — on tunneled backends each host<->device
    round trip costs ~20-25 ms, which used to dominate the whole run.

    vs[k] is segment k's count-matrix width (pair counting is the dominant
    round cost and scales with V — see scripts/profile_phases.py — so early
    segments count at the narrowest V covering their new ids). Compiled
    kernel count = number of DISTINCT widths in vs (r0/m_eff are dynamic),
    typically 2 for a 512-vocab run, never per-segment."""
    R = ids2.shape[0]
    fail = jnp.int32(M_total)
    n_live = jnp.asarray(n, jnp.int32)
    outs = []
    for k, V in enumerate(vs):
        m_k = min(SEG_ROUNDS, M_total - k * SEG_ROUNDS)
        ctl = (jnp.zeros((8, C), jnp.int32)
               .at[0, 0].set(fail).at[1, 0].set(n_live)
               .at[2, 0].set(k * SEG_ROUNDS).at[3, 0].set(m_k))
        out, ids_next, seg_next = _run_segment(ids2, seg2, live2, ctl,
                                               R, V, SEG_ROUNDS, interpret)
        outs.append(out[:m_k])
        fail = out[SEG_ROUNDS, 0]
        if k + 1 < len(vs):
            # tokens consumed this segment = one per merge occurrence
            # (column 2 of the merge log)
            n_live = n_live - jnp.sum(out[:m_k, 2])
            ids2, seg2, live2 = _compact_planes(ids_next, seg_next, R)
        else:
            # fail row rides along: one readback
            outs.append(out[SEG_ROUNDS:SEG_ROUNDS + 1])
    return jnp.concatenate(outs, axis=0)


def _plan_vs(num_merges: int) -> tuple[int, ...]:
    """Per-segment count-matrix widths: the smallest lane-aligned V covering
    each segment's highest new id (ids reach 256 + r0 + m_eff by segment
    end). No power-of-two bucketing — each 128-step in V costs a Mosaic
    compile only once per (R, V), and counting cost is linear in V."""
    segs = -(-num_merges // SEG_ROUNDS)
    return tuple(
        max(384,
            -(-(256 + min((k + 1) * SEG_ROUNDS, num_merges)) // 128) * 128)
        for k in range(segs)
    )


def _train_from_planes(ids2, seg2, live2, n: int, num_merges: int,
                       interpret: bool):
    import numpy as np

    M = num_merges
    if M == 0:
        return (np.zeros((0, 2), np.int32), np.zeros((0,), np.int32), 0)

    out = _train_staged(ids2, seg2, live2, n, M, _plan_vs(M), interpret)
    out_h = np.asarray(out)  # the one sync point of the whole training run
    return (out_h[:M, 0:2].copy(), out_h[:M, 2].copy(),
            min(int(out_h[M, 0]), M))

"""Fully-fused Pallas BPE training kernel: the ENTIRE merge loop in one
kernel launch.

Motivation: per-kernel overheads (dispatch, and on remotely-tunneled PJRT
backends, ~25 ms round-trips) dominate BPE rounds, whose math is tiny. The
whole training state fits in VMEM (1 MB ids per 256K tokens), so this kernel
keeps state on-chip and runs EVERY merge round of the whole run inside one
``fori_loop`` — one launch, one host sync, zero HBM traffic between rounds.

The round is formulated gather/scatter/sort-free so every op lowers cleanly
to Mosaic:

- pair adjacency over tombstones ("id/seg of the next live token") is a
  blocked reverse select-scan (rolls + selects, log passes) — no pointers;
- pair counts are one-hot MXU matmuls accumulated per 128-element row
  (`counts = sum_r A_r^T B_r`), rebuilt each round at the CURRENT vocab
  width (a two-variant switch: rounds below 384 ids count 384 wide) over
  the CURRENT live prefix — no scatter. Rebuilding beats delta/histogram
  maintenance on this hardware: scatter-free [V]-histograms of changed
  positions cost N*V VPU compares or N*V one-hot build traffic per round,
  which measures >= the full MXU rebuild at V <= 1024 (round-4 probes);
- every COMPACT_EVERY rounds (ctl-tunable) the live tokens are
  front-compacted IN VMEM: plane-parallel in-row packing by bit-decomposed
  conditional lane shifts + a serial row-stitch (dynamic-row RMW appends),
  preserving flat order and with it the first-occurrence tie-break order.
  All per-round work then scales with the integral of the live count over
  rounds (-25% at bench scale, bit-identical at every cadence);
- the reference tie-break (earliest first occurrence among max-count pairs,
  minbpe/basic.py:35 + base.py:20-21) runs only on actual ties, as a serial
  walk over the tied pairs (trip count = the actual tie count);
- left-first overlap parity (minbpe/base.py:33-41) uses chain positions
  (cumsum of live) and run-start chain positions (forward select-scan);
- consumed-token kills are "previous live token was kept" — another
  exclusive select-scan. The kernel tracks live tokens by KEPT SITES (merge
  log column 3), not occurrence counts: for pa == pb runs, occurrences
  overlap and counting them would under-estimate the live prefix.

Layout: the stream lives as (R, 128) int32 in VMEM, flat order row-major.
Scans are two-level (in-row lane scans + cross-row scans), walked in
(128, 128) tiles with scalar carries so transients stay in-register.
Transfers: corpus bytes ship as uint8 + uint16 chunk lengths; the host
fetches only the (M, 4) merge-log slice (pa, pb, count, kept).

Supported sizes: N <= 4M tokens (128 MB VMEM; 5 persistent planes),
V <= 1024. Larger runs use the sort-round loop (ops/train_sortloop.py);
multi-chip runs shard first (parallel/train.py).

Exactness: bit-identical to ops.train.train_merges (tests/test_fused.py),
including compaction crossings and overlap-run live tracking.
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


def tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref, T, t_cur=None,
                    carry_in=None):
    """Reverse pass: a/b = (id, next-live id) masked to countable pairs
    (same segment, both live) — the array form of adjacent-pair counting
    over chunk lists (minbpe/regex.py:52-54).

    t_cur (optional, traced): only tiles [0, t_cur) hold live data — tiles
    beyond the front-compacted prefix are skipped entirely.
    carry_in (optional): (id, seg) of the first live token AFTER this
    stream — lets the XL driver chain the scan across HBM segments.
    Returns the outgoing carry (first live id/seg of THIS stream)."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()
    n_t = T if t_cur is None else t_cur

    def body(tt, carry):
        t = n_t - 1 - tt
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

    init = carry_in if carry_in is not None else (jnp.int32(-1),
                                                   jnp.int32(-2))
    return jax.lax.fori_loop(0, n_t, body, init)


def tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb, new_id, T,
                t_cur=None, carry_in=None):
    """Forward pass: apply the merge (pa, pb) -> new_id with the reference's
    left-first overlap rule (minbpe/base.py:25-41) — keep = match whose
    chain distance from its run start is even; kill the token consumed
    by a kept match (the next live one).

    Returns the full scan carry (m-at-last-live, chain total, run-start
    chainpos, keep-at-last-live, kept total): element [4] is the number of
    KEPT merge sites (= tokens consumed), which is strictly less than the
    occurrence count when pa == pb occurrences overlap — the exact quantity
    a live-token tracker must subtract. carry_in chains the pass across
    HBM segments (XL driver); t_cur as in tiled_adjacency."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()
    n_t = T if t_cur is None else t_cur

    def body(t, carry):
        mc, cc, rc, kc, ktot = carry
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
                jnp.where(has, _tile_pick(keep, tflat, fl, -2**31), kc),
                ktot + jnp.sum(keep))

    init = carry_in if carry_in is not None else (
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.int32(0))
    return jax.lax.fori_loop(0, n_t, body, init)


# Below this many rows, whole-plane value scans beat the tiled passes: the
# scans are ~14 doubling steps over wide vectors with no serialized scalar
# carries, and at small R the Mosaic allocator's transient live ranges fit
# VMEM comfortably. (Measured on v5e: ~35% less per-round scan time at
# R ~ 1.5K; the crossover concern is purely VMEM growth, which is O(R log).)
# Used by the fused ENCODER's plane-scan rounds (fused_encode.round_plane);
# the trainer is tiled-only since the single-launch rework (tail-tile
# skipping over the compacted prefix needs tile granularity).
TILED_MIN_R = 4096


def tiled_mask_dead(ids_ref, live_ref, T):
    """ids -> -1 wherever not live (tombstones for host/driver compaction)."""
    TRS = SCAN_TILE_ROWS

    def body(t, _):
        sl = pl.ds(t * TRS, TRS)
        ids_ref[sl, :] = jnp.where(live_ref[sl, :] == 1, ids_ref[sl, :], -1)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


# ---------------------------------------------------------------------------
# exact multi-merge batching (one count rebuild amortized over several merges)
#
# After one count rebuild, candidates are taken in exact reference order
# (count desc, earliest-first-occurrence tie-break) while heterogeneous
# (pa != pb) and free of CROSS-side token shares: candidate q is accepted
# only if no earlier accepted merge can consume q's left token (qa != every
# accepted pb) or replace q's right token (qb != every accepted pa).
# Applying a merge only creates pairs that contain its new id z_j (every
# other adjacency is untouched); same-side shares (qa equal to an accepted
# pa, or qb to an accepted pb) cannot touch q's occurrences — site starts
# are REPLACED, so no (pa_m, w) occurrence can start at a site, and a
# consumed token only ever pairs with its own site start — so an accepted
# candidate's count and first-occurrence order are exactly what the rebuilt
# matrix says, and accepted candidates' match sites remain pairwise
# non-overlapping.  So candidate k is provably still
# the true argmax of the stream-after-k-1-merges iff its count strictly
# exceeds the count of every pair created by merges 0..k-1.  Those creation
# counts are bounded EXACTLY and pre-apply: the joint site map is known (for
# heterogeneous disjoint candidates every (a, b) match is a kept site — no
# overlaps), so the creations of candidate j are (v, z_j) / (z_j, w) over its
# sites' live neighbors, histogrammed into 128 partner buckets per creator.
# Partner tokens that are part of another candidate's site are counted under
# BOTH the merged-id and original-id hypotheses, making the bound valid for
# every trim prefix.  Structural facts used (both follow from disjointness +
# heterogeneity): a site's left live neighbor is never another site's start,
# and its right-of-consumed live neighbor is never another site's consumed
# token.  Measured on the bench corpus this accepts ~3.1 merges per rebuild
# (scripts/scratch/probe_r5_batch3.py simulates the identical rule host-side
# and checks bit-equality against the sequential reference loop).
# ---------------------------------------------------------------------------

K_CAP = 16  # max merges accepted per count rebuild

# Above this many tied pairs the serial pay-per-tie walk (one full-stream
# masked reduce per tied pair) gives way to the fixed-cost matmul membership
# sweep (~one count-rebuild equivalent regardless of tie count) — the cap on
# the adversarial maxc==1 tail where every distinct pair ties.
TIE_SERIAL_MAX = 64


def _oh128(t, g0):
    """(32 * rows, 128) int8 one-hot of a value tile's lanes g0..g0+32;
    negative values produce all-zero rows (masked-out positions)."""
    w = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], 128), 1)
    blocks = [(t[:, j:j + 1] == w).astype(jnp.int8)
              for j in range(g0, g0 + 32)]
    return jnp.concatenate(blocks, axis=0)


def _oh128_or(t1, t2, g0):
    """One-hot of value-in-{t1, t2} (compare-OR before the int8 cast —
    Mosaic has no int8 vector add, and OR is also the tighter bound: a
    position whose two hypotheses collide in one bucket counts once)."""
    w = jax.lax.broadcasted_iota(jnp.int32, (t1.shape[0], 128), 1)
    blocks = [((t1[:, j:j + 1] == w) | (t2[:, j:j + 1] == w)).astype(jnp.int8)
              for j in range(g0, g0 + 32)]
    return jnp.concatenate(blocks, axis=0)


def _hist_tile(acc, rows1, rows2, cols, use2):
    """acc[r, c] += one-hot(rows1 ∪ rows2)^T one-hot(cols); the rows2
    hypothesis participates only when use2 (tiles without any hypothesis-2
    position skip that build entirely)."""

    def with2(acc):
        for g in range(C // 32):
            B = _oh128(cols, g * 32)
            A = _oh128_or(rows1, rows2, g * 32)
            acc = acc + jax.lax.dot_general(
                A, B, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return acc

    def without2(acc):
        for g in range(C // 32):
            B = _oh128(cols, g * 32)
            A = _oh128(rows1, g * 32)
            acc = acc + jax.lax.dot_general(
                A, B, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return acc

    return jax.lax.cond(use2, with2, without2, acc)


def tiled_batch_mark(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                     pas, pbs, bsel, zbase, t_cur, carry_in=None,
                     acc0=None):
    """Batch pass 1 (forward): candidate-site plane, final-id plane, and the
    left-creation histogram.

    cand[p] = index of the candidate matching at p (-1 otherwise; matches
    of heterogeneous cross-side-free candidates never overlap — see the
    batching block comment — so every match is a kept site). F[p] = the id token p carries after the whole batch applies: z_j
    at site starts, z_j of the covering site at consumed tokens, unchanged
    otherwise.  Writes F into a_ref and cand into b_ref (the rebuild-time
    adjacency is not needed again this round).  Accumulates
    acc_l[v & 127, j] over sites' left live partners v — the creation pairs
    (v, z_j) — with candidate-involved partners under both hypotheses.
    Returns (acc_l, carry_out): acc_l (128, 128) int32 (cols >= bsel stay
    zero); carry_out = (cand, F, seg, id) at the stream's last live position
    (for the XL driver's cross-segment chaining via carry_in/acc0)."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()

    def body(t, st):
        acc, c_cand, c_F, c_seg, c_id = st
        sl = pl.ds(t * TRS, TRS)
        ids_t = ids_ref[sl, :]
        seg_t = seg_ref[sl, :]
        live_t = live_ref[sl, :]
        a_t = a_ref[sl, :]
        b_t = b_ref[sl, :]
        cand = jnp.full((TRS, C), -1, jnp.int32)
        for j in range(K_CAP):
            m = (a_t == pas[j]) & (b_t == pbs[j]) & (j < bsel)
            cand = jnp.where(m, j, cand)
        s1, pc = _select_scan_fwd_exclusive(live_t, cand, -1)
        pc = jnp.where(s1 == 1, pc, c_cand)
        F = jnp.where(cand >= 0, zbase + cand,
                      jnp.where(pc >= 0, zbase + pc, ids_t))
        s2, pF = _select_scan_fwd_exclusive(live_t, F, -1)
        pF = jnp.where(s2 == 1, pF, c_F)
        s3, ps = _select_scan_fwd_exclusive(live_t, seg_t, -2)
        ps = jnp.where(s3 == 1, ps, c_seg)
        s4, pid = _select_scan_fwd_exclusive(live_t, ids_t, -1)
        pid = jnp.where(s4 == 1, pid, c_id)
        site = cand >= 0
        lval = site & (ps == seg_t) & (pF >= 0)
        rows1 = jnp.where(lval, pF & 127, -1)
        wild = lval & (pF >= zbase)
        rows2 = jnp.where(wild, pid & 127, -1)
        cols = jnp.where(lval, cand, -1)
        any_site = jnp.max(jnp.where(lval, 1, 0)) > 0
        use2 = jnp.max(jnp.where(wild, 1, 0)) > 0
        acc = jax.lax.cond(
            any_site,
            lambda a: _hist_tile(a, rows1, rows2, cols, use2),
            lambda a: a, acc)
        a_ref[sl, :] = F
        b_ref[sl, :] = cand
        fl = jnp.max(jnp.where(live_t == 1, tflat, -1))
        has = fl >= 0
        big = -(2 ** 31)
        return (acc,
                jnp.where(has, _tile_pick(cand, tflat, fl, big), c_cand),
                jnp.where(has, _tile_pick(F, tflat, fl, big), c_F),
                jnp.where(has, _tile_pick(seg_t, tflat, fl, big), c_seg),
                jnp.where(has, _tile_pick(ids_t, tflat, fl, big), c_id))

    init_c = carry_in if carry_in is not None else (
        jnp.int32(-1), jnp.int32(-1), jnp.int32(-2), jnp.int32(-1))
    init_a = acc0 if acc0 is not None else jnp.zeros((128, 128), jnp.int32)
    st = jax.lax.fori_loop(0, t_cur, body, (init_a,) + tuple(init_c))
    return st[0], st[1:]


def tiled_batch_hist_rev(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                         zbase, t_cur, carry_in=None, acc0=None):
    """Batch pass 2 (reverse): right-creation histogram.

    Reads the final-id plane (a_ref) and candidate plane (b_ref) written by
    tiled_batch_mark.  For a site (s, t) of candidate j the created right
    pair is (z_j, w) with w = the SECOND next live token's final id (the
    site's own consumed token t never survives, and w is never a consumed
    token).  Returns acc_r (128, 128) int32: acc_r[w & 127, j] bounds every
    creation pair (z_j, w) for every trim prefix (candidate-involved w under
    both hypotheses). Returns (acc_r, carry_out); carry_out = the
    (F, seg, id) values at the stream's FIRST and SECOND live positions
    (XL cross-segment chaining — this pass runs back-to-front)."""
    TRS = SCAN_TILE_ROWS
    tflat = _tile_flat_iota()

    def body(tt, st):
        acc, c1F, c1s, c1id, c2F, c2s, c2id = st
        t = t_cur - 1 - tt
        sl = pl.ds(t * TRS, TRS)
        F_t = a_ref[sl, :]
        cand_t = b_ref[sl, :]
        seg_t = seg_ref[sl, :]
        live_t = live_ref[sl, :]
        ids_t = ids_ref[sl, :]
        s1, nF, ns, nid = _select_scan_rev_exclusive(
            live_t, (F_t, seg_t, ids_t), (-1, -2, -1))
        nF = jnp.where(s1 == 1, nF, c1F)
        ns = jnp.where(s1 == 1, ns, c1s)
        nid = jnp.where(s1 == 1, nid, c1id)
        s2, mF, ms, mid = _select_scan_rev_exclusive(
            live_t, (nF, ns, nid), (-1, -2, -1))
        mF = jnp.where(s2 == 1, mF, c2F)
        ms = jnp.where(s2 == 1, ms, c2s)
        mid = jnp.where(s2 == 1, mid, c2id)
        site = cand_t >= 0
        rval = site & (ms == seg_t) & (mF >= 0)
        rows1 = jnp.where(rval, mF & 127, -1)
        wild = rval & (mF >= zbase)
        rows2 = jnp.where(wild, mid & 127, -1)
        cols = jnp.where(rval, cand_t, -1)
        any_site = jnp.max(jnp.where(rval, 1, 0)) > 0
        use2 = jnp.max(jnp.where(wild, 1, 0)) > 0
        acc = jax.lax.cond(
            any_site,
            lambda a: _hist_tile(a, rows1, rows2, cols, use2),
            lambda a: a, acc)
        fl1 = jnp.min(jnp.where(live_t == 1, tflat, INT32_MAX))
        has1 = fl1 < INT32_MAX
        fl2 = jnp.min(jnp.where((live_t == 1) & (tflat > fl1), tflat,
                                INT32_MAX))
        has2 = fl2 < INT32_MAX
        big = -(2 ** 31)
        n1F = jnp.where(has1, _tile_pick(F_t, tflat, fl1, big), c1F)
        n1s = jnp.where(has1, _tile_pick(seg_t, tflat, fl1, big), c1s)
        n1id = jnp.where(has1, _tile_pick(ids_t, tflat, fl1, big), c1id)
        n2F = jnp.where(has2, _tile_pick(F_t, tflat, fl2, big),
                        jnp.where(has1, c1F, c2F))
        n2s = jnp.where(has2, _tile_pick(seg_t, tflat, fl2, big),
                        jnp.where(has1, c1s, c2s))
        n2id = jnp.where(has2, _tile_pick(ids_t, tflat, fl2, big),
                         jnp.where(has1, c1id, c2id))
        return (acc, n1F, n1s, n1id, n2F, n2s, n2id)

    init_c = carry_in if carry_in is not None else (
        jnp.int32(-1), jnp.int32(-2), jnp.int32(-1),
        jnp.int32(-1), jnp.int32(-2), jnp.int32(-1))
    init_a = acc0 if acc0 is not None else jnp.zeros((128, 128), jnp.int32)
    st = jax.lax.fori_loop(0, t_cur, body, (init_a,) + tuple(init_c))
    return st[0], st[1:]


def tiled_batch_apply(ids_ref, live_ref, b_ref, zbase, bstar, t_cur,
                      carry_in=None, kept0=None):
    """Combined apply of the accepted batch prefix: every position whose
    candidate index (b_ref, from tiled_batch_mark) is < bstar becomes its
    merge's new id; the consumed next-live token is killed via the same
    previous-live-was-kept rule as the single-merge apply
    (minbpe/base.py:25-41 — overlap parity is vacuous here: batch
    candidates are heterogeneous and cross-side-free, so matches can never
    overlap).
    Returns (kept_v, carry_out): kept_v is a (1, C) vector whose lane j
    holds candidate j's kept-site count; carry_out = keep flag at the last
    live position (XL cross-segment kill chaining)."""
    TRS = SCAN_TILE_ROWS
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    tflat = _tile_flat_iota()

    def body(t, st):
        c_k, kept_v = st
        sl = pl.ds(t * TRS, TRS)
        live_t = live_ref[sl, :]
        ids_t = ids_ref[sl, :]
        cand_t = b_ref[sl, :]
        keep = ((cand_t >= 0) & (cand_t < bstar)).astype(jnp.int32)
        s, kprv = _select_scan_fwd_exclusive(live_t, keep, 0)
        kprv = jnp.where(s == 1, kprv, c_k)
        ids_ref[sl, :] = jnp.where(keep == 1, zbase + cand_t, ids_t)
        live_ref[sl, :] = jnp.where(kprv == 1, 0, live_t)
        for j in range(K_CAP):
            kj = jnp.sum(jnp.where((keep == 1) & (cand_t == j), 1, 0))
            kept_v = kept_v + jnp.where(lane1 == j, kj, 0)
        fl = jnp.max(jnp.where(live_t == 1, tflat, -1))
        has = fl >= 0
        return (jnp.where(has, _tile_pick(keep, tflat, fl, -(2 ** 31)), c_k),
                kept_v)

    init_k = carry_in if carry_in is not None else jnp.int32(0)
    init_v = kept0 if kept0 is not None else jnp.zeros((1, C), jnp.int32)
    st = jax.lax.fori_loop(0, t_cur, body, (init_k, init_v))
    return st[1], st[0]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _compact_inplace(ids_ref, seg_ref, live_ref, a_ref, b_ref, bound, n_live):
    """Front-compact the live tokens of the first ``bound`` stream slots —
    entirely in-VMEM, scatter-free. Flat order (and with it the reference's
    first-occurrence tie-break order, minbpe/base.py:20-21) is preserved.

    Two phases:
    1. plane-parallel in-row packing: every live element moves left within
       its 128-lane row by the number of dead slots before it, via 7
       bit-decomposed conditional lane-shifts (collision-free for monotone
       shifts); per-row live counts land in live_ref (overwritten later);
    2. a serial row-stitch appends each packed row at the running global
       offset (each spans <= 2 output rows) into a_ref/b_ref staging, then
       the staging is copied back with PAD fill.

    Returns nothing; after the call the planes hold the packed stream of
    n_live tokens followed by PAD (ids -1 / seg -2 / live 0) up to bound.
    """
    TRS = SCAN_TILE_ROWS
    t_b = (bound + TILE_ELEMS - 1) // TILE_ELEMS
    rows_b = (n_live + C - 1) // C  # rows holding output after packing

    # --- phase 1: in-row packing (per tile; rows independent) -------------
    def pack_tile(t, _):
        def work(_):
            sl = pl.ds(t * TRS, TRS)
            x = ids_ref[sl, :]
            y = seg_ref[sl, :]
            l = live_ref[sl, :]
            dead = 1 - l
            inc = dead
            k = 1
            while k < C:
                inc = inc + _shift_lanes(inc, k, 0)
                k *= 2
            s = inc - dead  # exclusive in-row dead count = shift amount
            occ = l
            for b in range(7):
                step = 1 << b
                leav = occ * ((s >> b) & 1)
                inc_f = _shift_lanes_rev(leav, step, 0)
                cx = _shift_lanes_rev(x, step, -1)
                cy = _shift_lanes_rev(y, step, -2)
                cs = _shift_lanes_rev(s, step, 0)
                x = jnp.where(inc_f == 1, cx, x)
                y = jnp.where(inc_f == 1, cy, y)
                s = jnp.where(inc_f == 1, cs - step, s)
                occ = jnp.where(inc_f == 1, 1, occ * (1 - leav))
            krow = jnp.sum(l, axis=1, keepdims=True)  # (TRS, 1)
            ids_ref[sl, :] = x
            seg_ref[sl, :] = y
            live_ref[sl, :] = jnp.broadcast_to(krow, (TRS, C))
            return 0

        return jax.lax.cond(t * TILE_ELEMS < bound, work, lambda _: 0, 0)

    jax.lax.fori_loop(0, t_b, pack_tile, 0)

    # --- phase 2: serial row stitch into staging --------------------------
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    src_rows = (bound + C - 1) // C

    def row_body(r, off):
        k = jnp.max(live_ref[pl.ds(r, 1), :])
        row_i = ids_ref[pl.ds(r, 1), :]
        row_s = seg_ref[pl.ds(r, 1), :]
        q = off // C
        ql = off % C
        rot_i = pltpu.roll(row_i, ql, axis=1)
        rot_s = pltpu.roll(row_s, ql, axis=1)
        m0 = (lane1 >= ql) & (lane1 < ql + k)
        a_ref[pl.ds(q, 1), :] = jnp.where(m0, rot_i, a_ref[pl.ds(q, 1), :])
        b_ref[pl.ds(q, 1), :] = jnp.where(m0, rot_s, b_ref[pl.ds(q, 1), :])
        q1 = jnp.minimum(q + 1, ids_ref.shape[0] - 1)  # m1 empty on clamp
        m1 = lane1 < (ql + k - C)
        a_ref[pl.ds(q1, 1), :] = jnp.where(m1, rot_i, a_ref[pl.ds(q1, 1), :])
        b_ref[pl.ds(q1, 1), :] = jnp.where(m1, rot_s, b_ref[pl.ds(q1, 1), :])
        return off + k

    jax.lax.fori_loop(0, src_rows, row_body, jnp.int32(0))

    # --- phase 3: copy back with PAD fill over the old extent -------------
    tflat = _tile_flat_iota()

    def copy_tile(t, _):
        def work(_):
            sl = pl.ds(t * TRS, TRS)
            flat = tflat + t * TILE_ELEMS
            inside = flat < n_live
            ids_ref[sl, :] = jnp.where(inside, a_ref[sl, :], -1)
            seg_ref[sl, :] = jnp.where(inside, b_ref[sl, :], -2)
            live_ref[sl, :] = inside.astype(jnp.int32)
            return 0

        return jax.lax.cond(t * TILE_ELEMS < bound, work, lambda _: 0, 0)

    jax.lax.fori_loop(0, t_b, copy_tile, 0)


# Compaction cadence: every COMPACT_EVERY accepted merges, if at least
# 2^-COMPACT_SHIFT of the prefix is dead. With multi-merge batching the
# count rebuild dominates the round, so keeping the live prefix tight pays
# for itself quickly: the r5 hardware sweep measured (2, 4) fastest at bench
# scale (68 ms vs 78 ms at the old (16, 3)). The serial row-stitch inside
# _compact_inplace scales with R, so very large streams use a milder cadence
# (set by the driver via the dynamic ctl knobs).
COMPACT_EVERY = 2
COMPACT_SHIFT = 4
# streams larger than this keep the original (16, 3) cadence: the serial
# row-stitch inside _compact_inplace scales with R, and at multi-M-token
# sizes cadence 8 measured ~10% SLOWER than 16 (r5 x20 sweep)
COMPACT_RELAX_N = 1 << 21


def _kernel(ids_in, seg_in, live_in, ctl_in, out_ref,
            ids_ref, seg_ref, live_ref,
            a_ref, b_ref, dma_sems,
            *, R: int, V: int, Mp: int, phases: str = "full"):
    """Single-launch whole-training kernel with exact multi-merge batching.

    The ENTIRE merge loop runs in this one launch.  Each outer iteration
    does ONE count rebuild (adjacency + one-hot MXU matmuls in 128-wide
    vocab blocks, skipping blocks above the current max id) and then accepts
    as many merges as are provable from that single count (see the batching
    block comment above tiled_batch_mark): candidates in exact reference
    order off the rebuilt matrix, stopped at the first token-sharing /
    homogeneous / creation-bound-failing one, applied in ONE combined pass.
    Single-candidate rebuilds (and homogeneous argmaxes) take the exact
    single-merge path with the full run-parity apply.  Every COMPACT_EVERY
    accepted merges the live tokens are front-compacted in VMEM
    (_compact_inplace) so all per-round work shrinks with the live count.

    ctl: [0,0] fail-round so far, [1,0] live token count, [2,0] first global
    round r0, [3,0] m_eff = rounds to run (dynamic: one compiled kernel per
    (R, V, Mp) serves any merge count). The merge log row i is
    (pa, pb, count, kept); the final fail round lands in row m_eff.

    `phases` is the profiling knob (scripts/profile_phases.py): truncate
    each round after "none"/"adj"/"count"/"select" for cost attribution
    (phase-truncated rounds advance one merge and skip the batch machinery;
    "select" now times the full candidate walk).
    """
    for src, dst, k in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).start()
    for src, dst, k in ((ids_in, ids_ref, 0), (seg_in, seg_ref, 1),
                        (live_in, live_ref, 2)):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).wait()

    fail_in = ctl_in[0, 0]
    n_live0 = ctl_in[1, 0]
    r0 = ctl_in[2, 0]
    m_eff = ctl_in[3, 0]
    # compaction cadence + dead-fraction threshold shift ride in ctl
    # (dynamic: tunable without recompiling)
    c_every = jnp.maximum(ctl_in[4, 0], 1)
    c_on = ctl_in[4, 0] > 0
    c_shift = jnp.where(ctl_in[5, 0] > 0, ctl_in[5, 0], 3)

    TRS = SCAN_TILE_ROWS
    T = R // TRS
    tflat = jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 0) * C + \
        jax.lax.broadcasted_iota(jnp.int32, (TRS, C), 1)

    GROUP = 32  # lanes per matmul group: contraction = GROUP * TILE_ROWS
    NB = V // 128
    viota_full = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, V), 1)

    def one_hot_full(t, g0):
        blocks = [
            (t[:, j:j + 1] == viota_full).astype(jnp.int8)
            for j in range(g0, g0 + GROUP)
        ]
        return jnp.concatenate(blocks, axis=0)


    def count_width(bound, W):
        """One-hot MXU counting at STATIC width W (a multiple of 128):
        per tile, (GC, W) int8 one-hots of the a/b planes feed W x W int32
        accumulation; tiles beyond the compacted prefix are skipped. Result
        is zero-padded to (V, V)."""

        def oh(t, g0):
            blocks = [
                (t[:, j:j + 1] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, W), 1)
                 ).astype(jnp.int8)
                for j in range(g0, g0 + GROUP)
            ]
            return jnp.concatenate(blocks, axis=0)

        acc = jnp.zeros((W, W), jnp.int32)

        def tile_body(t, acc):
            def work(acc):
                at = a_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                bt = b_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                for g in range(C // GROUP):
                    A = oh(at, g * GROUP)
                    B = oh(bt, g * GROUP)
                    acc = acc + jax.lax.dot_general(
                        A, B, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                return acc

            return jax.lax.cond(t * TILE_ELEMS < bound, work,
                                lambda a: a, acc)

        t_b = (bound + TILE_ELEMS - 1) // TILE_ELEMS
        acc = jax.lax.fori_loop(0, t_b, tile_body, acc)
        if W == V:
            return acc
        return jnp.pad(acc, ((0, V - W), (0, V - W)))

    def count_blocked(bound, nvb):
        """Dynamic-vocab-width counting: ids present in round i are
        < 256 + r0 + i, so rounds below 384 ids count at width 384 instead
        of V — a switch between two fully-static width variants. (A cond
        per 128-block was measured to serialize on the scalar core, and
        more variants inflate the Mosaic compile.)"""
        if V <= 384:
            return count_width(bound, V)
        return jax.lax.cond(
            nvb * 128 <= 384,
            functools.partial(count_width, W=384),
            functools.partial(count_width, W=V),
            bound)

    def count_full(bound):
        """Full-width one-hot counting (V > 512: the blocked form's
        unrolled cond grid gets large; dynamic-V savings matter less)."""
        acc = jnp.zeros((V, V), jnp.int32)

        def tile_body(t, acc):
            def work(acc):
                at = a_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                bt = b_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                for g in range(C // GROUP):
                    A = one_hot_full(at, g * GROUP)
                    B = one_hot_full(bt, g * GROUP)
                    acc = acc + jax.lax.dot_general(
                        A, B, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                return acc

            return jax.lax.cond(t * TILE_ELEMS < bound, work,
                                lambda a: a, acc)

        t_b = (bound + TILE_ELEMS - 1) // TILE_ELEMS
        return jax.lax.fori_loop(0, t_b, tile_body, acc)

    def first_match_index(ca, cb, t_cur):
        """Smallest flat stream position with (a, b) == (ca, cb), tiled."""

        def body(t, best):
            sl = pl.ds(t * TRS, TRS)
            hit = (a_ref[sl, :] == ca) & (b_ref[sl, :] == cb)
            cand = jnp.min(jnp.where(hit, tflat + t * (TRS * C), INT32_MAX))
            return jnp.minimum(best, cand)

        return jax.lax.fori_loop(0, t_cur, body, jnp.int32(INT32_MAX))

    def _truncate(i, val):
        out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32) + val

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def vget(vec, j):
        return jnp.max(jnp.where(lane1 == j, vec, -(2 ** 31)))

    def vset(vec, j, val):
        return jnp.where(lane1 == j, val, vec)

    def select_candidate(counts, maxc, t_cur):
        """Exact reference argmax over the (possibly entry-zeroed) count
        matrix: unique max picked directly; ties resolved by earliest first
        stream occurrence (minbpe/basic.py:35 + base.py:20-21).

        Two tie implementations, picked by the ACTUAL tie count:
        - pay-per-tie serial walk (n_tied <= TIE_SERIAL_MAX): one masked
          min-reduce over the compacted prefix per tied pair — ~3 us each,
          and the bench corpus never exceeds single digits;
        - fixed-cost matmul membership sweep (n_tied above the threshold —
          the adversarial maxc==1 tail, where EVERY distinct pair ties and
          the serial walk would cost n_tied full-stream scans): per tile,
          Z = one-hot(a) @ tied(int8) followed by an elementwise row-select
          against one-hot(b) marks the positions whose pair is tied; the
          earliest such position IS the winner (a pair's first occurrence is
          its min position). One count-rebuild-equivalent (~0.2-0.4 ms) per
          tie-heavy round, independent of the tie count — this caps the r4
          'tie cliff' (VERDICT r4 #7)."""
        tied = counts == maxc
        n_tied = jnp.sum(tied.astype(jnp.int32))
        vi = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) * V + \
            jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)

        def pick_unique(_):
            flat = jnp.min(jnp.where(tied, vi, INT32_MAX))
            return flat // V, flat % V

        def pick_tied_serial(_):
            def body(t, st):
                prev, best_fi, pa, pb = st
                flat = jnp.min(jnp.where(tied & (vi > prev), vi, INT32_MAX))
                ca, cb = flat // V, flat % V
                fi = first_match_index(ca, cb, t_cur)
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

        def pick_tied_matmul(_):
            tied8 = tied.astype(jnp.int8)
            TRS = SCAN_TILE_ROWS
            GC = GROUP * TILE_ROWS
            # slab row r of one_hot_full(t, g0) holds the one-hot of the
            # tile element at (tile_row = r % TILE_ROWS, lane g0 + r //
            # TILE_ROWS); its flat stream position follows directly
            riota = jax.lax.broadcasted_iota(jnp.int32, (GC, 1), 0)
            slab_pos = (riota % TILE_ROWS) * C + riota // TILE_ROWS

            def body(t, best):
                at = a_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                bt = b_ref[pl.ds(t * TILE_ROWS, TILE_ROWS), :]
                for g in range(C // GROUP):
                    A = one_hot_full(at, g * GROUP)        # (GC, V) int8
                    B = one_hot_full(bt, g * GROUP)
                    Z = jax.lax.dot_general(
                        A, tied8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (GC, V)
                    w = jnp.sum(Z * B.astype(jnp.int32), axis=1,
                                keepdims=True)             # (GC, 1)
                    flat = t * TILE_ELEMS + slab_pos + g * GROUP
                    best = jnp.minimum(
                        best, jnp.min(jnp.where(w > 0, flat, INT32_MAX)))
                return best

            bestp = jax.lax.fori_loop(0, t_cur, body, jnp.int32(INT32_MAX))
            # read the winning pair at that position (masked reduces)
            row = jnp.minimum(bestp // C // SCAN_TILE_ROWS, T - 1)
            tl = pl.ds(row * SCAN_TILE_ROWS, SCAN_TILE_ROWS)
            fl = _tile_flat_iota() + row * SCAN_TILE_ROWS * C
            pa = jnp.max(jnp.where(fl == bestp, a_ref[tl, :], -(2 ** 31)))
            pb = jnp.max(jnp.where(fl == bestp, b_ref[tl, :], -(2 ** 31)))
            return pa, pb

        def pick_tied(_):
            return jax.lax.cond(n_tied <= TIE_SERIAL_MAX, pick_tied_serial,
                                pick_tied_matmul, None)

        return jax.lax.cond(n_tied == 1, pick_unique, pick_tied, None)

    def _active_round(i, fail, n_live, bound, lc):
        """One count rebuild + as many accepted merges as it proves.
        Returns the advanced (i, fail, n_live, bound, lc) carry."""
        if phases == "none":
            _truncate(i, i)
            return (i + 1, fail, n_live, bound, lc)

        # periodic in-VMEM front compaction: all per-rebuild work below
        # scales with `bound`, which tracks the live count
        do_c = c_on & (i > 0) & (i - lc >= c_every) & \
            (bound - n_live > (bound >> c_shift))

        def compact(_):
            _compact_inplace(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                             bound, n_live)
            return n_live

        bound = jax.lax.cond(do_c, compact, lambda _: bound, 0)
        lc = jnp.where(do_c, i, lc)
        t_cur = (bound + TILE_ELEMS - 1) // TILE_ELEMS

        tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref, T, t_cur)
        if phases == "adj":
            _truncate(i, jnp.max(a_ref[:]) + jnp.max(b_ref[:]))
            return (i + 1, fail, n_live, bound, lc)

        # ids present this round are < 256 + r0 + i: skip vocab blocks
        # above that (the count matrix there is identically zero)
        nvb = jnp.minimum((256 + r0 + i + 127) // 128, NB)
        if V <= 512:
            counts = count_blocked(bound, nvb)
        else:
            counts = count_full(bound)
        if phases == "count":
            _truncate(i, jnp.max(counts))
            return (i + 1, fail, n_live, bound, lc)

        zbase = 256 + r0 + i

        # ---- selection walk: up to K_CAP candidates off one count --------
        def sel_body(j, sst):
            cnts, pa_v, pb_v, c_v, bsel, stop = sst

            def run(_):
                maxc = jnp.max(cnts)
                pa, pb = select_candidate(cnts, maxc, t_cur)
                # CROSS-side shares only (r5 refinement): a candidate is
                # invalidated only when its LEFT token can be consumed
                # (qa == some accepted pb) or its RIGHT token replaced
                # (qb == some accepted pa). SAME-side shares — qa equal to
                # an accepted pa, or qb to an accepted pb — leave its
                # count, occurrences, and first-occurrence order provably
                # untouched: site starts are replaced (so no (pa_m, w)
                # occurrence can sit at a site) and consumed tokens only
                # ever pair with their own site start. Measured: B 3.2 ->
                # ~5-6 merges/rebuild, bit-exact vs the sequential
                # reference in simulation and the oracle suites.
                shares = jnp.max(jnp.where(
                    (lane1 < bsel) & ((pa_v == pb) | (pb_v == pa)),
                    1, 0)) > 0
                hom0 = vget(pa_v, 0) == vget(pb_v, 0)
                ok = (maxc > 0) & ((j == 0) |
                                   ((~shares) & (pa != pb) & (~hom0)))

                def acc(_):
                    vi_r = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0)
                    vi_c = jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
                    c2 = jnp.where((vi_r == pa) & (vi_c == pb), 0, cnts)
                    return (c2, vset(pa_v, j, pa), vset(pb_v, j, pb),
                            vset(c_v, j, maxc), bsel + 1, stop)

                def rej(_):
                    return (cnts, pa_v, pb_v, c_v, bsel, jnp.int32(1))

                return jax.lax.cond(ok, acc, rej, None)

            return jax.lax.cond(stop == 1, lambda _: sst, run, None)

        init_vec = jnp.full((1, C), -2, jnp.int32)
        _, pa_v, pb_v, c_v, bsel, _ = jax.lax.fori_loop(
            0, K_CAP, sel_body,
            (counts, init_vec, init_vec, jnp.zeros((1, C), jnp.int32),
             jnp.int32(0), jnp.int32(0)))

        pa0 = vget(pa_v, 0)
        pb0 = vget(pb_v, 0)
        c0 = vget(c_v, 0)
        if phases == "select":
            _truncate(i, pa0 * V + pb0)
            return (i + 1, fail, n_live, bound, lc)
        if phases in ("mark", "hist"):
            # batch-machinery profiling: pass 1 only / passes 1+2+trim
            def bm(_):
                pas = [vget(pa_v, j) for j in range(K_CAP)]
                pbs = [vget(pb_v, j) for j in range(K_CAP)]
                acc_l, _ = tiled_batch_mark(
                    ids_ref, seg_ref, live_ref, a_ref, b_ref, pas, pbs,
                    bsel, zbase, t_cur)
                if phases == "mark":
                    return jnp.max(acc_l)
                acc_r, _ = tiled_batch_hist_rev(
                    ids_ref, seg_ref, live_ref, a_ref, b_ref, zbase, t_cur)
                return jnp.max(acc_l) + jnp.max(acc_r)

            v = jax.lax.cond(bsel >= 2, bm, lambda _: jnp.int32(0), None)
            _truncate(i, v)
            return (i + 1, fail, n_live, bound, lc)

        def log_row(slot, pa, pb, cnt, kept):
            row = jnp.where(lane1 == 0, pa,
                            jnp.where(lane1 == 1, pb,
                                      jnp.where(lane1 == 2, cnt,
                                                jnp.where(lane1 == 3, kept,
                                                          0))))
            out_ref[pl.ds(slot, 1), :] = row

        def no_pair(_):
            # fresh failure: no countable pair left (minbpe basic.py:35's
            # max() on an empty dict) — record and let the tail writer fill
            # the remaining zero rows
            out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32)
            return (i + 1, jnp.minimum(fail, r0 + i), n_live, bound, lc)

        def single(_):
            # kept (NOT count): for pa == pb overlapping occurrences,
            # consumed tokens = kept sites < occurrence count
            kept = tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa0, pb0,
                               zbase, T, t_cur)[4]
            log_row(i, pa0, pb0, c0, kept)
            return (i + 1, fail, n_live - kept, bound, lc)

        def batch(_):
            pas = [vget(pa_v, j) for j in range(K_CAP)]
            pbs = [vget(pb_v, j) for j in range(K_CAP)]
            acc_l, _ = tiled_batch_mark(ids_ref, seg_ref, live_ref, a_ref,
                                        b_ref, pas, pbs, bsel, zbase, t_cur)
            acc_r, _ = tiled_batch_hist_rev(ids_ref, seg_ref, live_ref,
                                            a_ref, b_ref, zbase, t_cur)
            hcol = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            cm = [jnp.maximum(
                jnp.max(jnp.where(hcol == j, acc_l, 0)),
                jnp.max(jnp.where(hcol == j, acc_r, 0)))
                for j in range(K_CAP)]
            # trim: accept prefix while c_k strictly beats every creation
            # bound of earlier accepted merges
            bstar = jnp.int32(1)
            bnd = cm[0]
            for k in range(1, K_CAP):
                ok_k = (k < bsel) & (bstar == k) & (vget(c_v, k) > bnd)
                bstar = jnp.where(ok_k, k + 1, bstar)
                bnd = jnp.where(ok_k, jnp.maximum(bnd, cm[k]), bnd)
            bstar = jnp.minimum(bstar, m_eff - i)
            kept_v, _ = tiled_batch_apply(ids_ref, live_ref, b_ref, zbase,
                                          bstar, t_cur)
            tot = jnp.int32(0)
            for j in range(K_CAP):
                kj = jnp.max(jnp.where(lane1 == j, kept_v, 0))

                def wr(_):
                    log_row(i + j, pas[j], pbs[j], vget(c_v, j), kj)
                    return 0

                jax.lax.cond(j < bstar, wr, lambda _: 0, 0)
                tot = tot + jnp.where(j < bstar, kj, 0)
            return (i + bstar, fail, n_live - tot, bound, lc)

        def nonzero(_):
            return jax.lax.cond(bsel == 1, single, batch, None)

        return jax.lax.cond(bsel == 0, no_pair, nonzero, None)

    def outer_cond(st):
        return st[0] < m_eff

    def outer_body(st):
        i, fail, n_live, bound, lc, nreb = st

        def failed_tail(_):
            # a round already failed: every later round writes a zero row
            # (same observable output as the reference's exception path)
            out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32)
            return (i + 1, fail, n_live, bound, lc, nreb)

        def active(_):
            return _active_round(i, fail, n_live, bound, lc) + (nreb + 1,)

        return jax.lax.cond(fail < r0 + i, failed_tail, active, None)

    _, fail, n_live, _, _, nreb = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), fail_in, n_live0, n_live0, jnp.int32(0),
         jnp.int32(0)))
    # final row: lane 0 = fail round, lane 1 = count rebuilds executed
    # (diagnostic: merges / rebuilds = measured batching factor)
    out_ref[pl.ds(m_eff, 1), :] = jnp.where(
        lane1 == 0, fail, jnp.where(lane1 == 1, nreb, 0))


@functools.partial(jax.jit, static_argnames=("R",))
def _prep_from_bytes(data, ends, n, R: int):
    """Build the (R, C) working planes on device from raw corpus bytes and
    chunk-end offsets. This keeps the host->device transfer at ~1 byte per
    corpus byte (uint8 data + offsets) instead of 8 (two int32 planes);
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
def _prep_from_bytes_u16(data, lens, n, R: int):
    """_prep_from_bytes fed by uint16 chunk LENGTHS instead of int32 end
    offsets: with ~3-byte average chunks the offsets array in int32 is
    larger than the corpus itself; uint16 deltas halve that wire cost.
    Padding entries are 0 (their cumsum plateaus at n, whose marks only
    touch positions >= n — masked out by live)."""
    ends = jnp.cumsum(lens.astype(jnp.int32))
    return _prep_from_bytes(data, ends, n, R)


@functools.partial(jax.jit, static_argnames=("R",))
def _prep_from_bits(data, packed, n, R: int):
    """_prep_from_bytes fed by a boundary BITMASK: bit p (MSB-first, numpy
    packbits order) set iff a chunk ends at offset p + 1 — 1 bit per corpus
    byte on the wire (~6x less than uint16 lengths at ~3-byte GPT chunks)
    and no chunk-length limit at all. seg[i] = #(ends <= i) = the exclusive
    cumsum of the bit at i - 1, matching _prep_from_bytes exactly."""
    N = R * C
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    bits = (packed.astype(jnp.int32)[:, None] >> shifts[None, :]) & 1
    marks = bits.reshape(-1)[:N]
    seg_inc = jnp.cumsum(marks)
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32), seg_inc[:-1]])
    iota = jnp.arange(N, dtype=jnp.int32)
    pad = N - data.shape[0]
    d = jnp.pad(data.astype(jnp.int32), (0, pad))
    live = iota < n
    ids2 = jnp.where(live, d, -1)
    seg2 = jnp.where(live, seg, -2)
    return (ids2.reshape(R, C), seg2.reshape(R, C),
            live.astype(jnp.int32).reshape(R, C))


def prep_from_boundaries(data, ends, n, R: int):
    """Dispatch plane building on the boundary encoding: uint8 = packed
    boundary bitmask, uint16 = chunk lengths, else int32 end offsets."""
    ends = jnp.asarray(ends)
    if ends.dtype == jnp.uint8:
        return _prep_from_bits(jnp.asarray(data), ends, jnp.asarray(n), R)
    if ends.dtype == jnp.uint16:
        return _prep_from_bytes_u16(jnp.asarray(data), ends,
                                    jnp.asarray(n), R)
    return _prep_from_bytes(jnp.asarray(data), ends, jnp.asarray(n), R)


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


@functools.partial(jax.jit, static_argnames=("R", "V", "Mp", "interpret"))
def _run_single(ids2, seg2, live2, ctl, R: int, V: int, Mp: int,
                interpret: bool = False):
    """One kernel launch covering the whole training run; the host fetches
    only the (Mp+8, 4) merge-log slice (pa, pb, count, kept) — ~4 KB at
    M=256 instead of the full 128-lane plane."""
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, V=V, Mp=Mp),
        out_shape=jax.ShapeDtypeStruct((Mp + 8, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, C), jnp.int32),  # ids
            pltpu.VMEM((R, C), jnp.int32),  # seg
            pltpu.VMEM((R, C), jnp.int32),  # live
            pltpu.VMEM((R, C), jnp.int32),  # a (masked left ids)
            pltpu.VMEM((R, C), jnp.int32),  # b (masked next-live ids)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB of VMEM; the working set is 5 R*C planes +
            # in-register scan tiles + the count-matmul transients.
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids2, seg2, live2, ctl)
    return out[:, :4]


def _rows_for(n: int) -> int:
    R = -(-n // C)
    return -(-R // TILE_ROWS) * TILE_ROWS


def _vocab_width(num_merges: int) -> int:
    return max(384, -(-(256 + num_merges) // 128) * 128)


def _mp_bucket(num_merges: int) -> int:
    """Merge-log row bucket: power of two >= M (>= 128), so the compiled
    kernel count never scales with the exact merge count (m_eff is
    dynamic)."""
    return max(128, 1 << (max(num_merges, 1) - 1).bit_length())


def train_merges_fused(ids, seg, n, num_merges: int, interpret: bool = False):
    """Whole-training-in-one-launch driver. Same contract as
    ops.train.train_merges: (pairs[M,2], counts[M], fail_round)."""
    N = ids.shape[0]
    R = _rows_for(N)
    ids2, seg2, live2 = _prep_planes(jnp.asarray(ids), jnp.asarray(seg),
                                     jnp.asarray(n), R)
    return _train_from_planes(ids2, seg2, live2, int(n), num_merges,
                              interpret)


@functools.partial(jax.jit, static_argnames=("R", "V", "Mp", "mode",
                                             "interpret"))
def _run_single_bytes(data, ends, ctl, R: int, V: int, Mp: int, mode: str,
                      interpret: bool = False):
    """Plane build + whole-training kernel as ONE jitted program, so a
    host-side call is a single dispatch: host->device transfer of the raw
    bytes rides the dispatch instead of two separate blocking device_puts —
    on the tunneled backend each blocking transfer is a ~25 ms round trip,
    which used to cost more than the entire training kernel."""
    n = ctl[1, 0]
    if mode == "bits":
        ids2, seg2, live2 = _prep_from_bits(data, ends, n, R)
    elif mode == "u16":
        ids2, seg2, live2 = _prep_from_bytes_u16(data, ends, n, R)
    else:
        ids2, seg2, live2 = _prep_from_bytes(data, ends, n, R)
    return _run_single(ids2, seg2, live2, ctl, R, V, Mp, interpret)


def train_merges_fused_bytes(data, ends, n, num_merges: int,
                             interpret: bool = False):
    """Same contract as train_merges_fused, fed by raw corpus bytes + chunk
    boundaries: the working planes are built on device, cutting wire traffic
    ~4x on tunneled backends, and the whole call is ONE dispatch + ONE fetch
    (host numpy args transfer as part of the dispatch).
    ``ends``: uint8 packed boundary bitmask (1 bit/corpus byte, the
    default), uint16 chunk lengths, or int32 end offsets."""
    import numpy as np

    M = num_merges
    if M == 0:
        return (np.zeros((0, 2), np.int32), np.zeros((0,), np.int32), 0)
    R = _rows_for(data.shape[0])
    V = _vocab_width(M)
    Mp = _mp_bucket(M)
    edt = np.asarray(ends).dtype
    mode = "bits" if edt == np.uint8 else \
        ("u16" if edt == np.uint16 else "i32")
    ctl = np.zeros((8, C), np.int32)
    ctl[0, 0] = M
    ctl[1, 0] = int(n)
    ctl[3, 0] = M
    relax = data.shape[0] > COMPACT_RELAX_N
    ctl[4, 0] = 16 if relax else COMPACT_EVERY
    ctl[5, 0] = 3 if relax else COMPACT_SHIFT
    out = _run_single_bytes(data, ends, ctl, R, V, Mp, mode, interpret)
    out_h = np.asarray(out)  # the one sync point of the whole training run
    global LAST_REBUILDS
    LAST_REBUILDS = int(out_h[M, 1])
    return (out_h[:M, 0:2].copy(), out_h[:M, 2].copy(),
            min(int(out_h[M, 0]), M))


def _train_from_planes(ids2, seg2, live2, n: int, num_merges: int,
                       interpret: bool):
    import numpy as np

    M = num_merges
    if M == 0:
        return (np.zeros((0, 2), np.int32), np.zeros((0,), np.int32), 0)
    R = ids2.shape[0]
    V = _vocab_width(M)
    Mp = _mp_bucket(M)
    relax = R * C > COMPACT_RELAX_N
    ctl = (jnp.zeros((8, C), jnp.int32)
           .at[0, 0].set(M).at[1, 0].set(n).at[3, 0].set(M)
           .at[4, 0].set(16 if relax else COMPACT_EVERY)
           .at[5, 0].set(3 if relax else COMPACT_SHIFT))
    out = _run_single(ids2, seg2, live2, ctl, R, V, Mp, interpret)
    out_h = np.asarray(out)  # the one sync point of the whole training run
    global LAST_REBUILDS
    LAST_REBUILDS = int(out_h[M, 1])  # diagnostic: merges/rebuilds = batch B
    return (out_h[:M, 0:2].copy(), out_h[:M, 2].copy(),
            min(int(out_h[M, 0]), M))


LAST_REBUILDS = 0  # count rebuilds of the most recent fused run (diagnostic)

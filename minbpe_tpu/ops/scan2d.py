"""Blocked flat-order scans over (R, 128) planes — plain-XLA edition.

The Pallas training kernel (ops/pallas/fused_train.py) showed that log-step
select-scans over a 2-D (R, 128) layout are the fast formulation of
"next live token" / run-parity machinery on TPU. The same holds OUTSIDE
Pallas: XLA lowers rolls/selects on (R, 128) int32 planes to full-width
vector code, while the equivalent 1-D gathers/scans over N-element arrays
serialize (measured ~2 ms per gather at N=262K vs ~0.04 ms for a whole
blocked select-scan). This module is the shared plain-``jnp`` scan kit for
the XLA-side loops (flat encoder, sort-loop trainer).

All arrays are int32 planes of shape (R, C) holding a length R*C stream in
row-major flat order. C is fixed at 128 (the TPU lane width).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C = 128
INT32_MAX = 2**31 - 1


def _lane_iota(R):
    return jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)


def _row_iota(R):
    return jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)


def flat_iota(R):
    """Flat position of each element."""
    return _row_iota(R) * C + _lane_iota(R)


def _shift_lanes(x, k, fill):
    return jnp.where(_lane_iota(x.shape[0]) >= k,
                     jnp.roll(x, k, axis=1), fill)


def _shift_rows(x, k, fill):
    return jnp.where(_row_iota(x.shape[0]) >= k,
                     jnp.roll(x, k, axis=0), fill)


def _shift_lanes_rev(x, k, fill):
    return jnp.where(_lane_iota(x.shape[0]) < C - k,
                     jnp.roll(x, -k, axis=1), fill)


def _shift_rows_rev(x, k, fill):
    return jnp.where(_row_iota(x.shape[0]) < x.shape[0] - k,
                     jnp.roll(x, -k, axis=0), fill)


def shift_flat_fwd(xs, fills):
    """Shift a tuple of planes by +1 in flat order (element i sees i-1)."""
    R = xs[0].shape[0]
    lane0 = _lane_iota(R) == 0
    out = []
    for x, fill in zip(xs, fills):
        s = _shift_lanes(x, 1, fill)
        carry = _shift_rows(x[:, C - 1:C], 1, fill)
        out.append(jnp.where(lane0, carry, s))
    return tuple(out)


def shift_flat_rev(xs, fills):
    """Shift a tuple of planes by -1 in flat order (element i sees i+1)."""
    R = xs[0].shape[0]
    lane_last = _lane_iota(R) == C - 1
    out = []
    for x, fill in zip(xs, fills):
        s = _shift_lanes_rev(x, 1, fill)
        carry = _shift_rows_rev(x[:, 0:1], 1, fill)
        out.append(jnp.where(lane_last, carry, s))
    return tuple(out)


def cumsum_flat(x):
    """Inclusive flat-order sum-scan of an int32 plane."""
    R = x.shape[0]
    k = 1
    while k < C:
        x = x + _shift_lanes(x, k, 0)
        k *= 2
    totals = x[:, C - 1:C]
    k = 1
    while k < R:
        totals = totals + _shift_rows(totals, k, 0)
        k *= 2
    return x + _shift_rows(totals, 1, 0)


def select_scan_fwd(s, v, fill):
    """Inclusive forward select-scan: at i, the v of the LAST j <= i with
    s[j] == 1 (fill where none). Returns (s_seen, v_sel)."""
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
    return s | prs, v


def select_scan_fwd_exclusive(s, v, fill):
    """At i: the v of the LAST j < i with s[j] == 1."""
    s1, v1 = shift_flat_fwd((s, v), (0, fill))
    return select_scan_fwd(s1, v1, fill)


def select_scan_rev_exclusive(ss, vs, fills):
    """At i: the values of the FIRST j > i with flag set.

    ss: 0/1 int32 plane; vs: tuple of planes scanned together.
    Returns (found_flag, *values)."""
    s1, *v1 = shift_flat_rev((ss,) + tuple(vs), (0,) + tuple(fills))
    s = s1
    v = list(v1)
    R = s.shape[0]
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
    return (s | prs,) + tuple(v)


def seg_min_flat(seg, v):
    """Per-segment min of v, broadcast back to every member.

    Segments must be CONTIGUOUS in flat order (non-decreasing seg ids —
    chunk ids of a pre-split stream are). min(prefix-min, suffix-min) at
    each element equals the segment total min."""
    R = seg.shape[0]
    INF = INT32_MAX

    fwd = v
    k = 1
    while k < C:
        ps = _shift_lanes(seg, k, -9)
        pv = _shift_lanes(fwd, k, INF)
        fwd = jnp.where(ps == seg, jnp.minimum(fwd, pv), fwd)
        k *= 2
    rs, rv = seg[:, C - 1:C], fwd[:, C - 1:C]
    k = 1
    while k < R:
        ps = _shift_rows(rs, k, -9)
        pv = _shift_rows(rv, k, INF)
        rv = jnp.where(ps == rs, jnp.minimum(rv, pv), rv)
        k *= 2
    prs = _shift_rows(rs, 1, -9)
    prv = _shift_rows(rv, 1, INF)
    fwd = jnp.where(prs == seg, jnp.minimum(fwd, prv), fwd)

    rev = v
    k = 1
    while k < C:
        ns = _shift_lanes_rev(seg, k, -9)
        nv = _shift_lanes_rev(rev, k, INF)
        rev = jnp.where(ns == seg, jnp.minimum(rev, nv), rev)
        k *= 2
    rs2, rv2 = seg[:, 0:1], rev[:, 0:1]
    k = 1
    while k < R:
        ns = _shift_rows_rev(rs2, k, -9)
        nv = _shift_rows_rev(rv2, k, INF)
        rv2 = jnp.where(ns == rs2, jnp.minimum(rv2, nv), rv2)
        k *= 2
    nrs = _shift_rows_rev(rs2, 1, -9)
    nrv = _shift_rows_rev(rv2, 1, INF)
    rev = jnp.where(nrs == seg, jnp.minimum(rev, nrv), rev)

    return jnp.minimum(fwd, rev)

"""Fully-fused Pallas BPE encode kernel: the whole greedy merge sweep in one
kernel launch.

Uses the proven rank-sweep equivalence (see ops/encode.py): because merge
tables are well-founded, applying merges in increasing rank order — each
applied at ALL its occurrences, left-first — reproduces the reference's
min-present-rank loop (minbpe/basic.py:61-73, regex.py:96-108) exactly.

Per rank r the body needs NO table lookup at all: the pair (pa_r, pb_r) is
read from the rank-ordered merge arrays, matched elementwise against the
stream, and applied with the same tile-sequential scan passes as the fused
trainer (ops/pallas/fused_train.py): next-live adjacency via reverse
select-scans, left-first parity via chain positions, kills via exclusive
select-scans. State never leaves VMEM; scan temporaries stay in-register.

Transfers are minimal on both sides: the stream ships to the device as raw
corpus bytes + chunk-end offsets (planes are built on device), and the
result ships back as ONE tombstoned id plane (dead positions = -1; the live
ids in flat order ARE the output order, so the host just drops the -1s).

Right-sized for trained tokenizers (M <= ~2K ranks); cl100k-scale encode
uses the flat-stream encoder (ops/flat_encode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_train import (
    C, SCAN_TILE_ROWS, TILED_MIN_R, _compact_inplace, _cumsum_flat,
    _prep_from_bytes, _prep_from_bytes_u16, _prep_planes, _select_scan_fwd,
    _select_scan_fwd_exclusive, _select_scan_rev_exclusive, tiled_adjacency,
    tiled_apply, tiled_mask_dead,
)

FUSED_ENCODE_MAX_N = 1 << 22
FUSED_ENCODE_MAX_M = 2048


def _kernel(ids_in, seg_in, live_in, pairs_in, nid_in, out_ref,
            ids_ref, seg_ref, live_ref, a_ref, b_ref, dma_sems,
            *, R: int, M: int, compact: bool = False):
    for k, (src, dst) in enumerate(((ids_in, ids_ref), (seg_in, seg_ref),
                                    (live_in, live_ref))):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).start()
    for k, (src, dst) in enumerate(((ids_in, ids_ref), (seg_in, seg_ref),
                                    (live_in, live_ref))):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).wait()

    T = R // SCAN_TILE_ROWS
    tiled = R > TILED_MIN_R

    def round_tiled(r, _):
        pa = pairs_in[r, 0]
        pb = pairs_in[r, 1]
        nid = nid_in[r, 0]
        tiled_adjacency(ids_ref, seg_ref, live_ref, a_ref, b_ref, T)
        tiled_apply(ids_ref, live_ref, a_ref, b_ref, pa, pb, nid, T)
        return 0

    def round_plane(r, _):
        # whole-plane value-scan round: same algorithm as the tiled passes,
        # one (R, C) vector program per scan instead of T serialized tiles
        ids = ids_ref[:]
        seg = seg_ref[:]
        live = live_ref[:]
        pa = pairs_in[r, 0]
        pb = pairs_in[r, 1]
        nid = nid_in[r, 0]

        _, nli, nls = _select_scan_rev_exclusive(live, (ids, seg), (-1, -2))
        valid = (live == 1) & (nli >= 0) & (seg == nls)
        m = (valid & (ids == pa) & (nli == pb)).astype(jnp.int32)
        _, m_prv = _select_scan_fwd_exclusive(live, m, 0)
        new_run = m * (1 - m_prv)
        chainpos = _cumsum_flat(live)
        _, cps = _select_scan_fwd(new_run, chainpos, 0)
        keep = (m == 1) & (((chainpos - cps) & 1) == 0)
        _, k_prv = _select_scan_fwd_exclusive(live, keep.astype(jnp.int32), 0)
        ids_ref[:] = jnp.where(keep, nid, ids)
        live_ref[:] = jnp.where(k_prv == 1, 0, live)
        return 0

    jax.lax.fori_loop(0, M, round_tiled if tiled else round_plane, 0)

    if compact:
        # device-side compaction halves (at least) the result plane that
        # crosses the tunnel: out = header row + the first R//2 rows of the
        # packed token stream. Header: n_out split across two lanes (so it
        # survives the int16 narrowing downstream) + an overflow flag for
        # the rare n_out > (R//2)*C corpus (host falls back to the full
        # plane).
        def count_tile(t, acc):
            sl = pl.ds(t * SCAN_TILE_ROWS, SCAN_TILE_ROWS)
            return acc + jnp.sum(live_ref[sl, :])

        n_out = jax.lax.fori_loop(0, T, count_tile, jnp.int32(0))
        _compact_inplace(ids_ref, seg_ref, live_ref, a_ref, b_ref,
                         jnp.int32(R * C), n_out)
        half = R // 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        hdr = jnp.where(lane == 0, n_out & 0x7FFF,
                        jnp.where(lane == 1, n_out >> 15,
                                  jnp.where(lane == 2,
                                            (n_out > half * C)
                                            .astype(jnp.int32), 0)))
        out_ref[pl.ds(0, 1), :] = hdr
        pltpu.make_async_copy(ids_ref.at[pl.ds(0, half), :],
                              out_ref.at[pl.ds(1, half), :],
                              dma_sems.at[0]).start()
        pltpu.make_async_copy(ids_ref.at[pl.ds(0, half), :],
                              out_ref.at[pl.ds(1, half), :],
                              dma_sems.at[0]).wait()
        return

    # tombstone the dead positions and ship the single result plane out
    if tiled:
        tiled_mask_dead(ids_ref, live_ref, T)
    else:
        ids_ref[:] = jnp.where(live_ref[:] == 1, ids_ref[:], -1)
    pltpu.make_async_copy(ids_ref, out_ref, dma_sems.at[0]).start()
    pltpu.make_async_copy(ids_ref, out_ref, dma_sems.at[0]).wait()


@functools.partial(jax.jit,
                   static_argnames=("M", "narrow", "compact", "interpret"))
def _fused_encode_raw(ids2, seg2, live2, pairs, nids, M: int,
                      narrow: bool = False, compact: bool = False,
                      interpret: bool = False):
    R = ids2.shape[0]
    out_rows = (1 + R // 2) if compact else R
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, M=M, compact=compact),
        out_shape=jax.ShapeDtypeStruct((out_rows, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        # compact mode writes its header row directly (stores need VMEM);
        # the full plane ships via DMA from an ANY-space ref
        out_specs=pl.BlockSpec(
            memory_space=pltpu.VMEM if compact else pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((R, C), jnp.int32),  # ids
            pltpu.VMEM((R, C), jnp.int32),  # seg
            pltpu.VMEM((R, C), jnp.int32),  # live
            pltpu.VMEM((R, C), jnp.int32),  # a (masked left ids)
            pltpu.VMEM((R, C), jnp.int32),  # b (masked next-live ids)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids2, seg2, live2, pairs, nids)
    # narrow the result plane before it crosses the wire (ids < 2^15 for
    # every table this kernel accepts; -1 tombstones survive int16)
    return out.astype(jnp.int16) if narrow else out


def _rows_for(n: int) -> int:
    R = -(-max(n, 1) // C)
    return -(-R // SCAN_TILE_ROWS) * SCAN_TILE_ROWS


def _pack_table(merge_pairs, merge_new_ids):
    import numpy as np

    M = len(merge_pairs)
    Mp = max(8, -(-M // 8) * 8)
    # pad fill is -2, NOT -1: the a/b adjacency planes mark non-countable
    # positions with -1, so a (-1, -1) pad row would falsely match them in
    # tiled_apply (real pair ids are always >= 0)
    pairs = np.full((Mp, 128), -2, dtype=np.int32)
    nids = np.full((Mp, 128), -1, dtype=np.int32)
    if M:
        pairs[:M, 0] = np.asarray(merge_pairs)[:, 0]
        pairs[:M, 1] = np.asarray(merge_pairs)[:, 1]
        nids[:M, 0] = np.asarray(merge_new_ids)
    return jnp.asarray(pairs), jnp.asarray(nids), M


def _finish(out) -> "np.ndarray":
    import numpy as np

    vals = np.asarray(out).reshape(-1)
    return vals[vals >= 0].astype(np.int32)  # live ids in flat order


def _narrow(nids) -> bool:
    import numpy as np

    nids = np.asarray(nids)
    return nids.size == 0 or int(nids.max()) < 2 ** 15


def encode_fused(ids, seg, n, merge_pairs, merge_new_ids,
                 interpret: bool = False):
    """Encode a packed stream against a rank-ordered merge table; returns
    token ids as a numpy array."""
    R = _rows_for(ids.shape[0])
    ids2, seg2, live2 = _prep_planes(jnp.asarray(ids), jnp.asarray(seg),
                                     jnp.asarray(n), R)
    pairs, nids, M = _pack_table(merge_pairs, merge_new_ids)
    out = _fused_encode_raw(ids2, seg2, live2, pairs, nids, max(M, 1),
                            narrow=_narrow(merge_new_ids),
                            interpret=interpret)
    return _finish(out)


@functools.partial(jax.jit, static_argnames=("R",))
def _prep_from_data_seg(data, seg, n, R: int):
    """Planes from device-resident corpus bytes + per-byte segment ids (the
    device pre-splitter's output, ops/device_presplit.py)."""
    N = R * C
    iota = jnp.arange(N, dtype=jnp.int32)
    pad = N - data.shape[0]
    d = jnp.pad(data.astype(jnp.int32), (0, pad))
    s = jnp.pad(seg, (0, pad))
    live = iota < n
    ids2 = jnp.where(live, d, -1)
    seg2 = jnp.where(live, s, -2)
    return (ids2.reshape(R, C), seg2.reshape(R, C),
            live.astype(jnp.int32).reshape(R, C))


def encode_fused_planes(data, seg, n, merge_pairs, merge_new_ids,
                        interpret: bool = False):
    """encode_fused fed by device-resident bytes + per-byte segment ids —
    the zero-host-scan path (device pre-split upstream)."""
    R = _rows_for(data.shape[0])
    ids2, seg2, live2 = _prep_from_data_seg(data, seg, jnp.int32(n), R)
    pairs, nids, M = _pack_table(merge_pairs, merge_new_ids)
    out = _fused_encode_raw(ids2, seg2, live2, pairs, nids, max(M, 1),
                            narrow=_narrow(merge_new_ids),
                            interpret=interpret)
    return _finish(out)


def _prep_bytes_any(data, ends, n, R):
    """Planes from bytes + boundaries; uint16 arrays are chunk LENGTHS
    (half the wire of int32 end offsets — see engine._pack_raw)."""
    ends = jnp.asarray(ends)
    if ends.dtype == jnp.uint8:
        from .fused_train import _prep_from_bits

        return _prep_from_bits(jnp.asarray(data), ends, jnp.asarray(n), R)
    if ends.dtype == jnp.uint16:
        return _prep_from_bytes_u16(jnp.asarray(data), ends,
                                    jnp.asarray(n), R)
    return _prep_from_bytes(jnp.asarray(data), ends, jnp.asarray(n), R)


def encode_fused_bytes_vals(data, ends, n, merge_pairs, merge_new_ids,
                            interpret: bool = False):
    """Tombstoned flat result values (length R*C >= n): position i holds the
    output token that starts at input byte i, or -1. Flat positions map 1:1
    to input byte offsets, so callers can split multi-document batches at
    byte boundaries with a host-side mask — the basis of the one-dispatch
    special-token encode (engine.encode_parts)."""
    import numpy as np

    R = _rows_for(data.shape[0])
    ids2, seg2, live2 = _prep_bytes_any(data, ends, n, R)
    pairs, nids, M = _pack_table(merge_pairs, merge_new_ids)
    out = _fused_encode_raw(ids2, seg2, live2, pairs, nids, max(M, 1),
                            narrow=_narrow(merge_new_ids),
                            interpret=interpret)
    return np.asarray(out).reshape(-1)


def encode_fused_bytes(data, ends, n, merge_pairs, merge_new_ids,
                       interpret: bool = False):
    """Same contract as encode_fused, fed by raw corpus bytes + chunk
    boundaries: planes are built on device (host->device wire ~8x smaller
    than two int32 planes) and the result comes back DEVICE-COMPACTED as a
    half-height int16 plane (device->host wire ~8x smaller than the full
    int32 tombstone plane) — the encode path at bench scale is tunnel-bound
    on both directions. The rare corpus with more output tokens than
    (R//2)*128 (almost nothing merged) falls back to the full plane."""
    import numpy as np

    R = _rows_for(data.shape[0])
    ids2, seg2, live2 = _prep_bytes_any(data, ends, n, R)
    pairs, nids, M = _pack_table(merge_pairs, merge_new_ids)
    out = _fused_encode_raw(ids2, seg2, live2, pairs, nids, max(M, 1),
                            narrow=_narrow(merge_new_ids), compact=True,
                            interpret=interpret)
    arr = np.asarray(out)  # ONE wire transfer: header row + half plane
    hdr = arr[0].astype(np.int64)
    n_out = int(hdr[0]) | (int(hdr[1]) << 15)
    if hdr[2]:  # overflow: recompute with the full-plane output
        vals = encode_fused_bytes_vals(data, ends, n, merge_pairs,
                                       merge_new_ids, interpret)
        return vals[vals >= 0].astype(np.int32)
    return arr[1:].reshape(-1)[:n_out].astype(np.int32)

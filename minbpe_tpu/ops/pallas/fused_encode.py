"""Fully-fused Pallas BPE encode kernel: the whole greedy merge sweep in one
kernel launch.

Uses the proven rank-sweep equivalence (see ops/encode.py): because merge
tables are well-founded, applying merges in increasing rank order — each
applied at ALL its occurrences, left-first — reproduces the reference's
min-present-rank loop (minbpe/basic.py:61-73, regex.py:96-108) exactly.

Per rank r the body needs NO table lookup at all: the pair (pa_r, pb_r) is
read from the rank-ordered merge arrays, matched elementwise against the
stream, and applied with the same tombstone-chain scan machinery as the
fused trainer (ops/pallas/fused_train.py): next-live adjacency via reverse
select-scans, left-first parity via chain positions, kills via exclusive
select-scans. State never leaves VMEM.

Right-sized for trained tokenizers (M <= ~2K ranks); cl100k-scale encode
uses the bucketed chunk encoder (ops/chunk_encode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_train import (
    C, _cumsum_flat, _select_scan_fwd, _select_scan_fwd_exclusive,
    _select_scan_rev_exclusive,
)

FUSED_ENCODE_MAX_N = 1 << 21
FUSED_ENCODE_MAX_M = 2048


def _kernel(ids_in, seg_in, live_in, pairs_in, nid_in, out_ref,
            ids_ref, seg_ref, live_ref, dma_sems, *, R: int, M: int):
    for k, (src, dst) in enumerate(((ids_in, ids_ref), (seg_in, seg_ref),
                                    (live_in, live_ref))):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).start()
    for k, (src, dst) in enumerate(((ids_in, ids_ref), (seg_in, seg_ref),
                                    (live_in, live_ref))):
        pltpu.make_async_copy(src, dst, dma_sems.at[k]).wait()

    def round_body(r, _):
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

    jax.lax.fori_loop(0, M, round_body, 0)

    # compacted output: new position of each live token = cumsum(live) - 1,
    # emitted as (position, id) planes; the host does the final dense gather
    live = live_ref[:]
    pos = _cumsum_flat(live) - 1
    out_ref[0] = jnp.where(live == 1, pos, -1)
    out_ref[1] = ids_ref[:]


@functools.partial(jax.jit, static_argnames=("M", "interpret"))
def _fused_encode_raw(ids2, seg2, live2, pairs, nids, M: int,
                      interpret: bool = False):
    R = ids2.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, R=R, M=M),
        out_shape=jax.ShapeDtypeStruct((2, R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, C), jnp.int32),
            pltpu.VMEM((R, C), jnp.int32),
            pltpu.VMEM((R, C), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids2, seg2, live2, pairs, nids)


def encode_fused(ids, seg, n, merge_pairs, merge_new_ids,
                 interpret: bool = False):
    """Encode a packed stream against a rank-ordered merge table; returns
    (token ids as numpy array)."""
    import numpy as np

    N = ids.shape[0]
    R = -(-N // C)
    R = max(8, -(-R // 8) * 8)
    pad = R * C - N
    idx = jnp.arange(N, dtype=jnp.int32)
    live = (idx < n).astype(jnp.int32)
    ids2 = jnp.pad(jnp.asarray(ids), (0, pad), constant_values=-1).reshape(R, C)
    seg2 = jnp.pad(jnp.asarray(seg), (0, pad), constant_values=-2).reshape(R, C)
    live2 = jnp.pad(live, (0, pad)).reshape(R, C)

    M = len(merge_pairs)
    Mp = max(8, -(-M // 8) * 8)
    pairs = np.full((Mp, 128), -1, dtype=np.int32)
    nids = np.full((Mp, 128), -1, dtype=np.int32)
    if M:
        pairs[:M, 0] = np.asarray(merge_pairs)[:, 0]
        pairs[:M, 1] = np.asarray(merge_pairs)[:, 1]
        nids[:M, 0] = np.asarray(merge_new_ids)
    out = _fused_encode_raw(ids2, seg2, live2, jnp.asarray(pairs),
                            jnp.asarray(nids), max(M, 1),
                            interpret=interpret)
    out = np.asarray(out)
    pos = out[0].reshape(-1)
    vals = out[1].reshape(-1)
    mask = pos >= 0
    result = np.empty(int(mask.sum()), dtype=np.int32)
    result[pos[mask]] = vals[mask]
    return result

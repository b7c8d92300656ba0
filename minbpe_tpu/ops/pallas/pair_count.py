"""Pallas TPU kernel: dense pair-count matrix via fused one-hot MXU matmuls.

Equivalent to ops/select.py::count_pairs_dense but without materializing the
(N, V) one-hot matrices in HBM: each grid step builds the one-hot tiles for
one block of the stream in VMEM (VPU compares against an iota), feeds the MXU
with a (V, block) @ (block, V) contraction, and accumulates the (V, V) count
matrix in a VMEM accumulator across grid steps.

Exactness: each block's f32 contribution is an integer <= block_size (2^11),
cast to int32 before accumulation — counts are exact to 2^31 regardless of
stream length (a pure-f32 accumulation would silently lose counts past 2^24).

Cost model per round at V=512, block=1024: MACs = N*V^2/block per block-step
-> the MXU is the bottleneck at ~2*N*V^2 flops; HBM traffic is just the id
stream + 1 MB of counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, out_ref, acc_ref, *, V: int, block: int):
    i = pl.program_id(0)
    a = a_ref[0, :]
    b = b_ref[0, :]
    vrow = jax.lax.broadcasted_iota(jnp.int32, (block, V), 1)
    A = (a[:, None] == vrow).astype(jnp.bfloat16)
    B = (b[:, None] == vrow).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        acc_ref[:] = acc_ref[:] + contrib

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("V", "block", "interpret"))
def count_pairs_pallas(ids, seg, n, V: int, block: int = 1024,
                       interpret: bool = False):
    """Dense [V, V] int32 pair-count matrix for a packed stream."""
    from ..select import pair_validity

    N = ids.shape[0]
    valid, nxt_ids = pair_validity(ids, seg, n)
    a = jnp.where(valid, ids, -1)
    b = jnp.where(valid, nxt_ids, -1)
    nblk = -(-N // block)
    pad = nblk * block - N
    a = jnp.pad(a, (0, pad), constant_values=-1).reshape(nblk, block)
    b = jnp.pad(b, (0, pad), constant_values=-1).reshape(nblk, block)

    return pl.pallas_call(
        functools.partial(_kernel, V=V, block=block),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V, V), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblk * block * V * V,
            bytes_accessed=2 * nblk * block * 4 + V * V * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)

"""Pallas TPU kernel: dense pair-count matrix via fused one-hot MXU matmuls.

Equivalent to ops/select.py::count_pairs_dense but without materializing the
(N, V) one-hot matrices in HBM: each grid step loads an (8, 256) tile of the
id stream into VMEM (tile shape chosen for the TPU (8, 128) layout
constraint), builds one-hot slabs with VPU compares against an iota, feeds
the MXU with (V, 256) @ (256, V) contractions, and accumulates the (V, V)
count matrix in a VMEM accumulator across grid steps.

Exactness: each grid step's f32 contribution is an integer <= 2048 ids, cast
to int32 before accumulation — counts are exact to 2^31 regardless of stream
length (pure-f32 accumulation would silently lose counts past 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8
_COLS = 256
_TILE = _ROWS * _COLS  # ids per grid step


def _kernel(a_ref, b_ref, out_ref, acc_ref, *, V: int):
    i = pl.program_id(0)
    a = a_ref[0]  # (8, 256) int32
    b = b_ref[0]
    viota = jax.lax.broadcasted_iota(jnp.int32, (_COLS, V), 1)
    acc = jnp.zeros((V, V), jnp.float32)
    for r in range(_ROWS):
        A = (a[r][:, None] == viota).astype(jnp.bfloat16)
        B = (b[r][:, None] == viota).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    contrib = acc.astype(jnp.int32)

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
def count_pairs_pallas(ids, seg, n, V: int, block: int = _TILE,
                       interpret: bool = False):
    """Dense [V, V] int32 pair-count matrix for a packed stream."""
    from ..select import pair_validity

    N = ids.shape[0]
    valid, nxt_ids = pair_validity(ids, seg, n)
    a = jnp.where(valid, ids, -1)
    b = jnp.where(valid, nxt_ids, -1)
    nblk = -(-N // _TILE)
    pad = nblk * _TILE - N
    a = jnp.pad(a, (0, pad), constant_values=-1).reshape(nblk, _ROWS, _COLS)
    b = jnp.pad(b, (0, pad), constant_values=-1).reshape(nblk, _ROWS, _COLS)

    return pl.pallas_call(
        functools.partial(_kernel, V=V),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, _COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V, V), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V, V), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblk * _TILE * V * V,
            bytes_accessed=2 * nblk * _TILE * 4 + V * V * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)

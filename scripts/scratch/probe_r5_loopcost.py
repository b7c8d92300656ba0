"""r5: isolate the per-iteration overhead of the batched kernel's outer loop
structures (fori vs while, nested cond, big-branch cond) on real TPU."""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
R = 1536
M = 128


def kern(mode, ids_in, ctl_in, out_ref, ids_ref, dma_sems):
    pltpu.make_async_copy(ids_in, ids_ref, dma_sems.at[0]).start()
    pltpu.make_async_copy(ids_in, ids_ref, dma_sems.at[0]).wait()
    m_eff = ctl_in[3, 0]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def wr(i, val):
        out_ref[pl.ds(i, 1), :] = jnp.zeros((1, C), jnp.int32) + val

    if mode == "fori":
        def body(i, carry):
            wr(i, i)
            return carry
        jax.lax.fori_loop(0, m_eff, body, jnp.int32(0))
    elif mode == "while6":
        def cond(st):
            return st[0] < m_eff

        def body(st):
            i, a, b, c, d, e = st
            wr(i, i)
            return (i + 1, a, b, c, d, e)
        jax.lax.while_loop(cond, body, tuple(jnp.int32(k) for k in range(6)))
    elif mode == "whilecond":
        def cond(st):
            return st[0] < m_eff

        def body(st):
            i, a, b, c, d, e = st

            def t1(_):
                wr(i, i)
                return (i + 1, a, b, c, d, e)

            def t2(_):
                wr(i, i + 1)
                return (i + 1, a, b + 1, c, d, e)

            return jax.lax.cond(a < 0, t1, t2, None)
        jax.lax.while_loop(cond, body, tuple(jnp.int32(k) for k in range(6)))
    elif mode == "whilebig":
        # cond whose taken branch is tiny but whose other branch holds a big
        # vector region (approximates failed_tail vs active)
        def cond(st):
            return st[0] < m_eff

        def body(st):
            i, a, b, c, d, e = st

            def t1(_):
                wr(i, i)
                return (i + 1, a, b, c, d, e)

            def t2(_):
                acc = jnp.zeros((1, C), jnp.int32)
                for t in range(12):
                    acc = acc + jnp.sum(ids_ref[pl.ds(t * C, C), :], axis=0,
                                        keepdims=True)
                out_ref[pl.ds(i, 1), :] = acc
                return (i + 1, a, b + 1, c, d, e)

            return jax.lax.cond(a < 0, t2, t1, None)  # t1 taken (a >= 0)
        jax.lax.while_loop(cond, body, tuple(jnp.int32(k) for k in range(6)))


def run_mode(mode):
    k = functools.partial(kern, mode)

    @jax.jit
    def go(ids2, ctl):
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((M + 8, C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, C), jnp.int32),
                            pltpu.SemaphoreType.DMA((1,))],
        )(ids2, ctl)
        return jnp.sum(out)

    ids2 = jnp.zeros((R, C), jnp.int32)
    best = float("inf")
    for rep in range(4):
        ctl = jnp.zeros((8, C), jnp.int32).at[3, 0].set(M).at[4, 0].set(rep)
        t0 = time.time()
        float(go(ids2, ctl))
        dt = time.time() - t0
        if rep:
            best = min(best, dt)
    print(f"{mode:10s}: {best*1e3:8.2f} ms ({best/M*1e6:7.1f} us/iter)",
          flush=True)


for mode in ("fori", "while6", "whilecond", "whilebig"):
    run_mode(mode)

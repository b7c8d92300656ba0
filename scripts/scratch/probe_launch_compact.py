"""E4: (a) pallas launch overhead vs per-round loop cost (phases=none at
M=8 vs M=128); (b) serial-row in-kernel compaction cost."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import sys
sys.path.insert(0, "/root/repo")
from minbpe_tpu.ops.pallas import fused_train as ft

C = 128
RTT = 24.6e-3


def timed(fn, mk_args, n=3):
    np.asarray(fn(*mk_args(0)))
    best = float("inf")
    for i in range(1, n + 1):
        a = mk_args(i)
        t0 = time.time()
        np.asarray(fn(*a))
        best = min(best, time.time() - t0)
    return best


# (a) empty-round loop cost: ctl-driven M
R = 1536
for M in (8, 128):
    kernel = functools.partial(ft._kernel, R=R, V=512, M=M, phases="none")
    Mp = -(-(M + 1) // 8) * 8

    @jax.jit
    def run(ids2, seg2, live2, ctl):
        out, _, _ = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((Mp, C), jnp.int32),
                       jax.ShapeDtypeStruct((R, C), jnp.int32),
                       jax.ShapeDtypeStruct((R, C), jnp.int32)],
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[pltpu.VMEM((R, C), jnp.int32)] * 5
            + [pltpu.SemaphoreType.DMA((3,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(ids2, seg2, live2, ctl)
        return jnp.sum(out)

    def mk(i):
        rng = np.random.default_rng(i)
        ids = jnp.asarray(rng.integers(0, 256, (R, C), np.int32))
        seg = jnp.asarray(rng.integers(0, 9, (R, C), np.int32))
        live = jnp.ones((R, C), jnp.int32)
        ctl = (jnp.zeros((8, C), jnp.int32).at[0, 0].set(1 << 30)
               .at[1, 0].set(R * C).at[3, 0].set(M))
        return ids, seg, live, ctl

    t = timed(run, mk)
    print(f"phases=none M={M}: {(t-RTT)*1e3:.2f} ms over RTT "
          f"({(t-RTT)/M*1e6:.1f} us/round)", flush=True)


# (b) serial-row compaction kernel: per-row MXU permutation + dynamic row RMW
def compact_kernel(ids_in, out_ref, ids_ref, *, R, reps):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    lane_cc = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    rank_cc = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)

    def one_rep(rep, _):
        ids_ref[...] = jnp.full((R + 1, C), -7, jnp.int32)

        def row_body(r, off):
            row = ids_in[pl.ds(r, 1), :] + rep - rep
            live = (row >= 0).astype(jnp.int32)
            k = jnp.sum(live)
            # in-row stable compaction via (C,C) one-hot permutation matmul
            inc = live
            kk = 1
            while kk < C:
                inc = inc + ft._shift_lanes(inc, kk, 0)
                kk *= 2
            rank = inc - live  # exclusive in-row cumsum
            P = ((rank_cc == rank.reshape(C, 1)) &
                 (live.reshape(C, 1) == 1)).astype(jnp.float32)
            packed = jax.lax.dot_general(
                (row + 1).astype(jnp.float32), P, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32) - \
                jnp.where(lane < k, 1, 0)  # keep -1 pads... (+1/-1 offset)
            q = off // C
            ql = off % C
            rot = pltpu.roll(packed, ql, axis=1)
            m0 = (lane >= ql) & (lane < ql + k)
            cur0 = ids_ref[pl.ds(q, 1), :]
            ids_ref[pl.ds(q, 1), :] = jnp.where(m0, rot, cur0)
            m1 = lane < (ql + k - C)
            cur1 = ids_ref[pl.ds(q + 1, 1), :]
            ids_ref[pl.ds(q + 1, 1), :] = jnp.where(m1, rot, cur1)
            return off + k

        jax.lax.fori_loop(0, R, row_body, jnp.int32(0))
        return 0

    jax.lax.fori_loop(0, reps, one_rep, 0)
    out_ref[...] = ids_ref[...]


@functools.partial(jax.jit, static_argnames=("R", "reps"))
def run_compact(ids, R, reps):
    return pl.pallas_call(
        functools.partial(compact_kernel, R=R, reps=reps),
        out_shape=jax.ShapeDtypeStruct((R + 1, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R + 1, C), jnp.int32)],
    )(ids)


for R2, reps in ((1536, 16), (30720, 2)):
    rng = np.random.default_rng(0)
    v = rng.integers(-1, 500, size=(R2, C), dtype=np.int32)
    # correctness once
    out = np.asarray(run_compact(jnp.asarray(v), R2, 1))
    flat = v.reshape(-1)
    want = flat[flat >= 0]
    got = out.reshape(-1)[:len(want)]
    assert np.array_equal(got, want), "compaction mismatch"
    t = timed(lambda x: jnp.sum(run_compact(x, R2, reps)[:2]),
              lambda i: (jnp.asarray(
                  np.random.default_rng(i).integers(-1, 500, (R2, C),
                                                    np.int32)),))
    per = (t - RTT) / reps * 1e3
    print(f"serial-row compaction R={R2}: {per:.3f} ms/pass "
          f"({per/R2*1e6:.0f} ns/row)", flush=True)
print("done", flush=True)

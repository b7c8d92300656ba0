"""r5: marginal per-round phase costs of the batched kernel, RTT-free.

m_eff is dynamic, so ONE compiled kernel per phase serves two merge counts;
(t(M2) - t(M1)) / (M2 - M1) cancels the ~25 ms tunnel round trip and all
per-launch constants that polluted profile_phases' absolute rows."""

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

from minbpe_tpu.engine import _pack_raw
from minbpe_tpu.ops.pallas import fused_train as ft
from minbpe_tpu.regex import RegexTokenizer

CORPUS = "/root/reference/tests/taylorswift.txt"
M1, M2 = 64, 320
MP = 512
PHASES = ["none", "adj", "count", "select", "mark", "hist", "full"]
V = 512


def variant(text, seed):
    import random

    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def make_run(R, phases):
    kernel = functools.partial(ft._kernel, R=R, V=V, Mp=MP, phases=phases)

    @jax.jit
    def run(ids2, seg2, live2, ctl):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((MP + 8, ft.C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, ft.C), jnp.int32)] * 5
            + [pltpu.SemaphoreType.DMA((3,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(ids2, seg2, live2, ctl)
        return jnp.sum(out)

    return run


def main():
    text = open(CORPUS, encoding="utf-8").read()
    tok = RegexTokenizer()
    planes = []
    for seed in range(7):
        data, ends = tok._split_arrays(variant(text, seed))
        cap = ft.fused_capacity(len(data))
        d, e, n = _pack_raw(data, ends, cap)
        R = ft._rows_for(cap)
        p = ft._prep_from_bytes(jnp.asarray(d), jnp.asarray(e), n, R)
        jax.block_until_ready(p)
        planes.append((p, int(n)))

    marg = {}
    for phases in PHASES:
        run = make_run(R, phases)
        times = {M1: [], M2: []}
        # warm both M values once
        for M in (M1, M2):
            p, n = planes[0]
            ctl = (jnp.zeros((8, ft.C), jnp.int32)
                   .at[0, 0].set(1 << 30).at[1, 0].set(n).at[3, 0].set(M)
                   .at[4, 0].set(ft.COMPACT_EVERY))
            float(run(*p, ctl))
        for k, (p, n) in enumerate(planes[1:]):
            M = M1 if k % 2 == 0 else M2
            ctl = (jnp.zeros((8, ft.C), jnp.int32)
                   .at[0, 0].set(1 << 30).at[1, 0].set(n).at[3, 0].set(M)
                   .at[4, 0].set(ft.COMPACT_EVERY))
            t0 = time.time()
            float(run(*p, ctl))
            times[M].append(time.time() - t0)
        m = (min(times[M2]) - min(times[M1])) / (M2 - M1)
        marg[phases] = m
        print(f"{phases:7s}: t64={min(times[M1])*1e3:7.2f} ms "
              f"t320={min(times[M2])*1e3:7.2f} ms  marginal "
              f"{m*1e6:7.1f} us/round", flush=True)

    prev = 0.0
    print("\n-- marginal attribution (us/round) --")
    for ph, label in [("none", "loop"), ("adj", "adjacency"),
                      ("count", "count"), ("select", "sel walk"),
                      ("mark", "batch mark"), ("hist", "batch hist+rev"),
                      ("full", "trim+apply+log")]:
        print(f"  {label:15s} {(marg[ph]-prev)*1e6:8.1f}")
        prev = marg[ph]


if __name__ == "__main__":
    main()

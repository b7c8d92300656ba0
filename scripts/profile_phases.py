"""Per-phase cost attribution for the fused BPE training kernel.

Runs single 128-round segments at bench scale (taylorswift.txt pre-split,
R=1536) with the kernel truncated after each phase (fused_train._kernel's
`phases` knob), and prints a per-phase cost table by differencing wall
times. This is the tool the round-2 regression lacked: it makes the cost of
adjacency / count / select / apply visible individually, at any V.

Usage:  python scripts/profile_phases.py [V ...]   (default: 384 512)

Methodology: every timed call uses a DISTINCT perturbed corpus (the tunneled
execution layer caches (executable, inputs) pairs), 1 compile warmup + 3
timed runs per variant, min reported.
"""

import functools
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax

# sitecustomize imports jax before this script, so the env var above is read
# too late; set the cache dir on the live config as well
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
M = 128
PHASES = ["none", "adj", "count", "select", "mark", "hist", "full"]


def variant(text: str, seed: int) -> str:
    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def make_run(R: int, V: int, phases: str):
    Mp = ft._mp_bucket(M)
    kernel = functools.partial(ft._kernel, R=R, V=V, Mp=Mp, phases=phases)

    @jax.jit
    def run(ids2, seg2, live2, ctl):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Mp + 8, ft.C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, ft.C), jnp.int32)] * 5
            + [pltpu.SemaphoreType.DMA((3,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(ids2, seg2, live2, ctl)
        # a scalar the host can fetch: on the tunneled backend
        # block_until_ready does NOT wait for completion; only a real
        # device->host value fetch does.
        return jnp.sum(out)

    return run


def main():
    args = sys.argv[1:]
    reps = 1
    if args and args[0].startswith("x"):
        reps = int(args[0][1:])
        args = args[1:]
    vs = [int(a) for a in args] or [384, 512]
    text = open(CORPUS, encoding="utf-8").read() * reps
    tok = RegexTokenizer()

    planes = []
    for seed in range(4):
        data, ends = tok._split_arrays(variant(text, seed))
        cap = ft.fused_capacity(len(data))
        d, e, n = _pack_raw(data, ends, cap)
        R = ft._rows_for(cap)
        p = ft._prep_from_bytes(jnp.asarray(d), jnp.asarray(e), n, R)
        jax.block_until_ready(p)
        planes.append((p, int(n)))
    print(f"R={R} rows ({R * ft.C} slots), corpus {len(text)} chars, "
          f"M={M} rounds/segment", flush=True)

    results = {}
    for V in vs:
        for phases in PHASES:
            if phases in ("none", "adj") and V != vs[-1]:
                continue  # V-independent phases: measure once
            run = make_run(R, V, phases)
            (p, n), = planes[:1]
            ctl = (jnp.zeros((8, ft.C), jnp.int32)
                   .at[0, 0].set(1 << 30).at[1, 0].set(n)
                   .at[3, 0].set(M))
            t0 = time.time()
            float(run(*p, ctl))  # fetch = the only true sync on the tunnel
            compile_s = time.time() - t0
            best = float("inf")
            for (p, n) in planes[1:]:
                ctl = (jnp.zeros((8, ft.C), jnp.int32)
                       .at[0, 0].set(1 << 30).at[1, 0].set(n)
                       .at[3, 0].set(M))
                t0 = time.time()
                float(run(*p, ctl))
                best = min(best, time.time() - t0)
            results[(V, phases)] = best
            print(f"V={V:5d} phases={phases:7s} {best*1e3:8.2f} ms/segment "
                  f"({best/M*1e6:7.1f} us/round)  [compile {compile_s:.1f}s]",
                  flush=True)

    for V in vs:
        def get(ph, V=V):
            return results.get((V, ph)) or results.get((vs[-1], ph))
        prev = 0.0
        print(f"\n-- V={V} attribution (us/round) --")
        for ph, label in [("none", "loop overhead"), ("adj", "adjacency"),
                          ("count", "pair count"), ("select", "sel walk"),
                          ("mark", "batch mark"), ("hist", "batch hist"),
                          ("full", "apply+log")]:
            cur = get(ph)
            if cur is None:
                continue
            print(f"  {label:14s} {+(cur - prev)/M*1e6:8.1f}")
            prev = cur


if __name__ == "__main__":
    main()

"""r5: attribute the mesh=1 real-TPU distributed round cost (SCALING_r05).

Times each stage of parallel/train.py's round body in isolation on the chip
(D=1 mesh, vocab 512, bench corpus): pair arrays, dense count, tie lookup,
extended keep, kills. Marginal method: each jitted stage runs a fori_loop of
K iterations; (t(K2)-t(K1))/(K2-K1) cancels dispatch/RTT."""

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
from functools import partial

from minbpe_tpu.regex import RegexTokenizer
from minbpe_tpu.parallel.train import (
    _dense_counts, _extended_keep, _pair_arrays, shard_chunks,
)

INT32_MAX = 2**31 - 1
V = 512

text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
chunks = RegexTokenizer()._split_chunks(text)
ids, seg, lens = shard_chunks(list(chunks), 1)
Nl = ids.shape[0]
idx = np.arange(Nl, dtype=np.int32)
live = idx < lens[0]
print(f"Nl={Nl}", flush=True)


def loop(fn, K):
    def body(k, carry):
        return carry + fn(k)
    return jax.lax.fori_loop(0, K, body, jnp.int32(0))


def timeit(name, make):
    times = {}
    for K in (4, 20):
        f = jax.jit(partial(make, K=K))
        args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(live))
        float(f(*args))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(f(*args))
            best = min(best, time.time() - t0)
        times[K] = best
    m = (times[20] - times[4]) / 16
    print(f"{name:18s}: marginal {m*1e3:8.2f} ms/round", flush=True)


def mk_pair(ids, seg, live, K):
    def fn(k):
        a, b, ok = _pair_arrays(ids + k * 0, seg, live, jnp.int32(-1),
                                jnp.int32(-2), jnp.bool_(False))
        return jnp.sum(a) + jnp.sum(b)
    return loop(fn, K)


def mk_count(ids, seg, live, K):
    a, b, ok = _pair_arrays(ids, seg, live, jnp.int32(-1), jnp.int32(-2),
                            jnp.bool_(False))

    def fn(k):
        return jnp.max(_dense_counts(jnp.where(ok, a + k * 0, -1), b, ok, V,
                                     True))
    return loop(fn, K)


def mk_tielookup(ids, seg, live, K):
    a, b, ok = _pair_arrays(ids, seg, live, jnp.int32(-1), jnp.int32(-2),
                            jnp.bool_(False))
    gc = _dense_counts(a, b, ok, V, True)

    def fn(k):
        tied = gc == (jnp.max(gc) - k * 0)
        hit = ok & tied[jnp.clip(a, 0, V - 1), jnp.clip(b, 0, V - 1)]
        lbest = jnp.min(jnp.where(hit, jnp.arange(Nl), INT32_MAX))
        kk = jnp.argmax(hit & (jnp.arange(Nl) == lbest))
        return a[kk] + b[kk] + lbest
    return loop(fn, K)


def mk_keep(ids, seg, live, K):
    a, b, ok = _pair_arrays(ids, seg, live, jnp.int32(-1), jnp.int32(-2),
                            jnp.bool_(False))

    def fn(k):
        k0, k1, c0, c1 = _extended_keep(a, b, live, jnp.int32(101) + k * 0,
                                        jnp.int32(32))
        idxa = jnp.arange(Nl, dtype=jnp.int32)
        pl = jnp.roll(jax.lax.cummax(jnp.where(live, idxa, -1)),
                      1).at[0].set(-1)
        killed = live & (pl >= 0) & k0[jnp.maximum(pl, 0)]
        return jnp.sum(killed) + jnp.sum(k0) + c0.astype(jnp.int32)
    return loop(fn, K)


timeit("pair_arrays", mk_pair)
timeit("dense_count+max", mk_count)
timeit("tie lookup+pick", mk_tielookup)
timeit("keep+kill", mk_keep)

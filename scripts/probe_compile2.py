"""Probe: is the one-dispatch _train_staged jit the compile-time hog?

Times AOT lower/compile of the whole staged program (what bench.py's warmup
actually compiles) vs the sum of its parts, cache disabled.
"""

import os
import sys
import time

os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minbpe_tpu.ops.pallas import fused_train as ft


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    N = 196608
    R = N // 128
    ids2 = jax.ShapeDtypeStruct((R, 128), jnp.int32)
    n = jax.ShapeDtypeStruct((), jnp.int32)
    vs = ft._plan_vs(256)
    lowered = t(f"lower _train_staged ({len(vs)} segments)",
                lambda: ft._train_staged.lower(ids2, ids2, ids2, n, 256, vs))
    t(f"compile _train_staged ({len(vs)} segments)", lowered.compile)


if __name__ == "__main__":
    main()

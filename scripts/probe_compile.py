"""Profile what dominates the fused trainer's cold-start compile time.

Times each jitted piece separately via AOT lower/compile on the real TPU,
with the persistent compilation cache disabled so numbers are true cold.
"""

import os
import sys
import time

os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp
import numpy as np

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
    ctl = jax.ShapeDtypeStruct((8, 128), jnp.int32)

    # the two staged segments for M=256 (what bench.py compiles)
    for (r0, m, V) in [(0, 128, 384), (128, 128, 512)]:
        lowered = t(f"lower segment r0={r0} V={V}",
                    lambda: ft._run_segment.lower(ids2, ids2, ids2, ctl,
                                                  R, V, m, r0))
        t(f"compile segment r0={r0} V={V}", lowered.compile)

    data = jax.ShapeDtypeStruct((N,), jnp.uint8)
    ends = jax.ShapeDtypeStruct((8192,), jnp.int32)
    n = jax.ShapeDtypeStruct((), jnp.int32)
    lowered = t("lower prep_from_bytes",
                lambda: ft._prep_from_bytes.lower(data, ends, n, R))
    t("compile prep_from_bytes", lowered.compile)

    lowered = t("lower compact_planes",
                lambda: ft._compact_planes.lower(ids2, ids2, R))
    t("compile compact_planes", lowered.compile)


if __name__ == "__main__":
    main()

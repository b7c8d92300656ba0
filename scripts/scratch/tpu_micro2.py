"""Focused TPU timings with VARIED inputs (defeats any result caching)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.select import select_max_pair, count_pairs_dense
from minbpe_tpu.ops.pallas.pair_count import count_pairs_pallas
from minbpe_tpu.ops.train_inc import train_merges_incremental

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
rng = np.random.default_rng(0)

VARIANTS = []
for v in range(4):
    arr = np.frombuffer(text, dtype=np.uint8).astype(np.int32).copy()
    k = rng.integers(0, len(arr), 1000)
    arr[k] = rng.integers(0, 256, 1000)
    ids, seg, n = st.pack_bytes(arr.astype(np.uint8).tobytes())
    VARIANTS.append((jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n)))


def bench(name, fn, reps=8):
    f = jax.jit(fn)
    out = f(*VARIANTS[0])  # compile
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for r in range(reps):
        out = f(*VARIANTS[r % len(VARIANTS)])
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.3f} ms", flush=True)


N = VARIANTS[0][0].shape[0]
bench("select_sort (varied)", lambda a, b, c: select_max_pair(a, b, c))
bench("count_dense V=512 (varied)", lambda a, b, c: count_pairs_dense(a, b, c, 512))
bench("count_pallas V=512 (varied)", lambda a, b, c: count_pairs_pallas(a, b, c, 512))

# incremental full train steady, varied corpus each time
t0 = time.time()
p, c, f = train_merges_incremental(*VARIANTS[0], 256)
p.block_until_ready()
print(f"incremental compile+run: {time.time()-t0:.1f}s fail={int(f)}", flush=True)
for r in range(3):
    t0 = time.time()
    p, c, f = train_merges_incremental(*VARIANTS[(r + 1) % 4], 256)
    p.block_until_ready()
    print(f"incremental steady: {time.time()-t0:.3f}s fail={int(f)}", flush=True)

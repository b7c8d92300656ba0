"""Fused kernel: varied-input honest timing + persistent compile cache."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.pallas.fused_train import train_merges_fused

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
rng = np.random.default_rng(7)

variants = []
for v in range(4):
    arr = np.frombuffer(text, dtype=np.uint8).copy()
    k = rng.integers(0, len(arr), 200)
    arr[k] = rng.integers(97, 123, 200)
    ids, seg, n = st.pack_bytes(arr.tobytes())
    variants.append((jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n)))

t0 = time.time()
p, c, f = train_merges_fused(*variants[0], 256)
np.asarray(p)
print(f"cold(+compile, cache?): {time.time()-t0:.2f}s fail={int(f)}", flush=True)
for r in range(1, 4):
    t0 = time.time()
    p, c, f = train_merges_fused(*variants[r], 256)
    pn = np.asarray(p)
    print(f"varied steady: {time.time()-t0:.3f}s fail={int(f)} "
          f"first={pn[0].tolist()}", flush=True)

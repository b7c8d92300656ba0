"""Fused-kernel TPU timing + correctness vs golden."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.pallas.fused_train import train_merges_fused

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
ids, seg, n = st.pack_bytes(text)
ids = jnp.asarray(ids); seg = jnp.asarray(seg); n = jnp.asarray(n)
G = np.load("/tmp/golden_512.npz")

t0 = time.time()
p, c, f = train_merges_fused(ids, seg, n, 256)
pn = np.asarray(p)
print(f"fused cold(+compile): {time.time()-t0:.2f}s "
      f"correct={bool((pn == G['pairs']).all())} fail={int(f)}", flush=True)
for r in range(3):
    t0 = time.time()
    p, c, f = train_merges_fused(ids, seg, n, 256)
    pn = np.asarray(p)
    dt = time.time() - t0
    print(f"fused steady(to-numpy): {dt:.3f}s "
          f"correct={bool((pn == G['pairs']).all())} "
          f"-> {0.185768/dt:.2f} MB/s", flush=True)

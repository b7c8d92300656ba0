"""Measure train/encode on the real TPU across implementations."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train import train_merges

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
ids, seg, n = st.pack_bytes(text)
args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
MB = len(text) / 1e6

results = {}
for mode in ["sort", "dense", "pallas"]:
    t0 = time.time()
    p, c, f = train_merges(*args, 256, select_mode=mode)
    p.block_until_ready()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        p, c, f = train_merges(*args, 256, select_mode=mode)
        p.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    results[mode] = (np.asarray(p), best)
    print(f"{mode}: compile+run {compile_s:.2f}s, steady {best:.3f}s "
          f"({MB/best:.2f} MB/s), fail={int(f)}", flush=True)

base = results["sort"][0]
for mode, (p, _) in results.items():
    print(mode, "pairs match sort:", bool((p == base).all()), flush=True)

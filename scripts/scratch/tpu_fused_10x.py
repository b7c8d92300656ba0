"""10x-corpus fused train on TPU (compile + varied timing)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.pallas.fused_train import train_merges_fused

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read() * 10


def vary(data, seed):
    arr = np.frombuffer(data, dtype=np.uint8).copy()
    r = np.random.default_rng(seed)
    k = r.integers(0, len(arr), 200)
    arr[k] = r.integers(97, 123, 200)
    return arr.tobytes()


def pack(data):
    ids, seg, n = st.pack_bytes(data)
    return jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n)


t0 = time.time()
p, c, f = train_merges_fused(*pack(text), 256)
np.asarray(p)
print(f"10x cold(+compile): {time.time()-t0:.1f}s fail={int(f)}", flush=True)
for s in (3, 4):
    t0 = time.time()
    p, c, f = train_merges_fused(*pack(vary(text, s)), 256)
    np.asarray(p)
    dt = time.time() - t0
    print(f"10x varied: {dt:.3f}s ({1.85768/dt:.3f} MB/s) fail={int(f)}",
          flush=True)

"""Ground-truth TPU timing: wall time to NUMPY RESULT + correctness check."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train_inc import train_merges_stepped, train_merges_incremental

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
ids, seg, n = st.pack_bytes(text)
ids = jnp.asarray(ids); seg = jnp.asarray(seg); n = jnp.asarray(n)
G = np.load("/tmp/golden_512.npz")

for name, fn in [("stepped", lambda: train_merges_stepped(ids, seg, n, 256)),
                 ("fori", lambda: train_merges_incremental(ids, seg, n, 256))]:
    t0 = time.time()
    p, c, f = fn()
    pn = np.asarray(p); cn = np.asarray(c)
    print(f"{name} cold(+compile): {time.time()-t0:.2f}s "
          f"correct={bool((pn == G['pairs']).all() and (cn == G['counts']).all())} "
          f"fail={int(f)}", flush=True)
    for r in range(3):
        t0 = time.time()
        p, c, f = fn()
        pn = np.asarray(p)
        dt = time.time() - t0
        print(f"{name} steady(to-numpy): {dt:.3f}s "
              f"correct={bool((pn == G['pairs']).all())}", flush=True)

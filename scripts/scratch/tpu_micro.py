"""Per-component TPU timings at corpus shapes."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.select import (
    select_max_pair, select_max_pair_dense, count_pairs_dense,
)
from minbpe_tpu.ops.merge import apply_merge

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
ids, seg, n = st.pack_bytes(text)
ids = jnp.asarray(ids); seg = jnp.asarray(seg); n = jnp.asarray(n)
N = ids.shape[0]


def bench(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return dt


bench("noop (dispatch overhead)", lambda a: a + 1, n)
bench("select_sort", lambda a, b, c: select_max_pair(a, b, c), ids, seg, n)
bench("count_dense V=512", lambda a, b, c: count_pairs_dense(a, b, c, 512), ids, seg, n)
bench("select_dense V=512", lambda a, b, c: select_max_pair_dense(a, b, c, 512), ids, seg, n)
bench("apply_merge+compact", lambda a, b, c: apply_merge(a, b, c, jnp.int32(101), jnp.int32(32), jnp.int32(256)), ids, seg, n)

c = jnp.cumsum((jnp.arange(N) < n).astype(jnp.int32))
bench("cumsum", lambda x: jnp.cumsum(x), ids)
bench("searchsorted", lambda cc: jnp.searchsorted(cc, jnp.arange(1, N + 1, dtype=jnp.int32), side="left"), c)
bench("gather", lambda a: a[jnp.clip(a, 0, N - 1)], ids)
bench("cummax", lambda a: jax.lax.cummax(a), ids)
bench("scatter_add 1MB", lambda a: jnp.zeros(512 * 512, jnp.int32).at[jnp.clip(a, 0, 512 * 512 - 1)].add(1, mode="drop"), ids)
bench("sort3 N", lambda a, b: jax.lax.sort((a, b, jnp.arange(N, dtype=jnp.int32)), num_keys=2, is_stable=True), ids, seg)

# incremental one full run
from minbpe_tpu.ops.train_inc import train_merges_incremental
t0 = time.time()
p, ctr, f = train_merges_incremental(ids, seg, n, 256)
p.block_until_ready()
print(f"incremental compile+run: {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    p, ctr, f = train_merges_incremental(ids, seg, n, 256)
    p.block_until_ready()
    print(f"incremental steady: {time.time()-t0:.3f}s fail={int(f)}", flush=True)

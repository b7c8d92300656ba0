"""Microbenchmark for the fused training kernel variants (run on TPU)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from minbpe_tpu.regex import RegexTokenizer
from minbpe_tpu.utils.native import split_offsets
from minbpe_tpu.ops import stream as stream_ops

text = open("/root/reference/tests/taylorswift.txt").read()

tok = RegexTokenizer()
data, ends = tok._split_arrays(text)
ids, seg, n = stream_ops.pack_offsets(data, ends)
ids = jnp.asarray(ids); seg = jnp.asarray(seg); n = jnp.asarray(n)
print("N =", ids.shape[0], "n =", int(n), file=sys.stderr)

from minbpe_tpu.ops.pallas.fused_train import train_merges_fused

M = 256
# warm
p, c, f = train_merges_fused(ids, seg, n, M)
for trial in range(3):
    t0 = time.time()
    p, c, f = train_merges_fused(ids, seg, n, M)
    jax.block_until_ready((p, c))
    print(f"fused train_merges_fused: {time.time()-t0:.4f}s", file=sys.stderr)
np.save("/tmp/golden_pairs.npy", np.asarray(p))
np.save("/tmp/golden_counts.npy", np.asarray(c))
print("fail round:", int(f), file=sys.stderr)

"""Isolate the per-round cost inside fori_loop on the TPU backend."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.select import select_max_pair
from minbpe_tpu.ops.merge import apply_merge

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", "rb").read()
rng = np.random.default_rng(0)


def variants(k=3):
    out = []
    for v in range(k):
        arr = np.frombuffer(text, dtype=np.uint8).astype(np.int32).copy()
        i = rng.integers(0, len(arr), 500)
        arr[i] = rng.integers(0, 256, 500)
        ids, seg, n = st.pack_bytes(arr.astype(np.uint8).tobytes())
        out.append((jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n)))
    return out


VS = variants()
R = 256


@jax.jit
def loop_trivial(ids, seg, n):
    def body(i, s):
        a, b = s
        return (a + 1, b)
    return jax.lax.fori_loop(0, R, body, (ids, seg))[0]


@jax.jit
def loop_select(ids, seg, n):
    def body(i, s):
        acc = s
        pa, pb, c, ok = select_max_pair(ids, seg, n)
        return acc + pa + c
    return jax.lax.fori_loop(0, R, body, jnp.int32(0))


@jax.jit
def loop_apply(ids, seg, n):
    def body(i, s):
        ids_, seg_, n_ = s
        out = apply_merge(ids_, seg_, n_, jnp.int32(101), jnp.int32(32),
                          jnp.int32(256) + i)
        return out[:3]
    return jax.lax.fori_loop(0, R, body, (ids, seg, n))


@jax.jit
def loop_full(ids, seg, n):
    def body(i, s):
        ids_, seg_, n_ = s
        pa, pb, c, ok = select_max_pair(ids_, seg_, n_)
        out = apply_merge(ids_, seg_, n_, pa, pb, jnp.int32(256) + i)
        return out[:3]
    return jax.lax.fori_loop(0, R, body, (ids, seg, n))


def t(name, f):
    out = f(*VS[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    times = []
    for r in range(2):
        t0 = time.time()
        out = f(*VS[(r + 1) % len(VS)])
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.time() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms total, "
          f"{min(times)/R*1000:.3f} ms/round", flush=True)


t("loop_trivial", loop_trivial)
t("loop_select(sort)", loop_select)
t("loop_apply", loop_apply)
t("loop_full(sort)", loop_full)

from minbpe_tpu.ops.train_inc import train_merges_incremental
f = partial(train_merges_incremental, num_merges=R)
t("train_incremental", lambda a, b, c: train_merges_incremental(a, b, c, R))

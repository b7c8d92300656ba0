"""Probe #2: gather/scan variants for the round-4 designs.

- gather cost vs index count (is it ~per-index serialized?)
- gather with 2-D index shape vs flat
- row-gather from (H, 4) packed table vs 3 separate gathers
- one-hot-matmul lookup into a [Vc] classed table (MXU alternative)
- 2-D blocked flat-order cumsum vs 1-D jnp.cumsum
- 2-D blocked segmented min (lane+row log steps) vs 1-D associative_scan
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 1 << 18
C = 128
R = N // C


def timeit(label, fn, args_list, n=3):
    np.asarray(fn(*args_list[0]))
    ts = []
    for i in range(n):
        a = args_list[min(i + 1, len(args_list) - 1)]
        t0 = time.time()
        np.asarray(fn(*a))
        ts.append(time.time() - t0)
    print(f"{label:56s} min={min(ts)*1e3:9.3f} ms", flush=True)
    return min(ts)


def mk(seed, n=N, hi=512):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, hi, size=n, dtype=np.int32))

H = 1 << 18
table = [jnp.asarray(np.random.default_rng(9 + i).integers(0, 1 << 20, size=H, dtype=np.int32)) for i in range(2)]
table4 = [jnp.asarray(np.random.default_rng(9 + i).integers(0, 1 << 20, size=(H, 4), dtype=np.int32)) for i in range(2)]

# gather cost vs K
for K in (2048, 16384, 131072, N):
    idxs = [(mk(i, K, H), table[i % 2]) for i in range(4)]
    @jax.jit
    def g1(j, t):
        return jnp.sum(t[j])
    timeit(f"gather K={K} from [262144] 1-D idx", g1, idxs)

# 2-D shaped indices
idx2d = [(mk(i, N, H).reshape(R, C), table[i % 2]) for i in range(4)]
@jax.jit
def g2(j, t):
    return jnp.sum(t[j])
timeit(f"gather K={N} from [262144], idx (R,128) 2-D", g2, idx2d)

# row-gather packed (H,4) vs 3 gathers
idxs = [(mk(i, N, H), table4[i % 2]) for i in range(4)]
@jax.jit
def g_row(j, t):
    rows = t[j]  # (N, 4)
    return jnp.sum(rows)
timeit(f"row-gather K={N} rows of 4 from (H,4)", g_row, idxs)

@jax.jit
def g_3x(j, t):
    return jnp.sum(t[j, 0] + t[j, 1] + t[j, 2])
timeit(f"3 column gathers K={N} from (H,4)", g_3x, idxs)

# one-hot matmul "lookup" into a small [1024] table (dense-V alternative)
VT = 1024
tv = [jnp.asarray(np.random.default_rng(3 + i).integers(0, 1 << 20, size=(VT,), dtype=np.int32)) for i in range(2)]
lk = [(mk(i, N, VT).reshape(R, C), tv[i % 2]) for i in range(4)]
@jax.jit
def g_onehot(j, t):
    # lookup via take on last axis reshaped — plain gather for comparison
    return jnp.sum(t[j])
timeit(f"gather K={N} from small [1024] table 2-D idx", g_onehot, lk)

# 1-D cumsum vs 2-D blocked flat cumsum
xs1 = [(mk(i),) for i in range(4)]
@jax.jit
def c1(x):
    return jnp.sum(jnp.cumsum(x) * 3)
timeit("1-D jnp.cumsum over N", c1, xs1)

xs2 = [(mk(i).reshape(R, C),) for i in range(4)]
@jax.jit
def c2(x):
    lane = jnp.cumsum(x, axis=1)
    tot = lane[:, -1]
    pref = jnp.cumsum(tot) - tot
    return jnp.sum(lane + pref[:, None])
timeit("2-D blocked cumsum (R,128): row cumsum + carry", c2, xs2)

# segmented min: 1-D associative_scan vs 2-D blocked select-scan
def segop(a, b):
    sa, va = a
    sb, vb = b
    return sb, jnp.where(sa == sb, jnp.minimum(va, vb), vb)

@jax.jit
def s1(x):
    seg = jnp.cumsum((x & 15) == 0)
    _, fwd = jax.lax.associative_scan(segop, (seg, x))
    _, rev = jax.lax.associative_scan(segop, (seg, x), reverse=True)
    return jnp.sum(jnp.minimum(fwd, rev))
timeit("1-D segmented-min 2x associative_scan", s1, xs1)

@jax.jit
def s2(x):
    xf = x.reshape(-1)
    seg = jnp.cumsum((xf & 15) == 0).reshape(R, C)
    v = x
    # lane log-steps (shift via roll+mask on 2-D)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    INF = jnp.int32(2**31 - 1)
    sfwd, vfwd = seg, v
    k = 1
    while k < C:
        ps = jnp.where(lane >= k, jnp.roll(sfwd, k, axis=1), -1)
        pv = jnp.where(lane >= k, jnp.roll(vfwd, k, axis=1), INF)
        vfwd = jnp.where(ps == seg, jnp.minimum(vfwd, pv), vfwd)
        k *= 2
    # cross-row: row-total seg/min at row end, scan over rows (R elems, 1-D cheap-ish)
    rs = seg[:, -1]
    rv = vfwd[:, -1]
    k = 1
    while k < R:
        ps = jnp.where(jnp.arange(R) >= k, jnp.roll(rs, k), -1)
        pv = jnp.where(jnp.arange(R) >= k, jnp.roll(rv, k), INF)
        rv = jnp.where(ps == rs, jnp.minimum(rv, pv), rv)
        k *= 2
    prs = jnp.where(jnp.arange(R) >= 1, jnp.roll(rs, 1), -1)
    prv = jnp.where(jnp.arange(R) >= 1, jnp.roll(rv, 1), INF)
    vfwd = jnp.where(prs[:, None] == seg, jnp.minimum(vfwd, prv[:, None]), vfwd)
    return jnp.sum(vfwd)
timeit("2-D blocked segmented fwd-min (lane+row steps)", s2, xs2)

# scatter into [8448,8448] with donation (true cost)
V2 = 8448
from functools import partial
@partial(jax.jit, donate_argnums=(1,))
def scat_don(idx, m):
    m2 = m.at[idx[:, 0], idx[:, 1]].add(1)
    return jnp.max(m2), m2
K = N
sc = [(jnp.asarray(np.random.default_rng(i).integers(0, V2, size=(K, 2), dtype=np.int32)),
       jnp.asarray(np.zeros((V2, V2), np.int32))) for i in range(4)]
timeit(f"scatter-add K={K} -> donated [8448,8448]", scat_don, sc)

sc2 = [(jnp.asarray(np.random.default_rng(i).integers(0, 512, size=(K, 2), dtype=np.int32)),
        jnp.asarray(np.zeros((512, 512), np.int32))) for i in range(4)]
timeit(f"scatter-add K={K} -> donated [512,512]", scat_don, sc2)
print("done", flush=True)

"""Probe #3: loop-amortized per-op costs (the only reliable timing here).

Each op runs inside a fori_loop(ITERS) with data dependent on the carry so
XLA can't hoist it. Cost/iter = (total - RTT) / ITERS.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 1 << 18
C = 128
R = N // C
ITERS = 100
RTT = 24.6e-3


def timeit(label, fn, args_list, n=2):
    np.asarray(fn(*args_list[0]))
    ts = []
    for i in range(n):
        a = args_list[min(i + 1, len(args_list) - 1)]
        t0 = time.time()
        np.asarray(fn(*a))
        ts.append(time.time() - t0)
    per = (min(ts) - RTT) / ITERS * 1e3
    print(f"{label:56s} {per:8.4f} ms/iter   (total {min(ts)*1e3:.1f})", flush=True)
    return per


def mk(seed, n=N, hi=512):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, hi, size=n, dtype=np.int32))


def loop(body0):
    def f(x):
        def body(i, s):
            return body0(i, s)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x)[:16])
    return jax.jit(f)


xs1 = [(mk(i, N, N),) for i in range(3)]
xs2 = [(mk(i, N, N).reshape(R, C),) for i in range(3)]

# elementwise pass over N (1-D)
timeit("elementwise x5 over N 1-D", loop(lambda i, s: ((s + i) ^ (s >> 1)) + (s & 7) - (s % 5)), xs1)

# gather: K indices from [N] table (table = carry s)
for K in (2048, 16384, 65536, N):
    def body(i, s, K=K):
        j = (s[:K] + i) & (N - 1)
        return s.at[:K].set(s[j])
    timeit(f"gather K={K} from [262144] (loop)", loop(body), xs1)

# gather from small [1024] table
tv = jnp.asarray(np.random.default_rng(5).integers(0, 1 << 20, size=1024, dtype=np.int32))
def body_small(i, s):
    j = (s + i) & 1023
    return s + tv[j]
timeit("gather K=N from [1024] table (loop)", loop(body_small), xs1)

# 2-D-index gather from 1-D table
def body_2d(i, s):
    j = (s + i) & (N - 1)
    return (s.reshape(-1).at[(jnp.arange(N))].set(s.reshape(-1)[j.reshape(-1)])).reshape(R, C)
# simpler: j 2-D, table 1-D flat of s
def body_2d(i, s):
    flat = s.reshape(-1)
    j = (s + i) & (N - 1)
    return flat[j]  # (R,C) result
timeit("gather 2-D idx (R,128) from flat [N] (loop)", loop(body_2d), xs2)

# scatter-add N -> [512,512] in loop
def body_sc(i, s):
    a = (s + i) & 511
    b = (s >> 3) & 511
    cm = jnp.zeros((512, 512), jnp.int32).at[a.reshape(-1), b.reshape(-1)].add(1)
    return s + cm[0, 0]
timeit("scatter-add N -> [512,512] (loop)", loop(body_sc), xs2)

# scatter-add K=4096 -> [8448,8448] carried through loop
V2 = 8448
def f_scbig(x):
    cm = jnp.zeros((V2, V2), jnp.int32)
    def body(i, st):
        s, cm = st
        a = (s[:4096] + i) % V2
        b = (s[4096:8192] - i) % V2
        cm = cm.at[a, b].add(1)
        return s + 1, cm
    s, cm = jax.lax.fori_loop(0, ITERS, body, (x, cm))
    return jnp.sum(cm[:2, :2]) + jnp.sum(s[:4])
timeit("scatter-add K=4096 -> carried [8448,8448] (loop)", jax.jit(f_scbig), xs1)

def f_scbig2(x):
    cm = jnp.zeros((V2, V2), jnp.int32)
    def body(i, st):
        s, cm = st
        a = (s + i) % V2
        b = (s - i) % V2
        cm = cm.at[a, b].add(1)
        return s + 1, cm
    s, cm = jax.lax.fori_loop(0, ITERS, body, (x, cm))
    return jnp.sum(cm[:2, :2]) + jnp.sum(s[:4])
timeit("scatter-add K=N -> carried [8448,8448] (loop)", jax.jit(f_scbig2), xs1)

# argmax over [8448,8448] in loop
def f_am(x):
    cm = jnp.zeros((V2, V2), jnp.int32).at[x % V2, (x * 3) % V2].add(1)
    def body(i, st):
        s, cm = st
        mx = jnp.max(cm)
        fl = jnp.argmax(cm.reshape(-1)).astype(jnp.int32)
        cm = cm.at[(fl + i) % V2, fl % V2].add(1)
        return s, cm
    s, cm = jax.lax.fori_loop(0, ITERS, body, (x, cm))
    return jnp.sum(cm[:2, :2])
timeit("max+argmax [8448,8448] (loop)", jax.jit(f_am), xs1)

# argmax over [512,512] in loop
def f_am5(x):
    cm = jnp.zeros((512, 512), jnp.int32).at[x % 512, (x * 3) % 512].add(1)
    def body(i, st):
        s, cm = st
        fl = jnp.argmax(cm.reshape(-1)).astype(jnp.int32)
        cm = cm.at[(fl + i) % 512, fl % 512].add(1)
        return s, cm
    s, cm = jax.lax.fori_loop(0, ITERS, body, (x, cm))
    return jnp.sum(cm[:2, :2])
timeit("argmax [512,512] (loop)", jax.jit(f_am5), xs1)

# cumsum 1-D in loop
timeit("cumsum 1-D over N (loop)", loop(lambda i, s: jnp.cumsum(s) & (N - 1)), xs1)

# cummax 1-D in loop
timeit("cummax 1-D over N (loop)", loop(lambda i, s: jax.lax.cummax(s + i)), xs1)

# 2-D blocked cumsum in loop
def body_c2(i, s):
    lane = jnp.cumsum(s, axis=1)
    tot = lane[:, -1]
    pref = jnp.cumsum(tot) - tot
    return (lane + pref[:, None]) & (N - 1)
timeit("2-D blocked cumsum (R,128) (loop)", loop(body_c2), xs2)

# segmented-min assoc scan 1-D in loop
def segop(a, b):
    sa, va = a
    sb, vb = b
    return sb, jnp.where(sa == sb, jnp.minimum(va, vb), vb)

def body_s1(i, s):
    seg = jnp.cumsum((s & 15) == 0)
    _, fwd = jax.lax.associative_scan(segop, (seg, s + i))
    return fwd
timeit("1-D segmin: cumsum + 1x assoc_scan (loop)", loop(body_s1), xs1)

# 2-D select-scan (lane+row log steps) in loop — the Pallas-style scan in XLA
lane_i = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
def body_s2(i, s):
    v = s + i
    sfwd = s & 31
    k = 1
    while k < C:
        ps = jnp.where(lane_i >= k, jnp.roll(sfwd, k, axis=1), -1)
        pv = jnp.where(lane_i >= k, jnp.roll(v, k, axis=1), 0)
        v = jnp.where(ps == sfwd, jnp.minimum(v, pv), v)
        k *= 2
    rs = sfwd[:, -1]
    rv = v[:, -1]
    k = 1
    while k < R:
        ps = jnp.where(jnp.arange(R) >= k, jnp.roll(rs, k), -1)
        pv = jnp.where(jnp.arange(R) >= k, jnp.roll(rv, k), 0)
        rv = jnp.where(ps == rs, jnp.minimum(rv, pv), rv)
        k *= 2
    return v + rv[:, None]
timeit("2-D select-scan 7 lane + 11 row steps (loop)", loop(body_s2), xs2)

# sort N in loop
def body_sort(i, s):
    return jax.lax.sort((s + i, s), num_keys=1, is_stable=True)[1]
timeit("stable sort N 2-array (loop)", loop(body_sort), xs1)

def f_sort_small(x):
    def body(i, s):
        part = jax.lax.sort((s[:16384] + i, s[:16384]), num_keys=1,
                            is_stable=True)[1]
        return s.at[:16384].set(part)
    return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x)[:16])
timeit("stable sort 16384 2-array (loop)", jax.jit(f_sort_small), xs1)
print("done", flush=True)

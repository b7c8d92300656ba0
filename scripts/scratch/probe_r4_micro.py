"""Round-4 design probes: per-op costs on the tunneled TPU.

Timing forces a host FETCH of a scalar derived from the full result
(block_until_ready alone is not trustworthy through the tunnel). Distinct
inputs per timed run so results can't come from any input cache.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 1 << 18  # 262144


def timeit(label, fn, args_list, n=3):
    np.asarray(fn(*args_list[0]))  # warm/compile
    ts = []
    for i in range(n):
        a = args_list[min(i + 1, len(args_list) - 1)]
        t0 = time.time()
        np.asarray(fn(*a))
        ts.append(time.time() - t0)
    print(f"{label:52s} min={min(ts)*1e3:9.3f} ms  all={[round(t*1e3,2) for t in ts]}", flush=True)
    return min(ts)


def mk(seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 512, size=N, dtype=np.int32))

xs = [(mk(i),) for i in range(4)]

# 0. null fetch: RTT floor
@jax.jit
def null_op(x):
    return jnp.sum(x[:8])

timeit("null (RTT floor: tiny reduce + scalar fetch)", null_op, xs)

# 1. fori_loop overhead: trivial body, 1000 iterations
@jax.jit
def loop1000(x):
    def body(i, s):
        return s + i
    return jnp.sum(jax.lax.fori_loop(0, 1000, body, x))

timeit("fori_loop 1000 iters elementwise-N body", loop1000, xs)

@jax.jit
def loop100_gather(x):
    def body(i, s):
        j = (s * 7 + i) & (N - 1)
        return s + s[j]
    return jnp.sum(jax.lax.fori_loop(0, 100, body, x))

timeit("fori_loop 100 iters with gather-N body", loop100_gather, xs)

# 2. scatter-add colliding: N indices into [V,V] (V=512)
V = 512
@jax.jit
def scat_full(x):
    a = x & 511
    b = (x >> 3) & 511
    return jnp.sum(jnp.zeros((V, V), jnp.int32).at[a, b].add(1))

timeit(f"scatter-add N={N} -> [512,512]", scat_full, xs)

# 2b. scatter-add K into preexisting [8448, 8448]
V2 = 8448
ms_big = [jnp.asarray(np.random.default_rng(i).integers(0, 1000, size=(V2, V2), dtype=np.int32))
          for i in range(2)]
for K in (2048, 32768):
    ks = [(jnp.asarray(np.random.default_rng(i).integers(0, V2, size=(K, 2), dtype=np.int32)),
           ms_big[i % 2]) for i in range(4)]
    @jax.jit
    def scat_k(idx, m):
        return jnp.sum(m.at[idx[:, 0], idx[:, 1]].add(1) - m)
    timeit(f"scatter-add K={K} -> existing [8448,8448]", scat_k, ks)

# 2c. scatter-add N into 1-D [3N]
P = 3 * N
@jax.jit
def scat_1d(x):
    idx = (x * jnp.int32(-1640531527)) % P
    return jnp.sum(jnp.zeros((P,), jnp.int32).at[idx].add(1))

timeit(f"scatter-add N={N} -> [{P}] 1-D", scat_1d, xs)

# 3. gather over N
@jax.jit
def gath(x):
    j = (x * 7) & (N - 1)
    return jnp.sum(x[j] + x[(j + 1) & (N - 1)])

timeit("2x gather over N", gath, xs)

# 4. argmax over [8448, 8448] int32 (285 MB)
@jax.jit
def amax(m):
    return jnp.max(m) + jnp.argmax(m.reshape(-1)).astype(jnp.int32)

timeit("max+argmax over [8448,8448] (285MB)", amax, [(m,) for m in ms_big])

# 5. sort K elements
for KS in (2048, 32768, N):
    kss = [(jnp.asarray(np.random.default_rng(i).integers(0, 1 << 30, size=KS, dtype=np.int32)),)
           for i in range(4)]
    @jax.jit
    def srt(x):
        return jnp.sum(jax.lax.sort((x, x), num_keys=1, is_stable=True)[1])
    timeit(f"stable sort K={KS} (2 arrays)", srt, kss)

# 6. cumsum + cummax over N
@jax.jit
def scans(x):
    return jnp.sum(jnp.cumsum(x) + jax.lax.cummax(x))

timeit("cumsum+cummax over N", scans, xs)

# 7. segmented min via associative_scan over (seg, val), fwd+rev
@jax.jit
def segmin(x):
    seg = jnp.cumsum((x & 15) == 0)
    def op(a, b):
        sa, va = a
        sb, vb = b
        return sb, jnp.where(sa == sb, jnp.minimum(va, vb), vb)
    _, fwd = jax.lax.associative_scan(op, (seg, x))
    _, rev = jax.lax.associative_scan(op, (seg, x), reverse=True)
    return jnp.sum(jnp.minimum(fwd, rev))

timeit("segmented-min 2x associative_scan over N", segmin, xs)

# 7b. scatter-min segmented alternative: N -> [N/8 segs]
S = N // 8
@jax.jit
def segmin_scatter(x):
    seg = (jnp.arange(N, dtype=jnp.int32) // 8)
    return jnp.sum(jnp.full((S,), 2**31 - 1, jnp.int32).at[seg].min(x))

timeit(f"segmented-min scatter-min N -> [{S}]", segmin_scatter, xs)

# 8. fori_loop of 256 rounds each doing: argmax [512,512] + 10 elementwise-N
#    + cumsum + 2 gathers + 1 scatter-add-N  (delta-trainer round proxy, V=512)
@jax.jit
def delta_round_proxy(x):
    cm = jnp.zeros((V, V), jnp.int32).at[x & 511, (x >> 3) & 511].add(1)

    def body(i, st):
        y, cm = st
        mx = jnp.max(cm)
        fl = jnp.argmax(cm.reshape(-1)).astype(jnp.int32)
        y = jnp.where(y == (fl & 511), y + i, y)
        for _ in range(6):
            y = jnp.where(y > 0, y - 1, y + 1)
        c = jnp.cumsum(y)
        j = (y * 5 + i) & (N - 1)
        y = y + y[j] - c[j & (N - 1)]
        cm = cm.at[y & 511, (y >> 2) & 511].add(jnp.where(mx > 0, 1, -1))
        return y, cm

    y, cm = jax.lax.fori_loop(0, 256, body, (x, cm))
    return jnp.sum(y) + jnp.sum(cm)

timeit("256-round delta-trainer proxy V=512 (one jit)", delta_round_proxy, xs)
print("done", flush=True)

"""Probe the TPU backend: tiny eager op + tiny jit. Exits 0 on success."""
import time
import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
t0 = time.time()
x = (jnp.arange(1024) * 2).block_until_ready()
print(f"eager: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
f = jax.jit(lambda a: (a @ a.T).sum())
print(float(f(jnp.ones((256, 256)))), f"jit: {time.time()-t0:.1f}s", flush=True)

"""TPU encode throughput via the public API (fused encode path)."""
import time
import numpy as np
import jax

from minbpe_tpu import RegexTokenizer, BasicTokenizer

print("backend:", jax.default_backend(), flush=True)
text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
MB = len(text.encode()) / 1e6


def variant(seed):
    import random
    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


tok = RegexTokenizer()
t0 = time.time(); tok.train(text, 512); print(f"train: {time.time()-t0:.2f}s", flush=True)

t0 = time.time(); ids = tok.encode(variant(0)); print(f"encode warm(+compile): {time.time()-t0:.2f}s ({len(ids)} toks)", flush=True)
for s in (1, 2, 3):
    t0 = time.time()
    ids = tok.encode(variant(s))
    dt = time.time() - t0
    print(f"regex encode: {dt:.3f}s ({MB/dt:.3f} MB/s)", flush=True)

t0 = time.time(); out = tok.decode(ids); print(f"decode: {time.time()-t0:.3f}s roundtrip={out == variant(3)}", flush=True)

b = BasicTokenizer()
t0 = time.time(); b.train(text, 512); print(f"basic train: {time.time()-t0:.2f}s", flush=True)
t0 = time.time(); ids = b.encode(variant(4)); print(f"basic encode warm: {time.time()-t0:.2f}s", flush=True)
for s in (5, 6):
    t0 = time.time()
    ids = b.encode(variant(s))
    dt = time.time() - t0
    print(f"basic encode: {dt:.3f}s ({MB/dt:.3f} MB/s)", flush=True)

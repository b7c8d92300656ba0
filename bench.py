"""Benchmark: headline BPE training throughput vs the reference.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline (BASELINE.md, measured in this environment): the reference
RegexTokenizer.train at vocab 512 on tests/taylorswift.txt (185,768 bytes)
takes 15.53 s => 0.01196 MB/s.

Methodology notes:
- jit compilation is excluded (warmed up on a perturbed corpus variant and
  via the persistent compilation cache in .jax_cache);
- every timed run uses a DISTINCT corpus variant (the remote execution layer
  caches (executable, inputs) results, so repeat-timing identical inputs
  would measure the cache, not the machine);
- timing covers the full public API call: host pre-split, packing, device
  transfer, the training run, and fetching the learned merges.

Run on the default backend (TPU when available). Details go to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

CORPUS = "/root/reference/tests/taylorswift.txt"
BASELINE_MB_S = 0.185768 / 15.53  # reference regex train, this machine


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def variant(text: str, seed: int) -> str:
    """Perturb a few hundred characters (ASCII-for-ASCII) — same size/shape,
    different content, so results cannot be served from any input cache."""
    import random

    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def main():
    import jax
    from minbpe_tpu import RegexTokenizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    text = open(CORPUS, encoding="utf-8").read()
    mb = len(text.encode("utf-8")) / 1e6

    # warm-up / compile on a perturbed variant + parity sanity (encode path
    # compiles here too, so the timed section below is pure training)
    t0 = time.time()
    wtok = RegexTokenizer()
    wtok.train(variant(text, 0), 512)
    log(f"warmup train (incl compile): {time.time()-t0:.2f}s")
    t0 = time.time()
    sample = text[:20000]
    assert wtok.decode(wtok.encode(sample)) == sample
    log(f"warmup encode/decode round-trip ok ({time.time()-t0:.2f}s)")

    # timed: real corpus + two fresh variants, all uncached
    times = []
    tok = None
    for i, t in enumerate([text, variant(text, 1), variant(text, 2)]):
        t0 = time.time()
        tk = RegexTokenizer()
        tk.train(t, 512)
        dt = time.time() - t0
        times.append(dt)
        log(f"train run {i}: {dt:.3f}s ({mb/dt:.3f} MB/s)")
        if i == 0:
            tok = tk

    # parity sanity on the real-corpus artifact
    assert tok.decode(tok.encode(sample)) == sample
    log(f"merges learned: {len(tok.merges)}; round-trip ok")

    best = min(times)
    value = mb / best
    print(json.dumps({
        "metric": "regex_train_MBps_vocab512_taylorswift",
        "value": round(value, 4),
        "unit": "MB/s",
        "vs_baseline": round(value / BASELINE_MB_S, 2),
    }))


if __name__ == "__main__":
    main()

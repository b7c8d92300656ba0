"""Fused-trainer throughput at multi-MB corpus sizes (VERDICT r2 item 1b).

Trains RegexTokenizer at vocab 512 on taylorswift.txt replicated x5 and x20
(~0.93 MB / ~3.7 MB — the x20 stream lands on the fused kernel's 4M-token
capacity ceiling) on the real TPU, and prints one JSON line per size.

Per-round cost is dominated by pair counting, which scales with the live
prefix, so MB/s should RISE with corpus size as fixed per-round costs
(selection, launch, host sync) amortize — this run is the evidence.
"""

import json
import os
import random
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/root/reference/tests/taylorswift.txt"


def variant(text: str, seed: int) -> str:
    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def main():
    import jax

    # sitecustomize imports jax before this script, so the env var above is
    # read too late; set the cache dir on the live config as well
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from minbpe_tpu import RegexTokenizer

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr, flush=True)
    base = open(CORPUS, encoding="utf-8").read()

    for reps in (5, 20):
        text = base * reps
        mb = len(text.encode("utf-8")) / 1e6
        t0 = time.time()
        wtok = RegexTokenizer()
        wtok.train(variant(base, 0) * reps, 512)
        warm = time.time() - t0
        print(f"x{reps}: warmup (incl compile) {warm:.2f}s",
              file=sys.stderr, flush=True)
        times = []
        tok = None
        for i, t in enumerate([text,
                               variant(base, 1) * reps,
                               variant(base, 2) * reps]):
            t0 = time.time()
            tk = RegexTokenizer()
            tk.train(t, 512)
            dt = time.time() - t0
            times.append(dt)
            print(f"x{reps} run {i}: {dt:.3f}s ({mb/dt:.3f} MB/s)",
                  file=sys.stderr, flush=True)
            if i == 0:
                tok = tk
        sample = base[:20000]
        assert tok.decode(tok.encode(sample)) == sample
        best = min(times)
        print(json.dumps({
            "metric": f"regex_train_MBps_vocab512_taylorswift_x{reps}",
            "corpus_MB": round(mb, 3),
            "value": round(mb / best, 4),
            "unit": "MB/s",
            "seconds": round(best, 3),
            "warmup_s": round(warm, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

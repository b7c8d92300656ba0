"""TPU bench: large-vocab training via the sort-round loop (round 4).

Covers the full auto-routing band above the fused kernel: vocab 2048 and
4096 (previously unmeasured on TPU — VERDICT r3 weak #6) and vocab 8192
(the SPARSE_VOCAB comparison point: reference measured 435.4 s, r03 sparse
299 s). Also records a vocab-8192 encode row through the flat encoder.

Methodology: warm-up on a perturbed variant compiles everything; timed runs
use distinct corpus variants never equal to the warm input.
"""

import json
import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

CORPUS = "/root/reference/tests/taylorswift.txt"


def variant(text, seed):
    rng = random.Random(seed)
    chars = list(text)
    for _ in range(200):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def main():
    from minbpe_tpu import RegexTokenizer

    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    text = open(CORPUS, encoding="utf-8").read()
    mb = len(text.encode("utf-8")) / 1e6
    modes = sys.argv[1:] or ["sortloop"]

    for vocab in (2048, 4096, 8192):
        for mode in modes:
            if mode == "stepped" and vocab > 4096:
                continue
            t0 = time.time()
            tok = RegexTokenizer()
            tok.train(variant(text, 0), vocab, select_mode=mode)
            warm = time.time() - t0
            times = []
            for i in (1, 2):
                tok = RegexTokenizer()
                t0 = time.time()
                tok.train(variant(text, i), vocab, select_mode=mode)
                times.append(time.time() - t0)
                print(f"vocab {vocab} {mode} run {i}: {times[-1]:.2f}s",
                      file=sys.stderr, flush=True)
            best = min(times)
            print(json.dumps({
                "metric": f"train_seconds_vocab{vocab}_taylorswift",
                "select_mode": mode,
                "value": round(best, 3), "unit": "s",
                "MBps": round(mb / best, 4),
                "warm_first_s": round(warm, 1),
                "merges": len(tok.merges),
            }), flush=True)

    # encode at vocab 8192 through the flat encoder (sorted kind)
    tok = RegexTokenizer()
    tok.train(text, 8192, select_mode="sortloop")
    tok.encode_ordinary(variant(text, 3))  # warm
    times = []
    for i in (4, 5, 6):
        v = variant(text, i)
        t0 = time.time()
        ids = tok.encode_ordinary(v)
        times.append(time.time() - t0)
        assert tok.decode(ids) == v
        print(f"encode8192 run {i}: {times[-1]:.3f}s", file=sys.stderr,
              flush=True)
    best = min(times)
    print(json.dumps({
        "metric": "encode_MBps_vocab8192_taylorswift",
        "value": round(mb / best, 4), "unit": "MB/s",
        "seconds": round(best, 3),
    }), flush=True)


if __name__ == "__main__":
    main()

"""TPU bench: training beyond the fused kernel's VMEM ceiling (round 4).

taylorswift.txt x120 (~22.3 MB, ~22M tokens) at vocab 512 through the
auto-routed path for N > 4M tokens: the sort-round loop
(ops/train_sortloop.py), whose per-round cost is one lax.sort of the
stream + blocked scans at ANY N. Proves throughput does not cliff where
the fused kernel hands off (VERDICT r3 weak #7 / ask #5).

One timed warm run per variant (each run is minutes of wall; 2 variants).
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
REPS = int(os.environ.get("XL_REPS", "120"))


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
    base = open(CORPUS, encoding="utf-8").read()
    text = base * REPS
    mb = len(text.encode("utf-8")) / 1e6
    print(f"corpus: {mb:.1f} MB x{REPS}", file=sys.stderr, flush=True)

    t0 = time.time()
    tok = RegexTokenizer()
    tok.train(variant(text, 0), 512)
    warm = time.time() - t0
    print(f"warm (incl compile): {warm:.1f}s", file=sys.stderr, flush=True)
    times = []
    for i in (1, 2):
        tok = RegexTokenizer()
        t0 = time.time()
        tok.train(variant(text, i), 512)
        times.append(time.time() - t0)
        print(f"x{REPS} run {i}: {times[-1]:.1f}s "
              f"({mb/times[-1]:.3f} MB/s)", file=sys.stderr, flush=True)
    best = min(times)
    print(json.dumps({
        "metric": f"regex_train_MBps_vocab512_taylorswift_x{REPS}",
        "corpus_MB": round(mb, 3),
        "value": round(mb / best, 4),
        "unit": "MB/s",
        "seconds": round(best, 1),
        "warmup_s": round(warm, 1),
        "path": "fused_xl (auto: N > in-VMEM ceiling)",
        "merges": len(tok.merges),
    }), flush=True)


if __name__ == "__main__":
    main()

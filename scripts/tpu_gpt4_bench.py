"""TPU encode throughput at true cl100k scale (VERDICT r2 item 3).

Builds a GPT4Tokenizer from a deterministic synthetic 100,256-entry ranks
table (utils/synthranks.py — the real cl100k_base file cannot be fetched
offline; reference minbpe/gpt4.py:63), pushes taylorswift.txt through the
full pipeline — GPT-4 pre-split, byte shuffle, sorted pair table, bucketed
chunk encode, decode un-shuffle — and prints one JSON line per corpus size.

The synthetic table is cached on disk after first generation (the
rejection-sampling replay is pure Python and costs ~1 minute at 100K).
"""

import json
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/root/reference/tests/taylorswift.txt"
CACHE = "/tmp/synthranks_100256_seed7.pkl"
N_RANKS = 100_256


def get_table():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from minbpe_tpu.utils.synthranks import synthetic_ranks

    t0 = time.time()
    ranks, intended, specials = synthetic_ranks(N_RANKS, seed=7)
    print(f"synthetic_ranks({N_RANKS}): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    with open(CACHE, "wb") as f:
        pickle.dump((ranks, intended, specials), f)
    return ranks, intended, specials


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from minbpe_tpu.gpt4 import GPT4Tokenizer
    from minbpe_tpu.engine import device_table

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    ranks, _, specials = get_table()
    t0 = time.time()
    tok = GPT4Tokenizer.from_mergeable_ranks(ranks, specials)
    print(f"from_mergeable_ranks (recovery + vocab): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    assert device_table(tok).kind == "sorted"

    base = open(CORPUS, encoding="utf-8").read()
    for reps in (1, 5):
        text = base * reps
        mb = len(text.encode("utf-8")) / 1e6
        # warm (compile) on a shifted variant; timed runs start at i=2 so no
        # timed input repeats the warm input (the remote execution layer
        # caches (executable, inputs) results — ADVICE r3 item 1)
        t0 = time.time()
        tok.encode(text[1:] + text[:1])
        warm = time.time() - t0
        times = []
        ids = None
        last = None
        for i in range(2, 5):
            v = text[i:] + text[:i]  # distinct content, same size
            last = v
            t0 = time.time()
            ids = tok.encode(v)
            times.append(time.time() - t0)
            print(f"x{reps} run {i-2}: {times[-1]:.3f}s "
                  f"({mb/times[-1]:.3f} MB/s)", file=sys.stderr, flush=True)
        assert tok.decode(ids) == last
        best = min(times)
        print(json.dumps({
            "metric": f"gpt4_encode_MBps_vocab100256_taylorswift_x{reps}",
            "corpus_MB": round(mb, 3),
            "value": round(mb / best, 4),
            "unit": "MB/s",
            "seconds": round(best, 3),
            "warm_seconds": round(warm, 2),
            "n_tokens": len(ids),
        }), flush=True)


if __name__ == "__main__":
    main()

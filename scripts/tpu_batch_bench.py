"""TPU bench: encode_batch throughput vs looped encode (round-4 ask #6).

64 documents (total ~0.7 MB) through ONE batched device program
(RegexTokenizer.encode_batch / engine.encode_parts) vs a per-document
encode loop — the serving-surface advantage the reference cannot express
(it encodes one string at a time, minbpe/regex.py:123-164).
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
    for _ in range(150):
        i = rng.randrange(len(chars))
        if "a" <= chars[i] <= "z":
            chars[i] = chr(rng.randrange(97, 123))
    return "".join(chars)


def main():
    from minbpe_tpu import RegexTokenizer

    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    text = open(CORPUS, encoding="utf-8").read()
    tok = RegexTokenizer()
    tok.train(text, 512)

    n_docs = 64
    L = len(text) // 48  # ~3.9 KB docs, 64 docs ~ 250 KB per batch
    def docs_for(seed):
        v = variant(text, seed)
        return [v[i * L:(i + 1) * L] for i in range(n_docs)]

    tok.encode_batch(docs_for(0))          # warm batched program
    [tok.encode(d) for d in docs_for(0)]   # warm per-doc program

    t_batch = []
    t_loop = []
    for seed in (1, 2, 3):
        docs = docs_for(seed)
        t0 = time.time()
        out_b = tok.encode_batch(docs)
        t_batch.append(time.time() - t0)
        t0 = time.time()
        out_l = [tok.encode(d) for d in docs]
        t_loop.append(time.time() - t0)
        assert out_b == out_l, "batched != looped"
    mb = n_docs * L / 1e6
    bb, bl = min(t_batch), min(t_loop)
    print(f"batch {bb:.3f}s vs loop {bl:.3f}s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "encode_batch_docs_per_s_vocab512",
        "value": round(n_docs / bb, 1), "unit": "docs/s",
        "n_docs": n_docs, "doc_bytes": L,
        "batch_MBps": round(mb / bb, 3),
        "looped_docs_per_s": round(n_docs / bl, 1),
        "speedup_vs_looped": round(bl / bb, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

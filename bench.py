"""Benchmark: BPE training/encode/decode throughput vs the reference.

Prints exactly ONE JSON line on stdout. The headline metric (train) keeps the
round-over-round comparable keys {"metric", "value", "unit", "vs_baseline"};
the additional BASELINE.md rows ride along under "extra":

  {"metric": "regex_train_MBps_vocab512_taylorswift", "value": N,
   "unit": "MB/s", "vs_baseline": N,
   "extra": [{"metric": "basic_train_MBps", ...}, ...],
   "warmup_s": N}

Baselines (BASELINE.md, measured in this environment, corpus =
tests/taylorswift.txt = 185,768 bytes, vocab 512):
  regex train 15.53 s | basic train 7.34 s | regex encode 0.37 s |
  basic encode 7.36 s | decode 0.055 s.

Methodology notes:
- jit compilation is excluded (warmed up on a perturbed corpus variant and
  via the persistent compilation cache in .jax_cache);
- every timed run uses a DISTINCT corpus variant (the remote execution layer
  caches (executable, inputs) results, so repeat-timing identical inputs
  would measure the cache, not the machine);
- timing covers the full public API call: host pre-split, packing, device
  transfer, the run, and fetching the result.

Run on the default backend (TPU when available). Details go to stderr.
"""

import json
import os
import sys
import time

# NOTE: this environment's sitecustomize imports jax at interpreter startup,
# BEFORE this module runs, so the JAX_COMPILATION_CACHE_DIR env var would be
# read too late — the cache dir must be set through jax.config (see main()).
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")

CORPUS = "/root/reference/tests/taylorswift.txt"
MB = 0.185768
BASE = {  # seconds, reference on this machine (BASELINE.md)
    "regex_train": 15.53,
    "basic_train": 7.34,
    "regex_encode": 0.37,
    "basic_encode": 7.36,
    "decode": 0.055,
}


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


def timed(label, fn, args_list):
    """Min wall time of fn over distinct-input calls."""
    times = []
    results = []
    for i, a in enumerate(args_list):
        t0 = time.time()
        results.append(fn(a))
        dt = time.time() - t0
        times.append(dt)
        log(f"{label} run {i}: {dt:.3f}s ({MB/dt:.3f} MB/s)")
    return min(times), results[0]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    from minbpe_tpu import BasicTokenizer, RegexTokenizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    text = open(CORPUS, encoding="utf-8").read()
    texts = [text, variant(text, 1), variant(text, 2)]

    # -- warm-up / compile on a perturbed variant + parity sanity ------------
    t0 = time.time()
    wtok = RegexTokenizer()
    wtok.train(variant(text, 0), 512)
    sample = text[:20000]
    assert wtok.decode(wtok.encode(sample)) == sample
    wtok.encode_ordinary(variant(text, 0))  # full-size encode compile
    wb = BasicTokenizer()
    wb.train(variant(text, 0), 512)
    wb.encode(variant(text, 0))
    warmup_s = time.time() - t0
    log(f"warmup (train+encode compile, both tokenizers): {warmup_s:.2f}s")

    # -- train ----------------------------------------------------------------
    toks = {}

    def train_regex(t):
        tk = RegexTokenizer()
        tk.train(t, 512)
        toks.setdefault("regex", tk)
        return tk

    def train_basic(t):
        tk = BasicTokenizer()
        tk.train(t, 512)
        toks.setdefault("basic", tk)
        return tk

    t_regex_train, _ = timed("regex train", train_regex, texts)
    t_basic_train, _ = timed("basic train", train_basic, texts)
    rtok, btok = toks["regex"], toks["basic"]

    # -- encode ---------------------------------------------------------------
    t_regex_enc, ids = timed("regex encode", rtok.encode_ordinary, texts)
    t_basic_enc, _ = timed("basic encode", btok.encode, texts)

    # -- decode (host-side vocab concatenation) -------------------------------
    t_dec, out = timed("decode", rtok.decode, [ids, list(ids), list(ids)])
    assert out == text
    assert btok.decode(btok.encode(sample)) == sample
    log(f"merges learned: {len(rtok.merges)}; round-trips ok")

    # -- batched multi-document serving (no reference counterpart) ------------
    n_docs, L = 64, len(text) // 48

    def docs_for(t):
        return [t[i * L:(i + 1) * L] for i in range(n_docs)]

    rtok.encode_batch(docs_for(variant(text, 7)))  # warm
    t_batch, out_b = timed("encode_batch x64", rtok.encode_batch,
                           [docs_for(t) for t in texts])
    assert out_b[3] == rtok.encode(docs_for(text)[3])
    docs_per_s = round(n_docs / t_batch, 1)

    # sweet-spot batch: hundreds of docs / multi-MB payload, where the
    # per-call fixed costs (tunnel RTT + compile-free dispatch) amortize
    nb_docs, nb_L = 512, len(text) // 48
    big = [variant(text, 20 + k) for k in range(3)]

    def big_docs(t):
        return [t[(i * 37) % (len(t) - nb_L):][:nb_L] for i in range(nb_docs)]

    rtok.encode_batch(big_docs(variant(text, 19)))  # warm size bucket
    t_bigb, out_bb = timed("encode_batch x512", rtok.encode_batch,
                           [big_docs(t) for t in big])
    assert out_bb[5] == rtok.encode(big_docs(big[0])[5])
    big_mb = sum(len(d.encode("utf-8")) for d in big_docs(big[0])) / 1e6
    big_docs_per_s = round(nb_docs / t_bigb, 1)
    big_mbps = round(big_mb / t_bigb, 3)

    def row(name, secs):
        v = MB / secs
        return {"metric": f"{name}_MBps_vocab512_taylorswift",
                "value": round(v, 4), "unit": "MB/s",
                "vs_baseline": round(v / (MB / BASE[name]), 2)}

    head = row("regex_train", t_regex_train)
    head["extra"] = [row("basic_train", t_basic_train),
                     row("regex_encode", t_regex_enc),
                     row("basic_encode", t_basic_enc),
                     row("decode", t_dec),
                     {"metric": "encode_batch_docs_per_s_vocab512",
                      "value": docs_per_s, "unit": "docs/s",
                      "n_docs": n_docs, "doc_bytes": L},
                     {"metric": "encode_batch_sweetspot_MBps_vocab512",
                      "value": big_mbps, "unit": "MB/s",
                      "docs_per_s": big_docs_per_s, "n_docs": nb_docs,
                      "batch_MB": round(big_mb, 2)}]
    head["warmup_s"] = round(warmup_s, 2)
    print(json.dumps(head))


if __name__ == "__main__":
    main()

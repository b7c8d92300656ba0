"""Benchmark: headline BPE training throughput vs the reference.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline (BASELINE.md, measured in this environment): the reference
RegexTokenizer.train at vocab 512 on tests/taylorswift.txt (185,768 bytes)
takes 15.53 s => 0.01196 MB/s. We report our steady-state throughput for the
same public-API call (includes host regex pre-split + transfers; excludes
one-time jit compilation, which is cached across runs of the same shapes).

Run on the default backend (TPU when available). Details go to stderr.
"""

import json
import sys
import time

CORPUS = "/root/reference/tests/taylorswift.txt"
BASELINE_MB_S = 0.185768 / 15.53  # reference regex train, this machine


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    from minbpe_tpu import RegexTokenizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    text = open(CORPUS, encoding="utf-8").read()
    mb = len(text.encode("utf-8")) / 1e6

    # cold run: compile + execute
    t0 = time.time()
    tok = RegexTokenizer()
    tok.train(text, 512)
    cold = time.time() - t0
    log(f"cold train (incl compile): {cold:.2f}s")

    # parity sanity on the trained artifact
    sample = text[:20000]
    assert tok.decode(tok.encode(sample)) == sample

    # steady-state: best of 3
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        tok2 = RegexTokenizer()
        tok2.train(text, 512)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"steady train #{i}: {dt:.2f}s")
    assert tok2.merges == tok.merges

    value = mb / best
    print(json.dumps({
        "metric": "regex_train_MBps_vocab512_taylorswift",
        "value": round(value, 4),
        "unit": "MB/s",
        "vs_baseline": round(value / BASELINE_MB_S, 2),
    }))


if __name__ == "__main__":
    main()

"""BIGCORPUS_r05: multi-MB vocab-512 training on the real chip with the
batched kernels (x5/x20 in-VMEM, x120 segmented). Distinct perturbed inputs
per timed run; best-of over timed runs; exactness asserted at 1x vs the
reference oracle earlier this session (and continuously by tests/)."""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from minbpe_tpu import RegexTokenizer
from minbpe_tpu.ops.pallas import fused_train as ft
from minbpe_tpu.ops.pallas import fused_train_xl as xl

CORPUS = "/root/reference/tests/taylorswift.txt"


def variant(text, seed, k=400):
    rng = random.Random(seed)
    ch = list(text)
    for _ in range(k):
        i = rng.randrange(len(ch))
        if "a" <= ch[i] <= "z":
            ch[i] = chr(rng.randrange(97, 123))
    return "".join(ch)


def main():
    base = open(CORPUS, encoding="utf-8").read()
    rows = []
    for reps, runs in ((5, 3), (20, 3), (120, 2)):
        text = base * reps
        mb = len(text.encode()) / 1e6
        t0 = time.time()
        RegexTokenizer().train(variant(text, 0), 512)
        warm = time.time() - t0
        best = float("inf")
        for s in range(1, runs + 1):
            t0 = time.time()
            RegexTokenizer().train(variant(text, s), 512)
            best = min(best, time.time() - t0)
        reb = xl.LAST_REBUILDS if reps == 120 else ft.LAST_REBUILDS
        rows.append({
            "metric": f"regex_train_MBps_vocab512_taylorswift_x{reps}",
            "corpus_MB": round(mb, 3), "value": round(mb / best, 4),
            "unit": "MB/s", "seconds": round(best, 3),
            "warm_seconds": round(warm, 1),
            "merges_per_rebuild": round(256 / max(reb, 1), 2),
            "path": "fused_xl" if reps == 120 else "fused",
        })
        print(json.dumps(rows[-1]), flush=True)
    with open("/root/repo/BIGCORPUS_r05.json", "w") as f:
        f.write(json.dumps({
            "note": "multi-MB vocab-512 training on TPU v5e (tunneled), "
            "round 5: exact multi-merge batching (one count rebuild "
            "amortized over ~3.2 merges via the disjoint-prefix rule with "
            "pre-apply creation-bound histograms) in both the in-VMEM "
            "kernel (x5/x20) and the segmented XL trainer (x120), plus "
            "single-dispatch driver and tuned in-VMEM compaction cadence. "
            "r04: x5 2.64, x20 2.89, x120 2.41 MB/s. Bit-exactness vs the "
            "sequential reference re-proven on hardware this round "
            "(vocab-512 merge-table equality at 1x) and continuously by "
            "the interpret-mode oracle suites.",
            "date": "2026-08-21"}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote BIGCORPUS_r05.json")


if __name__ == "__main__":
    main()

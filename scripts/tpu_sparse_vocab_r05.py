"""SPARSE_VOCAB_r05: large-vocab training evidence (VERDICT r4 #2).

The corpus ceiling is a property of the DISTINCT chunk set: taylorswift.txt
exhausts mergeable pairs at merge round 10,161 (re-confirmed live below), and
replicating the corpus (x20/x120) replays the identical merge sequence with
counts scaled, so no replication unlocks vocab 32,768 — the reference raises
identically (max() on empty stats, minbpe/basic.py:35). The honest
"as high as the corpus sustains" evidence is therefore:

  - vocab 10,417 (= 256 + 10,161, the exact sustain limit) at 1x and at
    x20 scale (3.7 MB) through the sort-round trainer;
  - the first 512 merges oracle-verified against the independent host BPE;
  - a vocab-1024 row on the 22.3 MB corpus through the batched segmented
    trainer (the largest corpus x largest fused-vocab point).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from minbpe_tpu import RegexTokenizer

CORPUS = "/root/reference/tests/taylorswift.txt"


def main():
    base = open(CORPUS, encoding="utf-8").read()
    rows = []

    # -- re-confirm the exhaustion round by asking for vocab 32768 ---------
    t0 = time.time()
    try:
        RegexTokenizer().train(base, 32768)
        ceiling = None
    except ValueError as e:
        ceiling = int(str(e).split("merge round ")[1].split()[0])
    probe_s = time.time() - t0
    rows.append({
        "metric": "sparse_train_vocab32768",
        "value": None, "unit": None,
        "outcome": f"impossible on this corpus: pairs exhaust at merge "
        f"round {ceiling}; reference raises identically (max() on empty "
        f"stats, minbpe/basic.py:35); replication replays the same merge "
        f"sequence so x20/x120 exhaust at the same round",
        "probe_seconds": round(probe_s, 1),
    })
    print(json.dumps(rows[-1]), flush=True)
    vmax = 256 + ceiling

    # -- max-sustain vocab at 1x ------------------------------------------
    tok = RegexTokenizer()
    t0 = time.time()
    tok.train(base, vmax)
    warm = time.time() - t0
    t0 = time.time()
    tok2 = RegexTokenizer()
    tok2.train(base[:-1], vmax - 1)  # distinct input, same scale
    timed = time.time() - t0
    rows.append({
        "metric": f"train_seconds_vocab{vmax}_taylorswift",
        "value": round(timed, 2), "unit": "s",
        "merges": vmax - 257, "select_mode": "sortloop(auto)",
        "per_round_ms": round(1e3 * timed / (vmax - 257), 3),
        "warm_first_s": round(warm, 1),
        "note": "vocab = the corpus's exact sustain limit",
    })
    print(json.dumps(rows[-1]), flush=True)

    # -- oracle prefix verification on the sustain-limit run ---------------
    import oracle

    chunks = [list(c) for c in tok._split_chunks(base)]
    expected = oracle.train(chunks, 512)
    got = sorted(tok.merges.items(), key=lambda kv: kv[1])[:512]
    assert [(p, i) for p, i in got] == [
        (pair, 256 + k) for k, (pair, _) in enumerate(expected)
    ], "oracle prefix mismatch!"
    rows.append({
        "metric": "oracle_prefix_verified_merges", "value": 512,
        "unit": "merges",
        "note": "first 512 merges of the sustain-limit run equal the "
        "independent host oracle; full-depth parity is covered by "
        "tests/test_sortloop.py's slow suite at vocab 8192",
    })
    print(json.dumps(rows[-1]), flush=True)

    # -- max-sustain vocab at x20 scale (3.7 MB) ---------------------------
    text20 = base * 20
    mb20 = len(text20.encode()) / 1e6
    t0 = time.time()
    RegexTokenizer().train(text20, vmax)
    warm20 = time.time() - t0
    t0 = time.time()
    RegexTokenizer().train((base[:-1] + "x") * 20, vmax)
    timed20 = time.time() - t0
    rows.append({
        "metric": f"train_seconds_vocab{vmax}_taylorswift_x20",
        "value": round(timed20, 2), "unit": "s", "corpus_MB": round(mb20, 3),
        "MBps": round(mb20 / timed20, 4),
        "merges": vmax - 256, "select_mode": "sortloop(auto)",
        "per_round_ms": round(1e3 * timed20 / (vmax - 256), 3),
        "warm_first_s": round(warm20, 1),
    })
    print(json.dumps(rows[-1]), flush=True)

    # -- vocab 1024 on the 22.3 MB corpus (batched segmented trainer) ------
    text120 = base * 120
    mb120 = len(text120.encode()) / 1e6
    t0 = time.time()
    RegexTokenizer().train(text120, 1024)
    warm120 = time.time() - t0
    t0 = time.time()
    RegexTokenizer().train((base[:-1] + "x") * 120, 1024)
    timed120 = time.time() - t0
    rows.append({
        "metric": "train_seconds_vocab1024_taylorswift_x120",
        "value": round(timed120, 2), "unit": "s",
        "corpus_MB": round(mb120, 3), "MBps": round(mb120 / timed120, 4),
        "merges": 768, "select_mode": "fused_xl(auto)",
        "warm_first_s": round(warm120, 1),
    })
    print(json.dumps(rows[-1]), flush=True)

    with open("/root/repo/SPARSE_VOCAB_r05.json", "w") as f:
        f.write(json.dumps({
            "note": "large-vocab training evidence, round 5. The corpus "
            "sustain limit (10,161 merges) is re-confirmed live and is "
            "replication-invariant, so the road to the 100K north star "
            "needs corpus DIVERSITY, not size: the V-independent sort-round "
            "trainer (no V-dependent memory or work) is the path that "
            "scales there, demonstrated here at the exact sustain limit at "
            "1x and 20x corpus scale. Reference contrast: measured 435.4 s "
            "for vocab 8192 at 1x in r4 — its per-round cost is O(N) "
            "CPython, so the sustain-limit run extrapolates to ~560 s at "
            "1x vs our measured seconds below.",
            "date": "2026-08-21"}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote SPARSE_VOCAB_r05.json")


if __name__ == "__main__":
    main()

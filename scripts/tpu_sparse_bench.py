"""TPU bench: sparse slot-table trainer at vocab 8K / 32K (VERDICT item 1).

Measures the public RegexTokenizer.train path and the raw drivers
(stepped vs whole-run fori_loop) on the real chip.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from minbpe_tpu import RegexTokenizer

    print("backend:", jax.default_backend(), flush=True)
    text = open("/root/reference/tests/taylorswift.txt",
                encoding="utf-8").read()
    mb = len(text.encode("utf-8")) / 1e6

    for vocab in (8192, 32768):
        t0 = time.time()
        tok = RegexTokenizer()
        try:
            tok.train(text, vocab, select_mode="sparse")
        except ValueError as e:
            print(f"vocab {vocab}: FAILED EARLY: {e}", flush=True)
            continue
        dt = time.time() - t0
        print(f"vocab {vocab} sparse stepped (cold): {dt:.2f}s "
              f"({mb/dt:.4f} MB/s), merges={len(tok.merges)}", flush=True)
        t0 = time.time()
        tok2 = RegexTokenizer()
        tok2.train(text, vocab, select_mode="sparse")
        dt = time.time() - t0
        print(f"vocab {vocab} sparse stepped (warm): {dt:.2f}s "
              f"({mb/dt:.4f} MB/s)", flush=True)
        assert tok2.merges == tok.merges

    # raw driver comparison at 8K: stepped vs single-dispatch fori_loop.
    # Gated behind --full: each extra unroll width is a fresh multi-minute
    # server-side compile on the tunneled backend (measured 2026-08-20:
    # >30 min for the unroll-64 program alone), for secondary data.
    if "--full" not in sys.argv:
        return
    from minbpe_tpu.ops import stream as st
    from minbpe_tpu.ops.train_sparse import (
        train_merges_sparse, train_merges_sparse_stepped,
    )
    chunks = RegexTokenizer()._split_chunks(text)
    ids, seg, n = st.pack_chunks(chunks)
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    M = 8192 - 256
    for unroll in (16, 64, 256):
        t0 = time.time()
        p, c, f = train_merges_sparse_stepped(*args, M, unroll=unroll)
        np.asarray(p)
        print(f"stepped unroll={unroll}: {time.time()-t0:.2f}s "
              f"(incl compile)", flush=True)
        t0 = time.time()
        p, c, f = train_merges_sparse_stepped(*args, M, unroll=unroll)
        np.asarray(p)
        print(f"stepped unroll={unroll}: {time.time()-t0:.2f}s (warm)",
              flush=True)
    t0 = time.time()
    p, c, f = train_merges_sparse(*args, M)
    np.asarray(p)
    print(f"fori_loop whole-run: {time.time()-t0:.2f}s (incl compile)",
          flush=True)
    t0 = time.time()
    p, c, f = train_merges_sparse(*args, M)
    np.asarray(p)
    print(f"fori_loop whole-run: {time.time()-t0:.2f}s (warm)", flush=True)


if __name__ == "__main__":
    main()

"""Scaling harness: distributed training throughput at 1..D shards.

On real multi-chip hardware this measures strong-scaling efficiency of the
data-parallel training path. On virtual CPU devices (one host, shared cores)
real speedup is physically impossible — every mesh size shares the same
silicon — so the meaningful statistic there is ``overhead_vs_1``: how much
wall time D-way sharding adds at fixed total compute (0 = the collectives,
halo exchange, and selection reduction are free). ``scaling_efficiency_vs_1``
is still reported for real-hardware runs. Results are asserted bit-identical
across mesh sizes. Prints one JSON line per mesh size to stdout.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py --vocab-size 512 --reps 8
"""

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # honor the caller's CPU request even though this environment's
    # sitecustomize registers a remote-TPU plugin whose register() overrides
    # the env var (same workaround as tests/conftest.py)
    import jax
    import jax._src.xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "tpu", "cuda", "rocm", "gpu", "METAL"):
            _xb._backend_factories.pop(_name, None)
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/root/reference/tests/taylorswift.txt")
    ap.add_argument("--vocab-size", type=int, default=512)
    ap.add_argument("--mesh-sizes", default=None,
                    help="comma-separated; default 1,2,4,...,num_devices")
    ap.add_argument("--reps", type=int, default=1,
                    help="corpus replication factor (larger = per-shard "
                    "work dominates fixed per-round costs)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    import jax.numpy as jnp

    from minbpe_tpu import RegexTokenizer
    from minbpe_tpu.parallel.train import (
        _finish_train, build_distributed_train, make_mesh, shard_chunks,
    )

    text = open(args.corpus, encoding="utf-8").read() * args.reps
    mb = len(text.encode("utf-8")) / 1e6
    num_merges = args.vocab_size - 256
    chunks = RegexTokenizer()._split_chunks(text)

    ndev = len(jax.devices())
    if args.mesh_sizes:
        sizes = [int(s) for s in args.mesh_sizes.split(",")]
    else:
        sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]

    def run_once(fn, ids, seg, lens):
        pairs, counts, fail, oflow = fn(
            jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens))
        return _finish_train(pairs, counts, fail, num_merges, False, oflow)

    base = None
    reference = None
    for d in sizes:
        mesh = make_mesh(d)
        ids, seg, lens = shard_chunks(chunks, d)
        # build ONCE per mesh: rebuilding the jit per call would re-trace
        # (and without the persistent cache, recompile) the whole program —
        # the r5 mesh=1 run initially measured 56 s/call of pure recompile
        fn = build_distributed_train(mesh, num_merges,
                                     256 + num_merges, ids.shape[0] // d)
        t0 = time.time()
        merges, _ = run_once(fn, ids, seg, lens)
        warm = time.time() - t0
        t0 = time.time()
        merges2, _ = run_once(fn, ids, seg, lens)
        dt = time.time() - t0
        if reference is None:
            reference = merges
        assert merges2 == reference, "sharded results diverged"
        if base is None:
            base = dt
        eff = base / (dt * d)
        print(json.dumps({
            "metric": "distributed_train_MBps",
            "mesh": d,
            "corpus_MB": round(mb, 3),
            "value": round(mb / dt, 4),
            "unit": "MB/s",
            "seconds": round(dt, 3),
            "warm_seconds": round(warm, 2),
            "scaling_efficiency_vs_1": round(eff, 3),
            "overhead_vs_1": round(dt / base - 1, 3),
            "results_identical": True,
        }), flush=True)
        print(f"mesh={d}: {dt:.3f}s ({mb/dt:.3f} MB/s), eff={eff:.2f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

"""Multi-host setup helpers.

A multi-host training run is the same ``shard_map`` program as single-host
(parallel/train.py) with the ``data`` axis spanning every chip in the pod
slice; collectives ride ICI within a slice and DCN across slices. The only
host-side differences are initialization and input feeding, wrapped here.

Typical launch (one process per host, same script everywhere):

    from minbpe_tpu.parallel import multihost
    multihost.initialize()                     # jax.distributed handshake
    mesh = multihost.global_mesh()             # all chips, ("data",)
    merges, vocab = multihost.train_chunks_global(chunks, 100_000 - 256, mesh)
"""

from __future__ import annotations

import jax

from .train import (
    make_mesh, shard_chunks, build_distributed_train, _finish_train,
)


def initialize(**kwargs):
    """jax.distributed.initialize passthrough (no-op if already set up or
    single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process run


def global_mesh():
    """1-D data mesh over every addressable chip in the job."""
    return make_mesh()


def train_chunks_global(chunks, num_merges, mesh=None, verbose=False):
    """Distributed training where every process holds the full chunk list
    (each host packs all shards; jax places per-device slices).

    For corpora too large to replicate on each host, pack shards per-host and
    assemble a global array with jax.make_array_from_process_local_data; the
    compiled program is identical.
    """
    import jax.numpy as jnp

    mesh = mesh if mesh is not None else global_mesh()
    D = mesh.devices.size
    ids, seg, lens = shard_chunks(chunks, D)
    Nl = ids.shape[0] // D
    fn = build_distributed_train(mesh, num_merges, 256 + num_merges, Nl)
    pairs, counts, fail, oflow = fn(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens)
    )
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)

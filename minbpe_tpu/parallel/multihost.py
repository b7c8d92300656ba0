"""Multi-host setup + input feeding.

A multi-host training run is the same ``shard_map`` program as single-host
(parallel/train.py) with the ``data`` axis spanning every chip in the pod
slice; collectives ride ICI within a slice and DCN across slices. The only
host-side differences are initialization and input feeding, wrapped here.

Typical launch (one process per host, same script everywhere):

    from minbpe_tpu.parallel import multihost
    multihost.initialize()                     # jax.distributed handshake
    mesh = multihost.global_mesh()             # all chips, ("data",)
    # small corpora: every host holds all chunks
    merges, vocab = multihost.train_chunks_global(chunks, 100_000 - 256, mesh)
    # large corpora: every host holds only ITS slice of the corpus
    merges, vocab = multihost.train_local_chunks_global(
        my_chunks, 100_000 - 256, mesh)

Both entry points run the identical compiled program; they differ only in how
the global (ids, seg, lens) arrays are assembled. Exactness across hosts holds
because per-round selection combines global counts (psum / all_gather) and the
tie-break uses global positions ``shard_index * shard_capacity + local_index``
— a monotone relabeling of corpus order independent of host boundaries —
while per-host segment ids are offset to a disjoint range per process so
chunks never alias across hosts (tests/test_driver_entry.py).
"""

from __future__ import annotations

import numpy as np
import jax

from .train import (
    make_mesh, shard_chunks, build_distributed_train, _finish_train,
)

# per-process segment-id block: chunk counts per host stay below this
SEG_BLOCK = 1 << 24


def initialize(**kwargs):
    """``jax.distributed.initialize`` with loud failure semantics: only the
    benign already-initialized case is swallowed; a real handshake failure
    (bad coordinator address, timeout) propagates."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # initialized earlier in this process: benign
        raise


def global_mesh():
    """1-D data mesh over every addressable chip in the job."""
    return make_mesh()


def train_chunks_global(chunks, num_merges, mesh=None, verbose=False,
                        selection: str = "dense"):
    """Distributed training where every process holds the full chunk list
    (each host packs all shards; jax places per-device slices). For corpora
    too large to replicate per host, use train_local_chunks_global."""
    import jax.numpy as jnp

    mesh = mesh if mesh is not None else global_mesh()
    D = mesh.devices.size
    ids, seg, lens = shard_chunks(chunks, D)
    Nl = ids.shape[0] // D
    fn = build_distributed_train(mesh, num_merges, 256 + num_merges, Nl,
                                 selection=selection)
    pairs, counts, fail, oflow = fn(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens)
    )
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)


def assemble_global_inputs(local_chunks, mesh, shard_capacity: int):
    """Pack THIS process's chunk list across its local devices and assemble
    the global (ids, seg, lens) arrays without ever materializing other
    hosts' data (``jax.make_array_from_process_local_data``).

    ``local_chunks`` must be the process's contiguous slice of the corpus, in
    corpus order, host slices ordered by process index (the standard sharded
    data-pipeline contract). ``shard_capacity`` must be agreed globally (all
    processes pass the same value — e.g. a fixed bucket for the pipeline's
    max shard size) so that array shapes and the compiled program match.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    D_local = jax.local_device_count()
    ids, seg, lens = shard_chunks(local_chunks, D_local)
    Nl = ids.shape[0] // D_local
    if Nl > shard_capacity:
        raise ValueError(
            f"local shards need capacity {Nl} > agreed {shard_capacity}; "
            "raise shard_capacity (it must match on every process)"
        )
    # repack into the agreed capacity + per-process disjoint segment ids
    ids2 = np.full((D_local, shard_capacity), -1, dtype=np.int32)
    seg2 = np.full((D_local, shard_capacity), -2, dtype=np.int32)
    ids = ids.reshape(D_local, Nl)
    seg = seg.reshape(D_local, Nl)
    ids2[:, :Nl] = ids
    base = jax.process_index() * SEG_BLOCK
    seg2[:, :Nl] = np.where(seg >= 0, seg + base, seg)

    D = mesh.devices.size
    sh_flat = NamedSharding(mesh, P("data"))
    gids = jax.make_array_from_process_local_data(
        sh_flat, ids2.reshape(-1), (D * shard_capacity,))
    gseg = jax.make_array_from_process_local_data(
        sh_flat, seg2.reshape(-1), (D * shard_capacity,))
    glens = jax.make_array_from_process_local_data(
        sh_flat, lens.astype(np.int32), (D,))
    return gids, gseg, glens


def train_local_chunks_global(local_chunks, num_merges, mesh=None,
                              verbose=False, selection: str = "dense",
                              shard_capacity: int | None = None):
    """Distributed training from per-host corpus slices: each process feeds
    only its own chunks; the compiled program is identical to the replicated
    path. ``shard_capacity`` defaults to a power-of-two bucket of the LOCAL
    max shard — fine single-process; multi-process callers must pass an
    agreed global value."""
    from ..ops.stream import bucket_capacity

    mesh = mesh if mesh is not None else global_mesh()
    if shard_capacity is None:
        total = sum(len(c) for c in local_chunks)
        per = max(1, -(-total // max(jax.local_device_count(), 1)))
        longest = max((len(c) for c in local_chunks), default=1)
        shard_capacity = bucket_capacity(per + longest)
    gids, gseg, glens = assemble_global_inputs(local_chunks, mesh,
                                               shard_capacity)
    fn = build_distributed_train(mesh, num_merges, 256 + num_merges,
                                 shard_capacity, selection=selection)
    pairs, counts, fail, oflow = fn(gids, gseg, glens)
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)

"""Chunk-sharded multi-device BPE encode over a JAX device mesh.

The sequence-parallel serving path SURVEY.md §2.3 names as the analogue of
the reference's per-chunk encode (minbpe/regex.py:111-121): regex chunks are
independent — merges never cross chunk boundaries — so sharding chunk-aligned
slices of the corpus over the ``data`` mesh axis needs NO halo exchange and
exactness is free. Each shard runs the single-device min-present-rank encode
loop (ops/encode.py) against the replicated dense rank table; the gathered
shard outputs concatenate in shard order to exactly
``tokenizer.encode_ordinary(text)``.

No collective appears inside the encode loop, so devices drain their shards
independently (no lockstep rounds); the only synchronization is the final
result gather. The dense rank table bounds this path to vocab <= ~4K
(engine.DENSE_VOCAB_MAX); the 100K-vocab serving path stays the single-device
flat-stream encoder (ops/flat_encode.py), whose cuckoo tables are also
replicable the same way if ever needed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.encode import RANK_INF
from ..ops.merge import apply_merge
from ..ops.select import pair_validity
from ..ops.stream import PAD
from .train import _nomesh, _varying, make_mesh, shard_chunks


def _encode_shard(ids, seg, n, rank_table, merge_pairs, merge_ids):
    """The ops/encode.py encode_stream loop in SPMD (shard_map) form: the
    only difference is that loop-carry literals are pcast to varying so the
    per-shard while_loop type-checks under manual sharding (each device
    drains its shard independently; no collective in the loop)."""
    V = rank_table.shape[0]

    def pair_ranks(ids, seg, n):
        valid, nxt_ids = pair_validity(ids, seg, n)
        ia = jnp.clip(ids, 0, V - 1)
        ib = jnp.clip(nxt_ids, 0, V - 1)
        return jnp.where(valid, rank_table[ia, ib], RANK_INF)

    def cond(state):
        return ~state[3]

    def body(state):
        ids, seg, n, _ = state
        r = jnp.min(pair_ranks(ids, seg, n))

        def apply(_):
            rr = jnp.minimum(r, merge_ids.shape[0] - 1)
            new_ids, new_seg, new_n, _ = apply_merge(
                ids, seg, n, merge_pairs[rr, 0], merge_pairs[rr, 1],
                merge_ids[rr])
            return new_ids, new_seg, new_n, _varying(jnp.bool_(False))

        def stop(_):
            return ids, seg, n, _varying(jnp.bool_(True))

        return jax.lax.cond(r == RANK_INF, stop, apply, None)

    state = (ids, seg, n, _varying(n < 2))
    ids, seg, n, _ = jax.lax.while_loop(cond, body, state)
    return ids, n


def build_distributed_encode(mesh: Mesh, shard_capacity: int):
    """Returns a jitted fn: (ids[D*Nl], seg[D*Nl], lens[D], rank_table[V,V],
    merge_pairs[M,2], merge_ids[M]) -> (out_ids[D*Nl], out_lens[D]).

    out_ids holds each shard's encoded tokens front-packed in its slice
    (PAD beyond out_lens[d]); concatenating the per-shard prefixes in shard
    order yields the exact single-device encode of the whole corpus."""
    Nl = shard_capacity

    def shard_body(ids, seg, lens, rank_table, merge_pairs, merge_ids):
        out_ids, out_n = _encode_shard(ids, seg, lens[0], rank_table,
                                       merge_pairs, merge_ids)
        idx = jnp.arange(Nl, dtype=jnp.int32)
        return jnp.where(idx < out_n, out_ids, PAD), out_n[None]

    if mesh.devices.size == 1:
        mapped = _nomesh(shard_body, (0, 0, 0, None, None, None))
    else:
        mapped = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P(), P()),
            out_specs=(P("data"), P("data")),
        )
    return jax.jit(mapped)


def encode_chunks_distributed(chunks: list[bytes], merge_pairs, merge_ids,
                              mesh: Mesh | None = None) -> np.ndarray:
    """Encode pre-split chunks across the mesh; returns int32 token ids
    identical to the single-device stream encode (and to the reference's
    per-chunk loop, minbpe/regex.py:111-121)."""
    from ..ops.encode import build_rank_table

    mesh = mesh if mesh is not None else make_mesh()
    D = mesh.devices.size
    merge_pairs = np.asarray(merge_pairs, np.int32)
    merge_ids = np.asarray(merge_ids, np.int32)
    V = 256 if len(merge_ids) == 0 else max(256, int(merge_ids.max()) + 1)
    if not chunks:
        return np.zeros(0, np.int32)
    ids, seg, lens = shard_chunks(chunks, D)
    Nl = ids.shape[0] // D
    table = build_rank_table(merge_pairs, V)
    if len(merge_pairs) == 0:  # keep gather shapes valid (engine.py:46)
        merge_pairs = np.zeros((1, 2), np.int32)
        merge_ids = np.zeros((1,), np.int32)
    fn = build_distributed_encode(mesh, Nl)
    out, out_lens = fn(jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens),
                       jnp.asarray(table), jnp.asarray(merge_pairs),
                       jnp.asarray(merge_ids))
    out = np.asarray(out).reshape(D, Nl)
    out_lens = np.asarray(out_lens)
    return np.concatenate([out[d, :out_lens[d]] for d in range(D)])


def encode_text_distributed(tokenizer, text: str,
                            mesh: Mesh | None = None) -> list[int]:
    """Sharded encode through a tokenizer's pattern + merge table (ignores
    special tokens, like encode_ordinary). Exactly equal to
    ``tokenizer.encode_ordinary(text)``."""
    if not text:
        return []
    chunks = tokenizer._split_chunks(text)
    pairs, new_ids = tokenizer._merge_arrays()
    return encode_chunks_distributed(chunks, pairs, new_ids,
                                     mesh=mesh).tolist()

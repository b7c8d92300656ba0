"""Bucketed chunk-parallel BPE encoder for large merge tables.

The stream encoder (ops/encode.py) iterates once per *distinct applied rank*
globally — ideal for small vocabularies, hopeless for cl100k-scale tables
where a document applies tens of thousands of distinct ranks. But chunks are
independent (minbpe/regex.py:96-121 encodes per chunk), so this encoder packs
chunks into a [rows, bucket_len] matrix and iterates per-ROW: each iteration,
every unfinished row merges all occurrences of its own current minimum-rank
pair (the same proven-equivalent rule, applied rowwise). Iteration count is
the MAX over rows of per-chunk distinct ranks — bounded by the bucket length,
~tens in practice — regardless of vocab size.

Pair ranks come from the sorted-table binary search (ops/ranktab.py); row
compaction is a stable per-row sort on the dead mask. Everything is static
shapes; buckets are powers of two to bound recompilation.

Production encode routes through the flat-stream encoder (ops/flat_encode.py)
instead; this module is kept as its independent differential oracle
(tests/test_flat_encode.py) — two structurally different implementations of
the same per-chunk min-rank loop cross-check each other.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from .stream import PAD
from .ranktab import SortedPairTable, RANK_INF

_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
MAX_BUCKET = _BUCKETS[-1]


def _bucket_len(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -1  # oversized: routed to the stream fallback


def _pad_rows(c: int) -> int:
    r = 8
    while r < c:
        r *= 2
    return r


def _encode_block(ids, lens, ka, kb, rank, merge_pairs, merge_ids, depth: int,
                  unroll: int = 8):
    """One bucket: ids[C, L] int32 (PAD past lens), lens[C] -> merged rows.

    Host-stepped: dispatches ``unroll`` per-row min-rank iterations at a time
    and checks the done flag between dispatches (device-side loop iterations
    are expensive on remotely-tunneled backends)."""
    done = jnp.bool_(False)
    while True:
        ids, lens, done = _encode_block_step(
            ids, lens, done, ka, kb, rank, merge_pairs, merge_ids, depth,
            unroll,
        )
        if bool(done):
            return ids, lens


@partial(jax.jit, static_argnames=("depth", "unroll"),
         donate_argnums=(0, 1, 2))
def _encode_block_step(ids, lens, done, ka, kb, rank, merge_pairs, merge_ids,
                       depth: int, unroll: int):
    C, L = ids.shape
    M = ka.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (C, L), 1)

    def lookup(a, b, valid):
        lo = jnp.zeros_like(a)
        hi = jnp.full_like(a, M - 1)
        for _ in range(depth + 1):
            mid = (lo + hi) >> 1
            ma = ka[mid]
            mb = kb[mid]
            less = (ma < a) | ((ma == a) & (mb < b))
            lo = jnp.where(less, jnp.minimum(mid + 1, M - 1), lo)
            hi = jnp.where(less, hi, mid)
        hit = (ka[lo] == a) & (kb[lo] == b) & valid
        return jnp.where(hit, rank[lo], jnp.int32(RANK_INF))

    def row_ranks(ids, lens):
        nxt = jnp.roll(ids, -1, axis=1)
        valid = pos + 1 < lens[:, None]
        return lookup(ids, nxt, valid)

    def body(state):
        ids, lens, _ = state
        ranks = row_ranks(ids, lens)
        rmin = jnp.min(ranks, axis=1)
        any_active = jnp.min(rmin) != RANK_INF

        def run(_):
            active = (rmin != RANK_INF)[:, None]
            match = (ranks == rmin[:, None]) & active
            m_prev = jnp.roll(match, 1, axis=1).at[:, 0].set(False)
            new_run = match & ~m_prev
            run_start = jax.lax.cummax(
                jnp.where(new_run, pos, -1), axis=1
            )
            keep = match & (((pos - run_start) & 1) == 0)
            rr = jnp.minimum(rmin, M - 1)
            nid = merge_ids[rr][:, None]
            new_ids = jnp.where(keep, nid, ids)
            killed = jnp.roll(keep, 1, axis=1).at[:, 0].set(False)
            # stable per-row compaction: dead slots sort to the end
            dead = killed | (pos >= lens[:, None])
            _, out_ids = jax.lax.sort(
                (dead.astype(jnp.int32), new_ids),
                dimension=1, num_keys=1, is_stable=True,
            )
            new_lens = lens - jnp.sum(keep.astype(jnp.int32), axis=1)
            out_ids = jnp.where(pos < new_lens[:, None], out_ids, PAD)
            return out_ids, new_lens, jnp.bool_(False)

        def stop(_):
            return ids, lens, jnp.bool_(True)

        return jax.lax.cond(any_active, run, stop, None)

    state = (ids, lens, done)
    for _ in range(unroll):
        state = body(state)
    return state


def encode_offsets_arrays(data: np.ndarray, ends: np.ndarray,
                          table: SortedPairTable):
    """Encode from (byte array, chunk-end offsets) — vectorized bucketing.

    Returns (flat int32 token array in corpus order, int64 per-chunk output
    lengths). Both bucket construction AND result assembly are numpy fancy
    indexing — no per-chunk Python objects or per-chunk .tolist() anywhere.
    """
    n_chunks = len(ends)
    if n_chunks == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int64)
    data = np.ascontiguousarray(data)
    starts = np.concatenate([[0], ends[:-1]]).astype(np.int64)
    lengths = (ends - starts).astype(np.int64)
    chunk_out_len = np.zeros(n_chunks, np.int64)
    bucket_results = []  # (chunk idxs, out_ids matrix)
    oversized_results = []  # (chunk idx, out array)

    # bucket id per chunk: first bucket >= length (oversized -> stream path)
    barr = np.asarray(_BUCKETS, dtype=np.int64)
    bidx = np.searchsorted(barr, lengths, side="left")
    oversized = np.nonzero(bidx >= len(barr))[0]
    for i in oversized.tolist():
        from .encode import encode_stream_sorted
        from .stream import pack_bytes
        ids0, seg0, n0 = pack_bytes(
            data[starts[i]:ends[i]].astype(np.uint8).tobytes()
        )
        out_ids, out_n = encode_stream_sorted(
            jnp.asarray(ids0), jnp.asarray(seg0), jnp.asarray(n0),
            table.ka, table.kb, table.rank,
            table.merge_pairs, table.merge_ids, table.depth,
        )
        arr = np.asarray(out_ids)[:int(out_n)]
        chunk_out_len[i] = len(arr)
        oversized_results.append((i, arr))

    for b in np.unique(bidx[bidx < len(barr)]).tolist():
        L = int(barr[b])
        idxs = np.nonzero((bidx == b) & (lengths > 0))[0]
        if len(idxs) == 0:
            continue
        C = _pad_rows(len(idxs))
        gather = starts[idxs, None] + np.arange(L)[None, :]
        mask = np.arange(L)[None, :] < lengths[idxs, None]
        mat = np.full((C, L), PAD, dtype=np.int32)
        mat[:len(idxs)] = np.where(
            mask, data[np.minimum(gather, len(data) - 1)].astype(np.int32), PAD
        )
        lens = np.zeros((C,), dtype=np.int32)
        lens[:len(idxs)] = lengths[idxs]
        out_ids, out_lens = _encode_block(
            jnp.asarray(mat), jnp.asarray(lens),
            table.ka, table.kb, table.rank,
            table.merge_pairs, table.merge_ids, table.depth,
        )
        out_ids = np.asarray(out_ids)[:len(idxs)]
        chunk_out_len[idxs] = np.asarray(out_lens)[:len(idxs)]
        bucket_results.append((idxs, out_ids))

    # vectorized reassembly in corpus order
    out_starts = np.concatenate([[0], np.cumsum(chunk_out_len)])
    flat = np.empty(int(out_starts[-1]), np.int32)
    for idxs, out_ids in bucket_results:
        L = out_ids.shape[1]
        pos = out_starts[idxs][:, None] + np.arange(L)[None, :]
        mask = np.arange(L)[None, :] < chunk_out_len[idxs][:, None]
        flat[pos[mask]] = out_ids[mask]
    for i, arr in oversized_results:
        flat[out_starts[i]:out_starts[i] + len(arr)] = arr
    return flat, chunk_out_len


def encode_offsets(data: np.ndarray, ends: np.ndarray,
                   table: SortedPairTable) -> list[int]:
    """List-of-ints form of encode_offsets_arrays (host API boundary)."""
    flat, _ = encode_offsets_arrays(data, ends, table)
    return flat.tolist()


def encode_chunk_list(chunks: list[bytes], table: SortedPairTable) -> list[int]:
    """Encode byte chunks against the merge table; returns concatenated ids
    in original chunk order."""
    if not chunks:
        return []
    # group chunk indices by bucket length
    buckets: dict[int, list[int]] = {}
    for i, c in enumerate(chunks):
        if len(c) == 0:
            continue
        buckets.setdefault(_bucket_len(max(len(c), 1)), []).append(i)

    results: dict[int, list[int]] = {}

    # chunks beyond the largest bucket (rare: pathological whitespace/letter
    # runs) go through the sorted-table stream encoder one by one
    oversized = buckets.pop(-1, [])
    if oversized:
        from .encode import encode_stream_sorted
        from .stream import pack_bytes
        for i in oversized:
            ids0, seg0, n0 = pack_bytes(chunks[i])
            out_ids, out_n = encode_stream_sorted(
                jnp.asarray(ids0), jnp.asarray(seg0), jnp.asarray(n0),
                table.ka, table.kb, table.rank,
                table.merge_pairs, table.merge_ids, table.depth,
            )
            results[i] = np.asarray(out_ids)[:int(out_n)].tolist()

    for L, idxs in sorted(buckets.items()):
        C = _pad_rows(len(idxs))
        mat = np.full((C, L), PAD, dtype=np.int32)
        lens = np.zeros((C,), dtype=np.int32)
        for r, i in enumerate(idxs):
            c = chunks[i]
            mat[r, :len(c)] = np.frombuffer(c, dtype=np.uint8)
            lens[r] = len(c)
        out_ids, out_lens = _encode_block(
            jnp.asarray(mat), jnp.asarray(lens),
            table.ka, table.kb, table.rank,
            table.merge_pairs, table.merge_ids, table.depth,
        )
        out_ids = np.asarray(out_ids)
        out_lens = np.asarray(out_lens)
        for r, i in enumerate(idxs):
            results[i] = out_ids[r, :out_lens[r]].tolist()

    out: list[int] = []
    for i in range(len(chunks)):
        out.extend(results.get(i, []))
    return out

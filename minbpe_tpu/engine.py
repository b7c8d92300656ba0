"""Host<->device glue: packs text into streams, runs the jitted train/encode
programs, and converts results back into the dict-of-merges API surface.

This is the seam between the reference-compatible host API (base.py subclasses)
and the TPU compute paths (minbpe_tpu.ops). All device round-trips happen here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops import stream as stream_ops
from .ops.train import train_merges
from .ops.encode import (
    build_rank_table, encode_stream_sorted, encode_stream_stepped,
)
from .ops.ranktab import SortedPairTable

# Above this vocab size the dense [V, V] rank table gives way to the sorted
# pair table + bucketed chunk encoder (cl100k is ~100K: dense would be 40 GB).
DENSE_VOCAB_MAX = 4096


class DeviceMergeTable:
    """Frozen merge table resident on device, cached per tokenizer."""

    def __init__(self, pairs: np.ndarray, new_ids: np.ndarray):
        # Table dimension covers every id that can appear mid-encode.
        self.vocab_size = 256 if len(new_ids) == 0 else max(256, int(new_ids.max()) + 1)
        self.kind = "dense" if self.vocab_size <= DENSE_VOCAB_MAX else "sorted"
        self.sorted_table = SortedPairTable(pairs, new_ids)
        if self.kind == "sorted":
            from .ops.ranktab import CuckooPairTable

            # large-vocab serving path: 2-probe hash lookups for the flat
            # encoder (ops/flat_encode.py)
            self.cuckoo = CuckooPairTable(pairs, new_ids)
        if self.kind == "dense":
            self.rank_table = jnp.asarray(build_rank_table(pairs, self.vocab_size))
        if len(pairs):
            self.merge_pairs = jnp.asarray(pairs)
            self.merge_ids = jnp.asarray(new_ids)
        else:
            # Keep shapes non-empty so gathers in the jitted program are valid.
            self.merge_pairs = jnp.zeros((1, 2), dtype=jnp.int32)
            self.merge_ids = jnp.zeros((1,), dtype=jnp.int32)


def device_table(tokenizer) -> DeviceMergeTable:
    if tokenizer._dev is None:
        pairs, new_ids = tokenizer._merge_arrays()
        tokenizer._dev = DeviceMergeTable(pairs, new_ids)
    return tokenizer._dev


def run_train(ids, seg, n, num_merges: int, verbose: bool = False,
              select_mode: str = "auto", checkpoint_path: str | None = None,
              checkpoint_every: int | None = None,
              resume_from: str | None = None,
              profile_dir: str | None = None, progress=None,
              raw=None, packer=None):
    """Run the compiled training loop; return the merges dict + vocab dict.

    Replicates reference bookkeeping (minbpe/basic.py:29-45): new ids are
    256+round, vocab entries are concatenations of the children's bytes, and
    verbose prints one line per round in the reference's format.

    select_mode "auto" picks the fused Pallas kernel when it applies, the
    host-stepped dense incremental-count loop for small vocabs, and the
    sparse slot-table incremental loop (ops/train_sparse.py) for large
    vocabs (all exact; "sort" remains available explicitly).
    Optional: resumable checkpoints (checkpoint_path/_every/resume_from),
    jax profiler traces (profile_dir), and a progress(done, total) callback.

    raw/packer: when the fused path was pre-selected (see _train_capacity),
    `raw` carries (padded uint8 bytes, int32 chunk ends, live length) so only
    ~1 wire byte per corpus byte crosses the host->device tunnel; `packer`
    lazily builds the (ids, seg, n) planes if a fallback path needs them.
    """
    import contextlib

    from .ops.train import DENSE_SELECT_MAX
    from .ops.train_inc import train_merges_incremental, train_merges_stepped
    from .ops.pallas.fused_train import FUSED_MAX_N, FUSED_MAX_V

    if select_mode == "auto":
        import jax

        V = 256 + num_merges
        if ids is None:
            N = int(raw[2])
        else:
            N = ids.shape[0] if hasattr(ids, "shape") else len(ids)
        from .ops.pallas.fused_train_xl import XL_MAX_N

        plain = (checkpoint_path is None and resume_from is None
                 and progress is None)
        can_fuse = (
            jax.default_backend() == "tpu"
            and V <= FUSED_MAX_V and N <= FUSED_MAX_N and plain
        )
        if can_fuse:
            # whole training loop in one Pallas kernel: state in VMEM,
            # zero per-round dispatch
            select_mode = "fused"
        elif (jax.default_backend() == "tpu" and V <= FUSED_MAX_V
              and N <= XL_MAX_N and plain and raw is not None):
            # beyond the VMEM ceiling: segmented fused trainer (HBM
            # segments swept by pallas grid with cross-segment carries)
            select_mode = "fused_xl"
        elif V <= DENSE_SELECT_MAX and N <= FUSED_MAX_N:
            # incremental-count stepping: no sort, no recount
            select_mode = "stepped"
        else:
            # large vocab or huge stream: sort-round loop — no V-dependent
            # memory/work at all, and only sort/scan primitives that stay
            # vectorized on TPU (ops/train_sortloop.py; the slot-table
            # "sparse" path remains available explicitly)
            select_mode = "sortloop"

    if profile_dir is not None:
        import jax

        prof = jax.profiler.trace(profile_dir)
    else:
        prof = contextlib.nullcontext()

    with prof:
        if select_mode == "fused":
            from .ops.pallas.fused_train import (
                train_merges_fused, train_merges_fused_bytes,
            )

            try:
                if raw is not None:
                    pairs, counts, fail_round = train_merges_fused_bytes(
                        raw[0], raw[1], int(raw[2]), num_merges
                    )
                else:
                    pairs, counts, fail_round = train_merges_fused(
                        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
                        num_merges
                    )
                select_mode = "done"
            except Exception as e:  # kernel compile/runtime issue: fall back
                import sys

                print(f"minbpe_tpu: fused trainer unavailable ({e!r:.200}); "
                      "falling back to stepped", file=sys.stderr)
                select_mode = "stepped"
        if select_mode == "fused_xl":
            from .ops.pallas.fused_train_xl import train_merges_fused_xl

            try:
                pairs, counts, fail_round = train_merges_fused_xl(
                    raw[0], raw[1], int(raw[2]), num_merges
                )
                select_mode = "done"
            except Exception as e:  # kernel issue: fall back to sort loop
                import sys

                print(f"minbpe_tpu: segmented fused trainer unavailable "
                      f"({e!r:.200}); falling back to sortloop",
                      file=sys.stderr)
                select_mode = "sortloop"
        if select_mode != "done" and ids is None:
            ids, seg, n = packer()
        if select_mode == "done":
            pass
        elif select_mode == "stepped":
            pairs, counts, fail_round = train_merges_stepped(
                ids, seg, n, num_merges,
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every,
                resume_from=resume_from, progress=progress,
            )
        elif select_mode == "incremental":
            pairs, counts, fail_round = train_merges_incremental(
                jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), num_merges
            )
        elif select_mode == "sortloop":
            from .ops.train_sortloop import train_merges_sortloop_stepped

            pairs, counts, fail_round = train_merges_sortloop_stepped(
                ids, seg, n, num_merges,
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every,
                resume_from=resume_from, progress=progress,
            )
        elif select_mode == "sortloop_inc":
            from .ops.train_sortloop import train_merges_sortloop

            pairs, counts, fail_round = train_merges_sortloop(
                jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), num_merges
            )
        elif select_mode == "sparse":
            from .ops.train_sparse import train_merges_sparse_stepped

            pairs, counts, fail_round = train_merges_sparse_stepped(
                ids, seg, n, num_merges,
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every,
                resume_from=resume_from, progress=progress,
            )
        elif select_mode == "sparse_inc":
            from .ops.train_sparse import train_merges_sparse

            pairs, counts, fail_round = train_merges_sparse(
                jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), num_merges
            )
        else:
            pairs, counts, fail_round = train_merges(
                jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), num_merges,
                select_mode=select_mode,
            )
    pairs = np.asarray(pairs)
    counts = np.asarray(counts)
    fail_round = int(fail_round)
    if fail_round < num_merges:
        raise ValueError(
            f"no mergeable pair available at merge round {fail_round} "
            f"(requested {num_merges} merges); corpus is too small"
        )

    merges: dict[tuple[int, int], int] = {}
    vocab = {idx: bytes([idx]) for idx in range(256)}
    for i in range(num_merges):
        pair = (int(pairs[i, 0]), int(pairs[i, 1]))
        idx = 256 + i
        merges[pair] = idx
        vocab[idx] = vocab[pair[0]] + vocab[pair[1]]
        if verbose:
            print(
                f"merge {i+1}/{num_merges}: {pair} -> {idx} ({vocab[idx]}) "
                f"had {int(counts[i])} occurrences"
            )
    return merges, vocab


def encode_packed(tokenizer, ids, seg, n) -> list[int]:
    """Encode a packed stream with the tokenizer's frozen merge table."""
    import jax

    dev = device_table(tokenizer)
    if dev.kind == "dense":
        from .ops.pallas.fused_encode import (
            encode_fused, FUSED_ENCODE_MAX_N, FUSED_ENCODE_MAX_M,
        )

        M = int(dev.merge_ids.shape[0])
        if (jax.default_backend() == "tpu" and M <= FUSED_ENCODE_MAX_M
                and ids.shape[0] <= FUSED_ENCODE_MAX_N):
            out = encode_fused(ids, seg, n, dev.merge_pairs, dev.merge_ids)
            return out.tolist()
        out_ids, out_n = encode_stream_stepped(
            jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
            dev.rank_table, dev.merge_pairs, dev.merge_ids,
        )
    else:
        t = dev.sorted_table
        out_ids, out_n = encode_stream_sorted(
            jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
            t.ka, t.kb, t.rank, t.merge_pairs, t.merge_ids, t.depth,
        )
    return stream_ops.unpack_ids(np.asarray(out_ids), int(out_n))


def _device_split_mode(tokenizer) -> str | None:
    """"gpt4"/"gpt2" when the tokenizer's pattern has a device pre-splitter."""
    from .regex import GPT2_SPLIT_PATTERN, GPT4_SPLIT_PATTERN

    pattern = getattr(tokenizer, "pattern", None)
    return {GPT4_SPLIT_PATTERN: "gpt4", GPT2_SPLIT_PATTERN: "gpt2"}.get(
        pattern)


def encode_text_device_split(tokenizer, text: str) -> list[int] | None:
    """Whole-front-half-on-device encode: ship ONLY the raw UTF-8 bytes; the
    pre-split (ops/device_presplit.py), plane build, and fused merge sweep
    all run on device. Returns None when the configuration doesn't qualify
    (caller falls back to the host-split path).

    Opt-in (``tokenizer.device_presplit = True``): measured on a tunneled
    v5e at 186 KB, the orbit's ~18 gather/scatter rounds cost more device
    time than the native host scanner + offsets wire traffic it replaces
    (~125 ms vs ~60 ms end-to-end), so the host scan stays the default. The
    path exists for hosts without the C++ scanner and for pipelines whose
    bytes already live on device."""
    import jax

    if not getattr(tokenizer, "device_presplit", False):
        return None
    mode = _device_split_mode(tokenizer)
    if mode is None or jax.default_backend() != "tpu":
        return None
    dev = device_table(tokenizer)
    if dev.kind != "dense":
        return None
    from .ops.pallas.fused_encode import (
        FUSED_ENCODE_MAX_M, FUSED_ENCODE_MAX_N, encode_fused_planes,
    )
    from .ops.pallas.fused_train import fused_capacity
    from .ops.device_presplit import presplit_seg_ids

    raw = text.encode("utf-8")
    n = len(raw)
    M = int(dev.merge_ids.shape[0])
    if n == 0:
        return []
    if M > FUSED_ENCODE_MAX_M or n > FUSED_ENCODE_MAX_N:
        return None
    cap = fused_capacity(n)  # bucketed -> bounded compile count
    data = np.zeros((cap,), np.uint8)
    data[:n] = np.frombuffer(raw, np.uint8)
    data = jnp.asarray(data)
    _, seg = presplit_seg_ids(data, n, mode)
    out = encode_fused_planes(data, seg, n, dev.merge_pairs, dev.merge_ids)
    return out.tolist()


def encode_bytes(tokenizer, data: bytes) -> list[int]:
    """Encode raw bytes as a single segment (BasicTokenizer path)."""
    if len(data) == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    ends = np.array([len(data)], dtype=np.int32)
    return encode_offsets(tokenizer, arr, ends)


def encode_offsets(tokenizer, data, ends) -> list[int]:
    """Encode a (byte array, chunk-end offsets) pair — the vectorized path."""
    import jax

    if data.shape[0] == 0:
        return []
    dev = device_table(tokenizer)
    if dev.kind == "sorted":
        from .ops import flat_encode

        return flat_encode.encode_offsets(data, ends, dev.cuckoo)
    if dev.kind == "dense":
        from .ops.pallas.fused_encode import (
            encode_fused_bytes, FUSED_ENCODE_MAX_N, FUSED_ENCODE_MAX_M,
        )

        M = int(dev.merge_ids.shape[0])
        if (jax.default_backend() == "tpu" and M <= FUSED_ENCODE_MAX_M
                and data.shape[0] <= FUSED_ENCODE_MAX_N):
            from .ops.pallas.fused_train import fused_capacity

            # ship raw bytes + u16 chunk lengths into a SIZE-BUCKETED
            # program (unbucketed arrays would compile per corpus size);
            # the result comes back device-compacted in int16
            n = int(data.shape[0])
            d, e, _ = _pack_raw(data, np.asarray(ends), fused_capacity(n))
            out = encode_fused_bytes(d, e, n,
                                     dev.merge_pairs, dev.merge_ids)
            return out.tolist()
    ids, seg, n = stream_ops.pack_offsets(data, ends)
    return encode_packed(tokenizer, ids, seg, n)


def encode_parts(tokenizer, parts: list) -> list:
    """Encode several independent pre-split documents in as few device
    programs as possible. ``parts`` is a list of (byte array, chunk-end
    offsets) pairs; returns one numpy int32 token array per part, in order.

    This is the batched back-end of special-token encode
    (minbpe/regex.py:152-163 dispatches one encode per text part between
    specials; here every part rides ONE device program):
    - fused dense route: parts are concatenated into one stream (chunk ends
      shifted per part) and the tombstoned result plane is split at part
      byte boundaries host-side (flat positions map 1:1 to input bytes);
    - sorted-table route: one bucketed chunk-encode over the concatenation,
      split at part chunk boundaries via the per-chunk output lengths.
    """
    import jax

    parts = [(d, e) for (d, e) in parts]
    if not parts:
        return []
    sizes = [int(d.shape[0]) for d, _ in parts]
    if sum(sizes) == 0:
        return [np.zeros(0, np.int32) for _ in parts]
    offs = np.cumsum([0] + sizes)
    data = np.concatenate([np.asarray(d, dtype=np.uint8) for d, _ in parts])
    ends = np.concatenate(
        [np.asarray(e, dtype=np.int64) + offs[k]
         for k, (_, e) in enumerate(parts)]
    )
    dev = device_table(tokenizer)
    if dev.kind == "sorted":
        from .ops import flat_encode

        flat, chunk_lens = flat_encode.encode_offsets_arrays(
            data, ends, dev.cuckoo)
        out_starts = np.concatenate([[0], np.cumsum(chunk_lens)])
        cum_chunks = np.cumsum([0] + [len(e) for _, e in parts])
        return [
            flat[out_starts[cum_chunks[k]]:out_starts[cum_chunks[k + 1]]]
            for k in range(len(parts))
        ]
    from .ops.pallas.fused_encode import (
        encode_fused_bytes_vals, FUSED_ENCODE_MAX_N, FUSED_ENCODE_MAX_M,
    )

    M = int(dev.merge_ids.shape[0])
    if (jax.default_backend() == "tpu" and M <= FUSED_ENCODE_MAX_M
            and data.shape[0] <= FUSED_ENCODE_MAX_N):
        from .ops.pallas.fused_train import fused_capacity

        n = int(data.shape[0])
        d, e, _ = _pack_raw(data, np.asarray(ends), fused_capacity(n))
        vals = encode_fused_bytes_vals(d, e, n,
                                       dev.merge_pairs, dev.merge_ids)
        return [
            v[v >= 0].astype(np.int32)
            for v in (vals[offs[k]:offs[k + 1]] for k in range(len(parts)))
        ]
    # fallback (non-TPU dense): one program per part
    return [np.asarray(encode_offsets(tokenizer, d, e), dtype=np.int32)
            for d, e in parts]


def _train_capacity(n: int, num_merges: int, opts) -> int | None:
    """Padded capacity for a training stream: fine-grained buckets when the
    fused whole-training kernel will take it (its per-round cost scales with
    the padded size, so power-of-two padding is up to 2x wasted work);
    None = default power-of-two bucketing."""
    import jax

    from .ops.pallas.fused_train import (
        FUSED_MAX_N, FUSED_MAX_V, fused_capacity,
    )
    from .ops.pallas.fused_train_xl import SEG_TOKENS, XL_MAX_N

    plain = (opts.get("select_mode", "auto") in ("auto", "fused", "fused_xl")
             and jax.default_backend() == "tpu"
             and 256 + num_merges <= FUSED_MAX_V
             and opts.get("checkpoint_path") is None
             and opts.get("resume_from") is None
             and opts.get("progress") is None)
    if plain and n <= FUSED_MAX_N:
        return fused_capacity(n)
    if plain and n <= XL_MAX_N:
        return -(-n // SEG_TOKENS) * SEG_TOKENS  # segment-aligned
    return None


def _pack_raw(data: np.ndarray, ends: np.ndarray, cap: int):
    """Pad corpus bytes + chunk boundaries for the fused-from-bytes trainer:
    uint8 data to the stream capacity, boundaries to an /8-octave bucket.

    Boundaries ship as a PACKED BITMASK (uint8, bit p set iff a chunk
    ends at offset p + 1): 1 bit per corpus byte — ~6x less wire than the
    earlier uint16 chunk lengths at ~3-byte GPT chunks, no chunk-length
    limit, and a fixed cap//8 length (no separate bucketing)."""
    n = int(data.shape[0])
    d = np.zeros(cap, dtype=np.uint8)
    d[:n] = data
    flags = np.zeros(cap, dtype=np.uint8)
    ei = np.asarray(ends, dtype=np.int64)
    flags[ei - 1] = 1
    return d, np.packbits(flags), np.int32(n)


def train_offsets(data, ends, num_merges: int, verbose: bool = False, **opts):
    cap = _train_capacity(int(data.shape[0]), num_merges, opts)
    if cap is not None:
        raw = _pack_raw(data, ends, cap)
        return run_train(
            None, None, None, num_merges, verbose, raw=raw,
            packer=lambda: stream_ops.pack_offsets(data, ends, capacity=cap),
            **opts)
    ids, seg, n = stream_ops.pack_offsets(data, ends)
    return run_train(ids, seg, n, num_merges, verbose, **opts)


def train_bytes(data: bytes, num_merges: int, verbose: bool = False, **opts):
    arr = np.frombuffer(data, dtype=np.uint8)
    ends = np.asarray([len(data)], dtype=np.int64) if len(data) else \
        np.zeros(0, dtype=np.int64)
    return train_offsets(arr, ends, num_merges, verbose, **opts)

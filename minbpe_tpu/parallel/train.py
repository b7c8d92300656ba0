"""Data-parallel distributed BPE training over a JAX device mesh.

The reference is single-threaded CPython (SURVEY.md §2.3); this module is the
TPU-native scaling design it lacks:

- corpus chunks are sharded across a 1-D ``data`` mesh axis (chunks never
  straddle shards, so the Regex-path invariant "merges never cross chunk
  boundaries", minbpe/regex.py:44, also guarantees no cross-shard pairs);
- the merge table is replicated (tiny);
- per-round pair counts are combined with ``jax.lax.psum`` and the
  first-occurrence tie-break positions with ``jax.lax.pmin`` — so selection is
  bit-identical to the single-device sort-based path and to the reference;
- merge application + compaction happen shard-locally.

Three exact selection implementations (selection="dense"|"sparse"|"owner"):
- dense: psum'd [V, V] count/min-position matrices — right up to vocab ~8K;
- sparse: sorted per-shard distinct-pair run summaries merged across shards
  via all_gather — no V^2 memory anywhere, exact at 100K+ vocab, with loud
  (never silent) per-shard capacity overflow detection;
- owner: owner-sharded keyspace — summaries routed to per-pair owner devices
  (hash % D) over an all_to_all, merged at the owner, D champions gathered.
  Replicates O(D) scalars instead of O(D*K) summaries: the large-mesh mode.
See parallel/README.md for the scaling analysis.

Global first-occurrence positions are ``shard_index * shard_capacity +
local_index`` — a strictly monotone relabeling of the concatenated corpus
order, so relative order (all the tie-break needs) is preserved.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.stream import PAD, PAD_SEG, bucket_capacity
from ..ops.merge import compact

INT32_MAX = 2**31 - 1  # plain int: module import must not touch a backend


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_chunks(chunks: list[bytes], n_shards: int):
    """Pack chunks into n_shards contiguous, chunk-aligned shards.

    Returns (ids[D*Nl], seg[D*Nl], lens[D]) where Nl is the per-shard
    capacity. Chunks keep corpus order; shard boundaries fall between chunks.
    """
    total = sum(len(c) for c in chunks)
    target = max(1, -(-total // n_shards))
    shards: list[list[bytes]] = [[] for _ in range(n_shards)]
    fill = 0
    si = 0
    for c in chunks:
        if fill + len(c) > target and fill > 0 and si < n_shards - 1:
            si += 1
            fill = 0
        shards[si].append(c)
        fill += len(c)

    lens = np.array([sum(len(c) for c in s) for s in shards], dtype=np.int32)
    Nl = bucket_capacity(int(lens.max()) if len(chunks) else 1)
    ids = np.full((n_shards, Nl), PAD, dtype=np.int32)
    seg = np.full((n_shards, Nl), PAD_SEG, dtype=np.int32)
    g = 0  # global chunk counter -> segment id
    for d, s in enumerate(shards):
        pos = 0
        for c in s:
            ids[d, pos:pos + len(c)] = np.frombuffer(c, dtype=np.uint8)
            seg[d, pos:pos + len(c)] = g
            pos += len(c)
            g += 1
    return ids.reshape(-1), seg.reshape(-1), lens


def _local_pair_stats(ids, seg, n, gpos_base, V, halo_id, halo_seg, halo_ok):
    """Dense per-shard (count, min-global-position) matrices, OOB-dropped.

    Includes the cross-shard boundary pair (last local token, next shard's
    first token) when the halo is valid and in the same segment — the 1-token
    halo called out in SURVEY.md §2.3 for the unsegmented Basic path.
    """
    Nl = ids.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    nxt_ids = jnp.roll(ids, -1)
    nxt_seg = jnp.roll(seg, -1)
    valid = (idx + 1 < n) & (seg == nxt_seg)
    ia = jnp.where(valid, ids, V)  # V is out of bounds -> dropped
    ib = jnp.where(valid, nxt_ids, V)
    counts = jnp.zeros((V, V), jnp.int32).at[ia, ib].add(1, mode="drop")
    minpos = jnp.full((V, V), INT32_MAX, jnp.int32).at[ia, ib].min(
        gpos_base + idx, mode="drop"
    )
    # boundary pair (left token is ours, partner lives on the next shard)
    lastpos = jnp.maximum(n - 1, 0)
    bvalid = halo_ok & (n > 0) & (seg[lastpos] == halo_seg)
    ba = jnp.where(bvalid, ids[lastpos], V)
    bb = jnp.where(bvalid, halo_id, V)
    counts = counts.at[ba, bb].add(1, mode="drop")
    minpos = minpos.at[ba, bb].min(gpos_base + lastpos, mode="drop")
    return counts, minpos


def _varying(x):
    """Mark a per-shard-computed value as varying over the data axis
    (idempotent: no-op when it already is)."""
    try:
        return jax.lax.pcast(x, ("data",), to="varying")
    except ValueError:
        return x


def _halo_exchange(ids, seg, n, n_shards):
    """Each shard receives the first token of the nearest NON-EMPTY shard to
    its right (multi-hop 1-token halo, exact even across empty shards)."""
    D = n_shards
    firsts = jax.lax.all_gather(ids[0], "data")
    fsegs = jax.lax.all_gather(seg[0], "data")
    nons = jax.lax.all_gather(n > 0, "data")
    d = jax.lax.axis_index("data")
    ar = jnp.arange(D, dtype=jnp.int32)
    cand = jnp.where(nons & (ar > d), ar, D)
    j = jnp.min(cand)
    halo_ok = j < D
    jc = jnp.minimum(j, D - 1)
    return firsts[jc], fsegs[jc], halo_ok


def _extended_keep(ids, seg, n, pa, pb, halo_id, halo_seg, halo_ok):
    """Match + left-first keep masks over local pairs PLUS the boundary pair,
    under both possible carry-ins from the left shard.

    Returns (keep0, keep1, co0, co1): keep masks for carry-in 0/1 (index
    n-1 is the boundary pair's keep), and the boundary-pair keep bit under
    each carry-in (the shard's 2-state transfer function).
    """
    Nl = ids.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    nxt_ids = jnp.roll(ids, -1)
    nxt_seg = jnp.roll(seg, -1)
    valid = (idx + 1 < n) & (seg == nxt_seg)
    m_int = valid & (ids == pa) & (nxt_ids == pb)
    lastpos = jnp.maximum(n - 1, 0)
    bvalid = halo_ok & (n > 0) & (seg[lastpos] == halo_seg)
    bm = bvalid & (ids[lastpos] == pa) & (halo_id == pb)
    m = jnp.where(idx == n - 1, bm, m_int)
    m_prev = jnp.roll(m, 1).at[0].set(False)
    new_run = m & ~m_prev
    run_start = jax.lax.cummax(jnp.where(new_run, idx, -1))
    off = idx - run_start
    keep0 = m & ((off & 1) == 0)
    # carry-in = 1: the pair just left of our first token was kept, so the
    # run that starts at index 0 (if any) has its parity flipped
    in_first_run = m & (run_start == 0) & m[0]
    keep1 = jnp.where(in_first_run, m & ((off & 1) == 1), keep0)
    # transfer function carry_in -> carry_out: carry_out is whether the pair
    # immediately left of the NEXT shard's first token was kept. For a
    # non-empty shard that pair is our boundary pair; for an empty shard the
    # incoming carry passes through unchanged (identity transfer).
    co0 = (n > 0) & keep0[lastpos] & bm
    co1 = jnp.where(n > 0, keep1[lastpos] & bm, True)
    return keep0, keep1, co0, co1


def _local_run_summaries(ids, seg, n, gpos_base, K, halo_id, halo_seg,
                         halo_ok):
    """Per-shard distinct-pair summaries for the sparse (large-vocab)
    selection: sorted-run compaction of local pairs (incl. the boundary
    pair) into fixed (K,) arrays of (pa, pb, count, minpos).

    Returns (pa, pb, cnt, pos, overflow): entries past the distinct-pair
    count hold INT32_MAX sentinels; overflow flags n_runs > K.
    """
    Nl = ids.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    nxt_ids = jnp.roll(ids, -1)
    nxt_seg = jnp.roll(seg, -1)
    valid = (idx + 1 < n) & (seg == nxt_seg)
    lastpos = jnp.maximum(n - 1, 0)
    bvalid = halo_ok & (n > 0) & (seg[lastpos] == halo_seg)

    ka = jnp.concatenate([
        jnp.where(valid, ids, INT32_MAX),
        jnp.where(bvalid, ids[lastpos], INT32_MAX)[None],
    ])
    kb = jnp.concatenate([
        jnp.where(valid, nxt_ids, INT32_MAX),
        jnp.where(bvalid, halo_id, INT32_MAX)[None],
    ])
    pos = jnp.concatenate([gpos_base + idx, (gpos_base + lastpos)[None]])
    NE = Nl + 1
    sa, sb, sp = jax.lax.sort((ka, kb, pos), num_keys=3, is_stable=False)

    j = jnp.arange(NE, dtype=jnp.int32)
    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head = ((sa != prev_sa) | (sb != prev_sb)) & (sa != INT32_MAX)
    marker = jnp.where(head | (sa == INT32_MAX), j, NE)
    next_start = jnp.roll(jax.lax.cummin(marker, reverse=True), -1)
    next_start = next_start.at[NE - 1].set(NE)
    run_len = jnp.where(head, next_start - j, 0)

    # compact run heads into (K,) slots
    hcount = jnp.cumsum(head.astype(jnp.int32))
    n_runs = hcount[NE - 1]
    g = jnp.searchsorted(hcount, jnp.arange(1, K + 1, dtype=jnp.int32),
                         side="left")
    g = jnp.minimum(g, NE - 1)
    slot = jnp.arange(K, dtype=jnp.int32)
    have = slot < n_runs
    return (
        jnp.where(have, sa[g], INT32_MAX),
        jnp.where(have, sb[g], INT32_MAX),
        jnp.where(have, run_len[g], 0),
        jnp.where(have, sp[g], INT32_MAX),
        n_runs > K,
    )


def _sparse_global_select(lpa, lpb, lcnt, lpos, K, D):
    """Merge per-shard run summaries into the exact global argmax pair."""
    ga = jax.lax.all_gather(lpa, "data").reshape(-1)
    gb = jax.lax.all_gather(lpb, "data").reshape(-1)
    gc = jax.lax.all_gather(lcnt, "data").reshape(-1)
    gp = jax.lax.all_gather(lpos, "data").reshape(-1)
    T = D * K
    sa, sb, sp, sc = jax.lax.sort((ga, gb, gp, gc), num_keys=3,
                                  is_stable=False)
    j = jnp.arange(T, dtype=jnp.int32)
    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head = ((sa != prev_sa) | (sb != prev_sb)) & (sa != INT32_MAX)
    marker = jnp.where(head | (sa == INT32_MAX), j, T)
    next_start = jnp.roll(jax.lax.cummin(marker, reverse=True), -1)
    next_start = next_start.at[T - 1].set(T)
    csum = jnp.cumsum(sc)
    csum_prev = jnp.roll(csum, 1).at[0].set(0)
    # total count of the run starting at j: csum[next_start-1] - csum[j-1]
    total = jnp.where(
        head,
        csum[jnp.maximum(next_start - 1, 0)] - csum_prev,
        0,
    )
    maxc = jnp.max(total)
    tied = head & (total == maxc)
    best_pos = jnp.min(jnp.where(tied, sp, INT32_MAX))
    best_j = jnp.argmax(tied & (sp == best_pos))
    return sa[best_j], sb[best_j], maxc, maxc > 0


def _owner_global_select(lpa, lpb, lcnt, lpos, K, Kb, D):
    """Owner-sharded exact selection for large meshes: pair (a, b) is owned
    by device ``hash(a, b) % D``; every shard routes its distinct-pair
    summaries to their owners with a fixed-capacity ``all_to_all``, each
    owner merges the full count/min-position for the keys it owns and emits
    one champion, and an ``all_gather`` of the D champions yields the exact
    global argmax with the first-occurrence tie-break.

    Exact because every occurrence of a pair reaches exactly one owner, so
    each pair's total count and min position live complete at that owner,
    and the champion-of-champions is the true argmax. No top-K approximation;
    per-(shard, owner) bucket overflow (> Kb entries) is flagged loudly.

    Communication per round: D*Kb*16 bytes per shard over the all_to_all
    (Kb ~ K/D with skew margin) vs the sparse path's D*K*16 replicated
    all_gather — the right trade when D is large.

    Returns (pa, pb, maxc, any_pair, overflow_local).
    """
    j = jnp.arange(K, dtype=jnp.int32)
    valid = lpa != INT32_MAX
    # multiplicative hash mod D; int32 wraparound is deterministic and
    # jnp.remainder is non-negative for positive D. Invalid slots -> D
    # (dropped by the scatter below).
    owner = jnp.where(valid,
                      jnp.remainder(lpa * jnp.int32(1000003) + lpb,
                                    jnp.int32(D)),
                      jnp.int32(D))
    so, sa, sb, sc, sp = jax.lax.sort((owner, lpa, lpb, lcnt, lpos),
                                      num_keys=1, is_stable=False)
    # rank within the owner's run -> bucket slot
    head = so != jnp.roll(so, 1).at[0].set(-1)
    run_start = jax.lax.cummax(jnp.where(head, j, -1))
    rank = j - run_start
    ok = (so < D) & (rank < Kb)
    overflow = jnp.any((so < D) & (rank >= Kb))
    dest = jnp.where(ok, so * Kb + rank, D * Kb)  # oob index -> dropped
    buf_a = jnp.full((D * Kb,), INT32_MAX, jnp.int32).at[dest].set(
        sa, mode="drop")
    buf_b = jnp.full((D * Kb,), INT32_MAX, jnp.int32).at[dest].set(
        sb, mode="drop")
    buf_c = jnp.zeros((D * Kb,), jnp.int32).at[dest].set(sc, mode="drop")
    buf_p = jnp.full((D * Kb,), INT32_MAX, jnp.int32).at[dest].set(
        sp, mode="drop")

    # route bucket d to device d; receive (D, Kb) keyed by source shard
    recv = [
        jax.lax.all_to_all(x.reshape(D, Kb), "data", 0, 0).reshape(-1)
        for x in (buf_a, buf_b, buf_c, buf_p)
    ]
    ra, rb, rc, rp = recv

    # owner-local merge: identical run-sum machinery to the sparse path
    T = D * Kb
    sa, sb, sp, sc = jax.lax.sort((ra, rb, rp, rc), num_keys=3,
                                  is_stable=False)
    t = jnp.arange(T, dtype=jnp.int32)
    prev_sa = jnp.roll(sa, 1).at[0].set(-2)
    prev_sb = jnp.roll(sb, 1).at[0].set(-2)
    head = ((sa != prev_sa) | (sb != prev_sb)) & (sa != INT32_MAX)
    marker = jnp.where(head | (sa == INT32_MAX), t, T)
    next_start = jnp.roll(jax.lax.cummin(marker, reverse=True), -1)
    next_start = next_start.at[T - 1].set(T)
    csum = jnp.cumsum(sc)
    csum_prev = jnp.roll(csum, 1).at[0].set(0)
    total = jnp.where(head, csum[jnp.maximum(next_start - 1, 0)] - csum_prev,
                      0)
    cmax = jnp.max(total)
    ctied = head & (total == cmax)
    cpos = jnp.min(jnp.where(ctied, sp, INT32_MAX))
    cj = jnp.argmax(ctied & (sp == cpos))
    champ = (sa[cj], sb[cj], cmax, cpos)

    # champion-of-champions across owners (tiny: 4 scalars per device)
    ga, gb, gc, gp = (jax.lax.all_gather(x, "data") for x in champ)
    maxc = jnp.max(gc)
    tied = gc == maxc
    best_pos = jnp.min(jnp.where(tied, gp, INT32_MAX))
    w = jnp.argmax(tied & (gp == best_pos))
    return ga[w], gb[w], maxc, maxc > 0, overflow


def build_distributed_train(mesh: Mesh, num_merges: int, vocab_size: int,
                            shard_capacity: int, selection: str = "dense",
                            sparse_cap: int | None = None,
                            owner_cap: int | None = None):
    """Returns a jitted fn: (ids[D*Nl], seg[D*Nl], lens[D]) ->
    (pairs[M,2], counts[M], fail_round).

    Exact for both segmented (Regex) and unsegmented (Basic) streams: the
    boundary pair between consecutive shards is counted by its left owner
    and merged with globally-correct left-first parity via a per-round
    2-state carry scan across shards; empty shards are handled by the
    multi-hop halo + identity carry transfer.

    selection:
      "dense"  — psum'd [V, V] count/min-position matrices (vocab <= ~8K);
      "sparse" — sorted per-shard run summaries merged via all_gather
                 (any vocab size; no V^2 memory anywhere). sparse_cap bounds
                 distinct pairs per shard (default min(Nl+1, 1<<17));
                 overflow is detected and raised host-side, never silent.
      "owner"  — owner-sharded keyspace selection: summaries are routed to
                 per-pair owner devices (hash % D) over an all_to_all and
                 merged there; only D champions are replicated. Same
                 exactness and overflow discipline; owner_cap bounds
                 entries per (shard, owner) bucket (default the skew-padded
                 4*ceil(K/D), capped at K).
    """
    V = vocab_size
    M = num_merges
    Nl = shard_capacity
    D = mesh.devices.size
    K = sparse_cap if sparse_cap is not None else min(Nl + 1, 1 << 17)
    Kb = owner_cap if owner_cap is not None else min(K, 4 * (-(-K // D)))

    def shard_body(ids, seg, lens):
        # local views: ids, seg: [Nl]; lens: [1]
        n = lens[0]
        d = jax.lax.axis_index("data")
        gpos_base = d.astype(jnp.int32) * jnp.int32(Nl)
        idx = jnp.arange(Nl, dtype=jnp.int32)

        pairs0 = jnp.zeros((M, 2), jnp.int32)
        counts0 = jnp.zeros((M,), jnp.int32)

        def body(i, state):
            ids, seg, n, pairs, counts, fail, oflow = state
            halo_id, halo_seg, halo_ok = _halo_exchange(ids, seg, n, D)
            if selection in ("sparse", "owner"):
                lpa, lpb, lcnt, lpos, of = _local_run_summaries(
                    ids, seg, n, gpos_base, K, halo_id, halo_seg, halo_ok
                )
                if selection == "owner":
                    pa, pb, maxc, any_pair, of2 = _owner_global_select(
                        lpa, lpb, lcnt, lpos, K, Kb, D
                    )
                    of = of | of2
                else:
                    pa, pb, maxc, any_pair = _sparse_global_select(
                        lpa, lpb, lcnt, lpos, K, D
                    )
                oflow = oflow | (jax.lax.psum(of.astype(jnp.int32), "data")
                                 > 0)
            else:
                lc, lp = _local_pair_stats(
                    ids, seg, n, gpos_base, V, halo_id, halo_seg, halo_ok
                )
                gc = jax.lax.psum(lc, "data")
                gp = jax.lax.pmin(lp, "data")
                maxc = jnp.max(gc)
                tied = gc == maxc
                best_pos = jnp.min(jnp.where(tied, gp, INT32_MAX))
                flat = jnp.argmax((tied & (gp == best_pos)).reshape(-1))
                pa = (flat // V).astype(jnp.int32)
                pb = (flat % V).astype(jnp.int32)
            # normalize VMA typing across selection implementations
            pa, pb, maxc = _varying(pa), _varying(pb), _varying(maxc)
            ok = (maxc > 0) & (fail >= i)

            def do(_):
                keep0, keep1, co0, co1 = _extended_keep(
                    ids, seg, n, pa, pb, halo_id, halo_seg, halo_ok
                )
                # resolve carry-ins: compose the per-shard transfer functions
                # left to right (replicated scan over D gathered bit-pairs)
                co0g = jax.lax.all_gather(co0, "data")
                co1g = jax.lax.all_gather(co1, "data")

                def carry_step(dd, st):
                    carry, mine = st
                    mine = jnp.where(dd == d, carry, mine)
                    carry = jnp.where(carry, co1g[dd], co0g[dd])
                    return carry, mine

                init = jax.lax.pcast(
                    (jnp.bool_(False), jnp.bool_(False)), ("data",),
                    to="varying",
                )
                _, carry_in = jax.lax.fori_loop(0, D, carry_step, init)
                keep = jnp.where(carry_in, keep1, keep0)
                new_ids = jnp.where(keep, jnp.int32(256) + i, ids)
                killed = jnp.roll(keep, 1).at[0].set(carry_in)
                live = ~killed & (idx < n)
                out_ids, out_seg, new_n = compact(new_ids, seg, live)
                return (out_ids, out_seg, new_n,
                        pairs.at[i, 0].set(pa).at[i, 1].set(pb),
                        counts.at[i].set(maxc), fail, oflow)

            def skip(_):
                return (ids, seg, n, pairs, counts,
                        jnp.minimum(fail, jnp.where(maxc > 0, fail, i)),
                        oflow)

            return jax.lax.cond(ok, do, skip, None)

        state = (ids, seg, n, _varying(pairs0), _varying(counts0),
                 _varying(jnp.int32(M)), _varying(jnp.bool_(False)))
        ids, seg, n, pairs, counts, fail, oflow = jax.lax.fori_loop(
            0, M, body, state)
        return pairs[None], counts[None], fail[None], oflow[None]

    mapped = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data")),
    )

    def train(ids, seg, lens):
        pairs, counts, fail, oflow = mapped(ids, seg, lens)
        # every shard computed identical values; take shard 0's copy
        return pairs[0], counts[0], jnp.max(fail), jnp.max(oflow)

    return jax.jit(train)


def shard_bytes(data: bytes, n_shards: int):
    """Even byte-level sharding for unsegmented (Basic) streams; cross-shard
    pairs are handled exactly by the halo/carry machinery."""
    total = len(data)
    per = -(-total // n_shards) if total else 1
    Nl = bucket_capacity(per)
    ids = np.full((n_shards, Nl), PAD, dtype=np.int32)
    seg = np.full((n_shards, Nl), PAD_SEG, dtype=np.int32)
    lens = np.zeros(n_shards, dtype=np.int32)
    arr = np.frombuffer(data, dtype=np.uint8)
    for d in range(n_shards):
        sl = arr[d * per:(d + 1) * per]
        ids[d, :len(sl)] = sl
        seg[d, :len(sl)] = 0
        lens[d] = len(sl)
    return ids.reshape(-1), seg.reshape(-1), lens


def _finish_train(pairs, counts, fail, num_merges, verbose, oflow=False):
    pairs = np.asarray(pairs)
    counts = np.asarray(counts)
    if int(oflow):
        raise RuntimeError(
            "selection capacity overflow: a shard exceeded its distinct-pair "
            "capacity (raise sparse_cap) or an owner bucket overflowed "
            "(raise owner_cap)"
        )
    if int(fail) < num_merges:
        raise ValueError(
            f"no mergeable pair available at merge round {int(fail)}"
        )
    merges: dict[tuple[int, int], int] = {}
    vocab = {i: bytes([i]) for i in range(256)}
    for i in range(num_merges):
        pair = (int(pairs[i, 0]), int(pairs[i, 1]))
        idx = 256 + i
        merges[pair] = idx
        vocab[idx] = vocab[pair[0]] + vocab[pair[1]]
        if verbose:
            print(f"merge {i+1}/{num_merges}: {pair} -> {idx} "
                  f"({vocab[idx]}) had {int(counts[i])} occurrences")
    return merges, vocab


def train_bytes_distributed(data: bytes, num_merges: int,
                            mesh: Mesh | None = None, verbose: bool = False):
    """Distributed training over a raw (unsegmented) byte stream — the
    BasicTokenizer path, with exact cross-shard boundary handling."""
    mesh = mesh if mesh is not None else make_mesh()
    D = mesh.devices.size
    ids, seg, lens = shard_bytes(data, D)
    Nl = ids.shape[0] // D
    fn = build_distributed_train(mesh, num_merges, 256 + num_merges, Nl)
    pairs, counts, fail, oflow = fn(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens)
    )
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)


def train_chunks_distributed(chunks: list[bytes], num_merges: int,
                             mesh: Mesh | None = None, verbose: bool = False,
                             selection: str = "dense"):
    """Host entry: shard chunks over the mesh and run distributed training.

    Returns (merges dict, vocab dict) with reference-identical contents.
    """
    mesh = mesh if mesh is not None else make_mesh()
    D = mesh.devices.size
    ids, seg, lens = shard_chunks(chunks, D)
    Nl = ids.shape[0] // D
    V = 256 + num_merges
    fn = build_distributed_train(mesh, num_merges, V, Nl,
                                 selection=selection)
    pairs, counts, fail, oflow = fn(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens)
    )
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)

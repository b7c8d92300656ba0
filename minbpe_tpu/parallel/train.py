"""Data-parallel distributed BPE training over a JAX device mesh.

The reference is single-threaded CPython (SURVEY.md §2.3); this module is the
TPU-native scaling design it lacks:

- corpus chunks are sharded across a 1-D ``data`` mesh axis (chunks never
  straddle shards, so the Regex-path invariant "merges never cross chunk
  boundaries", minbpe/regex.py:44, also guarantees no cross-shard pairs);
- the merge table is replicated (tiny);
- the round body is the fused single-chip kernel's design in XLA form
  (ops/pallas/fused_train.py): TOMBSTONED streams with next-live adjacency
  (never compacted — no per-round sort, and global positions stay stable
  for the tie-break), shard-local counts as one-hot int8 MXU matmuls (no
  scatter), and the first-occurrence tie-break resolved per OCCURRENCE
  (psum'd counts -> tie membership lookup -> pmin of one scalar position)
  instead of a psum'd [V, V] position matrix — selection stays bit-identical
  to the single-device sort-based path and to the reference;
- merge application happens shard-locally with a 2-state carry scan for the
  cross-shard boundary pair.

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


def _pair_arrays(ids, seg, live, halo_id, halo_seg, halo_ok):
    """Per-position (a, b, pair_ok) over a TOMBSTONED shard stream — the
    array form the fused single-chip kernel uses (ops/pallas/fused_train.py
    tiled_adjacency): b is the id of the NEXT LIVE token in the same segment,
    so the stream never needs per-round compaction and global positions stay
    stable for the first-occurrence tie-break.

    The cross-shard boundary pair (last live local token, next shard's first
    live token — the 1-token halo of SURVEY.md §2.3) is folded in at the last
    live index, whose in-shard pair slot is vacant by construction.
    """
    Nl = ids.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    nxt = jax.lax.cummin(jnp.where(live, idx, INT32_MAX), reverse=True)
    nxt = jnp.roll(nxt, -1).at[Nl - 1].set(INT32_MAX)  # exclusive
    has = nxt < INT32_MAX
    j = jnp.minimum(nxt, Nl - 1)
    pair_ok = live & has & (seg == seg[j])
    a = jnp.where(pair_ok, ids, -1)
    b = jnp.where(pair_ok, ids[j], -1)
    # boundary pair (left token is ours, partner lives on a later shard)
    ll = jnp.max(jnp.where(live, idx, -1))
    llc = jnp.maximum(ll, 0)
    bvalid = halo_ok & (ll >= 0) & (seg[llc] == halo_seg)
    a = a.at[llc].set(jnp.where(bvalid, ids[llc], a[llc]))
    b = b.at[llc].set(jnp.where(bvalid, halo_id, b[llc]))
    return a, b, pair_ok | (bvalid & (idx == llc))


def _dense_counts(a, b, pair_ok, V, mxu: bool):
    """Shard-local dense pair counts.

    mxu=True (TPU): ONE one-hot int8 MXU matmul — no scatter, the fused
    kernel's counting scheme in XLA form. mxu=False (CPU hosts / virtual
    test meshes): scatter-add — the matmul is O(Nl * V^2) which the MXU
    eats for breakfast but a CPU host does not."""
    av = jnp.where(pair_ok, a, V)  # class V = invalid (sliced/dropped)
    bv = jnp.where(pair_ok, b, V)
    if not mxu:
        return jnp.zeros((V, V), jnp.int32).at[av, bv].add(1, mode="drop")
    A = jax.nn.one_hot(av, V + 1, dtype=jnp.int8)[:, :V]
    B = jax.nn.one_hot(bv, V + 1, dtype=jnp.int8)[:, :V]
    return jax.lax.dot_general(
        A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _varying(x):
    """Mark a per-shard-computed value as varying over the data axis
    (idempotent: no-op when it already is; also a no-op under the vmap
    emulation _nomesh uses for 1-device meshes, where pcast is unsupported
    but everything is trivially 'varying')."""
    try:
        return jax.lax.pcast(x, ("data",), to="varying")
    except Exception:
        return x


def _nomesh(f, in_axes=0):
    """Run a shard_map body as a 1-shard program via vmap(axis_name="data").

    At D == 1 every collective is an identity, but shard_map's
    manual-sharding lowering is not free: the full round body measured
    ~230 ms/round on a real chip where the same stages jitted plainly cost
    < 1 ms (scripts/scratch/probe_r5_dist1.py). vmap with an axis name
    gives the collectives a size-1 axis to reduce over and otherwise
    compiles as ordinary XLA. Sharded args get a leading length-1 axis;
    outputs drop it (matching shard_map's P(\"data\") concatenation)."""
    vf = jax.vmap(f, in_axes=in_axes, axis_name="data")

    def run(*args):
        axes = in_axes if isinstance(in_axes, (tuple, list)) \
            else (in_axes,) * len(args)
        vargs = [
            jnp.asarray(a)[None] if ax == 0 else a
            for a, ax in zip(args, axes)
        ]
        return jax.tree.map(lambda x: x[0], vf(*vargs))

    return run


def _halo_exchange(ids, seg, live, n_shards):
    """Each shard receives the first LIVE token of the nearest shard to its
    right that has one (multi-hop 1-token halo, exact even across empty or
    fully-tombstoned shards)."""
    D = n_shards
    Nl = ids.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    fli = jnp.min(jnp.where(live, idx, INT32_MAX))
    flc = jnp.minimum(fli, Nl - 1)
    firsts = jax.lax.all_gather(ids[flc], "data")
    fsegs = jax.lax.all_gather(seg[flc], "data")
    nons = jax.lax.all_gather(fli < INT32_MAX, "data")
    d = jax.lax.axis_index("data")
    ar = jnp.arange(D, dtype=jnp.int32)
    cand = jnp.where(nons & (ar > d), ar, D)
    j = jnp.min(cand)
    halo_ok = j < D
    jc = jnp.minimum(j, D - 1)
    return firsts[jc], fsegs[jc], halo_ok


def _extended_keep(a, b, live, pa, pb):
    """Match + left-first keep masks along the LIVE chain of a tombstoned
    shard (the boundary pair is already folded into a/b at the last live
    index by _pair_arrays), under both possible carry-ins from the left
    shard. Parity runs over CHAIN positions (cumsum of live), the tombstone
    form of the reference's adjacent-overlap rule (minbpe/base.py:25-41) —
    the same formulation as the fused kernel's apply pass.

    Returns (keep0, keep1, co0, co1): keep masks for carry-in 0/1, and the
    boundary-pair keep bit under each carry-in (the shard's 2-state transfer
    function; identity for shards with no live tokens).
    """
    Nl = a.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    m = (a == pa) & (b == pb)
    fli = jnp.min(jnp.where(live, idx, INT32_MAX))
    any_live = fli < INT32_MAX
    ll = jnp.maximum(jnp.max(jnp.where(live, idx, -1)), 0)

    chain = jnp.cumsum(live.astype(jnp.int32))  # 1-based at live positions
    pl = jnp.roll(jax.lax.cummax(jnp.where(live, idx, -1)), 1).at[0].set(-1)
    m_prev = (pl >= 0) & m[jnp.maximum(pl, 0)]
    new_run = m & ~m_prev
    crs = jax.lax.cummax(jnp.where(new_run, chain, -1))
    off = chain - crs
    keep0 = m & ((off & 1) == 0)
    # carry-in = 1: the pair just left of our first live token was kept, so
    # the run that starts at the first live token (if any) flips parity
    in_first_run = m & (crs == 1) & (any_live & m[jnp.minimum(fli, Nl - 1)])
    keep1 = jnp.where(in_first_run, m & ((off & 1) == 1), keep0)
    # transfer function carry_in -> carry_out: whether the pair immediately
    # left of the NEXT shard's first live token (our boundary pair) was kept
    co0 = any_live & keep0[ll]
    co1 = jnp.where(any_live, keep1[ll], True)
    return keep0, keep1, co0, co1


def _local_run_summaries(a, b, pair_ok, gpos_base, K):
    """Per-shard distinct-pair summaries for the sparse (large-vocab)
    selection: sorted-run compaction of the (a, b, pair_ok) arrays from
    _pair_arrays (boundary pair already folded in) into fixed (K,) arrays
    of (pa, pb, count, minpos).

    Returns (pa, pb, cnt, pos, overflow): entries past the distinct-pair
    count hold INT32_MAX sentinels; overflow flags n_runs > K.
    """
    Nl = a.shape[0]
    idx = jnp.arange(Nl, dtype=jnp.int32)
    ka = jnp.where(pair_ok, a, INT32_MAX)
    kb = jnp.where(pair_ok, b, INT32_MAX)
    pos = gpos_base + idx
    NE = Nl
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


def _select_round(a, b, pair_ok, gpos_base, idx, V, D, K, Kb, selection,
                  mxu, oflow):
    """One round's exact global argmax (all three selection modes).
    Returns (pa, pb, maxc, oflow') with VMA typing normalized."""
    if selection in ("sparse", "owner"):
        lpa, lpb, lcnt, lpos, of = _local_run_summaries(
            a, b, pair_ok, gpos_base, K
        )
        if selection == "owner":
            pa, pb, maxc, _, of2 = _owner_global_select(
                lpa, lpb, lcnt, lpos, K, Kb, D
            )
            of = of | of2
        else:
            pa, pb, maxc, _ = _sparse_global_select(lpa, lpb, lcnt, lpos,
                                                    K, D)
        oflow = oflow | (jax.lax.psum(of.astype(jnp.int32), "data") > 0)
    else:
        gc = jax.lax.psum(_dense_counts(a, b, pair_ok, V, mxu), "data")
        maxc = jnp.max(gc)
        # first-occurrence tie-break without any position matrix:
        # look up tie membership per occurrence, pmin the position,
        # and have the owning shard broadcast the winning pair
        tied = gc == maxc
        hit = pair_ok & tied[jnp.clip(a, 0, V - 1),
                             jnp.clip(b, 0, V - 1)]
        lbest = jnp.min(jnp.where(hit, gpos_base + idx, INT32_MAX))
        best = jax.lax.pmin(lbest, "data")
        mine = (lbest == best) & (best < INT32_MAX)
        k = jnp.argmax(hit & (gpos_base + idx == best))
        pa = jax.lax.psum(jnp.where(mine, a[k], 0), "data")
        pb = jax.lax.psum(jnp.where(mine, b[k], 0), "data")
    return _varying(pa), _varying(pb), _varying(maxc), oflow


def _apply_round(ids, live, a, b, pa, pb, new_id, d, D, idx):
    """Apply (pa, pb) -> new_id across shards with globally-correct
    left-first parity (2-state carry composition) and consumed-token kills.
    Returns (new_ids, new_live)."""
    Nl = ids.shape[0]
    keep0, keep1, co0, co1 = _extended_keep(a, b, live, pa, pb)
    # resolve carry-ins: compose the per-shard transfer functions
    # left to right (replicated scan over D gathered bit-pairs)
    co0g = jax.lax.all_gather(co0, "data")
    co1g = jax.lax.all_gather(co1, "data")

    def carry_step(dd, st):
        carry, mine = st
        mine = jnp.where(dd == d, carry, mine)
        carry = jnp.where(carry, co1g[dd], co0g[dd])
        return carry, mine

    init = _varying((jnp.bool_(False), jnp.bool_(False)))
    _, carry_in = jax.lax.fori_loop(0, D, carry_step, init)
    keep = jnp.where(carry_in, keep1, keep0)
    new_ids = jnp.where(keep, new_id, ids)
    # consumed tokens: the next live token after a kept match; the first
    # live token when the left shard's boundary pair was kept (carry_in)
    pl = jnp.roll(jax.lax.cummax(jnp.where(live, idx, -1)), 1).at[0].set(-1)
    killed = live & (pl >= 0) & keep[jnp.maximum(pl, 0)]
    fli = jnp.min(jnp.where(live, idx, INT32_MAX))
    flc = jnp.minimum(fli, Nl - 1)
    killed = killed.at[flc].set(
        (carry_in & (fli < INT32_MAX)) | killed[flc])
    return new_ids, live & ~killed


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
    # dense counting impl: MXU one-hot matmul on TPU meshes, scatter-add on
    # CPU hosts / virtual test meshes (see _dense_counts)
    mxu = all(d.platform == "tpu" for d in mesh.devices.flat)
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
            # the stream is TOMBSTONED (live mask), never compacted: global
            # positions stay stable for the tie-break, and the round has no
            # per-round sort — the fused single-chip kernel's design.
            ids, seg, live, pairs, counts, fail, oflow = state
            halo_id, halo_seg, halo_ok = _halo_exchange(ids, seg, live, D)
            a, b, pair_ok = _pair_arrays(ids, seg, live, halo_id, halo_seg,
                                         halo_ok)
            pa, pb, maxc, oflow = _select_round(
                a, b, pair_ok, gpos_base, idx, V, D, K, Kb, selection, mxu,
                oflow)
            ok = (maxc > 0) & (fail >= i)

            def do(_):
                new_ids, new_live = _apply_round(
                    ids, live, a, b, pa, pb, jnp.int32(256) + i, d, D, idx)
                return (new_ids, seg, new_live,
                        pairs.at[i, 0].set(pa).at[i, 1].set(pb),
                        counts.at[i].set(maxc), fail, oflow)

            def skip(_):
                return (ids, seg, live, pairs, counts,
                        jnp.minimum(fail, jnp.where(maxc > 0, fail, i)),
                        oflow)

            return jax.lax.cond(ok, do, skip, None)

        state = (ids, seg, idx < n, _varying(pairs0), _varying(counts0),
                 _varying(jnp.int32(M)), _varying(jnp.bool_(False)))
        ids, seg, live, pairs, counts, fail, oflow = jax.lax.fori_loop(
            0, M, body, state)
        return pairs[None], counts[None], fail[None], oflow[None]

    if D == 1:
        # single-device mesh: run the identical round body WITHOUT
        # shard_map. All collectives are identities at D == 1, and the
        # manual-sharding lowering itself measured ~230 ms/round on a real
        # chip where the same stages jitted plainly cost < 1 ms
        # (scripts/scratch/probe_r5_dist1.py; SCALING_r05 attribution) —
        # the VERDICT r4 #3 "skip collectives when D == 1" win.
        mapped = _nomesh(shard_body)
    else:
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


def build_distributed_train_stepped(mesh: Mesh, vocab_size: int,
                                    shard_capacity: int, step_rounds: int,
                                    selection: str = "dense",
                                    sparse_cap: int | None = None,
                                    owner_cap: int | None = None):
    """K-round jitted step for the host-driven distributed trainer — the
    checkpointable form of build_distributed_train (same round body via
    _select_round/_apply_round, so results are bit-identical; tested in
    tests/test_distributed.py).

    Returns step(ids, seg, live, r0, fail, oflow) ->
    (ids', live', pairs[K, 2], counts[K], fail', oflow') where r0 is the
    global index of the step's first round (new ids are 256 + r0 + k).
    The host drives M rounds as ceil(M / K) steps, persisting the merge
    prefix between steps (utils/checkpoint.py) — the distributed analogue of
    ops/train_sortloop.py's stepped driver, and the checkpoint/resume path
    the reference's final-artifact-only persistence lacks
    (minbpe/base.py:97-165)."""
    V = vocab_size
    Nl = shard_capacity
    D = mesh.devices.size
    KR = step_rounds
    mxu = all(d.platform == "tpu" for d in mesh.devices.flat)
    K = sparse_cap if sparse_cap is not None else min(Nl + 1, 1 << 17)
    Kb = owner_cap if owner_cap is not None else min(K, 4 * (-(-K // D)))

    def shard_body(ids, seg, live, r0, fail, oflow):
        d = jax.lax.axis_index("data")
        gpos_base = d.astype(jnp.int32) * jnp.int32(Nl)
        idx = jnp.arange(Nl, dtype=jnp.int32)
        pairs0 = _varying(jnp.zeros((KR, 2), jnp.int32))
        counts0 = _varying(jnp.zeros((KR,), jnp.int32))

        def body(k, state):
            ids, live, pairs, counts, fail, oflow = state
            i = r0[0] + k
            halo_id, halo_seg, halo_ok = _halo_exchange(ids, seg, live, D)
            a, b, pair_ok = _pair_arrays(ids, seg, live, halo_id, halo_seg,
                                         halo_ok)
            pa, pb, maxc, oflow = _select_round(
                a, b, pair_ok, gpos_base, idx, V, D, K, Kb, selection, mxu,
                oflow)
            ok = (maxc > 0) & (fail >= i)

            def do(_):
                new_ids, new_live = _apply_round(
                    ids, live, a, b, pa, pb, jnp.int32(256) + i, d, D, idx)
                return (new_ids, new_live,
                        pairs.at[k, 0].set(pa).at[k, 1].set(pb),
                        counts.at[k].set(maxc), fail, oflow)

            def skip(_):
                return (ids, live, pairs, counts,
                        jnp.minimum(fail, jnp.where(maxc > 0, fail, i)),
                        oflow)

            return jax.lax.cond(ok, do, skip, None)

        state = (ids, live, pairs0, counts0, _varying(fail[0]),
                 _varying(oflow[0] > 0))
        ids, live, pairs, counts, fail, oflow = jax.lax.fori_loop(
            0, KR, body, state)
        return ids, live, pairs[None], counts[None], fail[None], oflow[None]

    if D == 1:
        mapped = _nomesh(shard_body, (0, 0, 0, None, None, None))
    else:
        mapped = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P(), P()),
            out_specs=(P("data"), P("data"), P("data"), P("data"),
                       P("data"), P("data")),
        )

    def step(ids, seg, live, r0, fail, oflow):
        ids, live, pairs, counts, fail, oflow = mapped(
            ids, seg, live,
            jnp.asarray([r0], jnp.int32), jnp.asarray([fail], jnp.int32),
            jnp.asarray([oflow], jnp.int32))
        return (ids, live, pairs[0], counts[0], jnp.max(fail),
                jnp.max(oflow))

    return jax.jit(step)


def build_distributed_replay(mesh: Mesh, shard_capacity: int,
                             step_rounds: int):
    """K-round jitted replay: apply a KNOWN merge prefix block to the
    sharded stream (no counting, no selection — resume reconstruction is
    pure merge application, deterministic and much cheaper than training).
    Returns replay(ids, seg, live, r0, pairs[K, 2], m_valid) ->
    (ids', live'); rounds k >= m_valid are no-ops."""
    Nl = shard_capacity
    D = mesh.devices.size
    KR = step_rounds

    def shard_body(ids, seg, live, r0, pairs, m_valid):
        d = jax.lax.axis_index("data")
        idx = jnp.arange(Nl, dtype=jnp.int32)

        def body(k, state):
            ids, live = state
            i = r0[0] + k
            halo_id, halo_seg, halo_ok = _halo_exchange(ids, seg, live, D)
            a, b, _ = _pair_arrays(ids, seg, live, halo_id, halo_seg,
                                   halo_ok)

            def do(_):
                return _apply_round(
                    ids, live, a, b, pairs[k, 0], pairs[k, 1],
                    jnp.int32(256) + i, d, D, idx)

            return jax.lax.cond(k < m_valid[0], do, lambda _: (ids, live),
                                None)

        ids, live = jax.lax.fori_loop(0, KR, body, (ids, live))
        return ids, live

    if D == 1:
        mapped = _nomesh(shard_body, (0, 0, 0, None, None, None))
    else:
        mapped = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P(), P()),
            out_specs=(P("data"), P("data")),
        )

    def replay(ids, seg, live, r0, pairs, m_valid):
        return mapped(ids, seg, live, jnp.asarray([r0], jnp.int32),
                      jnp.asarray(pairs, jnp.int32),
                      jnp.asarray([m_valid], jnp.int32))

    return jax.jit(replay)


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


def _train_distributed_stepped(ids, seg, lens, num_merges, mesh, verbose,
                               selection, checkpoint_path, checkpoint_every,
                               resume_from):
    """Host-driven stepped distributed training with resumable checkpoints
    (same fingerprint + prefix-replay semantics as the single-device stepped
    paths, utils/checkpoint.py)."""
    from ..utils import checkpoint as ck

    D = mesh.devices.size
    Nl = ids.shape[0] // D
    V = 256 + num_merges
    KR = int(checkpoint_every or 32)
    step = build_distributed_train_stepped(mesh, V, Nl, KR,
                                           selection=selection)
    fp = ck.corpus_fingerprint(ids, seg, int(np.asarray(lens).sum()))
    pairs_all = np.zeros((num_merges, 2), np.int32)
    counts_all = np.zeros((num_merges,), np.int32)
    live = (np.arange(Nl, dtype=np.int32)[None, :]
            < np.asarray(lens)[:, None]).reshape(-1)
    ids_d = jnp.asarray(ids)
    seg_d = jnp.asarray(seg)
    live_d = jnp.asarray(live)
    start = 0
    if resume_from is not None:
        state = ck.load(resume_from)
        if state["fingerprint"] != fp:
            raise ValueError(
                "checkpoint does not match this corpus "
                f"(fingerprint {state['fingerprint']} != {fp})")
        if state["num_merges"] != num_merges:
            raise ValueError("checkpoint trained a different vocab size")
        start = state["round_idx"]
        pairs_all[:start] = state["pairs"]
        counts_all[:start] = state["counts"]
        replay = build_distributed_replay(mesh, Nl, KR)
        for r0 in range(0, start, KR):
            blk = np.zeros((KR, 2), np.int32)
            m_valid = min(KR, start - r0)
            blk[:m_valid] = pairs_all[r0:r0 + m_valid]
            ids_d, live_d = replay(ids_d, seg_d, live_d, r0, blk, m_valid)
    fail = num_merges
    oflow = 0
    for r0 in range(start, num_merges, KR):
        ids_d, live_d, p, c, fail_a, oflow_a = step(
            ids_d, seg_d, live_d, r0, fail, oflow)
        fail = int(fail_a)
        oflow = int(oflow_a)
        m_done = min(KR, num_merges - r0)  # overrun rounds are discarded
        pairs_all[r0:r0 + m_done] = np.asarray(p)[:m_done]
        counts_all[r0:r0 + m_done] = np.asarray(c)[:m_done]
        if oflow or fail < r0 + m_done:
            break
        if checkpoint_path is not None:
            ck.save(checkpoint_path, pairs_all, counts_all,
                    min(r0 + KR, num_merges), num_merges, fp)
    return _finish_train(pairs_all, counts_all, fail, num_merges, verbose,
                         oflow)


def train_chunks_distributed(chunks: list[bytes], num_merges: int,
                             mesh: Mesh | None = None, verbose: bool = False,
                             selection: str = "dense",
                             checkpoint_path: str | None = None,
                             checkpoint_every: int | None = None,
                             resume_from: str | None = None):
    """Host entry: shard chunks over the mesh and run distributed training.

    Returns (merges dict, vocab dict) with reference-identical contents.
    checkpoint_path/checkpoint_every/resume_from switch to the host-driven
    stepped trainer with resumable checkpoints (bit-identical results; the
    single-jit whole-run program remains the default fast path)."""
    mesh = mesh if mesh is not None else make_mesh()
    D = mesh.devices.size
    ids, seg, lens = shard_chunks(chunks, D)
    if (checkpoint_path is not None or resume_from is not None
            or checkpoint_every is not None):
        return _train_distributed_stepped(
            ids, seg, lens, num_merges, mesh, verbose, selection,
            checkpoint_path, checkpoint_every, resume_from)
    Nl = ids.shape[0] // D
    V = 256 + num_merges
    fn = build_distributed_train(mesh, num_merges, V, Nl,
                                 selection=selection)
    pairs, counts, fail, oflow = fn(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(lens)
    )
    return _finish_train(pairs, counts, fail, num_merges, verbose, oflow)

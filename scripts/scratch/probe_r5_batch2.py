"""r5 probe #2: batch size under the sharper exact rule.

Batch = maximal prefix q1..qB of the remaining-argmax sequence (count desc,
first-occurrence tie-break) such that
  - pairwise token-disjoint (non-disjoint candidate => its count is unknown
    => batch stops),
  - heterogeneous (pa != pb) beyond position 1 (homogeneous pairs need the
    run-parity machinery per pair; we stop the batch instead),
  - c_qj strictly exceeds the max count of any pair CREATED by q1..q(j-1)'s
    applies (computable exactly pre-apply from the joint site map; here we
    track both the exact max and the 128-bucket conservative version the
    kernel would use).
All accepted merges then apply in ONE combined pass. Reports the B histogram
=> predicted per-merge device cost.
"""

import collections
import sys
import time

sys.path.insert(0, "/root/repo")

import regex as re


def get_stats(ids, stats, order):
    for a, b in zip(ids, ids[1:]):
        p = (a, b)
        if p not in stats:
            order[p] = len(order)
            stats[p] = 1
        else:
            stats[p] += 1


def merge_with_created(ids, pair, idx):
    """Apply left-first; return (new_ids, kept, created pair list)."""
    out = []
    created = []
    kept = 0
    i = 0
    while i < len(ids):
        if ids[i] == pair[0] and i < len(ids) - 1 and ids[i + 1] == pair[1]:
            if out:
                created.append((out[-1], idx))
            out.append(idx)
            kept += 1
            i += 2
            if i < len(ids):
                # right partner resolved after loop completes is fine for the
                # probe: partner may itself merge later in this same apply;
                # we re-resolve below
                pass
        else:
            out.append(ids[i])
            i += 1
    # re-derive created right-pairs from the output stream
    for j, v in enumerate(out):
        if v == idx and j + 1 < len(out):
            created.append((v, out[j + 1]))
    return out, kept, created


def simulate(chunks, num_merges, kcap):
    rebuilds = 0
    hist = []
    i = 0
    while i < num_merges:
        stats: dict = {}
        order: dict = {}
        for ch in chunks:
            get_stats(ch, stats, order)
        rebuilds += 1
        cands = sorted(stats.items(), key=lambda kv: (-kv[1], order[kv[0]]))
        used = set()
        created_counts: collections.Counter = collections.Counter()
        bucket_counts: collections.Counter = collections.Counter()
        b = 0
        for (pa, pb), c in cands:
            if i >= num_merges or b >= kcap:
                break
            if pa in used or pb in used:
                break
            if b > 0 and pa == pb:
                break
            exact_bound = max(created_counts.values(), default=0)
            bucket_bound = max(bucket_counts.values(), default=0)
            if b > 0 and c <= bucket_bound:
                break
            idx = 256 + i
            new_chunks = []
            for ch in chunks:
                if pa in ch:
                    ch2, kept, created = merge_with_created(ch, (pa, pb), idx)
                    new_chunks.append(ch2)
                    for cp in created:
                        created_counts[cp] += 1
                        bucket_counts[(cp[0] & 127, cp[1] & 127)] += 1
                else:
                    new_chunks.append(ch)
            chunks = new_chunks
            used.add(pa)
            used.add(pb)
            i += 1
            b += 1
        hist.append(b)
    return rebuilds, hist, chunks


def main():
    text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
    pat = re.compile(
        r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}|"""
        r""" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
    )
    chunks0 = [list(c.encode("utf-8")) for c in re.findall(pat, text)]
    for kcap in (8, 16, 32):
        t0 = time.time()
        M = 256
        rebuilds, hist, final = simulate([list(c) for c in chunks0], M, kcap)
        cnt = collections.Counter(hist)
        print(f"kcap={kcap} M={M}: rebuilds={rebuilds} "
              f"merges/rebuild={M/rebuilds:.2f} dt={time.time()-t0:.1f}s")
        print("   hist:", dict(sorted(cnt.items())))
    # sanity: result must equal the plain sequential reference
    ref_chunks = [list(c) for c in chunks0]
    merges_ref = []
    for i in range(256):
        stats: dict = {}
        order: dict = {}
        for ch in ref_chunks:
            get_stats(ch, stats, order)
        pair = max(stats, key=lambda p: (stats[p], -order[p]))
        merges_ref.append(pair)
        ref_chunks = [
            merge_with_created(ch, pair, 256 + i)[0] if pair[0] in ch else ch
            for ch in ref_chunks
        ]
    rebuilds, hist, final = simulate([list(c) for c in chunks0], 256, 16)
    assert final == ref_chunks, "batched result diverges from reference!"
    print("exactness vs sequential reference: OK")


if __name__ == "__main__":
    main()

"""r5 probe #3: batch size under the KERNEL-faithful bound (hypothesis-doubled
128-bucket histograms, computed pre-apply from the joint site map).

This mirrors exactly what the Pallas kernel will compute:
- candidates: maximal disjoint heterogeneous prefix in (count desc, first-occ)
  order, kcap=8;
- joint site map on the rebuild-time stream; per creator j two histograms over
  128 partner buckets: acc_l (pairs (x, z_j)) and acc_r (pairs (z_j, w));
  partner tokens that are part of ANY candidate's site contribute TWO rows
  (merged-id hypothesis and original-id hypothesis) so the bound holds for
  every possible trim prefix;
- cmax[j] = max(max acc_l[:,j], max acc_r[:,j]);
- trim: accept prefix while c_k > max_{m<k} cmax[m];
- apply accepted prefix in one pass; verify final result equals the
  sequential reference byte-for-byte.
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


def merge(ids, pair, idx):
    out = []
    i = 0
    while i < len(ids):
        if ids[i] == pair[0] and i < len(ids) - 1 and ids[i + 1] == pair[1]:
            out.append(idx)
            i += 2
        else:
            out.append(ids[i])
            i += 1
    return out


def simulate(chunks, num_merges, kcap=8, verbose=False):
    rebuilds = 0
    hist_sizes = []
    i = 0
    while i < num_merges:
        stats: dict = {}
        order: dict = {}
        for ch in chunks:
            get_stats(ch, stats, order)
        rebuilds += 1
        cands_all = sorted(stats.items(), key=lambda kv: (-kv[1], order[kv[0]]))
        # selection walk
        sel = []
        used = set()
        for (pa, pb), c in cands_all:
            if len(sel) >= kcap:
                break
            if pa in used or pb in used:
                break
            if sel and pa == pb:
                break
            if not sel and pa == pb:
                sel.append(((pa, pb), c))
                break  # homogeneous first candidate: single-merge batch
            sel.append(((pa, pb), c))
            used.add(pa)
            used.add(pb)
        if not sel:
            break  # corpus exhausted
        B_sel = len(sel)
        zbase = 256 + i
        pair2j = {p: j for j, (p, _) in enumerate(sel)}
        # joint site map + hypothesis-doubled histograms
        acc_l = collections.Counter()  # (row, j)
        acc_r = collections.Counter()
        if B_sel > 1:
            for ch in chunks:
                # mark sites left-to-right, non-overlapping per pair is
                # automatic for heterogeneous disjoint candidates
                site_start = [-1] * len(ch)   # candidate index at start pos
                consumed = [-1] * len(ch)     # candidate index of covering site
                for p_i in range(len(ch) - 1):
                    j = pair2j.get((ch[p_i], ch[p_i + 1]), -1)
                    if j >= 0:
                        site_start[p_i] = j
                        consumed[p_i + 1] = j
                for s in range(len(ch)):
                    j = site_start[s]
                    if j < 0:
                        continue
                    # left neighbor = s-1 (pre-apply adjacency)
                    v = s - 1
                    if v >= 0:
                        if consumed[v] >= 0:          # site-second of m
                            m = consumed[v]
                            acc_l[((zbase + m) & 127, j)] += 1
                            acc_l[(ch[v] & 127, j)] += 1
                        elif site_start[v] >= 0:
                            raise AssertionError("left neighbor is site start")
                        else:
                            acc_l[(ch[v] & 127, j)] += 1
                    # right neighbor = s+2 (skip own consumed token)
                    u = s + 2
                    if u < len(ch):
                        if site_start[u] >= 0:        # site start of m
                            m = site_start[u]
                            acc_r[((zbase + m) & 127, j)] += 1
                            acc_r[(ch[u] & 127, j)] += 1
                        elif consumed[u] >= 0:
                            raise AssertionError("right neighbor is consumed")
                        else:
                            acc_r[(ch[u] & 127, j)] += 1
        cmax = [0] * B_sel
        for (row, j), v in acc_l.items():
            cmax[j] = max(cmax[j], v)
        for (row, j), v in acc_r.items():
            cmax[j] = max(cmax[j], v)
        # trim
        bstar = 1
        bound = cmax[0]
        for k in range(1, B_sel):
            if sel[k][1] > bound:
                bstar = k + 1
                bound = max(bound, cmax[k])
            else:
                break
        bstar = min(bstar, num_merges - i)
        for k in range(bstar):
            chunks = [
                merge(ch, sel[k][0], 256 + i) if sel[k][0][0] in ch else ch
                for ch in chunks
            ]
            i += 1
        hist_sizes.append(bstar)
    return rebuilds, hist_sizes, chunks, i


def main():
    text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
    pat = re.compile(
        r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}|"""
        r""" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
    )
    chunks0 = [list(c.encode("utf-8")) for c in re.findall(pat, text)]
    M = 256
    t0 = time.time()
    rebuilds, hist, final, done = simulate([list(c) for c in chunks0], M)
    cnt = collections.Counter(hist)
    print(f"M={M}: rebuilds={rebuilds} merges/rebuild={done/rebuilds:.2f} "
          f"dt={time.time()-t0:.1f}s")
    print("   hist:", dict(sorted(cnt.items())))
    # exactness vs plain sequential reference
    ref = [list(c) for c in chunks0]
    for i in range(M):
        stats: dict = {}
        order: dict = {}
        for ch in ref:
            get_stats(ch, stats, order)
        pair = max(stats, key=lambda p: (stats[p], -order[p]))
        ref = [merge(ch, pair, 256 + i) if pair[0] in ch else ch for ch in ref]
    assert final == ref, "batched diverges from reference!"
    print("exactness vs sequential reference: OK")


if __name__ == "__main__":
    main()

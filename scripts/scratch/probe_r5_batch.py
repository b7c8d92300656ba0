"""r5 probe: acceptance rate of exact multi-merge batching (VERDICT r4 #1).

Simulates the fused trainer's proposed batch rule on the reference algorithm:
after one count rebuild, keep accepting the next remaining argmax q while
  (a) q shares no token id with any pair applied since the rebuild, and
  (b) count(q) strictly exceeds every kept-site count since the rebuild
(then q is provably still the true argmax of the updated stream: disjointness
leaves its count and first-occurrence order untouched, and (b) dominates every
pair the applies could have created, all of which involve a new id and have
count <= kept).  Reports merges-per-rebuild, i.e. how much of the count wall
the batching removes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import regex as re


def get_stats(ids, stats):
    for a, b in zip(ids, ids[1:]):
        stats[(a, b)] = stats.get((a, b), 0) + 1


def merge(ids, pair, idx):
    out = []
    kept = 0
    i = 0
    while i < len(ids):
        if ids[i] == pair[0] and i < len(ids) - 1 and ids[i + 1] == pair[1]:
            out.append(idx)
            kept += 1
            i += 2
        else:
            out.append(ids[i])
            i += 1
    return out, kept


def simulate(chunks, num_merges):
    rebuilds = 0
    batch_hist = []
    i = 0
    t0 = time.time()
    while i < num_merges:
        # rebuild: count + first-occurrence order
        stats = {}
        for ch in chunks:
            get_stats(ch, stats)
        rebuilds += 1
        order = sorted(stats.items(), key=lambda kv: -kv[1])
        # stable sort keeps insertion (first-occurrence) order within count
        used = set()
        max_kept = 0
        first = True
        b = 0
        for (pa, pb), c in order:
            if i >= num_merges:
                break
            if not first and (pa in used or pb in used or c <= max_kept):
                break
            first = False
            kept_tot = 0
            new_chunks = []
            for ch in chunks:
                if pa in ch:  # cheap skip
                    ch2, k = merge(ch, (pa, pb), 256 + i)
                    kept_tot += k
                    new_chunks.append(ch2)
                else:
                    new_chunks.append(ch)
            chunks = new_chunks
            used.add(pa)
            used.add(pb)
            max_kept = max(max_kept, kept_tot)
            i += 1
            b += 1
        batch_hist.append(b)
    return rebuilds, batch_hist, time.time() - t0


def main():
    text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
    pat = re.compile(
        r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}|"""
        r""" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
    )
    chunks = [list(c.encode("utf-8")) for c in re.findall(pat, text)]
    for M in (256, 512 - 256, 1024 - 256):
        rebuilds, hist, dt = simulate([list(c) for c in chunks], M)
        f = 1 - rebuilds / M
        import collections

        cnt = collections.Counter(hist)
        print(f"M={M}: rebuilds={rebuilds}  merges/rebuild={M/rebuilds:.2f} "
              f"batched_frac={f:.3f}  dt={dt:.1f}s")
        print("   batch-size histogram:", dict(sorted(cnt.items())))


if __name__ == "__main__":
    main()

"""Tiny pure-Python BPE oracle used by the differential tests.

Independent reimplementation of the reference semantics (byte-level BPE with
first-occurrence tie-break and left-first merge application) kept deliberately
separate from the device code paths it validates.
"""

from collections import Counter


def scan_pairs(seqs):
    """Pair -> (count, first-occurrence order) over a list of id sequences."""
    counts = Counter()
    first = {}
    k = 0
    for seq in seqs:
        for x, y in zip(seq, seq[1:]):
            counts[(x, y)] += 1
            if (x, y) not in first:
                first[(x, y)] = k
            k += 1
        k += 1  # gap between sequences never forms a pair
    return counts, first


def substitute(seq, pair, new_id):
    """Left-first non-overlapping replacement of pair by new_id."""
    out = []
    i = 0
    L = len(seq)
    while i < L:
        if i + 1 < L and (seq[i], seq[i + 1]) == pair:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train(seqs, num_merges, base=256):
    """Returns merges as a list of (pair, new_id) in rank order."""
    seqs = [list(s) for s in seqs]
    learned = []
    for r in range(num_merges):
        counts, first = scan_pairs(seqs)
        if not counts:
            raise ValueError(f"no pairs left at round {r}")
        best = max(counts.items(), key=lambda kv: (kv[1], -first[kv[0]]))[0]
        nid = base + r
        seqs = [substitute(s, best, nid) for s in seqs]
        learned.append((best, nid))
    return learned


def encode(seq, ranks):
    """ranks: pair -> (rank, new_id). Greedy lowest-rank-first merging."""
    seq = list(seq)
    while len(seq) >= 2:
        cands = [(ranks[p][0], p) for p in zip(seq, seq[1:]) if p in ranks]
        if not cands:
            break
        _, pair = min(cands)
        seq = substitute(seq, pair, ranks[pair][1])
    return seq

"""Segmented (beyond-VMEM) fused trainer: bit-parity vs the sort path
across segment boundaries, compactions, overlap runs, ties, and exhaustion
(ops/pallas/fused_train_xl.py; tiny segments force the multi-segment
machinery). Reference loop: minbpe/regex.py:49-66."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.pallas.fused_train_xl import train_merges_fused_xl

SEG = 16384  # tiny test segments (128 rows)


def _run_xl(chunks, M, seg_tokens=SEG):
    data = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    ends = np.cumsum([len(c) for c in chunks])
    lens = np.diff(ends, prepend=0)
    ecap = max(128, 1 << (len(ends) - 1).bit_length())
    if lens.max(initial=0) < (1 << 16):
        e = np.zeros(ecap, np.uint16)
        e[:len(ends)] = lens
    else:
        cap = -(-len(data) // seg_tokens) * seg_tokens
        e = np.full(ecap, cap, np.int32)
        e[:len(ends)] = ends
    return train_merges_fused_xl(data, e, len(data), M, interpret=True,
                                 seg_tokens=seg_tokens)


def _run_sort(chunks, M):
    ids, seg, n = st.pack_chunks(chunks)
    return train_merges(jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
                        M, select_mode="sort")


def _check(chunks, M, seg_tokens=SEG):
    p1, c1, f1 = _run_sort(chunks, M)
    p2, c2, f2 = _run_xl(chunks, M, seg_tokens)
    assert int(f1) == int(f2)
    f = int(f1)
    assert np.array_equal(np.asarray(p1)[:f], np.asarray(p2)[:f])
    assert np.array_equal(np.asarray(c1)[:f], np.asarray(c2)[:f])


def test_multisegment_corpus_with_compactions():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:45000]
    ends = list(range(11, len(text), 13)) + [len(text)]
    chunks = [text[a:b] for a, b in zip([0] + ends, ends) if b > a]
    _check(chunks, 40)  # 3 segments, 2 in-kernel compactions


def test_single_segment_degenerates():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:12000]
    chunks = [text[a:b] for a, b in zip([0, 500, 7000], [500, 7000, 12000])]
    _check(chunks, 24)  # S == 1


def test_overlap_runs_cross_boundary_kills():
    """(a, a)-heavy: kept sites at segment tails kill tokens in the NEXT
    segment — the per-segment live accounting must charge kills where they
    land (the bug the first draft had)."""
    rng = random.Random(5)
    parts = []
    for _ in range(2600):
        parts.append(bytes([rng.randint(0, 3)]) * rng.randint(1, 9))
    blob = b"".join(parts)
    ends = list(range(700, len(blob), 1117)) + [len(blob)]
    chunks = [blob[a:b] for a, b in zip([0] + ends, ends) if b > a]
    _check(chunks, 24)


@pytest.mark.slow
def test_tie_heavy_small_alphabet():
    """Many exact count ties: the cross-segment tie walk must pick the pair
    at the earliest tied occurrence anywhere in the stream
    (minbpe/basic.py:35 + base.py:20-21)."""
    rng = random.Random(11)
    blob = bytes(rng.randint(0, 5) for _ in range(24000))
    chunks = [blob[i:i + 977] for i in range(0, len(blob), 977)]
    _check(chunks, 32)


def test_exhaustion_fail_round():
    chunks = [b"ababab", b"cdcd"]
    p1, c1, f1 = _run_sort(chunks, 16)
    p2, c2, f2 = _run_xl(chunks, 16)
    assert int(f1) == int(f2) < 16
    f = int(f1)
    assert np.array_equal(np.asarray(p1)[:f], np.asarray(p2)[:f])


def test_segment_boundary_inside_chunk():
    """A single chunk spanning several segments: merges must cross segment
    boundaries (segments are a memory layout, NOT chunk boundaries)."""
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:40000]
    _check([text], 24)  # one chunk, 3 segments


def test_batch_sites_straddle_segments():
    """Batch-heavy corpus laid out so candidate sites fall exactly on
    segment boundaries (site start = last token of a segment, consumed
    token = first of the next): exercises the mark/hist/apply cross-segment
    carries of the r5 batching port, plus same-side-share batches spanning
    boundaries."""
    import random

    rng = random.Random(41)
    words = [b"ab", b"ac", b"ad", b"bx", b"cx", b"th", b"he"]
    parts = []
    total = 0
    while total < 3 * SEG + 1000:   # 4 segments, sites everywhere
        w = words[rng.randrange(len(words))]
        parts.append(w + bytes([rng.randint(128, 255)]))
        total += len(parts[-1])
    _check(parts, 40)


def test_batch_hot_pair_at_every_boundary():
    """A single dominant pair placed to cover every segment edge."""
    filler = bytes(range(128, 200))
    seg_fill = filler * (SEG // len(filler))
    parts = []
    for k in range(3):
        parts.append(seg_fill[: SEG - 1 - (k % 2)])
        parts.append(b"qz" * 40)    # hot sites right at the boundary
    parts.append(b"qz" * 200)
    _check(parts, 12)

"""Fused whole-training Pallas kernel: bit-parity with the sort path
(interpret mode on CPU)."""

import random

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.pallas.fused_train import train_merges_fused


def _cmp(seqs, num_merges):
    import jax.numpy as jnp
    ids, seg, n = st.pack_chunks([bytes(s) for s in seqs])
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    p1, c1, f1 = train_merges(*args, num_merges, select_mode="sort")
    p2, c2, f2 = train_merges_fused(*args, num_merges, interpret=True)
    assert int(f1) == int(f2)
    k = int(f1) if int(f1) < num_merges else num_merges
    assert (np.asarray(p1)[:k] == np.asarray(p2)[:k]).all()
    assert (np.asarray(c1)[:k] == np.asarray(c2)[:k]).all()


def test_wikipedia_toy():
    _cmp([list(b"aaabdaaabac")], 3)


def test_overlap_runs():
    _cmp([[7] * 30, [7] * 5, [7, 8] * 9], 6)


@pytest.mark.parametrize("seed", range(6))
def test_random(seed):
    rng = random.Random(300 + seed)
    seqs = [
        [rng.randint(0, 6) for _ in range(rng.randint(0, 50))]
        for _ in range(rng.randint(1, 6))
    ]
    seqs.append([1, 2, 1, 2, 1, 1, 1, 2])
    _cmp(seqs, rng.randint(1, 10))


def test_corpus_slice():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:16384]
    _cmp([list(text)], 48)


def test_failure_round():
    _cmp([[1, 2]], 4)


@pytest.mark.slow
def test_multi_segment_corpus():
    """M > SEG_ROUNDS: crosses a segment boundary, exercising the staged
    driver's mid-training compaction + narrow-V first segment."""
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:16384]
    _cmp([list(text)], 160)


@pytest.mark.slow
def test_multi_segment_random_ties():
    """Tie-heavy small-alphabet stream across the segment boundary: the
    first-occurrence tie-break must survive compaction (stable order)."""
    rng = random.Random(77)
    seqs = [[rng.randint(0, 3) for _ in range(260)] for _ in range(3)]
    _cmp(seqs, 140)


def test_multi_segment_exhaustion():
    """Merges run dry mid-plan; the remaining rounds must skip (including
    their tie machinery: at maxc == 0 EVERYTHING ties) and the fail round
    must come back exact across a compaction boundary."""
    _cmp([[7] * 150], 40)


def test_multitile_compaction_crossing():
    """Multi-tile stream trained past several COMPACT_EVERY boundaries: the
    in-kernel front compaction (pack + serial row stitch + pad fill) must
    preserve results bit-exactly, including first-occurrence tie-break
    order across the repack."""
    import jax.numpy as jnp

    import minbpe_tpu.ops.pallas.fused_train as ft

    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:33000]
    # multi-chunk stream so segment isolation rides across tile boundaries
    ends = list(range(11, len(text), 13)) + [len(text)]
    chunks = [text[a:b] for a, b in zip([0] + ends, ends) if b > a]
    ids, seg, n = st.pack_chunks(chunks)
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    M = 3 * ft.COMPACT_EVERY + 5  # crosses >= 3 compaction points
    p1, c1, f1 = train_merges(*args, M, select_mode="sort")
    p2, c2, f2 = train_merges_fused(*args, M, interpret=True)
    assert int(f1) == int(f2)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(c1) == np.asarray(c2)).all()
    assert ft._rows_for(ids.shape[0]) >= 2 * ft.SCAN_TILE_ROWS  # >= 2 tiles


def test_overlap_runs_live_tracking():
    """(a, a)-heavy corpus where occurrence counts EXCEED kept sites: the
    kernel's live-token tracking must subtract kept sites (merge-log column
    3), not occurrence counts — an occurrence-based tracker under-counts
    live tokens and mis-skips tiles after compaction."""
    import jax.numpy as jnp

    import minbpe_tpu.ops.pallas.fused_train as ft

    rng = random.Random(5)
    # long same-byte runs -> many overlapping occurrences every round
    parts = []
    for _ in range(4000):
        parts.append(bytes([rng.randint(0, 3)]) * rng.randint(1, 9))
    blob = b"".join(parts)
    ends = list(range(500, len(blob), 997)) + [len(blob)]
    chunks = [blob[a:b] for a, b in zip([0] + ends, ends) if b > a]
    ids, seg, n = st.pack_chunks(chunks)
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    M = 2 * ft.COMPACT_EVERY + 3
    p1, c1, f1 = train_merges(*args, M, select_mode="sort")
    p2, c2, f2 = train_merges_fused(*args, M, interpret=True)
    assert int(f1) == int(f2)
    assert (np.asarray(p1)[:int(f1)] == np.asarray(p2)[:int(f1)]).all()
    assert (np.asarray(c1)[:int(f1)] == np.asarray(c2)[:int(f1)]).all()


def test_from_bytes_parity():
    """train_merges_fused_bytes (device-built planes from uint8 data + chunk
    ends) must equal the plane-fed driver exactly."""
    from minbpe_tpu.ops.pallas.fused_train import train_merges_fused_bytes
    from minbpe_tpu.engine import _pack_raw
    import jax.numpy as jnp

    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:8192]
    ends_list = list(range(7, len(text), 9)) + [len(text)]
    chunks = [text[a:b] for a, b in zip([0] + ends_list, ends_list)]
    ids, seg, n = st.pack_chunks([c for c in chunks if c])
    p1, c1, f1 = train_merges_fused(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), 40,
        interpret=True)
    data = np.frombuffer(text, dtype=np.uint8)
    ends = np.asarray(ends_list, dtype=np.int64)
    from minbpe_tpu.ops.pallas.fused_train import fused_capacity
    raw = _pack_raw(data, ends, fused_capacity(len(text)))
    p2, c2, f2 = train_merges_fused_bytes(raw[0], raw[1], int(raw[2]), 40,
                                          interpret=True)
    assert int(f1) == int(f2)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(c1) == np.asarray(c2)).all()


# ---------------------------------------------------------------------------
# multi-merge batching (r5): corpora shaped to exercise the batch machinery
# ---------------------------------------------------------------------------

def test_batch_disjoint_hot_pairs():
    """Several token-disjoint hot pairs with well-separated counts: the
    selection walk should accept multi-merge batches, and the result must
    still be bit-identical to the sequential oracle."""
    rng = random.Random(11)
    words = [b"ab", b"cd", b"ef", b"gh", b"ij", b"kl"]
    chunks = []
    for _ in range(800):
        w = []
        for k, word in enumerate(words):
            # geometric-ish falloff => distinct counts => deep batches
            if rng.random() < 0.9 - 0.12 * k:
                w.append(word)
        w.append(bytes([rng.randint(0, 255)]))
        chunks.append(b"".join(w))
    _cmp(chunks, 24)


def test_batch_creation_bound_edge():
    """Created pairs immediately rival the next candidate: 'th' creates
    ('th', 'e') at nearly the count of the next-ranked pair, forcing the
    creation bound to trim batches. Exactness must survive the trim."""
    rng = random.Random(12)
    chunks = []
    for _ in range(600):
        parts = []
        if rng.random() < 0.95:
            parts.append(b"the")   # (t,h) then (th,e) chained
        if rng.random() < 0.6:
            parts.append(b"in")
        if rng.random() < 0.45:
            parts.append(b"er")
        parts.append(bytes([rng.randint(32, 90)]))
        chunks.append(b" ".join(parts))
    _cmp(chunks, 32)


def test_batch_homogeneous_argmax():
    """Homogeneous (x, x) argmax among heterogeneous rivals: batches must
    stop at homogeneous candidates and route them through the run-parity
    single-merge path."""
    rng = random.Random(13)
    chunks = []
    for _ in range(500):
        parts = [b"a" * rng.randint(2, 6)]
        if rng.random() < 0.7:
            parts.append(b"xy")
        if rng.random() < 0.5:
            parts.append(b"pq")
        chunks.append(b"".join(parts) + bytes([rng.randint(0, 255)]))
    _cmp(chunks, 20)


def test_batch_adjacent_sites():
    """Candidate sites adjacent in the stream ('ingo' => (i,n) and (g,o)
    sites touch): exercises the hypothesis-doubled wildcard accounting in
    both histograms."""
    rng = random.Random(14)
    chunks = []
    for _ in range(700):
        parts = []
        if rng.random() < 0.9:
            parts.append(b"ingo")
        if rng.random() < 0.55:
            parts.append(b"stat")
        parts.append(bytes([rng.randint(97, 122)]))
        chunks.append(b"".join(parts))
    _cmp(chunks, 28)


@pytest.mark.parametrize("seed", range(4))
def test_batch_random_midsize(seed):
    """Mid-size random corpora over a small alphabet: count spectra are
    dense, so batches trim at every depth; cross-checks selection, trim,
    combined apply, and the kill scan against the oracle."""
    rng = random.Random(700 + seed)
    chunks = []
    for _ in range(rng.randint(200, 400)):
        n = rng.randint(1, 30)
        chunks.append(bytes(rng.randint(0, 9) for _ in range(n)))
    _cmp(chunks, rng.randint(12, 40))


def test_tie_cliff_matmul_fallback():
    """maxc==1 corpus where EVERY pair ties (> TIE_SERIAL_MAX distinct
    pairs): selection must route through the fixed-cost matmul membership
    sweep and still match the oracle exactly (earliest-first-occurrence
    winner)."""
    import minbpe_tpu.ops.pallas.fused_train as ft

    # 2-byte chunks, each a distinct pair => every pair has count 1
    pairs = [(a, b) for a in range(3, 23) for b in range(30, 40)]
    assert len(pairs) > ft.TIE_SERIAL_MAX
    chunks = [bytes(p) for p in pairs]
    _cmp(chunks, 5)


def test_tie_cliff_fallback_mid_training():
    """Counts collapse to the all-tied tail mid-run (serial walk early,
    matmul fallback late in the same launch)."""
    rng = random.Random(21)
    chunks = [b"zz"] * 10 + [bytes((a, b)) for a in range(3, 19)
                             for b in range(30, 38)]
    rng.shuffle(chunks)
    _cmp(chunks, 8)


def test_batch_same_side_shares():
    """Same-side token shares — (a,b) then (a,c): the second candidate's
    left token equals an accepted LEFT token — are provably harmless and
    must batch together; cross-side chains like (t,h) then (h,e) must still
    stop the batch. Oracle-exactness is the arbiter."""
    rng = random.Random(31)
    chunks = []
    for _ in range(700):
        parts = []
        if rng.random() < 0.9:
            parts.append(b"ab")
        if rng.random() < 0.7:
            parts.append(b"ac")   # same-side with (a,b)
        if rng.random() < 0.5:
            parts.append(b"ad")   # same-side again
        if rng.random() < 0.35:
            parts.append(b"the")  # cross-side chain material
        parts.append(bytes([rng.randint(100, 255)]))
        chunks.append(b"".join(parts))
    _cmp(chunks, 30)


def test_batch_shared_right_tokens():
    """(b,x) then (c,x): right tokens shared — same-side on the right."""
    rng = random.Random(32)
    chunks = []
    for _ in range(600):
        parts = []
        if rng.random() < 0.85:
            parts.append(b"bx")
        if rng.random() < 0.6:
            parts.append(b"cx")
        if rng.random() < 0.4:
            parts.append(b"dx")
        parts.append(bytes([rng.randint(100, 255)]))
        chunks.append(b"".join(parts))
    _cmp(chunks, 24)

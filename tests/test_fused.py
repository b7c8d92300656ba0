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

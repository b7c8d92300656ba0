"""Incremental-count trainer must be bit-identical to the sort path / oracle."""

import random

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.train_inc import train_merges_incremental


from minbpe_tpu.ops.train_inc import train_merges_stepped


def _run_both(seqs, num_merges):
    import jax.numpy as jnp
    ids, seg, n = st.pack_chunks([bytes(s) for s in seqs])
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    p1, c1, f1 = train_merges(*args, num_merges, select_mode="sort")
    p2, c2, f2 = train_merges_incremental(*args, num_merges)
    p3, c3, f3 = train_merges_stepped(*args, num_merges, unroll=3)
    assert int(f2) == int(f3)
    assert (np.asarray(p2) == np.asarray(p3)).all()
    assert (np.asarray(c2) == np.asarray(c3)).all()
    return (np.asarray(p1), np.asarray(c1), int(f1)), \
           (np.asarray(p2), np.asarray(c2), int(f2))


@pytest.mark.parametrize("seed", range(12))
def test_matches_sort_path_random(seed):
    rng = random.Random(seed * 7 + 1)
    seqs = [
        [rng.randint(0, rng.choice([2, 4, 8])) for _ in range(rng.randint(0, 40))]
        for _ in range(rng.randint(1, 8))
    ]
    seqs.append([1, 1, 1, 1, 2, 1, 1, 1])  # overlap-run stress
    (p1, c1, f1), (p2, c2, f2) = _run_both(seqs, rng.randint(1, 12))
    assert f1 == f2
    assert (p1[:f1] == p2[:f1]).all()
    assert (c1[:f1] == c2[:f1]).all()


def test_overlapping_runs():
    # heavy same-byte runs exercise chain parity + incremental deltas
    seqs = [[7] * 25, [7] * 6, [7, 8] * 10, [8] * 3]
    (p1, c1, f1), (p2, c2, f2) = _run_both(seqs, 8)
    assert f1 == f2 and (p1 == p2).all() and (c1 == c2).all()


def test_corpus_slice_matches_sort():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:20000]
    import jax.numpy as jnp
    ids, seg, n = st.pack_bytes(text)
    args = (jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    p1, c1, f1 = train_merges(*args, 100, select_mode="sort")
    p2, c2, f2 = train_merges_incremental(*args, 100)
    assert int(f1) == int(f2) == 100
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(c1) == np.asarray(c2)).all()


def test_failure_round_matches():
    (p1, c1, f1), (p2, c2, f2) = _run_both([[1, 2]], 5)
    assert f1 == f2 == 1

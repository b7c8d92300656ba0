"""Sparse slot-table trainer must be bit-identical to the other exact paths
(sort / dense-incremental) and the oracle — including at vocab >= 8K, the
regime it exists for (dense [V,V] counting is infeasible there)."""

import random

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.train_inc import train_merges_incremental
from minbpe_tpu.ops.train_sparse import (
    train_merges_sparse, train_merges_sparse_stepped,
)


def _pack(seqs):
    import jax.numpy as jnp

    ids, seg, n = st.pack_chunks([bytes(s) for s in seqs])
    return jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n)


def _run_all(seqs, num_merges):
    args = _pack(seqs)
    p1, c1, f1 = train_merges(*args, num_merges, select_mode="sort")
    p2, c2, f2 = train_merges_sparse(*args, num_merges)
    p3, c3, f3 = train_merges_sparse_stepped(*args, num_merges, unroll=3)
    assert int(f2) == int(f3)
    assert (np.asarray(p2) == np.asarray(p3)).all()
    assert (np.asarray(c2) == np.asarray(c3)).all()
    return (np.asarray(p1), np.asarray(c1), int(f1)), \
           (np.asarray(p2), np.asarray(c2), int(f2))


@pytest.mark.parametrize("seed", range(12))
def test_matches_sort_path_random(seed):
    rng = random.Random(seed * 13 + 5)
    seqs = [
        [rng.randint(0, rng.choice([2, 4, 8]))
         for _ in range(rng.randint(0, 40))]
        for _ in range(rng.randint(1, 8))
    ]
    seqs.append([1, 1, 1, 1, 2, 1, 1, 1])  # overlap-run stress
    (p1, c1, f1), (p2, c2, f2) = _run_all(seqs, rng.randint(1, 12))
    assert f1 == f2
    assert (p1[:f1] == p2[:f1]).all()
    assert (c1[:f1] == c2[:f1]).all()


def test_overlapping_runs():
    seqs = [[7] * 25, [7] * 6, [7, 8] * 10, [8] * 3]
    (p1, c1, f1), (p2, c2, f2) = _run_all(seqs, 8)
    assert f1 == f2 and (p1 == p2).all() and (c1 == c2).all()


def test_failure_round_matches():
    (p1, c1, f1), (p2, c2, f2) = _run_all([[1, 2]], 5)
    assert f1 == f2 == 1


def test_matches_incremental_on_corpus_slice():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:20000]
    args = _pack([text])
    p1, c1, f1 = train_merges_incremental(*args, 150)
    p2, c2, f2 = train_merges_sparse(*args, 150)
    assert int(f1) == int(f2) == 150
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(c1) == np.asarray(c2)).all()


@pytest.mark.slow
def test_oracle_parity_vocab_8k():
    """The VERDICT 'done' bar: bit-parity vs the independent oracle at
    vocab >= 8K (7744+ merge rounds) — the regime with no dense-count path.
    Synthetic corpus: random small-alphabet ids so thousands of rounds
    succeed at modest N."""
    rng = random.Random(1234)
    seqs = [[rng.randint(0, 7) for _ in range(8000)] for _ in range(4)]
    M = 8192 - 256  # vocab 8192
    args = _pack([bytes(s) for s in seqs])
    p, c, f = train_merges_sparse_stepped(*args, M, unroll=64)
    f = int(f)
    assert 256 + f >= 8000  # the corpus must actually sustain ~8K vocab
    want = oracle.train(seqs, f)
    got = [((int(p[i, 0]), int(p[i, 1])), 256 + i) for i in range(f)]
    assert got == want


@pytest.mark.slow
def test_matches_sort_path_vocab_8k_corpus():
    """Real-corpus cross-check at vocab 8K against the sort path (itself
    oracle-validated): taylorswift slice, 7744 merges."""
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:60000]
    M = 8192 - 256
    args = _pack([text])
    p1, c1, f1 = train_merges(*args, M, select_mode="sort")
    p2, c2, f2 = train_merges_sparse_stepped(*args, M, unroll=64)
    f1, f2 = int(f1), int(f2)
    assert f1 == f2
    assert (np.asarray(p1)[:f1] == np.asarray(p2)[:f1]).all()
    assert (np.asarray(c1)[:f1] == np.asarray(c2)[:f1]).all()

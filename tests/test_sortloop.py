"""Differential tests for the sort-round trainer (ops/train_sortloop.py):
bit-identical to the sort/sparse paths and the oracle, at small and large
vocab, with checkpoints/resume (reference loop: minbpe/regex.py:49-66)."""

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops.stream import pack_offsets
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.train_sortloop import (
    train_merges_sortloop, train_merges_sortloop_stepped,
)
from minbpe_tpu.ops.train_sparse import train_merges_sparse


def _pack(chunks):
    data = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    ends = np.cumsum([len(c) for c in chunks]).astype(np.int64)
    return pack_offsets(data, ends)


def _oracle(chunks, M):
    learned = oracle.train([list(c) for c in chunks], M)
    return (np.array([p for p, _ in learned], np.int32),
            np.array([0 for _ in learned]))


CASES = [
    ([b"aaabdaaabac"], 3),
    ([b"hello world", b" hello", b"wor", b"ld!!"], 12),
    ([b"aaaaaaaa", b"aaaa", b"aa"], 3),
    ([bytes([i % 7, (i * 3) % 11, i % 5]) for i in range(200)], 40),
]


@pytest.mark.parametrize("chunks,M", CASES)
def test_sortloop_matches_oracle(chunks, M):
    ids, seg, n = _pack(chunks)
    want_pairs, _ = _oracle(chunks, M)
    pairs, counts, fail = train_merges_sortloop(ids, seg, n, M)
    assert int(fail) == M
    assert np.asarray(pairs).tolist() == want_pairs.tolist()


@pytest.mark.parametrize("chunks,M", CASES)
def test_sortloop_matches_sort_path(chunks, M):
    ids, seg, n = _pack(chunks)
    p1, c1, f1 = train_merges(ids, seg, n, M, select_mode="sort")
    p2, c2, f2 = train_merges_sortloop(ids, seg, n, M)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert int(f1) == int(f2)


def test_sortloop_stepped_identical_and_fail_round():
    chunks = [b"ab" * 30, b"cd" * 20, b"ab"]
    ids, seg, n = _pack(chunks)
    M = 64  # exhausts well before 64 merges
    p1, c1, f1 = train_merges(ids, seg, n, M, select_mode="sort")
    p2, c2, f2 = train_merges_sortloop_stepped(ids, seg, n, M, unroll=7)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert int(f1) == int(f2) < M


@pytest.mark.slow
def test_sortloop_corpus_vs_sparse_largevocab():
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:20000]
    # single segment (basic-tokenizer shape)
    ids, seg, n = _pack([text])
    M = 600  # vocab 856 — above nothing special, checks deep merge chains
    p1, c1, f1 = train_merges_sparse(ids, seg, n, M)
    p2, c2, f2 = train_merges_sortloop(ids, seg, n, M)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert int(f1) == int(f2)


def test_sortloop_checkpoint_resume(tmp_path):
    chunks = [b"the quick brown fox jumps over the lazy dog " * 8]
    ids, seg, n = _pack(chunks)
    M = 24
    ck = str(tmp_path / "sl.ckpt.npz")
    p1, c1, f1 = train_merges_sortloop_stepped(
        ids, seg, n, M, unroll=5, checkpoint_path=ck, checkpoint_every=10)
    p2, c2, f2 = train_merges_sortloop_stepped(
        ids, seg, n, M, unroll=5, resume_from=ck)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert int(f1) == int(f2) == M


@pytest.mark.slow
def test_engine_routes_largevocab_to_sortloop():
    from minbpe_tpu import RegexTokenizer

    text = open("/root/reference/tests/taylorswift.txt",
                encoding="utf-8").read()[:40000]
    t1 = RegexTokenizer()
    t1.train(text, 256 + 2300)  # > DENSE_SELECT_MAX -> sortloop on auto
    t2 = RegexTokenizer()
    t2.train(text, 256 + 2300, select_mode="sparse")
    assert t1.merges == t2.merges


@pytest.mark.slow
def test_sortloop_oracle_parity_vocab_8k():
    """Bit-parity vs the independent oracle at vocab 8192 (7936 merge
    rounds) — the regime the sort-round loop now owns by default."""
    import random

    rng = random.Random(1234)
    seqs = [[rng.randint(0, 7) for _ in range(8000)] for _ in range(4)]
    M = 8192 - 256
    ids, seg, n = _pack([bytes(s) for s in seqs])
    p, c, f = train_merges_sortloop_stepped(ids, seg, n, M, unroll=256)
    f = int(f)
    assert 256 + f >= 8000
    want = oracle.train(seqs, f)
    got = [((int(p[i, 0]), int(p[i, 1])), 256 + i) for i in range(f)]
    assert got == want


@pytest.mark.slow
def test_sortloop_matches_sparse_vocab_8k_corpus():
    """Real-corpus cross-check at vocab 8192 against the sparse path
    (itself oracle-validated at this scale): taylorswift slice."""
    text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:60000]
    M = 8192 - 256
    ids, seg, n = _pack([text])
    p1, c1, f1 = train_merges_sparse(ids, seg, n, M)
    p2, c2, f2 = train_merges_sortloop_stepped(ids, seg, n, M, unroll=256)
    f1, f2 = int(f1), int(f2)
    assert f1 == f2
    assert (np.asarray(p1)[:f1] == np.asarray(p2)[:f1]).all()
    assert (np.asarray(c1)[:f1] == np.asarray(c2)[:f1]).all()

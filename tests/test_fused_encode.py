"""Fused rank-sweep encode kernel: parity with the oracle (interpret mode)."""

import random

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.pallas.fused_encode import encode_fused


def _table(rng, n_merges=10):
    train_seqs = [[rng.randint(0, 4) for _ in range(rng.randint(5, 60))]
                  for _ in range(3)]
    merges = oracle.train(train_seqs, n_merges)
    ranks = {p: (r, nid) for r, (p, nid) in enumerate(merges)}
    pairs = np.array([list(p) for p, _ in merges], np.int32)
    nids = np.array([nid for _, nid in merges], np.int32)
    return pairs, nids, ranks


@pytest.mark.parametrize("seed", range(6))
def test_matches_oracle(seed):
    rng = random.Random(500 + seed)
    pairs, nids, ranks = _table(rng, rng.randint(1, 12))
    seqs = [[rng.randint(0, 4) for _ in range(rng.randint(0, 40))]
            for _ in range(rng.randint(1, 5))]
    expected = []
    for s in seqs:
        expected.extend(oracle.encode(s, ranks))
    ids, seg, n = st.pack_chunks([bytes(s) for s in seqs])
    got = encode_fused(ids, seg, n, pairs, nids, interpret=True).tolist()
    assert got == expected


def test_overlap_runs():
    pairs = np.array([[7, 7], [256, 7]], np.int32)
    nids = np.array([256, 257], np.int32)
    ranks = {(7, 7): (0, 256), (256, 7): (1, 257)}
    for seq in ([7] * 9, [7] * 4, [7, 7, 8, 7, 7, 7]):
        ids, seg, n = st.pack_bytes(bytes(seq))
        got = encode_fused(ids, seg, n, pairs, nids, interpret=True).tolist()
        assert got == oracle.encode(seq, ranks)


def test_empty_and_no_merges():
    ids, seg, n = st.pack_bytes(b"")
    assert encode_fused(ids, seg, n, np.zeros((0, 2), np.int32),
                        np.zeros(0, np.int32), interpret=True).tolist() == []
    ids, seg, n = st.pack_bytes(b"abc")
    assert encode_fused(ids, seg, n, np.zeros((0, 2), np.int32),
                        np.zeros(0, np.int32),
                        interpret=True).tolist() == [97, 98, 99]


def test_encode_fused_bytes_matches_planes():
    """Bytes-fed prep (device-side plane building) must agree with the
    packed-planes path and the oracle on a multi-chunk stream."""
    from minbpe_tpu.ops.pallas.fused_encode import encode_fused_bytes

    chunks = [b"hello", b" world", b"hello", b" there", b"ll", b"o"]
    merges = oracle.train(chunks, 6)
    pairs = np.array([list(p) for p, _ in merges], np.int32)
    nids = np.array([nid for _, nid in merges], np.int32)
    ids, seg, n = st.pack_chunks(chunks)
    want = encode_fused(ids, seg, n, pairs, nids, interpret=True).tolist()

    data = np.frombuffer(b"".join(chunks), np.uint8)
    ends = np.cumsum([len(c) for c in chunks]).astype(np.int32)
    got = encode_fused_bytes(data, ends, len(data), pairs, nids,
                             interpret=True).tolist()
    assert got == want


def test_tiled_branch_matches_plane_branch(monkeypatch):
    """The R-threshold switch between whole-plane value scans and the
    tile-sequential passes must not change results."""
    import minbpe_tpu.ops.pallas.fused_encode as fe

    rng = random.Random(7)
    chunks = [bytes(rng.randint(97, 102) for _ in range(rng.randint(1, 9)))
              for _ in range(40)]
    merges = oracle.train(chunks, 8)
    pairs = np.array([list(p) for p, _ in merges], np.int32)
    nids = np.array([nid for _, nid in merges], np.int32)
    ids, seg, n = st.pack_chunks(chunks)
    want = encode_fused(ids, seg, n, pairs, nids, interpret=True).tolist()
    monkeypatch.setattr(fe, "TILED_MIN_R", 0)  # force the tiled branch
    fe._fused_encode_raw.clear_cache()
    got = encode_fused(ids, seg, n, pairs, nids, interpret=True).tolist()
    fe._fused_encode_raw.clear_cache()
    assert got == want

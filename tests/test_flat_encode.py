"""Differential tests for the flat-stream large-vocab encoder
(ops/flat_encode.py) against the oracle's per-chunk greedy encode
(reference loop: minbpe/regex.py:96-121) and the bucketed chunk encoder."""

import numpy as np
import pytest
import regex as re

from minbpe_tpu.ops.ranktab import (
    CuckooPairTable, SortedPairTable, RANK_INF,
)
from minbpe_tpu.ops import flat_encode, chunk_encode
from minbpe_tpu.regex import GPT4_SPLIT_PATTERN

import oracle

PAT = re.compile(GPT4_SPLIT_PATTERN)


def _chunks(text):
    return [c.encode("utf-8") for c in re.findall(PAT, text)]


def _ends_for(chunks):
    return np.cumsum([len(c) for c in chunks]).astype(np.int64)


def _data_for(chunks):
    return np.frombuffer(b"".join(chunks), dtype=np.uint8)


def _learn(train_text, num_merges):
    """(cuckoo, sorted, oracle-ranks) tables from oracle-trained merges
    (stops early if the corpus exhausts)."""
    seqs = [list(c) for c in _chunks(train_text)]
    learned = []
    for r in range(num_merges):
        counts, first = oracle.scan_pairs(seqs)
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], -first[kv[0]]))[0]
        nid = 256 + r
        seqs = [oracle.substitute(s, best, nid) for s in seqs]
        learned.append((best, nid))
    pairs = np.array([[a, b] for (a, b), _ in learned], dtype=np.int32
                     ).reshape(-1, 2)
    new_ids = np.array([nid for _, nid in learned], dtype=np.int32)
    ranks = {pair: (r, nid) for r, (pair, nid) in enumerate(learned)}
    return (CuckooPairTable(pairs, new_ids), SortedPairTable(pairs, new_ids),
            ranks)


def _ref_encode(chunks, ranks):
    out = []
    for c in chunks:
        out.extend(oracle.encode(list(c), ranks))
    return out


def test_cuckoo_lookup_exact():
    rng = np.random.default_rng(0)
    M = 5000
    keys = set()
    while len(keys) < M:
        keys.add((int(rng.integers(0, 1 << 17)), int(rng.integers(0, 1 << 17))))
    pairs = np.array(sorted(keys), dtype=np.int32)
    new_ids = np.arange(M, dtype=np.int32) + 256
    t = CuckooPairTable(pairs, new_ids)
    import jax.numpy as jnp

    r, nid = t.lookup(jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]))
    assert np.array_equal(np.asarray(r), np.arange(M))
    assert np.array_equal(np.asarray(nid), new_ids)
    # misses: perturbed keys not in the set
    qa = pairs[:, 0] + 1
    miss = np.array([(int(a), int(b)) not in keys
                     for a, b in zip(qa, pairs[:, 1])])
    r2, _ = t.lookup(jnp.asarray(qa), jnp.asarray(pairs[:, 1]))
    assert np.all(np.asarray(r2)[miss] == RANK_INF)


@pytest.mark.parametrize("text", [
    "aaabdaaabac" * 40,
    "hello world!!!? (안녕하세요!) lol123 😉 " * 30,
    "x",
    "  \n\n  mixed   WS\t and 12345 numbers 67890  ",
])
def test_flat_matches_oracle(text):
    cuckoo, _, ranks = _learn(text + " padding corpus for merge variety", 150)
    chunks = _chunks(text)
    want = _ref_encode(chunks, ranks)
    got, lens = flat_encode.encode_offsets_arrays(
        _data_for(chunks), _ends_for(chunks), cuckoo)
    assert got.tolist() == want
    assert int(lens.sum()) == len(want)


@pytest.mark.slow
def test_flat_matches_chunk_encoder_corpus():
    text = open("/root/reference/tests/taylorswift.txt",
                encoding="utf-8").read()[:30000]
    cuckoo, sorted_t, ranks = _learn(text, 256)
    chunks = _chunks(text)
    data, ends = _data_for(chunks), _ends_for(chunks)
    got, lens = flat_encode.encode_offsets_arrays(data, ends, cuckoo)
    want, want_lens = chunk_encode.encode_offsets_arrays(data, ends, sorted_t)
    assert got.tolist() == want.tolist()
    assert lens.tolist() == want_lens.tolist()
    assert got.tolist() == _ref_encode(chunks, ranks)


def test_flat_empty_and_single():
    cuckoo, _, _ = _learn("some text to make merges work ok", 40)
    got, lens = flat_encode.encode_offsets_arrays(
        np.zeros(0, np.uint8), np.zeros(0, np.int64), cuckoo)
    assert got.tolist() == [] and lens.tolist() == []
    got, lens = flat_encode.encode_offsets_arrays(
        np.frombuffer(b"z", dtype=np.uint8), np.array([1], np.int64), cuckoo)
    assert got.tolist() == [ord("z")]
    assert lens.tolist() == [1]


def test_flat_long_chunks():
    """Chunks longer than any old bucket (pathological runs) work in-stream,
    including the left-first parity tie on (a, a) runs."""
    cuckoo, _, ranks = _learn("a" * 500 + " aa aaa " + "b" * 300 + " ab" * 50,
                              60)
    chunks = [b"a" * 5000, b" " * 3000, b"ab" * 100, b"a" * 7]
    want = _ref_encode(chunks, ranks)
    got, _ = flat_encode.encode_offsets_arrays(
        _data_for(chunks), _ends_for(chunks), cuckoo)
    assert got.tolist() == want


def test_flat_randomized_vs_oracle():
    rng = np.random.default_rng(7)
    alphabet = "ab c\nde"
    for trial in range(6):
        train_text = "".join(rng.choice(list(alphabet), size=800))
        text = "".join(rng.choice(list(alphabet), size=400))
        cuckoo, _, ranks = _learn(train_text, 80)
        chunks = _chunks(text)
        if not chunks:
            continue
        want = _ref_encode(chunks, ranks)
        got, _ = flat_encode.encode_offsets_arrays(
            _data_for(chunks), _ends_for(chunks), cuckoo)
        assert got.tolist() == want, f"trial {trial}"

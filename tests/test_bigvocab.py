"""Large-vocab machinery: sorted pair table, bucketed chunk encoder,
sorted-stream encoder, and GPT-4 merge-forest recovery — all tested
hermetically (synthetic ranks; no cl100k file needed)."""

import random

import numpy as np
import pytest

import oracle
from minbpe_tpu.ops.ranktab import SortedPairTable
from minbpe_tpu.ops.chunk_encode import encode_chunk_list
from minbpe_tpu.ops.encode import encode_stream_sorted
from minbpe_tpu.ops import stream as st


def _trained_table(rng, alphabet=5, n_merges=12):
    seqs = [
        [rng.randint(0, alphabet - 1) for _ in range(rng.randint(5, 50))]
        for _ in range(rng.randint(2, 6))
    ]
    merges = oracle.train(seqs, n_merges)
    pairs = np.array([list(p) for p, _ in merges], dtype=np.int32)
    new_ids = np.array([nid for _, nid in merges], dtype=np.int32)
    ranks = {pair: (r, nid) for r, (pair, nid) in enumerate(merges)}
    return SortedPairTable(pairs, new_ids), ranks


class TestSortedPairTable:
    def test_lookup_roundtrip(self):
        rng = random.Random(7)
        table, ranks = _trained_table(rng)
        import jax.numpy as jnp
        pairs = list(ranks.keys()) + [(0, 999), (999, 0), (1, 1), (255, 255)]
        a = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
        b = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
        got = np.asarray(table.lookup(a, b, jnp.full(a.shape, True)))
        for i, p in enumerate(pairs):
            expect = ranks[p][0] if p in ranks else 2**31 - 1
            assert got[i] == expect, (p, got[i], expect)

    def test_invalid_masked(self):
        rng = random.Random(8)
        table, ranks = _trained_table(rng)
        import jax.numpy as jnp
        p = next(iter(ranks))
        a = jnp.asarray(np.array([p[0]], np.int32))
        b = jnp.asarray(np.array([p[1]], np.int32))
        assert int(table.lookup(a, b, jnp.asarray([False]))[0]) == 2**31 - 1


@pytest.mark.parametrize("seed", range(6))
def test_chunk_encoder_matches_oracle(seed):
    rng = random.Random(40 + seed)
    table, ranks = _trained_table(rng)
    chunks = [
        bytes(rng.randint(0, 4) for _ in range(rng.randint(0, 60)))
        for _ in range(rng.randint(1, 30))
    ]
    expected = []
    for c in chunks:
        expected.extend(oracle.encode(list(c), ranks))
    assert encode_chunk_list(chunks, table) == expected


@pytest.mark.parametrize("seed", range(4))
def test_sorted_stream_matches_oracle(seed):
    rng = random.Random(80 + seed)
    table, ranks = _trained_table(rng)
    seq = [rng.randint(0, 4) for _ in range(rng.randint(0, 120))]
    expected = oracle.encode(seq, ranks)
    import jax.numpy as jnp
    ids, seg, n = st.pack_bytes(bytes(seq))
    out_ids, out_n = encode_stream_sorted(
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
        table.ka, table.kb, table.rank, table.merge_pairs, table.merge_ids,
        table.depth,
    )
    assert st.unpack_ids(np.asarray(out_ids), int(out_n)) == expected


class TestGPT4Recovery:
    def _fake_mergeable_ranks(self, rng):
        """Build a tiktoken-style ranks dict (bytes -> rank) with a byte
        permutation, from an oracle-trained merge list."""
        perm = list(range(256))
        rng.shuffle(perm)  # raw byte value b gets rank perm[b]
        text_seqs = [
            [rng.randint(97, 105) for _ in range(rng.randint(10, 60))]
            for _ in range(4)
        ]
        # train in *shuffled* id space like cl100k does
        shuffled = [[perm[x] for x in s] for s in text_seqs]
        merges = oracle.train(shuffled, 16)

        inv = {r: b for b, r in enumerate(perm)}
        token_bytes = {r: bytes([inv[r]]) for r in range(256)}
        ranks = {bytes([b]): perm[b] for b in range(256)}
        for (p0, p1), nid in merges:
            token_bytes[nid] = token_bytes[p0] + token_bytes[p1]
            ranks[token_bytes[nid]] = nid
        return ranks, merges

    @pytest.mark.parametrize("seed", range(4))
    def test_recover_merge_forest(self, seed):
        from minbpe_tpu.gpt4 import recover_merge_forest

        rng = random.Random(200 + seed)
        ranks, merges = self._fake_mergeable_ranks(rng)
        recovered = recover_merge_forest(ranks)
        assert recovered == {pair: nid for pair, nid in merges}

    @pytest.mark.parametrize("seed", range(3))
    def test_full_tokenizer_from_ranks(self, seed):
        """End-to-end GPT4-style tokenizer from synthetic ranks: byte-shuffled
        encode must equal a tiktoken-style oracle; decode must round-trip."""
        from minbpe_tpu.gpt4 import GPT4Tokenizer

        rng = random.Random(700 + seed)
        ranks, merges = self._fake_mergeable_ranks(rng)
        tok = GPT4Tokenizer.from_mergeable_ranks(
            ranks, {"<|endoftext|>": 400}
        )

        # oracle emulation of tiktoken: split per GPT-4 pattern, shuffle
        # bytes, greedy min-rank merge
        perm = {b: ranks[bytes([b])] for b in range(256)}
        rank_table = {p: (r, nid) for r, (p, nid) in enumerate(merges)}
        text = "".join(
            chr(rng.randint(97, 105)) for _ in range(rng.randint(20, 200))
        ) + " hello't world 123"
        expected = []
        for chunk in tok._split_chunks(text):
            shuffled = [perm[b] for b in chunk]
            expected.extend(oracle.encode(shuffled, rank_table))
        got = tok.encode(text)
        assert got == expected
        assert tok.decode(got) == text
        # specials path (encode side); note: like the reference
        # (minbpe/gpt4.py:87-92), GPT4-style decode only handles vocab ids —
        # special ids raise (the reference KeyErrors identically)
        with_special = tok.encode("a<|endoftext|>b", allowed_special="all")
        assert 400 in with_special
        with pytest.raises(KeyError):
            tok.decode(with_special)
        no_special = [i for i in with_special if i != 400]
        assert tok.decode(no_special) == "ab"

    def test_save_vocab_from_ranks(self, tmp_path):
        from minbpe_tpu.gpt4 import GPT4Tokenizer

        rng = random.Random(900)
        ranks, _ = self._fake_mergeable_ranks(rng)
        tok = GPT4Tokenizer.from_mergeable_ranks(ranks)
        out = tmp_path / "g.vocab"
        tok.save_vocab(str(out))
        lines = out.read_text(encoding="utf-8").splitlines()
        assert len(lines) == 256 + 16  # bytes + merges
        assert all("] " in ln for ln in lines)

    def test_disabled_surface(self):
        from minbpe_tpu.gpt4 import GPT4Tokenizer

        rng = random.Random(901)
        ranks, _ = self._fake_mergeable_ranks(rng)
        tok = GPT4Tokenizer.from_mergeable_ranks(ranks)
        with pytest.raises(NotImplementedError):
            tok.train("x", 300)
        with pytest.raises(NotImplementedError):
            tok.save("x")
        with pytest.raises(NotImplementedError):
            tok.load("x.model")

"""Unit tests for the device ops (select / merge / compact / train / encode)
plus randomized differential tests against the pure-Python oracle."""

import random

import numpy as np
import pytest

from minbpe_tpu.ops import stream as st
from minbpe_tpu.ops.select import select_max_pair
from minbpe_tpu.ops.merge import apply_merge
from minbpe_tpu.ops.train import train_merges
from minbpe_tpu.ops.encode import build_rank_table, encode_stream
from minbpe_tpu import engine

import oracle


def pack_seqs(seqs):
    return st.pack_chunks([bytes(s) for s in seqs])


def run_select(seqs):
    ids, seg, n = pack_seqs(seqs)
    import jax.numpy as jnp
    pa, pb, cnt, ok = select_max_pair(jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))
    return int(pa), int(pb), int(cnt), bool(ok)


class TestSelect:
    def test_simple(self):
        assert run_select([[1, 2, 3, 1, 2]]) == (1, 2, 2, True)

    def test_tie_breaks_by_first_occurrence(self):
        # (3,4) and (1,2) both occur twice; (1,2) occurs first.
        assert run_select([[1, 2, 3, 4, 1, 2, 3, 4]])[:2] == (1, 2)
        # ... even when the later pair would win a lexicographic order.
        assert run_select([[9, 8, 1, 2, 9, 8, 1, 2]])[:2] == (9, 8)

    def test_overlapping_run_counts_each_adjacency(self):
        # [a,a,a] -> get_stats counts (a,a) twice (minbpe/base.py:20-21)
        assert run_select([[7, 7, 7]]) == (7, 7, 2, True)

    def test_segments_isolate_pairs(self):
        # pair split across two chunks never counted
        pa, pb, cnt, ok = run_select([[1], [2], [3]])
        assert not ok
        assert run_select([[1, 2], [1, 2]]) == (1, 2, 2, True)

    def test_empty(self):
        ids, seg, n = st.pack_bytes(b"")
        import jax.numpy as jnp
        ok = select_max_pair(jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n))[3]
        assert not bool(ok)


class TestApplyMerge:
    def _apply(self, seqs, pair, new_id):
        import jax.numpy as jnp
        ids, seg, n = pack_seqs(seqs)
        out_ids, out_seg, out_n, k = apply_merge(
            jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
            jnp.int32(pair[0]), jnp.int32(pair[1]), jnp.int32(new_id),
        )
        return st.unpack_ids(np.asarray(out_ids), int(out_n)), int(k)

    def test_basic(self):
        out, k = self._apply([[1, 2, 3, 1, 2]], (1, 2), 4)
        assert (out, k) == ([4, 3, 4], 2)

    def test_overlap_left_first(self):
        # [a,a,a] -> [Z,a] (minbpe/base.py:33-41 guard)
        out, _ = self._apply([[7, 7, 7]], (7, 7), 9)
        assert out == [9, 7]
        out, _ = self._apply([[7, 7, 7, 7]], (7, 7), 9)
        assert out == [9, 9]
        out, _ = self._apply([[7, 7, 7, 7, 7]], (7, 7), 9)
        assert out == [9, 9, 7]

    def test_segment_boundary_not_merged(self):
        out, k = self._apply([[1, 2], [2, 2]], (2, 2), 9)
        assert (out, k) == ([1, 2, 9], 1)

    def test_adjacent_runs_after_gap(self):
        out, _ = self._apply([[7, 7, 1, 7, 7]], (7, 7), 9)
        assert out == [9, 1, 9]


class TestTrainParity:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_streams_match_oracle(self, seed):
        rng = random.Random(seed)
        nseqs = rng.randint(1, 6)
        seqs = [
            [rng.randint(0, 5) for _ in range(rng.randint(0, 30))]
            for _ in range(nseqs)
        ]
        total_pairs = sum(max(0, len(s) - 1) for s in seqs)
        if total_pairs < 4:
            seqs.append([1, 2, 1, 2, 3, 1, 2])
        num_merges = rng.randint(1, 6)

        try:
            expected = oracle.train(seqs, num_merges)
        except ValueError:
            expected = None

        import jax.numpy as jnp
        ids, seg, n = pack_seqs(seqs)
        pairs, counts, fail = train_merges(
            jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n), num_merges
        )
        if expected is None:
            assert int(fail) < num_merges
        else:
            assert int(fail) == num_merges
            got = [((int(pairs[i, 0]), int(pairs[i, 1])), 256 + i)
                   for i in range(num_merges)]
            assert got == expected


class TestEncodeParity:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_encode_matches_oracle(self, seed):
        rng = random.Random(100 + seed)
        train_seqs = [
            [rng.randint(0, 4) for _ in range(rng.randint(5, 40))]
            for _ in range(rng.randint(1, 4))
        ]
        merges = oracle.train(train_seqs, rng.randint(1, 8))
        ranks = {pair: (r, nid) for r, (pair, nid) in enumerate(merges)}
        pairs_arr = np.array([list(p) for p, _ in merges], dtype=np.int32)
        new_ids = np.array([nid for _, nid in merges], dtype=np.int32)
        V = int(new_ids.max()) + 1

        import jax.numpy as jnp
        table = jnp.asarray(build_rank_table(pairs_arr, V))
        for _ in range(4):
            seqs = [
                [rng.randint(0, 4) for _ in range(rng.randint(0, 25))]
                for _ in range(rng.randint(1, 4))
            ]
            expected = []
            for s in seqs:
                expected.extend(oracle.encode(s, ranks))
            ids, seg, n = pack_seqs(seqs)
            out_ids, out_n = encode_stream(
                jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(n),
                table, jnp.asarray(pairs_arr), jnp.asarray(new_ids),
            )
            assert st.unpack_ids(np.asarray(out_ids), int(out_n)) == expected


def test_engine_empty_inputs():
    from minbpe_tpu import BasicTokenizer
    tok = BasicTokenizer()
    assert tok.encode("") == []
    assert tok.decode([]) == ""

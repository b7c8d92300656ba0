"""Distributed training parity: 8 virtual CPU devices vs single-device vs
oracle. The mesh/psum path must be bit-identical to the reference semantics."""

import random

import pytest

import oracle
from minbpe_tpu.parallel.train import (
    make_mesh, train_chunks_distributed, shard_chunks,
)


@pytest.mark.parametrize("seed", range(6))
def test_distributed_matches_oracle(seed):
    rng = random.Random(seed)
    chunks = [
        bytes(rng.randint(97, 104) for _ in range(rng.randint(1, 24)))
        for _ in range(rng.randint(2, 40))
    ]
    num_merges = rng.randint(1, 10)
    try:
        expected = oracle.train(chunks, num_merges)
    except ValueError:
        expected = None

    mesh = make_mesh(8)
    if expected is None:
        with pytest.raises(ValueError):
            train_chunks_distributed(chunks, num_merges, mesh)
        return
    merges, _ = train_chunks_distributed(chunks, num_merges, mesh)
    assert merges == {pair: nid for pair, nid in expected}


def test_distributed_matches_single_device_on_text():
    from minbpe_tpu import RegexTokenizer

    text = ("Distributed byte pair encoding must agree exactly with the "
            "single device path, ties and all. " * 30)
    single = RegexTokenizer()
    single.train(text, 256 + 48)

    chunks = single._split_chunks(text)
    merges, _ = train_chunks_distributed(chunks, 48, make_mesh(8))
    assert merges == single.merges


class TestBasicHalo:
    """Unsegmented (Basic) distributed training: cross-shard pairs must be
    counted and merged with exact global left-first parity."""

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_oracle(self, seed):
        from minbpe_tpu.parallel.train import train_bytes_distributed

        rng = random.Random(1000 + seed)
        # small alphabets + runs force merges and runs straddling shards
        data = bytes(
            rng.choice([rng.randint(97, 99), 97])
            for _ in range(rng.randint(16, 300))
        )
        num_merges = rng.randint(1, 8)
        try:
            expected = oracle.train([list(data)], num_merges)
        except ValueError:
            expected = None
        mesh = make_mesh(8)
        if expected is None:
            with pytest.raises(ValueError):
                train_bytes_distributed(data, num_merges, mesh)
            return
        merges, _ = train_bytes_distributed(data, num_merges, mesh)
        assert merges == {pair: nid for pair, nid in expected}

    def test_single_byte_runs_across_shards(self):
        from minbpe_tpu.parallel.train import train_bytes_distributed

        # one long run of 'a': merges and runs cross every shard boundary
        data = b"a" * 131
        expected = oracle.train([list(data)], 4)
        merges, _ = train_bytes_distributed(data, 4, make_mesh(8))
        assert merges == {pair: nid for pair, nid in expected}

    def test_matches_single_device_corpus_slice(self):
        from minbpe_tpu import BasicTokenizer
        from minbpe_tpu.parallel.train import train_bytes_distributed

        text = open("/root/reference/tests/taylorswift.txt", "rb").read()[:4000]
        single = BasicTokenizer()
        single.train(text.decode("utf-8", errors="ignore"), 256 + 32)
        data = text.decode("utf-8", errors="ignore").encode("utf-8")
        merges, _ = train_bytes_distributed(data, 32, make_mesh(8))
        assert merges == single.merges


class TestSparseSelection:
    """Sorted-run sparse selection (the any-vocab path): bit-identical to
    dense selection and the oracle."""

    @pytest.mark.parametrize("seed", range(5))
    def test_matches_dense(self, seed):
        rng = random.Random(2000 + seed)
        chunks = [
            bytes(rng.randint(97, 106) for _ in range(rng.randint(1, 30)))
            for _ in range(rng.randint(3, 40))
        ]
        num_merges = rng.randint(2, 10)
        mesh = make_mesh(8)
        try:
            dense, _ = train_chunks_distributed(chunks, num_merges, mesh)
        except ValueError:
            with pytest.raises(ValueError):
                train_chunks_distributed(chunks, num_merges, mesh,
                                         selection="sparse")
            return
        sparse, _ = train_chunks_distributed(chunks, num_merges, mesh,
                                             selection="sparse")
        assert sparse == dense

    def test_overflow_detected(self):
        from minbpe_tpu.parallel.train import (
            build_distributed_train, shard_chunks,
        )
        import jax.numpy as jnp

        rng = random.Random(1)
        chunks = [bytes(rng.randint(0, 255) for _ in range(64))
                  for _ in range(16)]
        mesh = make_mesh(8)
        ids, seg, lens = shard_chunks(chunks, 8)
        Nl = ids.shape[0] // 8
        fn = build_distributed_train(mesh, 2, 258, Nl, selection="sparse",
                                     sparse_cap=4)  # absurdly small
        _, _, _, oflow = fn(jnp.asarray(ids), jnp.asarray(seg),
                            jnp.asarray(lens))
        assert int(oflow) == 1


def test_shard_chunks_layout():
    chunks = [b"abc", b"de", b"f", b"ghij", b"kl"]
    ids, seg, lens = shard_chunks(chunks, 4)
    assert int(lens.sum()) == sum(len(c) for c in chunks)
    # chunk-aligned: every chunk's bytes are contiguous in one shard
    Nl = ids.shape[0] // 4
    flat = []
    for d in range(4):
        row = ids[d * Nl:(d + 1) * Nl]
        flat.extend(int(x) for x in row if x >= 0)
    assert bytes(flat) == b"".join(chunks)


class TestOwnerSelection:
    """Owner-sharded keyspace selection (the large-mesh path): routes each
    pair's summaries to its owner device over an all_to_all, so only D
    champions are ever replicated. Must be bit-identical to dense/sparse."""

    @pytest.mark.parametrize("seed", range(5))
    def test_matches_dense(self, seed):
        rng = random.Random(3000 + seed)
        chunks = [
            bytes(rng.randint(97, 106) for _ in range(rng.randint(1, 30)))
            for _ in range(rng.randint(3, 40))
        ]
        num_merges = rng.randint(2, 10)
        mesh = make_mesh(8)
        try:
            dense, _ = train_chunks_distributed(chunks, num_merges, mesh)
        except ValueError:
            with pytest.raises(ValueError):
                train_chunks_distributed(chunks, num_merges, mesh,
                                         selection="owner")
            return
        owner, _ = train_chunks_distributed(chunks, num_merges, mesh,
                                            selection="owner")
        assert owner == dense

    def test_matches_oracle_on_text(self):
        text = ("Owner sharded keyspace selection must agree exactly, "
                "ties included. " * 20)
        chunks = [w.encode() for w in text.split(" ") if w]
        expected = oracle.train(chunks, 12)
        mesh = make_mesh(8)
        merges, _ = train_chunks_distributed(chunks, 12, mesh,
                                             selection="owner")
        assert merges == {pair: nid for pair, nid in expected}

    def test_bucket_overflow_detected(self):
        from minbpe_tpu.parallel.train import build_distributed_train
        import jax.numpy as jnp

        rng = random.Random(1)
        chunks = [bytes(rng.randint(0, 255) for _ in range(64))
                  for _ in range(16)]
        mesh = make_mesh(8)
        ids, seg, lens = shard_chunks(chunks, 8)
        Nl = ids.shape[0] // 8
        fn = build_distributed_train(mesh, 2, 258, Nl, selection="owner",
                                     owner_cap=1)  # absurdly small buckets
        _, _, _, oflow = fn(jnp.asarray(ids), jnp.asarray(seg),
                            jnp.asarray(lens))
        assert int(oflow) == 1


class TestSteppedCheckpoint:
    """Host-driven stepped distributed trainer + checkpoint/resume: killing a
    run mid-way and resuming from its checkpoint must be bit-identical to an
    uninterrupted run (VERDICT r4 #4; reference analogue is final-artifact
    persistence only, minbpe/base.py:97-165)."""

    def test_stepped_matches_single_jit(self):
        from minbpe_tpu import RegexTokenizer

        text = ("Stepped distributed training must match the one-launch "
                "program exactly, ties included. " * 40)
        single = RegexTokenizer()
        single.train(text, 256 + 30)
        chunks = single._split_chunks(text)
        merges, _ = train_chunks_distributed(
            chunks, 30, make_mesh(8), checkpoint_every=7)
        assert merges == single.merges

    def test_kill_and_resume_bit_identical(self, tmp_path):
        from minbpe_tpu.parallel.train import _train_distributed_stepped
        from minbpe_tpu.utils import checkpoint as ck

        rng = random.Random(77)
        chunks = [
            bytes(rng.randint(97, 105) for _ in range(rng.randint(1, 20)))
            for _ in range(60)
        ]
        M = 26
        mesh = make_mesh(8)
        full, _ = train_chunks_distributed(chunks, M, mesh)

        # run WITH checkpointing but "kill" it by training only a prefix:
        # drive the stepped trainer for fewer merges, keeping its checkpoint
        path = str(tmp_path / "dist.ckpt.npz")
        ids, seg, lens = shard_chunks(chunks, 8)
        try:
            _train_distributed_stepped(
                ids, seg, lens, M, mesh, False, "dense", path, 8, None)
        except BaseException:
            pass
        # simulate the kill at the FIRST checkpoint: rewrite round_idx back
        state = ck.load(path)
        assert state["round_idx"] >= 8
        ck.save(path, state["pairs"][:8], state["counts"][:8], 8, M,
                state["fingerprint"])

        resumed, _ = train_chunks_distributed(
            chunks, M, mesh, checkpoint_path=str(tmp_path / "d2.npz"),
            checkpoint_every=8, resume_from=path)
        assert resumed == full

    def test_resume_wrong_corpus_rejected(self, tmp_path):
        rng = random.Random(78)
        chunks = [bytes(rng.randint(97, 103) for _ in range(12))
                  for _ in range(40)]
        path = str(tmp_path / "c.npz")
        mesh = make_mesh(8)
        train_chunks_distributed(chunks, 10, mesh, checkpoint_path=path,
                                 checkpoint_every=4)
        other = [b"different corpus entirely"] * 40
        with pytest.raises(ValueError, match="fingerprint|corpus"):
            train_chunks_distributed(other, 10, mesh, resume_from=path)


class TestShardedEncode:
    """Chunk-sharded multi-device encode (VERDICT r4 #6): embarrassingly
    parallel, must equal encode_ordinary exactly."""

    def test_matches_encode_ordinary(self):
        from minbpe_tpu import RegexTokenizer
        from minbpe_tpu.parallel.encode import encode_text_distributed

        text = ("Sharded encode is the sequence-parallel serving path; "
                "chunks are independent so exactness is free! " * 50)
        tok = RegexTokenizer()
        tok.train(text, 256 + 40)
        mesh = make_mesh(8)
        got = encode_text_distributed(tok, text, mesh)
        assert got == tok.encode_ordinary(text)

    def test_corpus_slice(self, corpus_text):
        from minbpe_tpu import RegexTokenizer
        from minbpe_tpu.parallel.encode import encode_text_distributed

        text = corpus_text[:30000]
        tok = RegexTokenizer()
        tok.train(text, 256 + 64)
        mesh = make_mesh(8)
        got = encode_text_distributed(tok, text, mesh)
        assert got == tok.encode_ordinary(text)

    def test_empty_and_no_merges(self):
        from minbpe_tpu import RegexTokenizer
        from minbpe_tpu.parallel.encode import encode_text_distributed

        tok = RegexTokenizer()
        mesh = make_mesh(8)
        assert encode_text_distributed(tok, "", mesh) == []
        # no merges learned: raw (chunked) bytes come back unchanged
        got = encode_text_distributed(tok, "hi there", mesh)
        assert got == tok.encode_ordinary("hi there")

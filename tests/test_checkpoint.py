"""Resumable training checkpoints: resume must be bit-identical to an
uninterrupted run, and mismatched corpora must be rejected."""

import numpy as np
import pytest

from minbpe_tpu import BasicTokenizer, RegexTokenizer


TEXT = ("checkpoint resume must reproduce the exact same merges, "
        "ties included, every single time. " * 20)


def test_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "train.ckpt.npz")
    full = BasicTokenizer()
    full.train(TEXT, 256 + 48)

    # run with checkpoints every 16 rounds; grab the one at round 32
    partial = BasicTokenizer()
    partial.train(TEXT, 256 + 48, checkpoint_path=ck, checkpoint_every=16)
    assert partial.merges == full.merges

    resumed = BasicTokenizer()
    resumed.train(TEXT, 256 + 48, resume_from=ck)
    assert resumed.merges == full.merges


def test_resume_rejects_wrong_corpus(tmp_path):
    ck = str(tmp_path / "train.ckpt.npz")
    tok = BasicTokenizer()
    tok.train(TEXT, 256 + 32, checkpoint_path=ck, checkpoint_every=8)
    other = BasicTokenizer()
    with pytest.raises(ValueError):
        other.train(TEXT + "x", 256 + 32, resume_from=ck)


def test_resume_rejects_wrong_target(tmp_path):
    ck = str(tmp_path / "train.ckpt.npz")
    tok = BasicTokenizer()
    tok.train(TEXT, 256 + 32, checkpoint_path=ck, checkpoint_every=8)
    other = BasicTokenizer()
    with pytest.raises(ValueError):
        other.train(TEXT, 256 + 48, resume_from=ck)


def test_progress_callback():
    seen = []
    tok = RegexTokenizer()
    tok.train(TEXT, 256 + 24, progress=lambda done, total: seen.append((done, total)))
    assert seen[-1][0] == 24
    assert all(t == 24 for _, t in seen)

"""Engine path-selection coverage: every select_mode yields identical merges
through the public API, including the large-vocab sparse route."""

import pytest

from minbpe_tpu import BasicTokenizer, RegexTokenizer

TEXT = ("mode selection must never change results. " * 40
        + "aaaa bbbb aaab abab " * 10)


@pytest.mark.parametrize(
    "mode", ["sort", "dense", "stepped", "incremental", "sparse",
             "sparse_inc"])
def test_modes_identical(mode):
    base = BasicTokenizer()
    base.train(TEXT, 256 + 32)  # auto
    other = BasicTokenizer()
    other.train(TEXT, 256 + 32, select_mode=mode)
    assert other.merges == base.merges


def test_large_vocab_routes_to_sortloop(monkeypatch):
    import minbpe_tpu.engine as engine
    import minbpe_tpu.ops.train as train_mod
    import minbpe_tpu.ops.train_sortloop as sl_mod

    calls = {}
    orig = sl_mod.train_merges_sortloop_stepped

    def spy(*args, **kw):
        calls["sortloop"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(train_mod, "DENSE_SELECT_MAX", 256 + 8)
    monkeypatch.setattr(sl_mod, "train_merges_sortloop_stepped", spy)
    tok = RegexTokenizer()
    tok.train(TEXT, 256 + 16)  # above the (patched) dense max -> sortloop
    assert calls.get("sortloop")

    ref = RegexTokenizer()
    ref.train(TEXT, 256 + 16, select_mode="stepped")
    assert tok.merges == ref.merges


def test_sparse_checkpoint_resume(tmp_path):
    """Large-vocab checkpoint/resume rides the sparse stepped driver."""
    ck = str(tmp_path / "sparse.ckpt.npz")
    full = RegexTokenizer()
    full.train(TEXT, 256 + 24, select_mode="sparse")

    partial = RegexTokenizer()
    try:
        partial.train(TEXT, 256 + 24, select_mode="sparse",
                      checkpoint_path=ck, checkpoint_every=8,
                      progress=lambda done, total: (_ for _ in ()).throw(
                          KeyboardInterrupt) if done > 16 else None)
    except KeyboardInterrupt:
        pass

    resumed = RegexTokenizer()
    resumed.train(TEXT, 256 + 24, select_mode="sparse", resume_from=ck)
    assert resumed.merges == full.merges

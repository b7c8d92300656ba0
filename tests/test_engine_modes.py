"""Engine path-selection coverage: every select_mode yields identical merges
through the public API, including the large-vocab sort route."""

import pytest

from minbpe_tpu import BasicTokenizer, RegexTokenizer

TEXT = ("mode selection must never change results. " * 40
        + "aaaa bbbb aaab abab " * 10)


@pytest.mark.parametrize("mode", ["sort", "dense", "stepped", "incremental"])
def test_modes_identical(mode):
    base = BasicTokenizer()
    base.train(TEXT, 256 + 32)  # auto
    other = BasicTokenizer()
    other.train(TEXT, 256 + 32, select_mode=mode)
    assert other.merges == base.merges


def test_large_vocab_routes_to_sort(monkeypatch):
    import minbpe_tpu.engine as engine
    import minbpe_tpu.ops.train as train_mod

    calls = {}
    orig = train_mod.train_merges

    def spy(*args, **kw):
        calls["mode"] = kw.get("select_mode")
        return orig(*args, **kw)

    monkeypatch.setattr(train_mod, "DENSE_SELECT_MAX", 256 + 8)
    monkeypatch.setattr(engine, "train_merges", spy)
    tok = RegexTokenizer()
    tok.train(TEXT, 256 + 16)  # above the (patched) dense max -> sort
    assert calls["mode"] == "sort"

    ref = RegexTokenizer()
    ref.train(TEXT, 256 + 16, select_mode="stepped")
    assert tok.merges == ref.merges

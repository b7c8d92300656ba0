"""Differential conformance against the actual reference implementation,
when it is mounted (skipped otherwise). Uses a corpus slice + small vocab to
stay fast; full-corpus vocab-512 parity is exercised by bench/driver runs."""

import sys

import pytest

from conftest import REFERENCE_DIR, CORPUS

if REFERENCE_DIR.exists():
    sys.path.insert(0, str(REFERENCE_DIR))

pytestmark = pytest.mark.skipif(
    not CORPUS.exists(), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def slice_text():
    return CORPUS.read_text(encoding="utf-8")[:8000]


def test_basic_train_and_encode_parity(slice_text):
    from minbpe import BasicTokenizer as RefBasic
    from minbpe_tpu import BasicTokenizer

    ref = RefBasic()
    ref.train(slice_text, 300)
    ours = BasicTokenizer()
    ours.train(slice_text, 300)
    assert ref.merges == ours.merges
    assert ref.encode(slice_text[:2000]) == ours.encode(slice_text[:2000])


def test_regex_train_and_encode_parity(slice_text):
    from minbpe import RegexTokenizer as RefRegex
    from minbpe_tpu import RegexTokenizer

    ref = RefRegex()
    ref.train(slice_text, 300)
    ours = RegexTokenizer()
    ours.train(slice_text, 300)
    assert ref.merges == ours.merges
    assert ref.encode(slice_text) == ours.encode(slice_text)


def test_model_and_vocab_files_byte_identical(slice_text, tmp_path):
    """save() must produce byte-identical .model AND .vocab files to the
    reference for the same trained state (format: minbpe/base.py:97-138)."""
    from minbpe import RegexTokenizer as RefRegex
    from minbpe_tpu import RegexTokenizer

    ref = RefRegex()
    ref.train(slice_text, 300)
    ref.register_special_tokens({"<|endoftext|>": 300, "<|fim_prefix|>": 301})
    ours = RegexTokenizer()
    ours.train(slice_text, 300)
    ours.register_special_tokens({"<|endoftext|>": 300, "<|fim_prefix|>": 301})

    ref.save(str(tmp_path / "ref"))
    ours.save(str(tmp_path / "ours"))
    for ext in (".model", ".vocab"):
        a = (tmp_path / ("ref" + ext)).read_bytes()
        b = (tmp_path / ("ours" + ext)).read_bytes()
        assert a == b, f"{ext} differs"

    # cross-load: the reference can load our model file and vice versa
    theirs = RefRegex()
    theirs.load(str(tmp_path / "ours.model"))
    assert theirs.merges == ours.merges
    back = RegexTokenizer()
    back.load(str(tmp_path / "ref.model"))
    assert back.merges == ref.merges


def test_verbose_output_identical(slice_text, capsys):
    """verbose training prints the reference's exact lines
    (minbpe/regex.py:65-66)."""
    from minbpe import RegexTokenizer as RefRegex
    from minbpe_tpu import RegexTokenizer

    ref = RefRegex()
    ref.train(slice_text[:2000], 280, verbose=True)
    ref_out = capsys.readouterr().out
    ours = RegexTokenizer()
    ours.train(slice_text[:2000], 280, verbose=True)
    our_out = capsys.readouterr().out
    assert our_out == ref_out


def test_gpt2_pattern_parity(slice_text):
    from minbpe import RegexTokenizer as RefRegex
    from minbpe_tpu import RegexTokenizer, GPT2_SPLIT_PATTERN

    ref = RefRegex(pattern=GPT2_SPLIT_PATTERN)
    ref.train(slice_text, 290)
    ours = RegexTokenizer(pattern=GPT2_SPLIT_PATTERN)
    ours.train(slice_text, 290)
    assert ref.merges == ours.merges
    assert ref.encode(slice_text[:3000]) == ours.encode(slice_text[:3000])

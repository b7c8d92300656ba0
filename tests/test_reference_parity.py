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


def test_gpt2_pattern_parity(slice_text):
    from minbpe import RegexTokenizer as RefRegex
    from minbpe_tpu import RegexTokenizer, GPT2_SPLIT_PATTERN

    ref = RefRegex(pattern=GPT2_SPLIT_PATTERN)
    ref.train(slice_text, 290)
    ours = RegexTokenizer(pattern=GPT2_SPLIT_PATTERN)
    ours.train(slice_text, 290)
    assert ref.merges == ours.merges
    assert ref.encode(slice_text[:3000]) == ours.encode(slice_text[:3000])

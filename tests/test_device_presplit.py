"""Device pre-splitter (ops/device_presplit.py): differential parity with
the host scanners (utils/presplit.py), which are themselves validated
byte-for-byte against the ``regex`` module (tests/test_presplit.py)."""

import random

import numpy as np
import pytest

from minbpe_tpu.ops.device_presplit import presplit_seg_ids, split_spans_host
from minbpe_tpu.utils.presplit import split_gpt2, split_gpt4

HOST = {"gpt4": split_gpt4, "gpt2": split_gpt2}

CASES = [
    "hello world", "Hello's world IT'S you'LL we've THEY'RE",
    "abc123456789def", "  spaces   and\t tabs ", "\n\nnewlines\r\n mix \n",
    "a b", "  b", "   b", " 1", "  1", "don't stop!!! 42x",
    "héllo wörld 你好世界 😊🎉 test", "'ll 've 're 's 'd 'm 't",
    "x'll !'ll ''ll \n'll 12'll  'll", "...1234...", "a!!!b",
    "word  \n  word", "\r\n\r\n", "trailing space ", "  ", " ", "\n",
    "𝕏 astral 𝄞 chars 🚀", "tab\ttab", "12 345 6789", "( )", "(  )",
    "a  'b", "\r\nx", " \r\n ", "'", "5", "'t",
]


def _device_chunks(text: str, mode: str) -> list[str]:
    data = text.encode()
    return [data[a:b].decode() for a, b in split_spans_host(text, mode)]


@pytest.mark.parametrize("mode", ["gpt4", "gpt2"])
def test_hand_cases(mode):
    for text in CASES:
        assert _device_chunks(text, mode) == HOST[mode](text), repr(text)


@pytest.mark.parametrize("mode", ["gpt4", "gpt2"])
def test_corpus_slice(mode):
    text = open("/root/reference/tests/taylorswift.txt").read()[:20000]
    assert _device_chunks(text, mode) == HOST[mode](text)


@pytest.mark.parametrize("mode", ["gpt4", "gpt2"])
@pytest.mark.parametrize("seed", range(3))
def test_fuzz(mode, seed):
    alpha = list("abcXYZ 019'\t\n\r!.,;-_é你٦\U0001F600\U0001D11E  ")
    rng = random.Random(seed)
    # fixed length per seed -> one device-compile per case
    s = "".join(rng.choice(alpha) for _ in range(64))
    assert _device_chunks(s, mode) == HOST[mode](s), repr(s)


def test_padded_input_matches_exact():
    """Segment ids must ignore pad bytes past n (bucketed engine calls)."""
    text = "pad me 123  ok\n"
    raw = np.frombuffer(text.encode(), np.uint8)
    padded = np.zeros(64, np.uint8)
    padded[:raw.size] = raw
    b_exact, s_exact = presplit_seg_ids(raw, raw.size, "gpt4")
    b_pad, s_pad = presplit_seg_ids(padded, raw.size, "gpt4")
    n = raw.size
    assert np.asarray(b_exact)[:n].tolist() == np.asarray(b_pad)[:n].tolist()
    assert np.asarray(s_exact)[:n].tolist() == np.asarray(s_pad)[:n].tolist()


def test_empty():
    assert split_spans_host("", "gpt4") == []


def test_engine_device_split_opt_in_cpu_noop():
    """On CPU backends the device-split route must decline (return None)."""
    from minbpe_tpu import RegexTokenizer, engine

    t = RegexTokenizer()
    t.train("a tiny corpus for routing checks " * 4, 260)
    t.device_presplit = True
    assert engine.encode_text_device_split(t, "hello world") is None

"""encode_batch: one device program per batch of independent documents.

TPU-native serving surface with no reference counterpart (the reference
encodes one string per call, minbpe/regex.py:123-164); the contract is exact
equality with the per-document encode loop, for every route of
engine.encode_parts (fused dense on TPU, sorted table, host fallback).
"""

import pytest

from minbpe_tpu import BasicTokenizer, RegexTokenizer
from minbpe_tpu import engine

DOCS = [
    "hello world!!!? (안녕하세요!) lol123 😉",
    "",
    "a",
    "FILE systems   are \t\n neat  ok",
    "'tis 'TIS 'Tis don't 1234 567",
    "x" * 3000,
]


@pytest.fixture(scope="module")
def corpus():
    return open("/root/reference/tests/taylorswift.txt",
                encoding="utf-8").read()


@pytest.fixture(scope="module")
def rtok(corpus):
    tok = RegexTokenizer()
    tok.train(corpus[:30000], 300)
    tok.register_special_tokens({"<|endoftext|>": 300, "<|fim|>": 301})
    return tok


def test_regex_batch_matches_loop(rtok):
    assert rtok.encode_batch(DOCS) == [rtok.encode(d) for d in DOCS]


def test_regex_batch_with_specials(rtok):
    docs = [
        "hello <|endoftext|> world",
        "<|fim|>",
        "no specials here",
        "<|endoftext|><|endoftext|> tail",
        "",
    ]
    got = rtok.encode_batch(docs, allowed_special="all")
    want = [rtok.encode(d, allowed_special="all") for d in docs]
    assert got == want
    # subset filtering applies per document, same as encode
    got = rtok.encode_batch(["a <|fim|> b"], allowed_special={"<|fim|>"})
    assert got == [rtok.encode("a <|fim|> b", allowed_special={"<|fim|>"})]


def test_regex_batch_none_raise(rtok):
    with pytest.raises(AssertionError):
        rtok.encode_batch(["ok", "bad <|endoftext|>"])


def test_regex_batch_sorted_route(rtok, monkeypatch):
    """Force the sorted-pair-table route (the cl100k path) through the same
    batched call."""
    monkeypatch.setattr(engine, "DENSE_VOCAB_MAX", 128)
    rtok._invalidate_device_state()
    try:
        assert rtok.encode_batch(DOCS) == [rtok.encode(d) for d in DOCS]
        docs = ["a <|endoftext|> b", "", "c"]
        got = rtok.encode_batch(docs, allowed_special="all")
        assert got == [rtok.encode(d, allowed_special="all") for d in docs]
    finally:
        monkeypatch.undo()
        rtok._invalidate_device_state()


def test_gpt4_batch_with_byte_shuffle():
    """encode_batch through GPT4Tokenizer: the byte shuffle applies per
    document inside the shared batched program."""
    from minbpe_tpu.gpt4 import GPT4Tokenizer
    from minbpe_tpu.utils.synthranks import synthetic_ranks

    ranks, _, specials = synthetic_ranks(600, seed=11)
    tok = GPT4Tokenizer.from_mergeable_ranks(ranks, specials)
    docs = [DOCS[0], "", "hello't world 123", DOCS[3]]
    assert tok.encode_batch(docs) == [tok.encode(d) for d in docs]
    name, sid = next(iter(specials.items()))
    sdocs = [f"a {name} b", name, "plain"]
    got = tok.encode_batch(sdocs, allowed_special="all")
    assert got == [tok.encode(d, allowed_special="all") for d in sdocs]
    assert sid in got[0]


def test_basic_batch_matches_loop(corpus):
    tok = BasicTokenizer()
    tok.train(corpus[:20000], 280)
    assert tok.encode_batch(DOCS) == [tok.encode(d) for d in DOCS]
    assert tok.encode_batch([]) == []
    assert tok.encode_batch(["", ""]) == [[], []]

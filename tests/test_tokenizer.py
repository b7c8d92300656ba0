"""Conformance suite — ports the reference test coverage
(reference tests/test_tokenizer.py:1-136) to minbpe_tpu.

Coverage mirrors the 5 reference test groups: encode/decode identity,
GPT-4 tiktoken equality (plain + special tokens; skipped when the cl100k
ranks are unavailable offline), the Wikipedia BPE example, and save/load.
"""

import os

import pytest

from minbpe_tpu import BasicTokenizer, RegexTokenizer

TEST_STRINGS = [
    "",
    "?",
    "hello world!!!? (안녕하세요!) lol123 😉",
    "FILE:taylorswift.txt",
]

SPECIAL_TOKENS = {
    "<|endoftext|>": 100257,
    "<|fim_prefix|>": 100258,
    "<|fim_middle|>": 100259,
    "<|fim_suffix|>": 100260,
    "<|endofprompt|>": 100276,
}

SPECIALS_STRING = """
<|endoftext|>Hello world this is one document
<|endoftext|>And this is another document
<|endoftext|><|fim_prefix|>And this one has<|fim_suffix|> tokens.<|fim_middle|> FIM
<|endoftext|>Last document!!! 👋<|endofprompt|>
""".strip()

# training text with embedded specials, mirroring the reference save/load
# fixture (reference tests/test_tokenizer.py:41-46)
TRAIN_TEXT = """
<|endoftext|>The llama (/ˈlɑːmə/; Spanish pronunciation: [ˈʎama] or [ˈʝama])
(Lama glama) is a domesticated South American camelid, widely used as a meat
and pack animal by Andean cultures since the pre-Columbian era.
Llamas are social animals and live with others as a herd. Their wool is soft
and contains only a small amount of lanolin.[2] Llamas can learn simple tasks
after a few repetitions. When using a pack, they can carry about 25 to 30% of
their body weight for 8 to 13 km (5-8 miles).[3] The name llama (in the past
also spelled "lama" or "glama") was adopted by European settlers from native
Peruvians.[4]
<|fim_prefix|>In Aymara mythology, llamas are important beings. The Heavenly
Llama is said to drink water from the ocean and urinates as it rains.[6]
According to Aymara eschatology,<|fim_suffix|> where they come from at the end
of time.[6]<|fim_middle|> llamas will return to the water springs and
ponds<|endofprompt|>
""".strip()


def _resolve(text, corpus_request):
    if text.startswith("FILE:"):
        return corpus_request.getfixturevalue("corpus_text")
    return text


def _gpt4_available():
    try:
        from minbpe_tpu.gpt4 import cl100k_ranks_available
        return cl100k_ranks_available()
    except ImportError:
        return False


requires_gpt4 = pytest.mark.skipif(
    not _gpt4_available(), reason="cl100k_base ranks unavailable (offline)"
)


def _factories():
    fs = [BasicTokenizer, RegexTokenizer]
    if _gpt4_available():
        from minbpe_tpu import GPT4Tokenizer
        fs.append(GPT4Tokenizer)
    return fs


@pytest.mark.parametrize("factory", _factories())
@pytest.mark.parametrize("text", TEST_STRINGS)
def test_encode_decode_identity(factory, text, request):
    text = _resolve(text, request)
    tok = factory()
    assert tok.decode(tok.encode(text)) == text


@requires_gpt4
@pytest.mark.parametrize("text", TEST_STRINGS)
def test_gpt4_tiktoken_equality(text, request):
    import tiktoken
    from minbpe_tpu import GPT4Tokenizer

    text = _resolve(text, request)
    enc = tiktoken.get_encoding("cl100k_base")
    assert GPT4Tokenizer().encode(text) == enc.encode(text)


@requires_gpt4
def test_gpt4_tiktoken_equality_special_tokens():
    import tiktoken
    from minbpe_tpu import GPT4Tokenizer

    enc = tiktoken.get_encoding("cl100k_base")
    assert GPT4Tokenizer().encode(
        SPECIALS_STRING, allowed_special="all"
    ) == enc.encode(SPECIALS_STRING, allowed_special="all")


@pytest.mark.parametrize("factory", [BasicTokenizer, RegexTokenizer])
def test_wikipedia_example(factory):
    # BPE on "aaabdaaabac" for 3 merges -> "XdXac" with Z=aa(256), then
    # (by first-occurrence tie-break) the ids [258, 100, 258, 97, 99]
    # (reference tests/test_tokenizer.py:80-107).
    tok = factory()
    text = "aaabdaaabac"
    tok.train(text, 256 + 3)
    ids = tok.encode(text)
    assert ids == [258, 100, 258, 97, 99]
    assert tok.decode(ids) == text


@pytest.mark.parametrize("special_tokens", [{}, SPECIAL_TOKENS])
def test_save_load(special_tokens, tmp_path):
    tok = RegexTokenizer()
    tok.train(TRAIN_TEXT, 256 + 64)
    tok.register_special_tokens(special_tokens)
    assert tok.decode(tok.encode(TRAIN_TEXT, "all")) == TRAIN_TEXT
    ids = tok.encode(TRAIN_TEXT, "all")

    prefix = os.path.join(tmp_path, "tok_tmp")
    tok.save(prefix)

    fresh = RegexTokenizer()
    fresh.load(prefix + ".model")
    assert fresh.decode(ids) == TRAIN_TEXT
    assert fresh.decode(fresh.encode(TRAIN_TEXT, "all")) == TRAIN_TEXT
    assert fresh.encode(TRAIN_TEXT, "all") == ids


def test_allowed_special_modes():
    tok = RegexTokenizer()
    tok.train("hello hello world<|endoftext|> bye", 256 + 8)
    tok.register_special_tokens({"<|endoftext|>": 300})
    text = "hi<|endoftext|>there"
    with_special = tok.encode(text, allowed_special="all")
    assert 300 in with_special
    as_plain = tok.encode(text, allowed_special="none")
    assert 300 not in as_plain
    with pytest.raises(AssertionError):
        tok.encode(text)  # none_raise default
    subset = tok.encode(text, allowed_special={"<|endoftext|>"})
    assert subset == with_special
    with pytest.raises(ValueError):
        tok.encode(text, allowed_special="bogus")
    # decode of an unknown id raises (minbpe/regex.py:87)
    with pytest.raises(ValueError):
        tok.decode([999999])


def test_train_too_many_merges_raises():
    tok = BasicTokenizer()
    with pytest.raises(ValueError):
        tok.train("ab", 256 + 5)  # only one pair available

"""Differential tests: hand-derived GPT-2/GPT-4 split scanners vs the
``regex`` module (the semantics oracle the reference uses,
minbpe/regex.py:41,114).

Every case runs against BOTH implementations: the pure-Python byte-class
scanner (utils/presplit.py) and the native C++ scanner (csrc/presplit.cpp,
the production default in RegexTokenizer._split_arrays) when its .so builds.
"""

import random

import pytest
import regex as re

from minbpe_tpu.regex import GPT2_SPLIT_PATTERN, GPT4_SPLIT_PATTERN
from minbpe_tpu.utils import native
from minbpe_tpu.utils.presplit import split_gpt2, split_gpt4

GPT2_RE = re.compile(GPT2_SPLIT_PATTERN)
GPT4_RE = re.compile(GPT4_SPLIT_PATTERN)
NATIVE = native.available()


def check(text):
    want4 = re.findall(GPT4_RE, text)
    want2 = re.findall(GPT2_RE, text)
    assert split_gpt4(text) == want4, f"gpt4 on {text!r}"
    assert split_gpt2(text) == want2, f"gpt2 on {text!r}"
    if NATIVE:
        data = text.encode("utf-8")
        got4 = native.split_utf8(data, 4)
        got2 = native.split_utf8(data, 2)
        assert got4 == [c.encode("utf-8") for c in want4], \
            f"native gpt4 on {text!r}"
        assert got2 == [c.encode("utf-8") for c in want2], \
            f"native gpt2 on {text!r}"


def test_native_scanner_present():
    """The production fast path must actually be under this sweep in CI
    environments with a toolchain; skip only when g++ is genuinely absent."""
    import shutil

    if shutil.which("g++") is None and shutil.which("cc") is None:
        pytest.skip("no C++ toolchain")
    assert NATIVE, "native presplit .so failed to build"


ADVERSARIAL = [
    "",
    "hello world",
    "  leading and   trailing  ",
    "don't you'd we'll they've you're I'M CAN'T o'LL x'Ve",
    "'s 'd 'm 't 'll 've 're 'S 'D 'LL 'VE 'RE 'sx 'llx 'lx 'v 'r",
    "1 22 333 4444 55555 123456789",
    "a1b22c333d4444",
    "!!!???...,,,;;;",
    " !x !! ?y",
    "\n\n\nword\n\n",
    "\r\n\r\nmixed\r",
    "   \n   \n   x",
    "tab\tseparated\tvalues",
    "\t\n \t\n mix \t \n",
    "trailing spaces   ",
    "trailing newline\n",
    "one\ntwo\r\nthree\rfour",
    "unicode: 안녕하세요 héllo naïve Ĉu vi parolas",
    "emoji 😉👍 mixed 🇺🇸 text",
    "ſtrange caſe 'ſ K kelvin",
    "½⅓¼ numerals ²³ ١٢٣ ৪৫৬",
    "中文字符串 日本語のテキスト",
    "mixed中文and English",
    "a'b c'd e''f",
    "'", "''", "'''", "' '", "x'", "'x",
    "price: $5.99!",
    "   ",
    "\n",
    " \n", "\n ", " \n ",
    "a ", " a", "  a", "a  b", "a   b",
    "under_score kebab-case dot.sep",
    " nbsp run ",  # non-breaking space is \s in regex? oracle decides
    " line para",
    "ب العربية والفارسية text",
    "ᾮᾯᾰ greek extended ΩΣς",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial(idx):
    check(ADVERSARIAL[idx])


def test_corpus(corpus_text):
    check(corpus_text)


ALPHABETS = [
    "abc ABC'.!?\t\n\r 0123",
    "aA'lLvVeErRsSdDmMtT ſK",
    " \t\n\r\x0b\x0c   　",
    "你好ñé9٣½!@# \n'",
    "".join(chr(c) for c in [0x1F600, 0x10300, 0xFFFD, 0x0301, 0x200D, 39, 32, 97, 49]),
]


@pytest.mark.parametrize("seed", range(20))
def test_random(seed):
    rng = random.Random(seed)
    alpha = ALPHABETS[seed % len(ALPHABETS)]
    for _ in range(30):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        check(s)


def test_all_single_chars_bmp_sample():
    rng = random.Random(999)
    cps = list(range(0, 0x300)) + [rng.randint(0x300, 0x10FFFF) for _ in range(2000)]
    for cp in cps:
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        check(ch)
        check(" " + ch)
        check(ch + "a")
        check("'" + ch)

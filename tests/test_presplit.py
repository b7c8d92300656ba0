"""Differential tests: hand-derived GPT-2/GPT-4 split scanners vs the
``regex`` module (the semantics oracle the reference uses)."""

import random

import pytest
import regex as re

from minbpe_tpu.regex import GPT2_SPLIT_PATTERN, GPT4_SPLIT_PATTERN
from minbpe_tpu.utils.presplit import split_gpt2, split_gpt4

GPT2_RE = re.compile(GPT2_SPLIT_PATTERN)
GPT4_RE = re.compile(GPT4_SPLIT_PATTERN)


def check(text):
    assert split_gpt4(text) == re.findall(GPT4_RE, text), f"gpt4 on {text!r}"
    assert split_gpt2(text) == re.findall(GPT2_RE, text), f"gpt2 on {text!r}"


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

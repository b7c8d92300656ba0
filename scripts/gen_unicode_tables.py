"""Generate the Unicode classification tables used by the byte-level
pre-split scanners (minbpe_tpu/utils/presplit.py, csrc/presplit.cpp).

The ``regex`` PyPI module is the semantics oracle (it is what the reference
uses to compile the GPT split patterns, minbpe/regex.py:12,18-19): for every
codepoint we ask it which classes match, then store the result as sorted
disjoint intervals with a property bitmask. ~1.1M probes, run once; output is
committed as package data (a few KB compressed).

Properties: L = \\p{L}, N = \\p{N}, WS = \\s, CRLF = [\\r\\n],
CONTRACTION1 = matches (?i:[sdmt]) after an apostrophe, and the letters
needed for the 2-char contractions (l, v, e, r, s, d, m, t case variants).
"""

import sys

import numpy as np
import regex as re

L_RE = re.compile(r"\p{L}", re.V0)
N_RE = re.compile(r"\p{N}", re.V0)
WS_RE = re.compile(r"\s", re.V0)
C1_RE = re.compile(r"(?i:[sdmt])\Z", re.V0)
# second char of 'll 've 're (and first, for the 2-letter ones)
CI = {c: re.compile(rf"(?i:{c})\Z", re.V0) for c in "lvers"}

FLAG_L = 1
FLAG_N = 2
FLAG_WS = 4
FLAG_C1 = 8          # (?i:[sdmt])
FLAG_CI_L = 16       # (?i:l)
FLAG_CI_V = 32       # (?i:v)
FLAG_CI_E = 64       # (?i:e)
FLAG_CI_R = 128      # (?i:r)


def classify(cp: int) -> int:
    ch = chr(cp)
    f = 0
    if L_RE.match(ch):
        f |= FLAG_L
    if N_RE.match(ch):
        f |= FLAG_N
    if WS_RE.match(ch):
        f |= FLAG_WS
    if C1_RE.match(ch):
        f |= FLAG_C1
    if CI["l"].match(ch):
        f |= FLAG_CI_L
    if CI["v"].match(ch):
        f |= FLAG_CI_V
    if CI["e"].match(ch):
        f |= FLAG_CI_E
    if CI["r"].match(ch):
        f |= FLAG_CI_R
    return f


def main(out_path: str):
    flags = np.zeros(0x110000, dtype=np.uint8)
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue  # surrogates: unencodable in str
        flags[cp] = classify(cp)
    # run-length encode into intervals
    change = np.nonzero(np.diff(flags))[0] + 1
    starts = np.concatenate([[0], change]).astype(np.int32)
    vals = flags[starts].astype(np.uint8)
    np.savez_compressed(out_path, starts=starts, flags=vals)
    print(f"{len(starts)} intervals -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "minbpe_tpu/data/unicode_tables.npz")

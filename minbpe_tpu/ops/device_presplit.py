"""Device-side GPT-2/GPT-4 pre-splitter (SURVEY §7 L1.5): parallel lexing
of the fixed split patterns (minbpe/regex.py:18-19) entirely on device.

The reference pre-splits with the backtracking ``regex`` engine; the host
scanners (utils/presplit.py, csrc/presplit.cpp) re-derive the two fixed
patterns as linear scanners. This module is the array form, built so the
whole encode/train front half can run on device with only raw corpus bytes
shipped over the wire:

1. **UTF-8 decode** — vectorized: char-start mask from the byte prefix,
   codepoints assembled from up to 4 shifted byte lanes (inputs come from
   ``str.encode``, so the stream is valid UTF-8 by construction).
2. **Char classes** — one gather from the dense BMP flag table (64 KB,
   device-resident) plus a ``searchsorted`` fallback for astral planes;
   same tables as the host scanners (scripts/gen_unicode_tables.py).
3. **Per-position successor** ``f(i)`` = end of the span that WOULD start
   at char i, evaluated for every i at once. Each pattern alternative's
   greedy/possessive/lookahead semantics reduces to class-run arithmetic
   (next-non-X indices from reverse cummin scans, last-CRLF from a prefix
   cummax) — no sequential scanning.
4. **Boundary orbit** — actual chunk starts are {0, f(0), f(f(0)), ...}.
   Computed in ceil(log2 n) pointer-doubling rounds (J <- J[J] composition
   + a visited-set scatter), the associative-scan form of the sequential
   lexer loop.

Exactness: differential-tested against utils/presplit.py (itself validated
against ``regex`` byte-for-byte) in tests/test_device_presplit.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.presplit import (
    FLAG_C1, FLAG_CI_E, FLAG_CI_L, FLAG_CI_R, FLAG_CI_V, FLAG_L, FLAG_N,
    FLAG_WS, _load,
)

_BIG = jnp.int32(2 ** 30)


@functools.lru_cache(maxsize=1)
def _device_tables():
    # plain numpy: jitted callers embed these as constants (caching jax
    # arrays here would capture tracers when first touched under a trace)
    starts, flags, dense = _load()
    return (dense.astype(np.int32),
            starts.astype(np.int32),  # cps < 0x110000: int32 is enough
            flags.astype(np.int32))


def _shift_next(x, k, fill):
    """x[i + k], out-of-range -> fill."""
    k = min(k, x.shape[0])
    return jnp.concatenate(
        [x[k:], jnp.full((k,), fill, x.dtype)]) if k else x


def _next_non(mask, idx):
    """Smallest j >= i with mask[j] False (treating past-end as False is the
    caller's job via the mask)."""
    return jax.lax.cummin(jnp.where(~mask, idx, _BIG), reverse=True)


def _gather(a, i):
    """a[i] with an appended sentinel slot so i == len(a) is legal."""
    return jnp.take(a, jnp.clip(i, 0, a.shape[0] - 1))


def _decode_utf8(data):
    """Per-byte (is_start, codepoint-at-start) for a valid UTF-8 stream."""
    b = data.astype(jnp.int32)
    is_start = (b & 0xC0) != 0x80
    b1 = _shift_next(b, 1, 0)
    b2 = _shift_next(b, 2, 0)
    b3 = _shift_next(b, 3, 0)
    cp = jnp.where(
        b < 0x80, b,
        jnp.where(
            (b & 0xE0) == 0xC0, ((b & 0x1F) << 6) | (b1 & 0x3F),
            jnp.where(
                (b & 0xF0) == 0xE0,
                ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F),
                ((b & 0x07) << 18) | ((b1 & 0x3F) << 12)
                | ((b2 & 0x3F) << 6) | (b3 & 0x3F))))
    return is_start, cp


def _char_flags(cp):
    dense, starts, flags = _device_tables()
    f_bmp = jnp.take(dense, jnp.clip(cp, 0, dense.shape[0] - 1))
    hi = jnp.searchsorted(starts, cp, side="right") - 1
    f_ast = jnp.take(flags, jnp.clip(hi, 0, flags.shape[0] - 1))
    return jnp.where(cp < 0x10000, f_bmp, f_ast)


def _orbit(J, n_items):
    """Visited set of {0, J[0], J[J[0]], ...} below n_items, by pointer
    doubling: each round squares the jump table and scatters the frontier."""
    NC = J.shape[0]
    Jx = jnp.where(jnp.arange(NC, dtype=jnp.int32) < n_items, J, NC)
    visited = (jnp.arange(NC, dtype=jnp.int32) == 0) & (n_items > 0)
    steps = max(1, (NC - 1).bit_length())
    for _ in range(steps):
        tgt = jnp.where(visited, Jx, NC)
        visited = visited | jnp.zeros((NC,), jnp.bool_).at[tgt].set(
            True, mode="drop")
        Jx = jnp.minimum(_gather(jnp.append(Jx, jnp.int32(NC)), Jx),
                         jnp.int32(NC))
    return visited


def _successor(cp, F, idx, n, mode: str):
    """f(i): end of the span the scanner would emit starting at char i.
    Mirrors utils/presplit.py's alternative order exactly."""
    valid = idx < n
    L = valid & ((F & FLAG_L) != 0)
    Nd = valid & ((F & FLAG_N) != 0)
    WS = valid & ((F & FLAG_WS) != 0)
    CRLF = valid & ((cp == 10) | (cp == 13))
    OTHER = valid & ~L & ~Nd & ~WS
    APOS = valid & (cp == 39)
    SP = valid & (cp == 32)

    # runs are terminated by n even when the buffer has no slack past it
    next_non_l = jnp.minimum(_next_non(L, idx), n)
    next_non_n = jnp.minimum(_next_non(Nd, idx), n)
    next_non_ws = jnp.minimum(_next_non(WS, idx), n)
    next_non_other = jnp.minimum(_next_non(OTHER, idx), n)
    next_non_crlf = jnp.minimum(_next_non(CRLF, idx), n)
    last_crlf = jax.lax.cummax(jnp.where(CRLF, idx, -1))

    nvec = jnp.reshape(n, (1,)).astype(jnp.int32)

    def gat_pos(a, i):
        """Gather from a positions array; index n (== buffer end) -> n."""
        return _gather(jnp.concatenate([a, nvec]), i)

    F1 = _shift_next(F, 1, 0)
    F2 = _shift_next(F, 2, 0)
    cp1 = _shift_next(cp, 1, -1)
    cp2 = _shift_next(cp, 2, -1)
    L1 = _shift_next(L, 1, False)

    f = jnp.full_like(idx, -1)

    def put(pred, val):
        return jnp.where((f < 0) & pred, val, f)

    if mode == "gpt4":
        # P1: '(?i:[sdmt]|ll|ve|re)
        c1 = (F1 & FLAG_C1) != 0
        ci2 = ((((F1 & FLAG_CI_L) != 0) & ((F2 & FLAG_CI_L) != 0))
               | (((F1 & FLAG_CI_V) != 0) & ((F2 & FLAG_CI_E) != 0))
               | (((F1 & FLAG_CI_R) != 0) & ((F2 & FLAG_CI_E) != 0)))
        p1 = APOS & (idx + 1 < n)
        f = put(p1 & c1, idx + 2)
        f = put(p1 & ~c1 & (idx + 2 < n) & ci2, idx + 3)
        # P2: [^\r\n\p{L}\p{N}]?+ \p{L}+
        f = put(L, next_non_l)
        f = put(~L & ~Nd & ~CRLF & valid & L1,
                gat_pos(next_non_l, idx + 1))
        # P3: \p{N}{1,3}
        f = put(Nd, jnp.minimum(next_non_n, idx + 3))
        # P4: " "? [^\s\p{L}\p{N}]++ [\r\n]*
        k4 = jnp.where(SP & (idx + 1 < n), idx + 1, idx)
        other4 = _gather(jnp.append(OTHER, False), k4)
        end4 = gat_pos(next_non_other, k4)
        f = put(valid & other4, gat_pos(next_non_crlf, end4))
        # P5/P6/P7: \s*[\r\n] | \s+(?!\S) | \s+
        kws = next_non_ws
        lnl = _gather(jnp.append(last_crlf, -1), kws - 1)
        f = put(WS & (lnl >= idx), lnl + 1)
        f = put(WS & (kws >= n), kws)
        f = put(WS & (kws - idx >= 2), kws - 1)
        f = put(WS, kws)
    elif mode == "gpt2":
        # Q1: '([sdmt]|ll|ve|re) exact case
        q1 = APOS & (idx + 1 < n)
        c1 = (cp1 == 115) | (cp1 == 100) | (cp1 == 109) | (cp1 == 116)
        c2 = (((cp1 == 108) & (cp2 == 108)) | ((cp1 == 118) & (cp2 == 101))
              | ((cp1 == 114) & (cp2 == 101)))
        f = put(q1 & c1, idx + 2)
        f = put(q1 & ~c1 & (idx + 2 < n) & c2, idx + 3)
        # Q2/Q3/Q4: " "? (\p{L}+ | \p{N}+ | [^\s\p{L}\p{N}]+)
        k = jnp.where(SP, idx + 1, idx)
        kL = _gather(jnp.append(L, False), k)
        kN = _gather(jnp.append(Nd, False), k)
        kO = _gather(jnp.append(OTHER, False), k)
        f = put(valid & kL, gat_pos(next_non_l, k))
        f = put(valid & kN, gat_pos(next_non_n, k))
        f = put(valid & kO, gat_pos(next_non_other, k))
        # Q5/Q6: \s+(?!\S) | \s+
        kws = next_non_ws
        f = put(WS & (kws >= n), kws)
        f = put(WS & (kws - idx >= 2), kws - 1)
        f = put(WS, kws)
    else:  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")

    return jnp.where(valid & (f > idx), f, _BIG)


@functools.partial(jax.jit, static_argnames=("mode",))
def _presplit_device(data, nb, mode: str):
    """data: uint8[NB] (valid UTF-8 in [:nb]); returns per-byte
    (boundary flags, segment ids): seg[i] = index of the chunk byte i
    belongs to (garbage past nb)."""
    NB = data.shape[0]
    bidx = jnp.arange(NB, dtype=jnp.int32)
    bvalid = bidx < nb
    is_start, cp_b = _decode_utf8(jnp.where(bvalid, data, 0x41))
    is_start = is_start & bvalid
    char_of_byte = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_chars = jnp.maximum(char_of_byte[NB - 1] + 1, 0)

    # compact per-char codepoints + flags (char k's slot; tail garbage)
    tgt = jnp.where(is_start, char_of_byte, NB)
    cp = jnp.zeros((NB,), jnp.int32).at[tgt].set(cp_b, mode="drop")
    F = _char_flags(cp)
    cidx = jnp.arange(NB, dtype=jnp.int32)

    f = _successor(cp, F, cidx, n_chars, mode)
    starts_chunk = _orbit(f, n_chars)

    boundary_b = is_start & _gather(jnp.append(starts_chunk, False),
                                    char_of_byte)
    seg = jnp.cumsum(boundary_b.astype(jnp.int32)) - 1
    return boundary_b, seg


def presplit_seg_ids(data, n: int, mode: str):
    """Public entry: per-byte segment ids for a UTF-8 byte stream, computed
    on device. mode: "gpt4" | "gpt2"."""
    return _presplit_device(jnp.asarray(data), jnp.int32(n), mode)


def split_spans_host(text: str, mode: str) -> list[tuple[int, int]]:
    """Host-visible byte spans via the device splitter (test/debug use)."""
    data = np.frombuffer(text.encode(), np.uint8)
    if data.size == 0:
        return []
    boundary, _ = presplit_seg_ids(data, data.size, mode)
    cuts = np.flatnonzero(np.asarray(boundary)[:data.size]).tolist()
    cuts.append(data.size)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]

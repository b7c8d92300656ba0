"""ctypes binding for the native pre-split scanner (csrc/presplit.cpp).

Builds the shared library on first use if a C++ toolchain is available;
callers fall back to the pure-Python scanner (utils/presplit.py) when the
native path is unavailable. Both implementations run under the full
adversarial/random/BMP differential sweep against the ``regex`` module in
tests/test_presplit.py (the native one via split_utf8 whenever the .so
builds — test_native_scanner_present fails rather than skips when a
toolchain exists, so the production default cannot silently drop out of
coverage)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libpresplit.so")

_lib = None
_init_done = False


def _build() -> bool:
    src = os.path.join(_CSRC, "presplit.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "-s"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_SO)
    except Exception:
        return False


def _load():
    global _lib, _init_done
    if _init_done:
        return _lib
    _init_done = True
    if not os.path.isfile(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.presplit_init.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.presplit_run.restype = ctypes.c_int64
    lib.presplit_run.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
    ]
    from . import presplit
    starts, flags, _ = presplit._load()
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    flags = np.ascontiguousarray(flags, dtype=np.uint8)
    lib.presplit_init(
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(starts),
    )
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def split_offsets(data: bytes, mode: int) -> np.ndarray | None:
    """Chunk-end byte offsets for UTF-8 bytes. mode: 4 = GPT-4, 2 = GPT-2.
    Returns None when the native library is unavailable.

    This is the fast path: downstream packing builds (ids, seg) arrays from
    the offsets fully vectorized, with no per-chunk Python objects.
    """
    lib = _load()
    if lib is None:
        return None
    if not data:
        return np.zeros(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(len(data), dtype=np.int64)
    k = lib.presplit_run(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out), mode,
    )
    if k < 0:
        raise RuntimeError(f"native presplit failed with code {k}")
    return out[:k].copy()


def split_utf8(data: bytes, mode: int) -> list[bytes] | None:
    """Split UTF-8 bytes into chunk bytes (compat/testing API)."""
    ends = split_offsets(data, mode)
    if ends is None:
        return None
    chunks = []
    prev = 0
    for e in ends.tolist():
        chunks.append(data[prev:e])
        prev = e
    return chunks

"""Resumable mid-training checkpoints.

The reference's only persistence is the final ``.model`` artifact
(minbpe/base.py:97-165) — there is no resume. For long multi-host 100K-vocab
runs this module adds a *training* checkpoint: the merge prefix learned so
far plus a corpus fingerprint. Resuming replays the prefix onto the packed
stream (merge application is deterministic), rebuilds the dense counts, and
continues training from the recorded round — bit-identical to an untouched
run (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

FORMAT = "minbpe_tpu-ckpt-v1"


def corpus_fingerprint(ids: np.ndarray, seg: np.ndarray, n) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(ids).tobytes())
    h.update(np.asarray(seg).tobytes())
    h.update(str(int(n)).encode())
    return h.hexdigest()[:32]


def save(path: str, pairs: np.ndarray, counts: np.ndarray, round_idx: int,
         num_merges: int, fingerprint: str):
    np.savez(
        path,
        format=FORMAT,
        pairs=np.asarray(pairs[:round_idx]),
        counts=np.asarray(counts[:round_idx]),
        round_idx=round_idx,
        num_merges=num_merges,
        fingerprint=fingerprint,
    )


def load(path: str):
    z = np.load(path, allow_pickle=False)
    if str(z["format"]) != FORMAT:
        raise ValueError(f"bad checkpoint format: {z['format']}")
    return {
        "pairs": z["pairs"],
        "counts": z["counts"],
        "round_idx": int(z["round_idx"]),
        "num_merges": int(z["num_merges"]),
        "fingerprint": str(z["fingerprint"]),
    }

"""Large-vocab validation sweep (run on CPU; slow paths, excluded from the
fast test suite). Validates:

1. sparse distributed selection at vocab beyond the dense threshold,
   vs single-device sort training (bit-exact);
2. cl100k-SCALE encode: a synthetic 32K-merge table through the sorted
   pair table + bucketed chunk encoder, vs the pure-Python oracle.
"""

import random
import sys
import time

sys.path.insert(0, "tests")

import numpy as np
import oracle

from minbpe_tpu import RegexTokenizer
from minbpe_tpu.parallel.train import make_mesh, train_chunks_distributed
from minbpe_tpu.ops.ranktab import SortedPairTable
from minbpe_tpu.ops.chunk_encode import encode_chunk_list

text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()

# --- 1. sparse distributed at vocab 856 (600 merges) --------------------
slice_text = text[:60000]
single = RegexTokenizer()
t0 = time.time()
single.train(slice_text, 256 + 600, select_mode="sort")
print(f"single-device sort train (600 merges): {time.time()-t0:.1f}s",
      flush=True)
chunks = single._split_chunks(slice_text)
t0 = time.time()
sparse, _ = train_chunks_distributed(chunks, 600, make_mesh(8),
                                     selection="sparse")
print(f"sparse distributed train: {time.time()-t0:.1f}s", flush=True)
assert sparse == single.merges, "sparse distributed != single-device sort"
print("[1] sparse distributed @ 600 merges: EXACT", flush=True)

# --- 2. synthetic 32K-merge encode through the big-vocab path -----------
rng = random.Random(0)
M = 32768
pairs = []
seen = set()
avail = list(range(256))
for i in range(M):
    while True:
        a, b = rng.choice(avail), rng.choice(avail)
        if (a, b) not in seen:
            break
    seen.add((a, b))
    pairs.append((a, b))
    avail.append(256 + i)
pairs_arr = np.array(pairs, dtype=np.int32)
nids = np.arange(256, 256 + M, dtype=np.int32)
table = SortedPairTable(pairs_arr, nids)
ranks = {p: (r, 256 + r) for r, p in enumerate(pairs)}

sample_chunks = [c for c in
                 RegexTokenizer()._split_chunks(text[:20000])]
t0 = time.time()
got = encode_chunk_list(sample_chunks, table)
dt = time.time() - t0
expected = []
for c in sample_chunks:
    expected.extend(oracle.encode(list(c), ranks))
assert got == expected, "32K-merge chunked encode != oracle"
print(f"[2] 32K-merge bucketed encode (20KB, {dt:.1f}s device incl "
      f"compile): EXACT ({len(got)} tokens)", flush=True)
print("ALL LARGE-VOCAB VALIDATIONS PASSED", flush=True)

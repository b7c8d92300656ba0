"""Single-device jitted BPE training loop.

The reference training loop (minbpe/basic.py:31-45, minbpe/regex.py:49-66) runs
count -> argmax -> merge once per new vocab slot, in Python, over lists. Here the
*entire* multi-round loop is one compiled XLA program: a ``lax.fori_loop`` whose
body is sort-based exact selection (ops/select.py) + parallel merge application
and compaction (ops/merge.py). One device round-trip per training run, not per
round.

Failure parity: when no countable pair exists the reference raises (``max`` over
an empty dict, minbpe/basic.py:35). Inside jit we can't raise, so the loop
records the first failing round in ``fail_round`` and the host wrapper raises.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .select import (
    select_max_pair, select_max_pair_dense, select_max_pair_pallas,
)
from .merge import apply_merge

# Vocab bound under which the dense MXU counting path is used on accelerators
# (count matrix V^2 f32; 2048 -> 16 MB).
DENSE_SELECT_MAX = 2048


@partial(jax.jit, static_argnames=("num_merges", "vocab_base", "select_mode"))
def train_merges(ids, seg, n, num_merges: int, vocab_base: int = 256,
                 select_mode: str = "sort"):
    """Learn ``num_merges`` BPE merges from a packed stream.

    Returns (pairs[num_merges, 2], counts[num_merges], fail_round) where
    fail_round == num_merges means every round succeeded. New token ids are
    ``vocab_base + round`` exactly as in the reference (minbpe/basic.py:37).

    select_mode: "sort" (exact, any vocab) or "dense" (exact, MXU one-hot
    matmul counting — fastest for vocab <= DENSE_SELECT_MAX).
    """
    M = num_merges
    V = vocab_base + num_merges
    pairs0 = jnp.zeros((M, 2), dtype=jnp.int32)
    counts0 = jnp.zeros((M,), dtype=jnp.int32)

    def body(i, state):
        ids, seg, n, pairs, counts, fail_round = state

        def do_round(_):
            if select_mode == "dense":
                pa, pb, cnt, ok = select_max_pair_dense(ids, seg, n, V)
            elif select_mode == "pallas":
                pa, pb, cnt, ok = select_max_pair_pallas(ids, seg, n, V)
            elif select_mode == "pallas_interpret":
                pa, pb, cnt, ok = select_max_pair_pallas(
                    ids, seg, n, V, interpret=True
                )
            else:
                pa, pb, cnt, ok = select_max_pair(ids, seg, n)

            def ok_branch(_):
                new_ids, new_seg, new_n, _ = apply_merge(
                    ids, seg, n, pa, pb, jnp.int32(vocab_base) + i
                )
                return (
                    new_ids, new_seg, new_n,
                    pairs.at[i, 0].set(pa).at[i, 1].set(pb),
                    counts.at[i].set(cnt),
                    fail_round,
                )

            def fail_branch(_):
                return (ids, seg, n, pairs, counts, jnp.minimum(fail_round, i))

            return jax.lax.cond(ok, ok_branch, fail_branch, None)

        def skip(_):
            return (ids, seg, n, pairs, counts, fail_round)

        # Once a round has failed, later rounds are no-ops.
        return jax.lax.cond(fail_round >= i, do_round, skip, None)

    state = (ids, seg, n, pairs0, counts0, jnp.int32(M))
    ids, seg, n, pairs, counts, fail_round = jax.lax.fori_loop(0, M, body, state)
    return pairs, counts, fail_round

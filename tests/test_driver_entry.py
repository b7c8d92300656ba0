"""Regression coverage for the driver entry points (__graft_entry__.py).

The external driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on N virtual CPU devices; both must keep working as the
internal APIs they call evolve (build_distributed_train grew an overflow
return value once and silently broke the dryrun — never again).
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out_ids, out_n = jax.jit(fn)(*args)
    assert int(out_n) > 0
    assert out_ids.shape[0] >= int(out_n)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_multihost_train_chunks():
    from minbpe_tpu.parallel.multihost import train_chunks_global
    from minbpe_tpu.parallel.train import make_mesh

    chunks = [b"the cat", b" sat on", b" the mat", b" and the", b" cat sat"]
    merges, vocab = train_chunks_global(chunks, 4, mesh=make_mesh(8))
    assert len(merges) == 4
    assert all(v in vocab for v in range(256, 260))


def test_multihost_local_feeding_matches_replicated():
    """The per-host feeding path (make_array_from_process_local_data) must
    produce the identical merge sequence as the replicated path — exercised
    single-process (local slice == whole corpus), where the assembly code,
    segment-id offsetting, and capacity agreement all still run."""
    from minbpe_tpu.parallel.multihost import (
        train_chunks_global, train_local_chunks_global,
    )
    from minbpe_tpu.parallel.train import make_mesh

    words = (b"the cat sat on the mat and the cat sat on that hat "
             b"while the rat sat flat").split()
    chunks = [b" " + w for w in words] * 3
    mesh = make_mesh(8)
    ref, _ = train_chunks_global(chunks, 12, mesh=mesh)
    for selection in ("dense", "sparse"):
        got, _ = train_local_chunks_global(chunks, 12, mesh=mesh,
                                           selection=selection)
        assert got == ref, f"selection={selection} diverged"


def test_multihost_initialize_reraises_real_failures():
    import pytest
    from minbpe_tpu.parallel import multihost

    class Boom(Exception):
        pass

    def fake_init(**kwargs):
        raise RuntimeError("coordinator unreachable at 10.0.0.1:1234")

    import jax

    orig = jax.distributed.initialize
    jax.distributed.initialize = fake_init
    try:
        with pytest.raises(RuntimeError, match="coordinator unreachable"):
            multihost.initialize()
    finally:
        jax.distributed.initialize = orig

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

"""Test harness config.

Tests run on the CPU backend with 8 virtual devices so the multi-chip sharding
path is exercised without TPU hardware (the strategy the reference lacks — see
SURVEY.md §4). Env must be set before jax initializes its backends.

This environment also ships a sitecustomize that registers a remote-TPU PJRT
plugin ("axon") in every process; its tunnel can stall arbitrary jax calls, so
we both force JAX_PLATFORMS=cpu and drop the plugin's backend factory.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:  # keep the remote-TPU plugin from ever initializing inside tests
    # (JAX_PLATFORMS=cpu prevents backend *init*, but the axon plugin's
    # registration alone can stall; drop it. The builtin "tpu" factory must
    # stay registered: pallas imports need the platform to be known.)
    import jax._src.xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "tpu", "cuda", "rocm", "gpu", "METAL"):
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass

try:  # the plugin's register() may have set jax_platforms explicitly at
    # interpreter start (sitecustomize), which overrides the env var above;
    # force the config value back to cpu.
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
CORPUS = REFERENCE_DIR / "tests" / "taylorswift.txt"


@pytest.fixture(scope="session")
def corpus_text() -> str:
    if not CORPUS.exists():
        pytest.skip("reference corpus not available")
    return CORPUS.read_text(encoding="utf-8")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The suite compiles several hundred XLA programs in one process (pallas
    interpret-mode kernels are large); with everything cached for the whole
    session the CPU backend's compiler eventually segfaults deep inside
    backend_compile_and_load (reproducible at the same test with a full-
    suite prefix, absent for any subset). Dropping caches at module
    boundaries keeps peak compiler state bounded; within-module sharing —
    where almost all reuse lives — is unaffected."""
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass

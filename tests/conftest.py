"""Test harness: force JAX onto a virtual 8-device CPU backend.

Must run before any jax import — pytest imports conftest first, so setting the
env here is sufficient as long as test modules import jax at module scope or
later (never at conftest-collection time from another plugin).

``DEPTHG_TPU_TESTS=1`` flips the harness onto the REAL device instead: the
CPU forcing is skipped and tests marked ``tpu`` (skipped by default) run.
Usage: ``DEPTHG_TPU_TESTS=1 python -m pytest -m tpu tests/`` — running the
whole suite on the tunneled chip is neither supported nor fast.
"""

import os

ON_TPU = os.environ.get("DEPTHG_TPU_TESTS", "") not in ("", "0")

if not ON_TPU:
    # The shell env pins JAX_PLATFORMS=axon (the real TPU tunnel) and the
    # axon sitecustomize imports jax at interpreter startup, so jax.config
    # has already captured JAX_PLATFORMS=axon. Setting env vars here still
    # works for XLA_FLAGS (read at backend creation), but the platform must
    # be forced via jax.config.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(items):
    """Every test not marked ``slow`` is part of the ``fast`` subset:
    ``pytest -m fast`` is the documented <5 min run for 1-core hosts.
    ``tpu``-marked tests only run under ``DEPTHG_TPU_TESTS=1``."""
    import pytest as _pytest

    skip_tpu = _pytest.mark.skip(
        reason="needs the real TPU chip; run DEPTHG_TPU_TESTS=1 pytest -m tpu")
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(_pytest.mark.fast)
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip_tpu)


# persistent compile cache: repeat suite runs replay identical-HLO programs
# instead of recompiling (entries are content-keyed, so stale ones are
# simply never hit). DEPTHG_NO_COMPILE_CACHE=1 opts out.
from depthg_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

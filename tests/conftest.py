"""Test harness: force JAX onto a virtual 8-device CPU backend.

Must run before any jax import — pytest imports conftest first, so setting the
env here is sufficient as long as test modules import jax at module scope or
later (never at conftest-collection time from another plugin).
"""

import os

# The shell env pins JAX_PLATFORMS=axon (the real TPU tunnel) and the axon
# sitecustomize imports jax at interpreter startup, so jax.config has already
# captured JAX_PLATFORMS=axon. Setting env vars here still works for XLA_FLAGS
# (read at backend creation), but the platform must be forced via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat suite runs replay identical-HLO programs
# instead of recompiling (entries are content-keyed, so stale ones are
# simply never hit). DEPTHG_NO_COMPILE_CACHE=1 opts out.
from depthg_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

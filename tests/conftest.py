"""Test harness: force JAX onto a virtual 8-device CPU backend.

Must run before any jax import — pytest imports conftest first, so setting the
env here is sufficient as long as test modules import jax at module scope or
later (never at conftest-collection time from another plugin).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""Persistent XLA compilation cache plumbing (utils/compile_cache.py)."""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from depthg_tpu.utils.compile_cache import enable_compilation_cache


def test_cache_writes_entries(tmp_path, monkeypatch):
    monkeypatch.delenv("DEPTHG_NO_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(d) == d
    # conftest already initialized the cache at the default dir; the cache
    # object pins its dir at first use, so re-point it explicitly
    from jax.experimental.compilation_cache import compilation_cache
    compilation_cache.reset_cache()
    # the utility's 0.5 s gate is right for real TPU programs but filters
    # this trivial one — drop it to validate the write path
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        f = jax.jit(lambda x: (x @ x.T).sum() + 12345)
        float(f(jnp.asarray(np.random.default_rng(0).random((128, 128)),
                            jnp.float32)))
        files = [p for p in glob.glob(d + "/**", recursive=True)
                 if os.path.isfile(p)]
        assert files, "no cache entries written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def test_opt_out_env(monkeypatch, tmp_path):
    monkeypatch.setenv("DEPTHG_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "nope")) is None
    assert not (tmp_path / "nope").exists()

"""Pallas bilateral kernel: semantics vs naive dense (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Force pallas interpret mode (tests run on the CPU backend)."""
    from jax.experimental import pallas as pl

    import depthg_tpu.ops.crf_pallas as cp

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cp.pl, "pallas_call", patched)


@pytest.mark.parametrize("n,c", [(300, 27), (1024, 5), (513, 12)])
def test_matches_naive_dense(n, c):
    from depthg_tpu.ops.crf_pallas import bilateral_message_pallas

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    vals = rng.standard_normal((n, c)).astype(np.float32)
    d = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    want = np.exp(-d / 2) @ vals
    got = np.asarray(bilateral_message_pallas(jnp.asarray(feats), jnp.asarray(vals)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


def test_supported_budget():
    from depthg_tpu.ops.crf_pallas import pallas_supported

    assert pallas_supported(25600, 28)       # 320px, ds=2
    assert not pallas_supported(300_000, 28)  # too big for VMEM residency

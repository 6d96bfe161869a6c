"""Whole-KV fused attention kernel vs the plain XLA softmax-attention.

Runs the Pallas kernel in interpret mode (CPU backend); the math must match
the reference formulation bit-for-bit up to f32 reduction order. Contract
under test = ``ops/attention.py`` docstring: masked keys get probability
exactly 0 and padded query rows emit exactly 0.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthg_tpu.ops.attention import (_pick_block_q, whole_kv_mha,
                                      whole_kv_seq_ok)


def _xla_attn(q, k, v, scale, n_valid):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    keep = jnp.arange(s.shape[-1]) < n_valid
    s = jnp.where(keep[None, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))


def _qkv(b, h, n, hd, n_valid, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, hd)),
                             dtype
                             ).at[:, :, n_valid:].set(0.0)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n,n_valid", [(256, 256), (256, 201), (384, 385 - 128)])
def test_matches_xla_attention(n, n_valid):
    q, k, v = _qkv(2, 3, n, 64, n_valid)
    out = whole_kv_mha(q, k, v, 0.125, n_valid=n_valid, interpret=True)
    ref = _xla_attn(q, k, v, 0.125, n_valid)
    np.testing.assert_allclose(np.asarray(out[:, :, :n_valid]),
                               np.asarray(ref[:, :, :n_valid]),
                               rtol=2e-5, atol=2e-5)


def test_padded_rows_exact_zero():
    q, k, v = _qkv(1, 2, 256, 64, n_valid=130, seed=1)
    out = whole_kv_mha(q, k, v, 0.125, n_valid=130, interpret=True)
    assert np.all(np.asarray(out[:, :, 130:]) == 0.0)


def test_blocked_q_matches_single_block():
    q, k, v = _qkv(1, 2, 384, 64, n_valid=384, seed=2)
    whole = whole_kv_mha(q, k, v, 0.2, block_q=384, interpret=True)
    blocked = whole_kv_mha(q, k, v, 0.2, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                               rtol=1e-6, atol=1e-6)


def test_bf16_inputs_close_to_f32_reference():
    q, k, v = _qkv(1, 2, 256, 64, n_valid=256, seed=3, dtype=jnp.bfloat16)
    out = whole_kv_mha(q, k, v, 0.125, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attn(q, k, v, 0.125, 256)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("n,n_valid,block_q", [(256, 256, None),
                                               (384, 260, 128)])
def test_bias_matches_xla_attention(n, n_valid, block_q):
    """Additive logit bias (BEiT relative-position bias contract) through
    the split-operand kernel, including a mixed valid/padded q block."""
    h = 2
    q, k, v = _qkv(2, h, n, 64, n_valid)
    rng = np.random.default_rng(9)
    bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32)
    out = whole_kv_mha(q, k, v, 0.125, n_valid=n_valid, block_q=block_q,
                       bias=bias, interpret=True)
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * 0.125 + bias[None]
    keep = jnp.arange(n) < n_valid
    s = jnp.where(keep[None, None, None, :], s, -jnp.inf)
    ref = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(s, axis=-1),
                     v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out[:, :, :n_valid]),
                               np.asarray(ref[:, :, :n_valid]),
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(out[:, :, n_valid:]) == 0.0)


@pytest.mark.parametrize("n_valid,block_q", [(384, None), (260, 128)])
def test_bias_qkv_packed_matches_split(n_valid, block_q):
    """Bias through the head-PAIR packed kernel == bias through the split
    kernel (each pair's b_ref half must map to the right head)."""
    from depthg_tpu.ops.attention import whole_kv_mha_qkv

    b, nh, n, hd = 2, 4, 384, 64
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * nh * hd)), jnp.float32)
    qkv = qkv.at[:, n_valid:].set(0.0)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32)
    out = whole_kv_mha_qkv(qkv, nh, 0.125, n_valid=n_valid,
                           block_q=block_q, bias=bias, interpret=True)
    q, k, v = jnp.transpose(qkv.reshape(b, n, 3, nh, hd), (2, 0, 3, 1, 4))
    ref = whole_kv_mha(q, k, v, 0.125, n_valid=n_valid, bias=bias,
                       interpret=True)
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, n, nh * hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bias_shape_rejected():
    q, k, v = _qkv(1, 2, 256, 64, 256)
    with pytest.raises(ValueError, match="bias"):
        whole_kv_mha(q, k, v, 1.0, bias=jnp.zeros((2, 128, 256)),
                     interpret=True)


def test_block_q_picker_divides_and_fits():
    for npad in (128, 896, 1664, 4096):
        bq = _pick_block_q(npad)
        assert npad % bq == 0 and bq % 8 == 0
        assert 2 * 4 * bq * npad <= 8 * 2 ** 20 or bq == 8
    assert whole_kv_seq_ok(1601) and whole_kv_seq_ok(785)
    assert not whole_kv_seq_ok(200_000)


@pytest.mark.parametrize("n_valid,block_q", [(384, None), (260, None),
                                             (260, 128)])
def test_qkv_packed_matches_split(n_valid, block_q):
    """whole_kv_mha_qkv over the packed [B, N, 3D] layout (head-pair
    blocks) == whole_kv_mha over the split/transposed operands, including
    with MULTIPLE q blocks so the global padded-row offset arithmetic
    (program_id * bq) is exercised, not just the single-block case."""
    from depthg_tpu.ops.attention import whole_kv_mha_qkv

    b, nh, n, hd = 2, 2, 384, 64
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * nh * hd)), jnp.float32)
    qkv = qkv.at[:, n_valid:].set(0.0)
    out = whole_kv_mha_qkv(qkv, nh, 0.125, n_valid=n_valid,
                           block_q=block_q, interpret=True)
    assert out.shape == (b, n, nh * hd)
    assert np.all(np.asarray(out[:, n_valid:]) == 0.0)
    q, k, v = jnp.transpose(qkv.reshape(b, n, 3, nh, hd), (2, 0, 3, 1, 4))
    ref = whole_kv_mha(q, k, v, 0.125, n_valid=n_valid, interpret=True)
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, n, nh * hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_qkv_packed_rejects_unpairable_heads():
    from depthg_tpu.ops.attention import qkv_packed_ok, whole_kv_mha_qkv

    assert qkv_packed_ok(6, 384) and qkv_packed_ok(12, 768)
    assert not qkv_packed_ok(3, 192)  # vit_tiny: odd heads, D % 128 != 0
    assert not qkv_packed_ok(2, 64)   # head_dim 32
    qkv = jnp.zeros((1, 128, 3 * 192), jnp.float32)
    with pytest.raises(ValueError, match="qkv_packed_ok"):
        whole_kv_mha_qkv(qkv, 3, 1.0, interpret=True)


def test_padded_rows_zero_across_multiple_q_blocks():
    """Regression for the global row-offset arithmetic: with block_q=128 and
    n_valid=260, block 2 is mixed (rows 256..259 valid, 260.. padded) and
    block 0/1 fully valid — a dropped program_id term or a wrong shape in
    the row iota would corrupt exactly these."""
    q, k, v = _qkv(1, 2, 384, 64, n_valid=260, seed=5)
    out = whole_kv_mha(q, k, v, 0.125, n_valid=260, block_q=128,
                       interpret=True)
    assert np.all(np.asarray(out[:, :, 260:]) == 0.0)
    ref = _xla_attn(q, k, v, 0.125, 260)
    np.testing.assert_allclose(np.asarray(out[:, :, :260]),
                               np.asarray(ref[:, :, :260]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dim,heads", [(64, 2),   # hd=32: split-operand path
                                       (128, 2)])  # hd=64, D%128==0: packed
def test_vit_forward_fused_matches_xla(monkeypatch, dim, heads):
    """End-to-end ViT stack with attn_impl='fused' == 'xla' (interpret mode;
    exercises the whole-stack padding + n_valid plumbing in vit_apply, on
    both the qkv-packed and the split-operand fused paths)."""
    from jax.experimental import pallas as pl
    import depthg_tpu.ops.attention as att
    from depthg_tpu.models import vit as vit_lib

    orig = pl.pallas_call
    monkeypatch.setattr(att.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    cfg = vit_lib.ViTConfig(embed_dim=dim, depth=2, num_heads=heads,
                            patch_size=8)
    params = vit_lib.vit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 3, 40, 40)),
                    jnp.float32)
    f_x, _, q_x = vit_lib.vit_apply(params, x, cfg, attn_impl="xla")
    f_f, a_f, q_f = vit_lib.vit_apply(params, x, cfg, attn_impl="fused")
    assert a_f[0] is None
    np.testing.assert_allclose(np.asarray(f_f[0]), np.asarray(f_x[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(q_f[0]), np.asarray(q_x[0]),
                               rtol=2e-5, atol=2e-5)


def test_rejects_bad_shapes():
    q, k, v = _qkv(1, 1, 256, 64, 256)
    with pytest.raises(ValueError):
        whole_kv_mha(q[:, :, :200], k[:, :, :200], v[:, :, :200], 1.0,
                     interpret=True)
    with pytest.raises(ValueError):
        whole_kv_mha(q, k, v, 1.0, block_q=100, interpret=True)

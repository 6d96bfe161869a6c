"""ZoeDepth-NK: router + two-domain head smoke on a reduced config."""

import numpy as np

import jax
import jax.numpy as jnp

from depthg_tpu.models.zoedepth.beit import BEiTConfig
from depthg_tpu.models.zoedepth.dpt import DPTConfig
from depthg_tpu.models.zoedepth.nk import (
    BinConf,
    ZoeNKConfig,
    zoedepth_nk_forward,
    zoedepth_nk_init,
)

CFG = ZoeNKConfig(
    bin_confs=(BinConf("nyu", 8, 1e-3, 10.0), BinConf("kitti", 8, 1e-3, 80.0)),
    bin_embedding_dim=16, n_attractors=(4, 3, 2, 1),
    router_dim=16, router_layers=2, router_heads=2,
    beit=BEiTConfig(embed_dim=64, depth=8, num_heads=4, pretrain_window=4,
                    hooks=(1, 3, 5, 7)),
    dpt=DPTConfig(embed_dim=64, features=32, reassemble_channels=(16, 32, 64, 64)))


def test_nk_forward_routes_and_is_finite():
    params = zoedepth_nk_init(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 3, 64, 64)).astype(np.float32))
    out = jax.jit(lambda p, x: zoedepth_nk_forward(p, x, CFG))(params, x)
    assert out["metric_depth"].shape == (2, 1, 64, 64)
    assert out["domain_logits"].shape == (2, 2)
    assert bool(jnp.isfinite(out["metric_depth"]).all())
    assert float(out["metric_depth"].min()) >= 0

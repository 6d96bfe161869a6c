import numpy as np, jax, jax.numpy as jnp
from depthg_tpu.ops.crf import crf_config_from_cfg, dense_crf_multi_batch, CRFConfig
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((4, 3, 320, 320), dtype=np.float32) * 255.0)
lp = jnp.asarray(rng.standard_normal((4, 27, 40, 40)).astype(np.float32))
cfg = crf_config_from_cfg({})
print("cfg:", cfg, flush=True)
out = jax.jit(lambda i, l: dense_crf_multi_batch(i, [l, l], cfg))(img, lp)
print("CRF default OK", [np.asarray(o).shape for o in out], flush=True)

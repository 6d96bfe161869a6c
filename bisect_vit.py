import numpy as np, jax, jax.numpy as jnp
from depthg_tpu.inference import EvalConfig, tta_code
from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
key = jax.random.PRNGKey(0)
net = featurizer_init(key, fcfg)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((4, 3, 320, 320)).astype(np.float32))
code = jax.jit(lambda p, i: tta_code({"net": p}, i, fcfg, backbone_dtype="bfloat16"))(net, img)
print("ViT bf16 flash TTA OK", np.asarray(code).shape, flush=True)

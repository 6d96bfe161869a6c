"""CRF-loss playground: optimize a per-image code table directly against the
ContrastiveCRFLoss (reference ``src/train_crf.py``).

A ``CodeSpaceTable`` parameter grid [n_images, dim, h, w] is optimized with
Adam against the training-time CRF kernel plus (for discrete codes) global and
local entropy regularizers. Visualization: PCA-projected code maps saved as
PNGs (the reference uses matplotlib + sklearn, not available here; PCA is a
plain SVD).
"""

import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from depthg_tpu.config import cli_overrides, load_config
from depthg_tpu.data import ContrastiveSegDataset, DataLoader, get_transform
from depthg_tpu.data.transforms import unnormalize
from depthg_tpu.train.losses import contrastive_crf_loss


def pca3(code_hw_c: np.ndarray) -> np.ndarray:
    """[H, W, C] -> [H, W, 3] PCA projection (numpy SVD)."""
    h, w, c = code_hw_c.shape
    x = code_hw_c.reshape(-1, c)
    x = x - x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T
    proj = proj.reshape(h, w, 3)
    return np.clip((proj + 1) / 2, 0, 1)


def main(argv=None):
    from depthg_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    cfg = load_config("local_config.yml",
                      cli_overrides(argv if argv is not None else sys.argv[1:]))
    continuous = bool(cfg.continuous)
    dim = int(cfg.dim)
    n_images = int(cfg.get("n_images", 7))
    epochs = int(cfg.get("epochs", 2000))
    imsize = int(cfg.res)
    small = imsize // 2

    dataset = ContrastiveSegDataset(
        cfg.data_dir, cfg.dataset_name, None, cfg.get("image_set", "train"),
        get_transform(small, False, None), get_transform(small, True, None), cfg=cfg)
    loader = DataLoader(dataset, n_images, shuffle=False, num_workers=2)
    pack = next(iter(loader))
    img = jnp.asarray(pack["img"].astype(np.float32))

    key = jax.random.PRNGKey(0)
    code_space = 0.1 * jax.random.normal(key, (n_images, dim, small, small))
    opt = optax.adam(1e-2)
    opt_state = opt.init(code_space)

    def entropy(p):
        p = jnp.maximum(p, 1e-7)
        return -(p * jnp.log(p)).sum(axis=1)

    def loss_fn(code_space, key):
        code = code_space if continuous else jax.nn.log_softmax(code_space, axis=1)
        from depthg_tpu.ops.correlation import norm

        prepped = norm(code) if continuous else jnp.exp(code)
        crf = contrastive_crf_loss(
            key, img, prepped, int(cfg.crf_samples), float(cfg.alpha),
            float(cfg.beta), float(cfg.gamma), float(cfg.w1), float(cfg.w2),
            float(cfg.shift)).mean()
        if continuous:
            reg = 0.0
        else:
            probs = jnp.exp(code)
            ent_global = entropy(probs.mean(axis=0, keepdims=True)).mean()
            ent_local = entropy(probs).mean()
            reg = (-float(cfg.get("global_ent_weight", 0.01)) * ent_global
                   - float(cfg.get("local_ent_weight", 0.01)) * ent_local)
        return crf + reg, crf

    @jax.jit
    def step(code_space, opt_state, key):
        (loss, crf), grads = jax.value_and_grad(loss_fn, has_aux=True)(code_space, key)
        updates, opt_state = opt.update(grads, opt_state, code_space)
        return optax.apply_updates(code_space, updates), opt_state, loss, crf

    out_dir = join(cfg.output_root, "crf_playground")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(epochs):
        code_space, opt_state, loss, crf = step(
            code_space, opt_state, jax.random.fold_in(key, i))
        if i % 100 == 0:
            print(f"step {i}: loss={float(loss):.4f} crf={float(crf):.4f}")
        if i % 500 == 0:
            codes = np.asarray(code_space)
            for idx in range(n_images):
                rgb = np.clip(unnormalize(np.asarray(img[idx])) , 0, 1)
                Image.fromarray((rgb.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
                    join(out_dir, f"{idx}_img.png"))
                if continuous:
                    vis = pca3(codes[idx].transpose(1, 2, 0))
                else:
                    seg = codes[idx].argmax(0)
                    vis = (seg[..., None] == np.arange(3)).astype(float)
                Image.fromarray((vis * 255).astype(np.uint8)).save(
                    join(out_dir, f"{idx}_code_{i}.png"))
    print(f"done; visualizations in {out_dir}")


if __name__ == "__main__":
    main()

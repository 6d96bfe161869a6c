from depthg_tpu.models.vit import ViTConfig, vit_init, vit_apply, VIT_PRESETS
from depthg_tpu.models.featurizer import (
    FeaturizerConfig,
    featurizer_init,
    featurizer_apply,
)
from depthg_tpu.models.probes import (
    cluster_lookup_init,
    cluster_lookup_apply,
    linear_probe_init,
    linear_probe_apply,
    decoder_init,
    decoder_apply,
)

__all__ = [
    "ViTConfig",
    "vit_init",
    "vit_apply",
    "VIT_PRESETS",
    "FeaturizerConfig",
    "featurizer_init",
    "featurizer_apply",
    "cluster_lookup_init",
    "cluster_lookup_apply",
    "linear_probe_init",
    "linear_probe_apply",
    "decoder_init",
    "decoder_apply",
]
